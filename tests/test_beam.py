"""Beam decode: correctness properties on the tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_unified_voice import CFG
from indextts_tpu.models import unified_voice as uv


@pytest.fixture(scope="module")
def params():
    return uv.init_params(jax.random.PRNGKey(0), CFG)


def _decode(params, texts, **kw):
    prep = uv.prepare_text_prompt(texts, CFG.start_text_token, CFG.stop_text_token)
    return uv.inference_speech_beam(
        params, CFG, kw.pop("cond"), jnp.asarray(prep.text_tokens),
        jnp.asarray(prep.attn_text), kw.pop("rng", jax.random.PRNGKey(0)),
        cache_dtype=jnp.float32, **kw)


def _seq_logprob(params, cond, text, codes):
    """Cumulative greedy-path log-prob of a generated sequence under the
    model (teacher-forced) — the quantity beam search maximises."""
    prep = uv.prepare_text_prompt([text], CFG.start_text_token, CFG.stop_text_token)
    r = uv.inference_speech(
        params, CFG, cond, jnp.asarray(prep.text_tokens),
        jnp.asarray(prep.attn_text), jax.random.PRNGKey(0), max_new=len(codes),
        do_sample=False, repetition_penalty=1.0, cache_dtype=jnp.float32)
    return r


def test_beam_runs_and_shapes(params):
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t = rng.integers(2, 40, (6,))
    r = _decode(params, [t], cond=cond, max_new=16, num_beams=3,
                do_sample=False, repetition_penalty=1.0, top_k=0, top_p=1.0)
    assert r.codes.shape == (1, 16)
    assert 0 <= int(r.lengths[0]) <= 16


def test_beam1_greedy_equals_greedy(params):
    """num_beams=1 deterministic beam search must reduce to greedy."""
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t = rng.integers(2, 40, (5,))
    rb = _decode(params, [t], cond=cond, max_new=12, num_beams=1,
                 do_sample=False, repetition_penalty=1.0, top_k=0, top_p=1.0)
    prep = uv.prepare_text_prompt([t], CFG.start_text_token, CFG.stop_text_token)
    rg = uv.inference_speech(
        params, CFG, cond, jnp.asarray(prep.text_tokens),
        jnp.asarray(prep.attn_text), jax.random.PRNGKey(0), max_new=12,
        do_sample=False, repetition_penalty=1.0, cache_dtype=jnp.float32)
    n = min(int(rb.lengths[0]), int(rg.lengths[0]))
    np.testing.assert_array_equal(np.asarray(rb.codes[0, :n]),
                                  np.asarray(rg.codes[0, :n]))


def test_beam_sample_reproducible(params):
    rng = np.random.default_rng(2)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t = rng.integers(2, 40, (5,))
    kw = dict(cond=cond, max_new=10, num_beams=3, do_sample=True,
              repetition_penalty=2.0, top_k=10, top_p=0.9)
    r1 = _decode(params, [t], rng=jax.random.PRNGKey(5), **kw)
    r2 = _decode(params, [t], rng=jax.random.PRNGKey(5), **kw)
    np.testing.assert_array_equal(np.asarray(r1.codes), np.asarray(r2.codes))


def test_beam_batched(params):
    rng = np.random.default_rng(3)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t1 = rng.integers(2, 40, (7,))
    t2 = rng.integers(2, 40, (4,))
    r = _decode(params, [t1, t2], cond=cond, max_new=12, num_beams=2,
                do_sample=False, repetition_penalty=1.0, top_k=0, top_p=1.0)
    assert r.codes.shape == (2, 12)


def test_beam_batched_matches_single(params):
    """Batched (left-padded) greedy beam decode must reproduce each
    sentence's single-row decode — the beam-path analogue of the reference
    padding_test.py invariant.  Catches prefix-mask broadcasting mistakes
    across the (batch, beam) axes of the split KV cache."""
    rng = np.random.default_rng(4)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t1 = rng.integers(2, 40, (7,))
    t2 = rng.integers(2, 40, (4,))
    kw = dict(cond=cond, max_new=12, num_beams=2, do_sample=False,
              repetition_penalty=1.0, top_k=0, top_p=1.0)
    rb = _decode(params, [t1, t2], **kw)
    for i, t in enumerate([t1, t2]):
        rs = _decode(params, [t], **kw)
        n = int(rs.lengths[0])
        assert int(rb.lengths[i]) == n
        np.testing.assert_array_equal(
            np.asarray(rb.codes[i][:n]), np.asarray(rs.codes[0][:n]))


@pytest.mark.parametrize("lp", [0.0, 1.1, -0.5])
def test_beam_step_matches_hf_scorer(lp):
    """Drive ops/beam.beam_step + finalize and HF's BeamSearchScorer with
    IDENTICAL per-step candidate streams; the banked hypotheses, running
    scores, done-latch and final sequence must agree — including the
    length_penalty semantics (score = sum_logprobs / generated_len**lp,
    process-time banking, frozen done batches)."""
    torch = pytest.importorskip("torch")
    from transformers.generation.beam_search import BeamSearchScorer

    from indextts_tpu.ops import beam as beam_lib

    B, nb, V, steps, P = 2, 3, 23, 12, 5
    eos = V - 1
    rng = np.random.default_rng(int(abs(lp) * 10) + 3)

    scorer = BeamSearchScorer(batch_size=B, num_beams=nb, device="cpu",
                              length_penalty=lp, do_early_stopping=False)
    input_ids = torch.ones((B * nb, P), dtype=torch.long)
    hf_scores = torch.full((B, nb), -1e9)
    hf_scores[:, 0] = 0.0
    hf_scores = hf_scores.view(-1)

    state = beam_lib.init_beam_state(B, nb, steps + 1)
    seqs = jnp.zeros((B, nb, steps + 1), jnp.int32)
    done = jnp.zeros((B,), bool)

    for s in range(steps):
        # shared candidate stream: per-beam log-probs, eos made competitive
        logp = np.log(rng.dirichlet(np.ones(V), size=(B, nb))).astype(np.float32)
        logp[:, :, eos] += 3.0  # encourage banking events
        flat_np = logp + np.asarray(state.scores)[:, :, None]
        flat = jnp.asarray(flat_np.reshape(B, nb * V))

        # HF side: identical totals, its own top-2nb
        nts = torch.tensor(logp).view(B * nb, V) + hf_scores[:, None]
        nts = nts.view(B, nb * V)
        topv, topi = torch.topk(nts, 2 * nb, dim=1)
        out = scorer.process(
            input_ids, topv, topi % V, topi // V,
            pad_token_id=0, eos_token_id=[eos], decoder_prompt_len=P)
        hf_scores = out["next_beam_scores"]
        input_ids = torch.cat(
            [input_ids[out["next_beam_indices"], :],
             out["next_beam_tokens"].unsqueeze(-1)], dim=-1)

        state, parent, token, seqs, best_cand = beam_lib.beam_step(
            jax.random.PRNGKey(0), flat, nb, state, seqs, jnp.int32(s),
            eos, do_sample=False, length_penalty=lp, done=done)
        # the PRODUCTION done-heuristic (not HF's is_done) must latch in
        # lockstep with scorer._done — it keys on the step's best candidate
        # incl. banked eos candidates (r3 review)
        done = jnp.logical_or(
            done, beam_lib.batch_done(state, jnp.int32(s), best_cand, lp))

        np.testing.assert_array_equal(np.asarray(done),
                                      scorer._done.numpy())
        np.testing.assert_allclose(np.asarray(best_cand),
                                   nts.max(dim=1).values.numpy(), rtol=1e-6)
        for b in range(B):
            if not bool(done[b]):
                np.testing.assert_allclose(
                    np.asarray(state.scores[b]),
                    hf_scores.view(B, nb)[b].numpy(), rtol=1e-5)
        if bool(jnp.all(done)):
            break

    gl = min(s + 1, steps)  # process iterations executed
    final = scorer.finalize(input_ids, hf_scores, None, None,
                            max_length=P + steps + 1, pad_token_id=0,
                            eos_token_id=[eos], decoder_prompt_len=P)
    best_seq, best_len, from_bank = beam_lib.finalize(
        state, seqs, jnp.int32(gl), length_penalty=lp, done=done)

    # winning scores must agree (catches length-mismatch silently passing
    # a prefix comparison)
    denom = 1.0 if lp == 0.0 else float(gl) ** lp
    run_pen = np.asarray(state.scores, np.float32) / denom
    run_pen = np.where(np.asarray(done)[:, None], beam_lib.NEG_INF, run_pen)
    ours_best = np.concatenate(
        [np.asarray(state.fin_scores), run_pen], axis=1).max(axis=1)
    np.testing.assert_allclose(ours_best, final["sequence_scores"].numpy(),
                               rtol=1e-5)

    hf_seqs = final["sequences"].view(B, -1)
    for b in range(B):
        # ours: banked hyps carry the stop at position len-1; HF appends
        # the eos after the hypothesis tokens, so the generated prefixes
        # must match exactly
        n = int(best_len[b]) - (1 if bool(from_bank[b]) else 0)
        np.testing.assert_array_equal(np.asarray(best_seq[b, :n]),
                                      hf_seqs[b, P : P + n].numpy())


def test_negative_length_penalty_bank_survives_sentinel():
    """A negative length_penalty MAGNIFIES scores (score = sum·gl^|lp|): at
    gl≈600 a real banked hypothesis can fall below -1e9, where the old
    empty-bank sentinel would outrank it in top_k and finalize returned a
    zero-length sequence (r3 review).  The -inf bank sentinel must lose to
    any real penalised score."""
    from indextts_tpu.ops import beam as beam_lib

    B, nb, V, L = 1, 3, 8, 8
    eos = V - 1
    lp = -2.0
    step = jnp.int32(599)  # gl = 600 → denominator 600**-2
    state = beam_lib.init_beam_state(B, nb, L)
    seqs = jnp.zeros((B, nb, L), jnp.int32)
    done = jnp.zeros((B,), bool)

    # beam 0's eos candidate carries sum_logprobs=-4000: penalised score
    # -4000·360000 = -1.44e9, strictly below the old -1e9 sentinel
    flat = np.full((B, nb * V), -5000.0, np.float32)
    flat[0, eos] = -4000.0
    state, _, _, seqs, best_cand = beam_lib.beam_step(
        jax.random.PRNGKey(0), jnp.asarray(flat), nb, state, seqs, step,
        eos, do_sample=False, length_penalty=lp, done=done)

    banked = np.asarray(state.fin_scores[0])
    assert np.isclose(banked.max(), -4000.0 * 600.0**2, rtol=1e-6)

    best_seq, best_len, from_bank = beam_lib.finalize(
        state, seqs, step + 1, length_penalty=lp, done=done)
    # running beams penalise to -5000·~361200 < the banked -1.44e9: the
    # banked hypothesis must win and carry a real length, not a sentinel row
    assert bool(from_bank[0])
    assert int(best_len[0]) > 0
    # batch_done must see the PARTIALLY-filled bank as not-full (isfinite,
    # not a > -1e9/2 threshold the magnified scores now cross)
    assert not bool(beam_lib.batch_done(state, step, best_cand, lp)[0])


def test_extreme_length_penalty_bank_stays_finite():
    """|lp| ≳ 14 at gl≈600 overflows the fp32 penalised score to -inf, which
    isfinite would misread as an EMPTY bank slot — batch_done could then
    never fire and finalize could drop a real banked hypothesis (ADVICE r3).
    Banked scores must clamp to the finite fp32 range."""
    from indextts_tpu.ops import beam as beam_lib

    B, nb, V, L = 1, 3, 8, 8
    eos = V - 1
    lp = -20.0
    step = jnp.int32(599)  # denom = 600**-20 → score / denom overflows fp32
    state = beam_lib.init_beam_state(B, nb, L)
    seqs = jnp.zeros((B, nb, L), jnp.int32)
    done = jnp.zeros((B,), bool)

    flat = np.full((B, nb * V), -5000.0, np.float32)
    flat[0, eos] = -4000.0       # rank-0 eos candidate → banked
    state, _, _, seqs, best_cand = beam_lib.beam_step(
        jax.random.PRNGKey(0), jnp.asarray(flat), nb, state, seqs, step,
        eos, do_sample=False, length_penalty=lp, done=done)

    banked = np.asarray(state.fin_scores[0])
    # the real hypothesis clamps to finfo.min (finite), NOT -inf
    assert np.isfinite(banked.max())
    assert banked.max() == np.finfo(np.float32).min

    best_seq, best_len, from_bank = beam_lib.finalize(
        state, seqs, step + 1, length_penalty=lp, done=done)
    assert int(best_len[0]) > 0  # a real sequence, not a sentinel row


def test_flat_scores_matches_hf_beam_sample_order():
    """Score-pipeline parity with HF 4.44 beam_sample (ADVICE r1): per-beam
    warpers on [B*nb, V] AFTER adding beam scores, processors on log-probs,
    min_tokens_to_keep=2 under beams.  Oracle: HF's own processor/warper
    classes composed in that order."""
    import torch
    from transformers.generation.logits_process import (
        RepetitionPenaltyLogitsProcessor, TemperatureLogitsWarper,
        TopKLogitsWarper, TopPLogitsWarper, TypicalLogitsWarper)

    from indextts_tpu.ops import beam as beam_lib

    B, nb, V = 2, 3, 50
    rng = np.random.default_rng(0)
    logits = (rng.standard_normal((B * nb, V)) * 2).astype(np.float32)
    input_ids = rng.integers(0, V, (B * nb, 4))
    presence = np.zeros((B * nb, V), bool)
    for i, row in enumerate(input_ids):
        presence[i, row] = True
    beam_scores = rng.standard_normal((B, nb)).astype(np.float32)

    t = torch.from_numpy(logits)
    ids = torch.from_numpy(input_ids)
    lp = torch.nn.functional.log_softmax(t, dim=-1)
    lp = RepetitionPenaltyLogitsProcessor(2.5)(ids, lp)
    lp = TypicalLogitsWarper(mass=0.8, min_tokens_to_keep=2)(ids, lp)
    sc = lp + torch.from_numpy(beam_scores.reshape(-1))[:, None]
    sc = TemperatureLogitsWarper(0.9)(ids, sc)
    sc = TopKLogitsWarper(top_k=10, min_tokens_to_keep=2)(ids, sc)
    sc = TopPLogitsWarper(top_p=0.85, min_tokens_to_keep=2)(ids, sc)
    ref = sc.reshape(B, nb * V).numpy()

    ours = np.asarray(beam_lib.flat_scores(
        jnp.asarray(logits), jnp.asarray(presence), jnp.asarray(beam_scores),
        nb, temperature=0.9, top_k=10, top_p=0.85, repetition_penalty=2.5,
        typical_sampling=True, typical_mass=0.8, do_sample=True))

    mask_ref = ~np.isfinite(ref)
    mask_ours = ours <= beam_lib.NEG_INF / 2
    np.testing.assert_array_equal(mask_ref, mask_ours)
    np.testing.assert_allclose(np.where(mask_ref, 0.0, ref),
                               np.where(mask_ours, 0.0, ours),
                               rtol=1e-5, atol=1e-5)


def test_flat_scores_no_warpers_when_greedy():
    """HF builds warpers only for do_sample=True — pure beam search must
    keep the full distribution (processors still apply)."""
    from indextts_tpu.ops import beam as beam_lib

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((3, 20)).astype(np.float32)
    presence = np.zeros((3, 20), bool)
    scores = np.zeros((1, 3), np.float32)
    out = np.asarray(beam_lib.flat_scores(
        jnp.asarray(logits), jnp.asarray(presence), jnp.asarray(scores), 3,
        temperature=0.5, top_k=5, top_p=0.5, repetition_penalty=1.0,
        do_sample=False))
    assert np.isfinite(out).all()  # nothing filtered
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    np.testing.assert_allclose(out.reshape(3, 20), lp, rtol=1e-6, atol=1e-6)


def test_beam_typical_sampling_runs(params):
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t = rng.integers(2, 40, (5,))
    r = _decode(params, [t], cond=cond, max_new=10, num_beams=3,
                do_sample=True, repetition_penalty=2.0, top_k=10, top_p=0.9,
                typical_sampling=True, typical_mass=0.8)
    assert r.codes.shape == (1, 10)


def test_filtered_tokens_never_outrank_dead_beam_candidates():
    """Sentinel separation in flat_scores: top-k/top-p-FILTERED tokens get
    FILTER_NEG (float32 min), while a dead beam's real candidates sit at
    ~NEG_INF (-1e9) + logprob — so a live beam's masked token can never be
    selected over a dead beam's genuine continuation (HF keeps the two
    roles distinct via -inf warpers vs -1e9 beam init)."""
    from indextts_tpu.ops import beam as beam_lib

    rng = np.random.default_rng(7)
    nb, V = 3, 32
    logits = jnp.asarray(rng.standard_normal((nb, V)).astype(np.float32))
    presence = jnp.zeros((nb, V), bool)
    # beam 2 is dead (HF dead-beam init); beams 0/1 live
    beam_scores = jnp.asarray([[0.0, -0.3, beam_lib.NEG_INF]], jnp.float32)
    flat = np.asarray(beam_lib.flat_scores(
        logits, presence, beam_scores, nb, temperature=1.0, top_k=4,
        top_p=0.9, repetition_penalty=1.0, do_sample=True)).reshape(nb, V)
    live_filtered = flat[:2][flat[:2] < beam_lib.NEG_INF]   # masked tokens
    dead = flat[2]
    assert live_filtered.size > 0                            # filter fired
    assert dead.max() > beam_lib.NEG_INF * 2                 # real candidate
    # every dead-beam candidate (even its own filtered ones excluded)
    # outranks every live-beam FILTERED token
    assert dead.max() > live_filtered.max()
    # filtered tokens are at the distinct, far-lower sentinel
    assert (live_filtered < beam_lib.NEG_INF * 1e6).all()
