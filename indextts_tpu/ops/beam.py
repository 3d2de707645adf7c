"""Static-shape beam decode helpers.

The reference decodes with HF `generate(num_beams=3, do_sample=True, ...)`
(infer.py:628-635) — "beam sample": per step, beam log-probs are summed
with warped token log-probs over the flattened [beams × vocab] space, 2·nb
candidates are drawn (sampled, or top-k when do_sample=False), finished
candidates are banked as hypotheses and the best nb continuing candidates
become the new beams.

This module provides the per-step candidate selection and the hypothesis
bank as pure functions over static shapes; the loop lives in
models/unified_voice.inference_speech_beam.  length_penalty=0 (the
reference default) ⇒ raw cumulative log-prob scoring.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu.ops.sampling import NEG_INF as FILTER_NEG

# Beam-score sentinel: dead-beam init and stop-candidate ranking use HF's
# -1e9 (beam_search_scores init, utils/generation).  Token-FILTER masking
# uses the more negative FILTER_NEG (= float32 min, HF warpers' -inf
# analogue) so a masked token can never outrank a dead beam's real
# candidate (-1e9 + logprob): the two sentinel roles stay distinguishable.
NEG_INF = -1e9
# Empty-bank sentinel: must lose to ANY real length-penalised score.  With a
# negative length_penalty the penalised score is sum_logprobs·gl^|lp| and can
# fall below -1e9 (lp=-2, gl≈600 needs only sum_logprobs < -2.8e3), so the
# bank sentinel is -inf, not NEG_INF — HF's Python BeamHypotheses heap simply
# has no entry, which -inf models exactly.  Never used in arithmetic: bank
# scores are only compared/top_k'd, and bank-fullness tests isfinite.
BANK_EMPTY = float("-inf")


def flat_scores(
    logits: jnp.ndarray,        # [B*nb, V]
    presence: jnp.ndarray,      # [B*nb, V] bool (repetition-penalty table)
    beam_scores: jnp.ndarray,   # [B, nb] cumulative log-probs
    num_beams: int,
    *,
    temperature: float = 1.0,
    top_k: int = 30,
    top_p: float = 0.8,
    repetition_penalty: float = 10.0,
    typical_sampling: bool = False,
    typical_mass: float = 0.9,
    do_sample: bool = True,
) -> jnp.ndarray:
    """Candidate totals [B, nb*V] in HF 4.44 beam_sample order (the
    reference pins transformers==4.44.2; ADVICE r1):

      log_softmax → logits_processor (repetition penalty + typical filter,
      applied to the *log-probs*) → + beam scores → logits_warper
      (temperature / top-k / top-p) per beam ROW [B*nb, V] → flatten.

    Warpers run only when sampling (HF builds them only for do_sample) and
    use min_tokens_to_keep=2 under beams (HF _get_logits_warper).

    `temperature`/`top_p`/`repetition_penalty` may be traced scalars, or
    per-ROW vectors [B*nb] (the beam pool's per-request contract — each
    group decodes with its own request's params); a scalar broadcasts
    exactly, so the dedicated single-request path is unchanged."""
    from indextts_tpu.ops import sampling

    def _col(v):
        a = jnp.asarray(v, jnp.float32)
        return a[:, None] if a.ndim == 1 else a

    temperature = _col(temperature)
    top_p = _col(top_p)
    repetition_penalty = _col(repetition_penalty)

    Bnb, V = logits.shape
    B = Bnb // num_beams
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp = sampling.apply_repetition_penalty(lp, presence, repetition_penalty)
    if typical_sampling:
        lp = sampling.apply_typical_filter(lp, typical_mass,
                                           min_tokens_to_keep=2)
    sc = lp + beam_scores.reshape(-1)[:, None]
    if do_sample:
        min_keep = 2
        # temperature/top_p may be traced scalars (value changes don't
        # recompile the decode program); /1.0 and the top_p=1.0 threshold
        # (→ plain top-k cutoff) are exact no-ops
        sc = sc / temperature
        if 0 < top_k < V:
            # hot path: after the top-k filter only kk values survive, so the
            # nucleus threshold can be found on the kk-shortlist — no
            # full-vocab argsort per decode step
            kk = max(top_k, min_keep)
            shortlist, _ = jax.lax.top_k(sc, kk)           # [B*nb, kk] desc
            probs = jax.nn.softmax(shortlist, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = jnp.logical_or(cum - probs <= top_p,
                                  jnp.arange(kk)[None, :] < min_keep)
            last = jnp.sum(keep.astype(jnp.int32), axis=-1,
                           keepdims=True) - 1
            thresh = jnp.take_along_axis(shortlist, last, axis=-1)
            sc = jnp.where(sc < thresh, FILTER_NEG, sc)
        else:
            order = jnp.argsort(-sc, axis=-1)
            ssc = jnp.take_along_axis(sc, order, axis=-1)
            probs = jax.nn.softmax(ssc, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            remove_sorted = jnp.logical_and(
                cum - probs > top_p, jnp.arange(V)[None, :] >= min_keep)
            remove = jnp.take_along_axis(
                remove_sorted, jnp.argsort(order, axis=-1), axis=-1)
            sc = jnp.where(remove, FILTER_NEG, sc)
    return sc.reshape(B, num_beams * V)


class BeamState(NamedTuple):
    scores: jnp.ndarray        # [B, nb] cumulative log-probs of live beams
    # hypothesis bank: best finished sequences per batch
    fin_scores: jnp.ndarray    # [B, nb]
    fin_seqs: jnp.ndarray      # [B, nb, max_len]
    fin_lens: jnp.ndarray      # [B, nb]


def init_beam_state(batch: int, num_beams: int, max_len: int) -> BeamState:
    scores = jnp.full((batch, num_beams), NEG_INF).at[:, 0].set(0.0)
    return BeamState(
        scores=scores,
        fin_scores=jnp.full((batch, num_beams), BANK_EMPTY),
        fin_seqs=jnp.zeros((batch, num_beams, max_len), jnp.int32),
        fin_lens=jnp.zeros((batch, num_beams), jnp.int32),
    )


def length_denom(generated_len: jnp.ndarray, length_penalty: float) -> jnp.ndarray:
    """HF's hypothesis-score denominator `generated_len ** length_penalty`
    (BeamHypotheses.add with generated_len = cur_len - decoder_prompt_len).
    `length_penalty` may be traced (slider changes reuse the compiled
    program); lp=0 → exactly 1.0 (callers always pass generated_len ≥ 1)."""
    lp = jnp.asarray(length_penalty, jnp.float32)
    gl = jnp.maximum(generated_len, 1).astype(jnp.float32)
    return jnp.where(lp == 0.0, jnp.float32(1.0), jnp.power(gl, lp))


def beam_step(
    rng: jax.Array,
    flat: jnp.ndarray,       # [B, nb*V] beam-score + warped log-prob totals
    num_beams: int,
    state: BeamState,
    seqs: jnp.ndarray,       # [B, nb, max_len] running sequences
    step: jnp.ndarray,       # current length of running sequences
    stop_token: int,
    do_sample: bool,
    length_penalty: float = 0.0,
    done: Optional[jnp.ndarray] = None,
) -> Tuple[BeamState, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One beam(-sample) step over precomputed flattened candidate totals
    (the caller applies processors/warpers, HF beam_sample order).

    Returns (state', beam_parent [B, nb], next_token [B, nb],
    seqs' [B, nb, max_len], best_cand [B]).  `best_cand` is the step's
    maximum candidate total over all 2·nb candidates INCLUDING banked eos
    candidates — HF's `next_scores[batch_idx].max()`, the value its
    done-heuristic keys on (BeamSearchScorer.process → is_done); the kept
    running beams' max is ≤ this whenever the top candidate was an eos,
    which matters for length_penalty ≠ 0 (r3 review).
    Candidates that end with `stop_token` are
    banked into the hypothesis bank with HF's length-penalised score
    `sum_logprobs / generated_len**length_penalty` (generated_len =
    `step + 1`: HF's process uses cur_len = input_ids.shape[-1] + 1, i.e.
    the eos candidate itself counts — beam_search.py:232,292);
    the nb best non-stop candidates continue on raw cumulative scores.

    `done` [B] is HF's latched `_done`: a done batch is FROZEN — its bank
    accepts nothing new and its running scores/sequences keep their values
    (BeamSearchScorer.process pads and skips done batches; with
    length_penalty > 0 a longer hypothesis could otherwise displace banked
    ones after the stop decision, diverging from HF)."""
    B = flat.shape[0]
    nb = num_beams
    V = flat.shape[1] // nb
    cand = 2 * nb
    if done is None:
        done = jnp.zeros((B,), bool)
    # `step` and `length_penalty` may be scalars (dedicated decode: every
    # batch row at the same offset) or per-batch [B] vectors (beam pool:
    # each group at its own offset, with its own request's length penalty)
    step = jnp.broadcast_to(jnp.asarray(step, jnp.int32), (B,))
    lp_col = jnp.broadcast_to(
        jnp.asarray(length_penalty, jnp.float32), (B,))

    if do_sample:
        # sample 2nb distinct candidates via Gumbel top-k over the flat
        # dist.  `rng` is one key (dedicated decode: the whole batch shares
        # a step key) or a BATCH of keys [B, 2] (beam pool: each group
        # draws from its own request's fold chain); a single key's (B, C)
        # draw equals the per-row (C,) draws of the same key, so the two
        # forms agree at B=1 bit-for-bit.
        if rng.ndim == 2:
            g = jax.vmap(
                lambda k: jax.random.gumbel(k, (flat.shape[1],)))(rng)
        else:
            g = jax.random.gumbel(rng, flat.shape)
        _, idx = jax.lax.top_k(flat + g, cand)
        sc = jnp.take_along_axis(flat, idx, axis=1)
        order = jnp.argsort(-sc, axis=1)
        idx = jnp.take_along_axis(idx, order, axis=1)
        sc = jnp.take_along_axis(sc, order, axis=1)
    else:
        sc, idx = jax.lax.top_k(flat, cand)              # already sorted desc

    parent = idx // V                                     # [B, cand]
    token = (idx % V).astype(jnp.int32)
    is_stop = token == stop_token

    # --- bank finished candidates -------------------------------------
    # candidate sequences = parent's prefix + stop; keep the nb best
    # finished overall (merge with existing bank)
    cand_seqs = jnp.take_along_axis(
        seqs, parent[:, :, None], axis=1)                 # [B, cand, L]
    cand_seqs = jax.vmap(
        lambda s, t, st: s.at[:, st].set(t),
        in_axes=(0, 0, 0))(cand_seqs, token, step)
    # HF BeamSearchScorer.process drops (not banks) eos candidates whose
    # candidate rank is >= num_beams ("is_beam_token_worse_than_top_num_
    # beams", beam_search.py in transformers 4.44); candidates here are
    # sorted desc, so rank == position
    bankable = jnp.logical_and(
        jnp.logical_and(is_stop, jnp.arange(cand)[None, :] < nb),
        ~done[:, None])
    # clamp to the finite fp32 range: with extreme negative length_penalty
    # (|lp| ≳ 14 at gl≈600) the penalised score overflows to -inf, which
    # batch_done/finalize would misread as an EMPTY bank slot (-inf is the
    # empty sentinel) — same magnification class as the r3 sentinel bug,
    # one step further out (ADVICE r3)
    fin_cand_scores = jnp.where(
        bankable,
        jnp.maximum(sc / length_denom(step + 1, lp_col)[:, None],
                    jnp.finfo(jnp.float32).min),
        BANK_EMPTY)
    all_scores = jnp.concatenate([state.fin_scores, fin_cand_scores], axis=1)
    all_seqs = jnp.concatenate([state.fin_seqs, cand_seqs], axis=1)
    all_lens = jnp.concatenate(
        [state.fin_lens,
         jnp.broadcast_to((step + 1)[:, None], (B, cand)).astype(jnp.int32)],
        axis=1)
    top_sc, top_ix = jax.lax.top_k(all_scores, nb)
    fin_seqs = jnp.take_along_axis(all_seqs, top_ix[:, :, None], axis=1)
    fin_lens = jnp.take_along_axis(all_lens, top_ix, axis=1)

    # --- pick nb continuing (non-stop) candidates ----------------------
    cont_rank = jnp.where(is_stop, NEG_INF, sc)
    _, keep = jax.lax.top_k(cont_rank, nb)                # [B, nb]
    new_scores = jnp.take_along_axis(jnp.where(is_stop, NEG_INF, sc), keep, axis=1)
    new_parent = jnp.take_along_axis(parent, keep, axis=1)
    new_token = jnp.take_along_axis(token, keep, axis=1)
    new_seqs = jnp.take_along_axis(cand_seqs, keep[:, :, None], axis=1)

    # freeze done batches (scores, sequences, bank); parent defaults to the
    # identity so the cache reorder is a no-op for them
    d1 = done[:, None]
    state = BeamState(
        jnp.where(d1, state.scores, new_scores),
        jnp.where(d1, state.fin_scores, top_sc),
        jnp.where(d1[:, :, None], state.fin_seqs, fin_seqs),
        jnp.where(d1, state.fin_lens, fin_lens),
    )
    new_parent = jnp.where(d1, jnp.arange(nb)[None, :], new_parent)
    new_seqs = jnp.where(d1[:, :, None], seqs, new_seqs)
    return state, new_parent, new_token, new_seqs, sc[:, 0]


def batch_done(state: BeamState, step: jnp.ndarray, best_cand: jnp.ndarray,
               length_penalty: float = 0.0) -> jnp.ndarray:
    """HF early_stopping=False done-heuristic (BeamHypotheses.is_done): a
    batch is done when its bank is full AND the worst banked
    (length-penalised) score beats the best THIS-step candidate's
    attainable score `best_cand / (step+1)**lp` — best_cand is beam_step's
    max over all 2·nb candidates (HF `next_scores.max()`), and HF's
    cur_len counts the candidate token itself (beam_search.py:232).
    Call AFTER the step's banking, then latch with logical_or
    (beam_search.py:300-306)."""
    bank_full = jnp.isfinite(state.fin_scores[:, -1])
    # step/length_penalty: traced scalars or per-batch [B] (see beam_step)
    attainable = best_cand / length_denom(step + 1, length_penalty)
    return jnp.logical_and(bank_full, state.fin_scores[:, -1] >= attainable)


def finalize(state: BeamState, seqs: jnp.ndarray, step: jnp.ndarray,
             length_penalty: float = 0.0,
             done: Optional[jnp.ndarray] = None,
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Best hypothesis per batch, HF BeamSearchScorer.finalize semantics:
    for batches whose early-stop condition has NOT fired, the running beams
    join the bank with length-penalised scores
    `sum_logprobs / generated_len**length_penalty` and compete with the
    banked hypotheses; for done batches the bank alone decides
    (beam_search.py:345-360).

    Returns (sequences [B, max_len], lengths [B], from_bank [B] — whether
    the winning hypothesis carries a stop token)."""
    B, nb, L = seqs.shape
    if done is None:
        done = jnp.zeros((B,), bool)
    step = jnp.broadcast_to(jnp.asarray(step, jnp.int32), (B,))
    lp_col = jnp.broadcast_to(
        jnp.asarray(length_penalty, jnp.float32), (B,))
    # same finite clamp as beam_step's banking: -inf is reserved for "no
    # hypothesis", a penalised-overflow real beam must stay representable
    run_pen = jnp.maximum(state.scores / length_denom(step, lp_col)[:, None],
                          jnp.finfo(jnp.float32).min)             # [B, nb]
    run_pen = jnp.where(done[:, None], BANK_EMPTY, run_pen)
    all_scores = jnp.concatenate([state.fin_scores, run_pen], axis=1)
    best_ix = jnp.argmax(all_scores, axis=1)                      # [B]
    from_bank = best_ix < nb
    bank_ix = jnp.clip(best_ix, 0, nb - 1)
    run_ix = jnp.clip(best_ix - nb, 0, nb - 1)
    bank_seq = jnp.take_along_axis(state.fin_seqs, bank_ix[:, None, None],
                                   axis=1)[:, 0]
    run_seq = jnp.take_along_axis(seqs, run_ix[:, None, None], axis=1)[:, 0]
    out_seq = jnp.where(from_bank[:, None], bank_seq, run_seq)
    bank_len = jnp.take_along_axis(state.fin_lens, bank_ix[:, None], axis=1)[:, 0]
    out_len = jnp.where(from_bank, bank_len, step)
    return out_seq, out_len, from_bank
