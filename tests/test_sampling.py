"""Sampling ops vs the actual HF logits processors the reference uses
(infer.py:628-635 → transformers generate)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from indextts_tpu.ops import sampling


def test_repetition_penalty_matches_hf():
    from transformers import RepetitionPenaltyLogitsProcessor

    V, B = 50, 2
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((B, V)).astype(np.float32)
    seen = [[3, 7, 7, 12], [0, 49]]
    proc = RepetitionPenaltyLogitsProcessor(penalty=10.0)
    input_ids = torch.nn.utils.rnn.pad_sequence(
        [torch.tensor(s) for s in seen], batch_first=True, padding_value=3)
    # HF penalises every id present in input_ids — build presence identically
    presence = np.zeros((B, V), dtype=bool)
    for i, s in enumerate(seen):
        presence[i, s] = True
    presence[0, 3] = True  # padding value counts for row 0 already
    presence[1, 3] = True  # pad token leaks into row 1's input_ids
    ref = proc(input_ids, torch.from_numpy(logits.copy())).numpy()
    ours = np.asarray(sampling.apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(presence), 10.0))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_top_k_top_p_filtering_matches_hf():
    from transformers import TopKLogitsWarper, TopPLogitsWarper

    V, B = 64, 3
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((B, V)).astype(np.float32) * 3
    k, p = 10, 0.8
    ref = TopPLogitsWarper(top_p=p)(
        None, TopKLogitsWarper(top_k=k)(None, torch.from_numpy(logits.copy()))
    ).numpy()
    ref_probs = torch.softmax(torch.from_numpy(ref), -1).numpy()

    # ours: shortlist then mask, mapped back to dense probabilities
    shortlist, idx = jax.lax.top_k(jnp.asarray(logits), k)
    keep = sampling._top_p_mask(shortlist, p)
    masked = jnp.where(keep, shortlist, sampling.NEG_INF)
    probs_short = jax.nn.softmax(masked, axis=-1)
    ours_probs = np.zeros((B, V), np.float32)
    for b in range(B):
        ours_probs[b, np.asarray(idx)[b]] = np.asarray(probs_short)[b]
    np.testing.assert_allclose(ours_probs, ref_probs, rtol=1e-4, atol=1e-6)


def test_sample_step_stop_handling():
    V, B = 20, 2
    logits = jnp.zeros((B, V))
    presence = sampling.init_penalty_presence(V, B, start_token=18)
    finished = jnp.asarray([False, True])
    tok, presence, finished = sampling.sample_step(
        jax.random.PRNGKey(0), logits, presence, finished, stop_token=19,
        do_sample=False, repetition_penalty=1.0)
    # finished row must emit the stop token and stay finished
    assert int(tok[1]) == 19
    assert bool(finished[1])


def test_greedy_ignores_rng():
    V, B = 16, 1
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((B, V)), jnp.float32)
    t1 = sampling.sample_token(jax.random.PRNGKey(0), logits, do_sample=False)
    t2 = sampling.sample_token(jax.random.PRNGKey(9), logits, do_sample=False)
    assert int(t1[0]) == int(t2[0]) == int(np.argmax(np.asarray(logits)))


def test_typical_filter_matches_hf():
    from transformers import TypicalLogitsWarper

    from indextts_tpu.ops.sampling import apply_typical_filter

    V, B = 40, 3
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((B, V)).astype(np.float32) * 2
    ref = TypicalLogitsWarper(mass=0.9)(None, torch.from_numpy(logits.copy())).numpy()
    ours = np.asarray(apply_typical_filter(jnp.asarray(logits), mass=0.9))
    # filter value differs (-inf vs finfo.min); compare keep/remove pattern
    removed_ref = np.isinf(ref) & (ref < 0)
    removed_ours = ours < np.finfo(np.float32).min / 2
    np.testing.assert_array_equal(removed_ours, removed_ref)
    keep = ~removed_ref
    np.testing.assert_allclose(ours[keep], ref[keep], rtol=1e-5)


def test_top_k_disabled_full_nucleus():
    """top_k<=0 with top_p<1 must sample from the full nucleus, not a
    64-token shortlist (ADVICE r1): near-uniform logits over 300 tokens with
    top_p≈1 must produce samples beyond index 64."""
    import jax

    V = 300
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, V)).astype(np.float32) * 0.01)
    seen = set()
    for i in range(200):
        tok = sampling.sample_token(jax.random.PRNGKey(i), logits,
                                    temperature=1.0, top_k=0, top_p=0.999)
        seen.add(int(tok[0]))
    assert max(seen) > 64, sorted(seen)[-5:]


def test_approx_topk_switch_matches_sort():
    """APPROX_TOPK=True routes the shortlist through jax.lax.approx_max_k
    (recall_target=1.0 — exact); on tie-free logits every sampled token and
    the shortlist itself must match the sort-based default."""
    import jax

    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.standard_normal((4, 300)).astype(np.float32))
    v0, i0 = sampling.shortlist_top_k(logits, 32)
    assert sampling.APPROX_TOPK is False
    try:
        sampling.APPROX_TOPK = True
        v1, i1 = sampling.shortlist_top_k(logits, 32)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
        tok_a = sampling.sample_token(jax.random.PRNGKey(0), logits,
                                      temperature=0.8, top_k=30, top_p=0.8)
    finally:
        sampling.APPROX_TOPK = False
    tok_b = sampling.sample_token(jax.random.PRNGKey(0), logits,
                                  temperature=0.8, top_k=30, top_p=0.8)
    np.testing.assert_array_equal(np.asarray(tok_a), np.asarray(tok_b))
