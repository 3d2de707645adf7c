"""Pallas pool-attention kernel (ops/pallas/pool_attention.py): interpret-
mode parity vs the XLA flat path and vs the row-layout decode step.

The kernel is PARKED (branch experiment/pool-attention-kernel wires it into
the scheduler): measured slower than the row-layout XLA step on v5e —
see ROADMAP.md "Pool attention kernel" for the numbers.  These tests keep
the kernel and the flat decode step correct for future toolchains."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.models import gpt2
from indextts_tpu.ops.pallas import pool_attention as pa

L, H, HD = 2, 2, 64
D = H * HD  # 128: the kernel's lane-alignment minimum


def _mask_and_pos(rng, S, T):
    """Pool-shaped masks: hole [32:32+pad) invalid, live up to pos."""
    pos = rng.integers(T // 2, T - 1, (S,)).astype(np.int32)
    mask = np.zeros((S, T), np.int32)
    for s in range(S):
        pad = rng.integers(0, 8)
        mask[s, : pos[s] + 1] = 1
        mask[s, 2 : 2 + pad] = 0
    return jnp.asarray(mask), jnp.asarray(pos)


def _xla_ctx(q, k_all, v_all, l, mask):
    S, T = mask.shape
    k_l = k_all[l].reshape(S, T, H, HD).transpose(0, 2, 1, 3).astype(q.dtype)
    v_l = v_all[l].reshape(S, T, H, HD).transpose(0, 2, 1, 3).astype(q.dtype)
    qh = q.reshape(S, H, 1, HD)
    bias = jnp.where(mask[:, None, None, :].astype(bool), 0.0,
                     gpt2.NEG_INF).astype(jnp.float32)
    return gpt2._merge_heads(gpt2._attention(qh, k_l, v_l, bias))[:, 0, :]


@pytest.mark.parametrize("S,T", [(8, 40), (16, 200), (4, 48)])
def test_kernel_matches_xla(S, T):
    """Multi-tile, multi-chunk (T=200 → 5 chunks of 40), and S<SLOT_BLOCK."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    k_all = jnp.asarray(rng.standard_normal((L, S, T, D)), jnp.float32)
    v_all = jnp.asarray(rng.standard_normal((L, S, T, D)), jnp.float32)
    mask, pos = _mask_and_pos(rng, S, T)
    sb = pa.SLOT_BLOCK if S % pa.SLOT_BLOCK == 0 else S
    t_chunk = T // pa.chunking(T)
    live_chunk = jnp.max((pos // t_chunk).reshape(S // sb, sb), axis=1)
    for l in range(L):
        got = pa.pool_attention(q, k_all, v_all, jnp.int32(l), mask.T,
                                live_chunk, H, interpret=True)
        want = _xla_ctx(q, k_all, v_all, l, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_kernel_dead_tail_chunks():
    """Regression: chunks past a tile's live end pin their index maps to the
    live-end block; without the `c <= live_chunk` compute guard the kernel
    re-accumulated that chunk's softmax mass once per dead chunk (0.09 max
    abs divergence at live_chunk=1 of 3).  All slots early in the cache →
    live_chunk strictly below n_tc-1, multiple dead chunks."""
    S, T = 8, 552  # chunking(552) = 3 chunks of 184
    n_tc = pa.chunking(T)
    t_chunk = T // n_tc
    assert n_tc >= 3
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    k_all = jnp.asarray(rng.standard_normal((L, S, T, D)), jnp.float32)
    v_all = jnp.asarray(rng.standard_normal((L, S, T, D)), jnp.float32)
    # every slot's furthest live position lands in chunk 1 → chunk 2 is dead
    pos = rng.integers(t_chunk, 2 * t_chunk - 1, (S,)).astype(np.int32)
    mask = np.zeros((S, T), np.int32)
    for s in range(S):
        mask[s, : pos[s] + 1] = 1
    mask = jnp.asarray(mask)
    live_chunk = jnp.max((jnp.asarray(pos) // t_chunk).reshape(1, S), axis=1)
    assert int(live_chunk[0]) == 1
    got = pa.pool_attention(q, k_all, v_all, jnp.int32(0), mask.T,
                            live_chunk, H, interpret=True)
    want = _xla_ctx(q, k_all, v_all, 0, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_unsupported_shape_raises():
    """D not lane-aligned must fail loudly at the call site, not as an
    opaque Mosaic error on hardware (interpret mode skips block checks)."""
    q = jnp.zeros((8, 64), jnp.float32)
    k = jnp.zeros((1, 8, 40, 64), jnp.float32)
    with pytest.raises(ValueError, match="unsupported shape"):
        pa.pool_attention(q, k, k, jnp.int32(0),
                          jnp.zeros((40, 8), jnp.int32),
                          jnp.zeros((1,), jnp.int32), 1, interpret=True)


def test_flat_step_matches_row_layout():
    """decode_step_rows_flat (XLA fallback AND interpret kernel) both equal
    the original [L,S,H,T,hd]-layout decode_step_rows, including the cache
    updates, in fp32."""
    from indextts_tpu.models.gpt2 import GPT2Size, KVCache

    S, T = 8, 40
    size = GPT2Size(layers=L, dim=D, heads=H)
    rng = np.random.default_rng(1)
    params = gpt2.init_gpt2_params(jax.random.PRNGKey(0), size,
                                   dtype=jnp.float32)
    hidden = jnp.asarray(rng.standard_normal((S, 1, D)), jnp.float32)
    mask, pos = _mask_and_pos(rng, S, T)
    mask = mask.at[jnp.arange(S), pos].set(1)  # include the write position
    cache = KVCache(
        jnp.asarray(rng.standard_normal((L, S, H, T, HD)), jnp.float32),
        jnp.asarray(rng.standard_normal((L, S, H, T, HD)), jnp.float32))
    want_h, want_cache = gpt2.decode_step_rows(params, hidden, cache, pos,
                                               mask, size)
    kf, vf = gpt2.flatten_rows_cache(cache)
    for use_pallas, interp in [(False, False), (True, True)]:
        got_h, got_k, got_v = gpt2.decode_step_rows_flat(
            params, hidden, kf, vf, pos, mask, size,
            use_pallas=use_pallas, interpret=interp)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                                   rtol=2e-5, atol=2e-5)
        wf_k, wf_v = gpt2.flatten_rows_cache(want_cache)
        np.testing.assert_allclose(np.asarray(got_k), np.asarray(wf_k),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(wf_v),
                                   rtol=1e-6, atol=1e-6)
