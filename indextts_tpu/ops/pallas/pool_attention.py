"""Pooled decode attention — Pallas TPU kernel.

Motivation (measured on v5e at the 64-slot flagship pool shape, r4): the
XLA decode step spends ~11.2 of its 12.8 ms in attention — 6.4× the cache's
DMA floor — because the per-layer `dynamic_index_in_dim` slice, the fp8→bf16
upcast and the `bhqd,bhkd` contraction's K-transpose each materialize
full-cache intermediates in HBM.  This kernel reads the cache ONCE per
step, straight from the stacked [L, S, T, D] buffer (the layer index is a
scalar-prefetch operand consumed by the block index maps, so no layer slice
is ever materialized), converts fp8 tiles in VMEM, and computes scores with
the head-indicator matmul trick from decode_layer.py (Mosaic-safe: no
lane↔sublane reshapes, no K-transpose — `scores[Tc, H] = (k ⊙ q) @ M`).

Layout: the pool cache is FLAT per slot — [L, S, T, D] with D = H·hd
head-major (the natural qkv layout BEFORE split_heads), T padded to the
chunk multiple.  Grid (S/SB slot-tiles, T/Tc chunks), online softmax over
chunks; chunks past a tile's furthest live position pin their index maps
(no DMA) and skip compute, so dead cache tail is never read.

Status: PARKED as an experiment (wired into the scheduler only on branch
experiment/pool-attention-kernel).  Measured on the tunnel v5e the kernel
runs ~1.05 ms per layer-call (65 us/program at 16 programs/call) where the
DMA floor is 73 us/call — per-program/call overhead or slow fp8 upcasts
dominate, and the pooled step LOSES to the row-layout XLA step (2400 vs
4507 tok/s at 64 slots e2e).  Swapping the p@M^T context expansion for
per-head dots changed nothing (2163), and a read-only kernel loop (no
scatter, no carry) reproduces the cost — it is NOT an XLA copy artifact.
A winning version likely needs the whole-trunk one-call structure
(decode_layer.py at S rows) or a toolchain with cheaper program overhead;
parity tests (tests/test_pool_attention.py) keep it correct meanwhile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
_M_INIT = -1e30

# slot-tile sublanes and the cache-chunk target (VMEM: 2 pipeline stages ×
# (k+v) × SB × T_CHUNK × D fp8 ≈ 7.5 MB at the flagship 1280-dim config)
SLOT_BLOCK = 8
T_CHUNK = 184


def _kernel(layer_ref, live_chunk_ref,          # scalar prefetch (index maps)
            q_ref, mask_ref, head_mat_ref, k_ref, v_ref, out_ref,
            m_scr, s_scr, ctx_scr,
            *, head_dim: int, n_tc: int, sb: int,
            compute_dtype):
    i = pl.program_id(0)
    c = pl.program_id(1)
    cd = compute_dtype

    @pl.when(c == 0)
    def _reset():
        m_scr[:] = jnp.full_like(m_scr, _M_INIT)
        s_scr[:] = jnp.zeros_like(s_scr)
        ctx_scr[:] = jnp.zeros_like(ctx_scr)

    # chunks pinned past the tile's live end SKIP compute (their index maps
    # repeat the live-end block: no DMA either).  The guard is required for
    # correctness, not just speed: a pinned chunk re-feeds chunk lc's
    # k/v/mask, and re-running the online-softmax update would accumulate
    # that chunk's mass once per dead chunk, skewing the weighting whenever
    # earlier chunks contributed (they'd be counted once vs lc's N times).
    @pl.when(c <= live_chunk_ref[i])
    def _compute():
        _attend_chunk(q_ref, mask_ref, head_mat_ref, k_ref, v_ref,
                      m_scr, s_scr, ctx_scr, head_dim=head_dim, sb=sb, cd=cd)

    @pl.when(c == n_tc - 1)
    def _finish():
        head_mat32 = head_mat_ref[:].astype(jnp.float32)
        s_lanes = jax.lax.dot_general(
            s_scr[:], head_mat32,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # [SB, D]
        out_ref[:] = (ctx_scr[:] / jnp.maximum(s_lanes, 1e-30)).astype(
            out_ref.dtype)


def _attend_chunk(q_ref, mask_ref, head_mat_ref, k_ref, v_ref,
                  m_scr, s_scr, ctx_scr, *, head_dim: int, sb: int, cd):
    """One online-softmax update over the current [sb, t_chunk, D] block.

    The mask (0 at dead/pad positions, updated with the current write BEFORE
    this call) handles partial chunks.

    ctx update uses per-head [Tc,1]x[Tc,hd] dots (static lane slices), NOT
    the B=1 kernel's p @ Mᵀ expansion: that trick materializes a [Tc, D]
    fp32 intermediate + two elementwise passes PER ROW, which at sb=8
    rows per program was the whole kernel's cost (the "multi-row
    head-indicator scaling" loss ROADMAP.md predicted for fused trunks).
    """
    head_mat = head_mat_ref[:]                                 # [D, H] cd
    head_mat32 = head_mat.astype(jnp.float32)
    heads = head_mat.shape[1]
    hd = head_dim
    for si in range(sb):
        kb = k_ref[0, si].astype(cd)                           # [Tc, D]
        qrow = q_ref[si : si + 1, :].astype(cd)                # [1, D]
        scores = jax.lax.dot_general(
            kb * qrow, head_mat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [Tc, H]
        scores = scores / np.sqrt(head_dim) + jnp.where(
            mask_ref[0][:, si : si + 1] != 0, 0.0, NEG_INF)
        m_old = m_scr[si : si + 1, :]                          # [1, H]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=0, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(scores - m_new).astype(cd)                 # [Tc, H]
        s_scr[si : si + 1, :] = (s_scr[si : si + 1, :] * alpha
                                 + jnp.sum(p, axis=0, keepdims=True,
                                           dtype=jnp.float32))
        m_scr[si : si + 1, :] = m_new
        vb = v_ref[0, si].astype(cd)                           # [Tc, D]
        parts = [
            jax.lax.dot_general(                               # [1, hd]
                p[:, h : h + 1], vb[:, h * hd : (h + 1) * hd],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(heads)
        ]
        new_ctx = jnp.concatenate(parts, axis=1)               # [1, D]
        alpha_lanes = jax.lax.dot_general(                     # [1, D]
            alpha, head_mat32, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ctx_scr[si : si + 1, :] = (ctx_scr[si : si + 1, :] * alpha_lanes
                                   + new_ctx)


@functools.lru_cache(maxsize=4)
def _head_matrix(D: int, heads: int) -> np.ndarray:
    hd = D // heads
    m = np.zeros((D, heads), np.float32)
    for h in range(heads):
        m[h * hd : (h + 1) * hd, h] = 1.0
    return m


def chunking(T: int, target: int = T_CHUNK) -> int:
    """Fewest chunks with t_chunk ≤ target, t_chunk a multiple of 8 dividing
    T (T itself must be a multiple of 8 — callers round the pool cache_len)."""
    if T % 8:  # a bare assert strips under -O and the loop below would spin
        raise ValueError(f"pool cache_len {T} must be a multiple of 8")
    n_tc = max(1, -(-T // target))
    while T % n_tc or (T // n_tc) % 8:
        n_tc += 1
    return n_tc


def supported(S: int, T: int, D: int, heads: int) -> bool:
    """Shapes the kernel handles: whole slot tiles and lane-aligned D."""
    return (D % 128 == 0 and D % heads == 0 and T % 8 == 0
            and (S % SLOT_BLOCK == 0 or S <= SLOT_BLOCK))


def pool_attention(
    q: jnp.ndarray,            # [S, D] fp32/bf16 (current tokens' queries)
    k_all: jnp.ndarray,        # [L, S, T, D] cache (fp8/bf16/fp32)
    v_all: jnp.ndarray,        # [L, S, T, D]
    layer: jnp.ndarray,        # scalar int32 (traced)
    mask_t: jnp.ndarray,       # [T, S] int32 — 1 at valid positions
                               # (current write position INCLUDED)
    live_chunk: jnp.ndarray,   # [n_tiles] int32 — per-tile max live chunk
    heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention for every slot over its own cache row at `layer`.
    Returns ctx [S, D] (head-major flat, ready for the output projection)."""
    L, S, T, D = k_all.shape
    if not supported(S, T, D, heads):
        raise ValueError(
            f"pool_attention unsupported shape S={S} T={T} D={D} "
            f"heads={heads}: need D%128==0, D%heads==0, T%8==0, and S a "
            f"multiple of {SLOT_BLOCK} (or ≤{SLOT_BLOCK})")
    sb = SLOT_BLOCK if S % SLOT_BLOCK == 0 else S
    n_tiles = S // sb
    n_tc = chunking(T)
    t_chunk = T // n_tc
    # [n_tiles, T, sb] mask so each program's block has last-two dims equal
    # to (t_chunk, sb) with sb the true minor array dim
    mask3 = mask_t.reshape(T, n_tiles, sb).transpose(1, 0, 2)

    # index maps (scalar-prefetch refs: layer, live_chunk)
    qmap = lambda i, c, l_ref, lc_ref: (i, 0)
    mmap = lambda i, c, l_ref, lc_ref: (i, jnp.minimum(c, lc_ref[i]), 0)
    kmap = lambda i, c, l_ref, lc_ref: (l_ref[0], i,
                                        jnp.minimum(c, lc_ref[i]), 0)
    cmap = lambda i, c, l_ref, lc_ref: (0, 0)
    omap = lambda i, c, l_ref, lc_ref: (i, 0)

    compute_dtype = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
    kernel = functools.partial(
        _kernel, head_dim=D // heads, n_tc=n_tc, sb=sb,
        compute_dtype=compute_dtype)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles, n_tc),
            in_specs=[
                pl.BlockSpec((sb, D), qmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t_chunk, sb), mmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((D, heads), cmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sb, t_chunk, D), kmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sb, t_chunk, D), kmap, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((sb, D), omap, memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((sb, heads), jnp.float32),   # online max
                pltpu.VMEM((sb, heads), jnp.float32),   # online denom
                pltpu.VMEM((sb, D), jnp.float32),       # context accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((S, D), q.dtype),
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
        live_chunk.astype(jnp.int32),
        q,
        mask3.astype(jnp.int32),
        jnp.asarray(_head_matrix(D, heads), compute_dtype),
        k_all,
        v_all,
    )
