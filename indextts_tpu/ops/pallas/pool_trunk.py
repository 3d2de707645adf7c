"""Fused S-row pool decode trunk — Pallas TPU kernel (VERDICT r4 #2).

The whole-trunk generalization of ops/pallas/decode_layer.py to S pool
rows: ONE pallas_call per decode step runs all L layers (LN1 → qkv →
per-row cached attention → proj → LN2 → MLP) with the [S, D] hidden state
resident in VMEM scratch, weights streaming layer-by-layer, and the FLAT
pool cache [L, S, T, D] streaming in (slot-tile, time-chunk) blocks with
an online softmax.

Why this exists: the r4 ablation measured the XLA pool step spending 11.2
of 12.8 ms in attention at the 64-slot flagship shape and called that
"6.4× the cache's 1.75 ms DMA floor".  The r4 per-LAYER Pallas kernel
(deleted) lost to XLA on per-call overhead; this whole-trunk variant is
one pallas_call per step — the structure whose B=1 instance
(decode_layer.py) beats the XLA step 2-4×.

MEASURED VERDICT (r5, tools/bench_pool_trunk.py, S=64 T=768 flagship
24L/1280d/20h int8 weights + fp8 KV, chained donated-carry scan,
host-fetch synced): this kernel 54.3 ms/step vs 18.9 for the production
head-split XLA step (xla-rows) and 78.1 for XLA over the flat cache —
the kernel LOSES 2.9× and `FUSED_TRUNK_DEFAULT` stays False.  The r4
"6.4× headroom" was an accounting error: the 1.75 ms figure was the BEAM
bench's no-reorder floor at engine lengths (T≈100+600, 12 rows —
PARITY.md beam note), not this shape's.  The pool step actually streams
2·L·S·T·D = 3.02 GB of fp8 cache, which at the chip's measured 334 GB/s
stream bandwidth is a 9.05 ms floor — XLA's attention was already within
~25% of it, and there was never 3-4× of headroom to claim.  The kernel
itself is compute-bound, not DMA-bound: the Mosaic-imposed formulation
(flat [T, D] lanes, 0/1 head-indicator matmuls whose row count scales
with S·Tc, arithmetic current-token blend over [sb, Tc, D]) costs ~36 µs
of VPU/low-utilization-MXU work per grid program × 1488 programs, 5-6×
its own 2.6 MB/program DMA — the same per-row dot-count scaling that made
the r4 multi-row fused-trunk analysis reject R=8 (ROADMAP), confirmed
here at S=64.  A winning kernel would need per-head [Tc, hd] dots on an
[S, H, T, hd] layout — exactly the lane↔sublane moves Mosaic disallows
and exactly what XLA already emits near the floor.  Kept behind
`fused_trunk=True` (parity: tests/test_pool_trunk.py) as the measured
decision record; the binding constraint on the pool step is HBM
bandwidth.

Mosaic constraints inherited from decode_layer.py: the cache stays FLAT
head-major ([L, S, T, D]; no lane↔sublane reshapes), per-head reductions
are matmuls with a 0/1 head-indicator matrix, and the current token's K/V
row is merged into its chunk with an iota mask and emitted as a per-layer
row output that the CALLER scatters into HBM (dynamic stores into >2D
blocks crash).

Grid: (L, 3 + n_tiles·n_tc + 1 + n_mc), minor axis fastest:
  a == 0                q phase (+ hidden init on layer 0, softmax reset)
  a == 1                k phase
  a == 2                v phase (emits this layer's K/V rows)
  a in [3, 3+nt·ntc)    attention over (slot-tile i, cache chunk c);
                        chunks past tile i's live end pin their index maps
                        (no DMA) and skip compute
  a == 3+nt·ntc         attention finish: ctx/Σ → proj → residual → LN2
  a > 3+nt·ntc          MLP column chunk (last one finishes the layer;
                        layer L-1 emits the trunk hidden, pre-ln_f)

Supports plain (bf16/fp32) weights and int8 weight-only dicts {"q","s"}.
Parity: tests/test_pool_trunk.py, interpret mode vs
gpt2.decode_step_rows_flat.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
_M_INIT = -1e30

SLOT_BLOCK = 8
T_CHUNK = 128


def _kernel(
    pos_ref, live_chunk_ref,                # scalar prefetch: [S], [nt]
    x_ref,                                  # [S, D]
    mask_ref,                               # [1, Tc, sb] chunk of [nt, T, sb]
    head_mat_ref,                           # [D, H]
    ln1_s_ref, ln1_b_ref,
    qkv_w_ref, qkv_s_ref, qkv_b_ref,        # qkv column phase blocks
    proj_w_ref, proj_s_ref, proj_b_ref,
    ln2_s_ref, ln2_b_ref,
    fc_w_ref, fc_s_ref, fc_b_ref,
    mproj_w_ref, mproj_s_ref, mproj_b_ref,
    k_ref, v_ref,                           # [1, sb, Tc, D] cache blocks
    x_out_ref, krows_out_ref, vrows_out_ref,
    x_scr, h1_scr, h2_scr, acc_scr,         # [S, D] fp32
    qrow_scr, krow_scr, vrow_scr,           # [S, D] fp32
    m_scr, s_scr,                           # [S, H] online-softmax state
    ctx_scr,                                # [S, D] fp32
    *, head_dim: int, n_tiles: int, n_tc: int, t_chunk: int, n_mc: int,
    sb: int, quant: str, compute_dtype,
):
    l = pl.program_id(0)
    a = pl.program_id(1)
    L = pl.num_programs(0)
    S, D = x_scr.shape
    heads = m_scr.shape[1]
    cd = compute_dtype
    att0 = 3
    fin = att0 + n_tiles * n_tc

    def mm(x32, w_ref, s_ref):
        y = jax.lax.dot_general(
            x32.astype(cd), w_ref[0].astype(cd),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if quant == "int8":
            y = y * s_ref[0]
        return y

    def layer_norm(x32, s_ref, b_ref):
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)
                * s_ref[0, 0].astype(jnp.float32)
                + b_ref[0, 0].astype(jnp.float32))

    @pl.when(a == 0)
    def _q_phase():
        @pl.when(l == 0)
        def _init():
            x_scr[:] = x_ref[:].astype(jnp.float32)

        h1_scr[:] = layer_norm(x_scr[:], ln1_s_ref, ln1_b_ref)
        qrow_scr[:] = mm(h1_scr[:], qkv_w_ref, qkv_s_ref) \
            + qkv_b_ref[0, 0].astype(jnp.float32)
        m_scr[:] = jnp.full_like(m_scr, _M_INIT)
        s_scr[:] = jnp.zeros_like(s_scr)
        ctx_scr[:] = jnp.zeros_like(ctx_scr)

    @pl.when(a == 1)
    def _k_phase():
        krow_scr[:] = mm(h1_scr[:], qkv_w_ref, qkv_s_ref) \
            + qkv_b_ref[0, 0].astype(jnp.float32)

    @pl.when(a == 2)
    def _v_phase():
        v_new = mm(h1_scr[:], qkv_w_ref, qkv_s_ref) \
            + qkv_b_ref[0, 0].astype(jnp.float32)
        vrow_scr[:] = v_new
        krows_out_ref[0] = krow_scr[:].astype(krows_out_ref.dtype)
        vrows_out_ref[0] = v_new.astype(vrows_out_ref.dtype)

    @pl.when(jnp.logical_and(a >= att0, a < fin))
    def _attention_chunk():
        i = (a - att0) // n_tc
        c = (a - att0) % n_tc

        @pl.when(c <= live_chunk_ref[i])
        def _accumulate():
            # ALL sb rows of the tile in one vectorized pass (a per-row
            # Python loop of [Tc,D]x[D,H] dots measured 50 ms/step at the
            # flagship shape — 8 sequential MXU-starved matmuls per chunk;
            # one [sb*Tc,D] dot keeps the systolic array fed).  One dynamic
            # tile slice per state array; per-row dynamic indexing would be
            # a Mosaic hazard.
            base = i * sb
            q_t = qrow_scr[pl.ds(base, sb), :]                 # [sb, D] fp32
            k_t = krow_scr[pl.ds(base, sb), :]
            v_t = vrow_scr[pl.ds(base, sb), :]
            m_t = m_scr[pl.ds(base, sb), :]                    # [sb, H]
            s_t = s_scr[pl.ds(base, sb), :]
            ctx_t = ctx_scr[pl.ds(base, sb), :]                # [sb, D]
            head_mat = head_mat_ref[:].astype(cd)
            head_mat32 = head_mat_ref[:].astype(jnp.float32)
            # current-token merge for every row at once: [sb, Tc] selector
            # of each row's write position inside this chunk
            pos_vec = jnp.stack([pos_ref[base + si] for si in range(sb)])
            t_iota = jax.lax.broadcasted_iota(
                jnp.int32, (sb, t_chunk), 1) + c * t_chunk
            # exact 0/1 arithmetic blend — Mosaic cannot insert a minor dim
            # on an i1 vector, and selector values 0.0/1.0 make the blend
            # bit-exact in any dtype
            sel = (t_iota == pos_vec[:, None]).astype(
                jnp.int32)[:, :, None].astype(cd)              # [sb, Tc, 1]
            kb = (k_ref[0].astype(cd) * (1 - sel)
                  + k_t[:, None, :].astype(cd) * sel)          # [sb, Tc, D]
            vb = (v_ref[0].astype(cd) * (1 - sel)
                  + v_t[:, None, :].astype(cd) * sel)
            # per-head scores for all rows/positions in ONE dot:
            # (kb ⊙ q) @ M — collapse (sb, Tc) into the sublane axis
            qk = (kb * q_t[:, None, :].astype(cd)
                  ).reshape(sb * t_chunk, D)
            scores = jax.lax.dot_general(
                qk, head_mat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(sb, t_chunk, heads) / np.sqrt(head_dim)
            scores = scores + (
                1.0 - mask_ref[0][:, :, None].astype(jnp.float32)) * NEG_INF
            m_new = jnp.maximum(m_t, jnp.max(scores, axis=1))  # [sb, H]
            alpha = jnp.exp(m_t - m_new)
            p = jnp.exp(scores - m_new[:, None, :])            # [sb, Tc, H]
            s_new = s_t * alpha + jnp.sum(p, axis=1)
            # context via the B=1 kernel's lane expansion: p@Mᵀ then ⊙v
            p_lanes = jax.lax.dot_general(
                p.reshape(sb * t_chunk, heads).astype(cd), head_mat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # [sb*Tc, D]
            contrib = jnp.sum(
                (p_lanes.astype(cd) * vb.reshape(sb * t_chunk, D)
                 ).reshape(sb, t_chunk, D),
                axis=1, dtype=jnp.float32)                     # [sb, D]
            alpha_lanes = jax.lax.dot_general(
                alpha, head_mat32,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # [sb, D]
            m_scr[pl.ds(base, sb), :] = m_new
            s_scr[pl.ds(base, sb), :] = s_new
            ctx_scr[pl.ds(base, sb), :] = ctx_t * alpha_lanes + contrib

    @pl.when(a == fin)
    def _finish_attention():
        head_mat32 = head_mat_ref[:].astype(jnp.float32)
        s_lanes = jax.lax.dot_general(
            s_scr[:], head_mat32,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # [S, D]
        ctx = ctx_scr[:] / jnp.maximum(s_lanes, 1e-30)
        attn_out = mm(ctx, proj_w_ref, proj_s_ref)
        x = x_scr[:] + attn_out + proj_b_ref[0, 0].astype(jnp.float32)
        x_scr[:] = x
        h2_scr[:] = layer_norm(x, ln2_s_ref, ln2_b_ref)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(a > fin)
    def _mlp_chunk():
        hidden = (mm(h2_scr[:], fc_w_ref, fc_s_ref)
                  + fc_b_ref[0, 0, 0].astype(jnp.float32))
        g = 0.5 * hidden * (1.0 + jnp.tanh(
            np.sqrt(2.0 / np.pi) * (hidden + 0.044715 * hidden ** 3)))
        acc_scr[:] = acc_scr[:] + mm(g, mproj_w_ref, mproj_s_ref)

        @pl.when(a == fin + n_mc)
        def _finish_layer():
            x = x_scr[:] + acc_scr[:] + mproj_b_ref[0, 0].astype(jnp.float32)
            x_scr[:] = x

            @pl.when(l == L - 1)
            def _emit():
                x_out_ref[:] = x.astype(x_out_ref.dtype)


@functools.lru_cache(maxsize=4)
def _head_matrix(D: int, heads: int) -> np.ndarray:
    hd = D // heads
    m = np.zeros((D, heads), np.float32)
    for h in range(heads):
        m[h * hd : (h + 1) * hd, h] = 1.0
    return m


def chunking(T: int, target: int = T_CHUNK) -> int:
    if T % 8:
        raise ValueError(f"pool cache_len {T} must be a multiple of 8")
    n_tc = max(1, -(-T // target))
    while T % n_tc or (T // n_tc) % 8:
        n_tc += 1
    return n_tc


def mlp_chunking(F: int, D: int, itemsize: int,
                 target_bytes: int = 768 * 1024) -> int:
    """MLP column-chunk count sized to the scoped-VMEM budget: the fc/proj
    weight blocks ([D, Fc] / [Fc, D]) are the fattest streamed operands and
    Mosaic double-buffers them, so at the flagship shape (D=1280, F=5120,
    int8) a fixed Fc=F/4 overflows the 16 MB scoped VMEM by ~1 MB.  Pick
    the smallest chunk count dividing F with the block under
    `target_bytes` and Fc lane-aligned where possible."""
    n = max(1, -(-(F * D * itemsize) // target_bytes))
    while n < F // 128 and (F % n or (F // n) % 128):
        n += 1
    while F % n:  # fall back: any divisor (tiny test configs)
        n -= 1
    return max(1, n)


def supported(S: int, T: int, D: int, heads: int,
              params: Dict[str, Any]) -> bool:
    """Shapes/weight tiers this kernel handles (plain or int8 weights,
    lane-aligned D, whole slot tiles)."""
    aw = params["blocks"]["attn"]["qkv_w"]
    quant_ok = not isinstance(aw, dict) or set(aw) == {"q", "s"}
    return (quant_ok and D % 128 == 0 and D % heads == 0 and T % 8 == 0
            and (S % SLOT_BLOCK == 0 or S <= SLOT_BLOCK))


def fused_pool_step(
    params: Dict[str, Any],
    hidden: jnp.ndarray,          # [S, D] this step's embeddings
    k_all: jnp.ndarray,           # [L, S, T, D] flat pool cache
    v_all: jnp.ndarray,
    positions: jnp.ndarray,       # [S] int32 write slots (current token)
    attention_mask: jnp.ndarray,  # [S, T] int32, positions INCLUDED
    heads: int,
    n_chunks: int | None = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused decode step for all S slots.  Returns (trunk hidden
    [S, D] **before** ln_f, k_rows [L, S, D], v_rows [L, S, D]); the
    caller scatters the rows into the HBM cache at `positions`."""
    blocks = params["blocks"]
    aw = blocks["attn"]["qkv_w"]
    quant = "int8" if isinstance(aw, dict) else "none"
    L, D = blocks["ln_1"]["scale"].shape
    S, T = attention_mask.shape

    def wq(w):
        return w["q"] if quant == "int8" else w

    def sc(w, cols):
        if quant == "none":
            return jnp.zeros((L, 1, cols), jnp.float32)
        return w["s"].astype(jnp.float32)

    F = wq(blocks["mlp"]["fc_w"]).shape[2]
    if n_chunks is None:
        n_chunks = mlp_chunking(F, D, wq(blocks["mlp"]["fc_w"]).dtype.itemsize)
    assert F % n_chunks == 0
    Fc = F // n_chunks
    sb = SLOT_BLOCK if S % SLOT_BLOCK == 0 else S
    n_tiles = S // sb
    n_tc = chunking(T)
    t_chunk = T // n_tc
    att0 = 3
    fin = att0 + n_tiles * n_tc
    C = fin + 1 + n_chunks

    # [nt, sb, T] mask so each block's last-two dims are (sb, t_chunk)
    mask3 = attention_mask.astype(jnp.int32).reshape(n_tiles, sb, T)

    def att_ic(a, lc_ref):
        ai = jnp.clip(a - att0, 0, n_tiles * n_tc - 1)
        i = ai // n_tc
        return i, jnp.minimum(ai % n_tc, lc_ref[i])

    rep3 = lambda l, a, *_: (l, 0, 0)
    qmap3 = lambda l, a, *_: (l, 0, jnp.minimum(a, 2))
    kmap = lambda l, a, pos_ref, lc_ref: (
        (l,) + tuple(att_ic(a, lc_ref)) + (0,))
    def mmask(l, a, pos_ref, lc_ref):
        i, c = att_ic(a, lc_ref)
        return (i, 0, c)
    mlpmap3 = lambda l, a, *_: (l, 0, jnp.clip(a - fin - 1, 0, n_chunks - 1))
    mlpmap4 = lambda l, a, *_: (l, jnp.clip(a - fin - 1, 0, n_chunks - 1), 0, 0)
    mlpmap_mp = lambda l, a, *_: (l, jnp.clip(a - fin - 1, 0, n_chunks - 1), 0)
    const2 = lambda l, a, *_: (0, 0)

    in_specs = [
        pl.BlockSpec((S, D), const2, memory_space=pltpu.VMEM),            # x
        pl.BlockSpec((1, sb, t_chunk), mmask, memory_space=pltpu.VMEM),   # mask
        pl.BlockSpec((D, heads), const2, memory_space=pltpu.VMEM),        # M
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln1 s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln1 b
        pl.BlockSpec((1, D, D), qmap3, memory_space=pltpu.VMEM),          # qkv w
        pl.BlockSpec((1, 1, D), qmap3, memory_space=pltpu.VMEM),          # qkv s
        pl.BlockSpec((1, 1, D), qmap3, memory_space=pltpu.VMEM),          # qkv b
        pl.BlockSpec((1, D, D), rep3, memory_space=pltpu.VMEM),           # proj w
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # proj s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # proj b
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln2 s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln2 b
        pl.BlockSpec((1, D, Fc), mlpmap3, memory_space=pltpu.VMEM),       # fc w
        pl.BlockSpec((1, 1, Fc), mlpmap3, memory_space=pltpu.VMEM),       # fc s
        pl.BlockSpec((1, 1, 1, Fc), mlpmap4, memory_space=pltpu.VMEM),    # fc b
        pl.BlockSpec((1, Fc, D), mlpmap_mp, memory_space=pltpu.VMEM),     # mp w
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # mp s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # mp b
        pl.BlockSpec((1, sb, t_chunk, D), kmap, memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, sb, t_chunk, D), kmap, memory_space=pltpu.VMEM),  # v
    ]
    out_specs = (
        pl.BlockSpec((S, D), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, D), rep3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, D), rep3, memory_space=pltpu.VMEM),
    )

    compute_dtype = (jnp.float32 if hidden.dtype == jnp.float32
                     else jnp.bfloat16)
    heads_n = heads
    kernel = functools.partial(
        _kernel, head_dim=D // heads, n_tiles=n_tiles, n_tc=n_tc,
        t_chunk=t_chunk, n_mc=n_chunks, sb=sb, quant=quant,
        compute_dtype=compute_dtype)

    qkv_w = wq(blocks["attn"]["qkv_w"])                        # [L, D, 3D]
    qkv_s = sc(blocks["attn"]["qkv_w"], 3 * D)                 # [L, 1, 3D]
    qkv_b = blocks["attn"]["qkv_b"][:, None]                   # [L, 1, 3D]
    # per-tile furthest live chunk (positions are the highest valid index
    # per row — prefix fills [0, base), generated tokens [base, pos])
    live_chunk = jnp.max(
        (positions // t_chunk).reshape(n_tiles, sb), axis=1).astype(jnp.int32)

    x_out, k_rows, v_rows = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(L, C),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((S, D), jnp.float32),       # x
                pltpu.VMEM((S, D), jnp.float32),       # h1
                pltpu.VMEM((S, D), jnp.float32),       # h2
                pltpu.VMEM((S, D), jnp.float32),       # acc
                pltpu.VMEM((S, D), jnp.float32),       # q rows
                pltpu.VMEM((S, D), jnp.float32),       # k rows
                pltpu.VMEM((S, D), jnp.float32),       # v rows
                pltpu.VMEM((S, heads_n), jnp.float32),  # online max
                pltpu.VMEM((S, heads_n), jnp.float32),  # online denom
                pltpu.VMEM((S, D), jnp.float32),       # ctx accumulator
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, D), hidden.dtype),
            jax.ShapeDtypeStruct((L, S, D), k_all.dtype),
            jax.ShapeDtypeStruct((L, S, D), v_all.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the flagship 64-slot shape needs ~17 MB of simultaneously-live
            # blocks (weights + double-buffered cache chunks + fp32 row
            # scratch) — over Mosaic's 16 MB DEFAULT scoped limit but well
            # inside v5e's 128 MB physical VMEM; 32 MB keeps the wide cache
            # chunks (t_chunk=128) instead of degrading DMA efficiency
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(
        positions.astype(jnp.int32),
        live_chunk,
        hidden,
        mask3,
        jnp.asarray(_head_matrix(D, heads)),
        blocks["ln_1"]["scale"][:, None], blocks["ln_1"]["bias"][:, None],
        qkv_w, qkv_s, qkv_b,
        wq(blocks["attn"]["proj_w"]), sc(blocks["attn"]["proj_w"], D),
        blocks["attn"]["proj_b"][:, None],
        blocks["ln_2"]["scale"][:, None], blocks["ln_2"]["bias"][:, None],
        wq(blocks["mlp"]["fc_w"]), sc(blocks["mlp"]["fc_w"], F),
        blocks["mlp"]["fc_b"].reshape(L, n_chunks, 1, Fc),
        wq(blocks["mlp"]["proj_w"]), sc(blocks["mlp"]["proj_w"], D),
        blocks["mlp"]["proj_b"][:, None],
        k_all, v_all,
    )
    return x_out, k_rows, v_rows
