"""Fused single-token decode trunk — Pallas TPU kernel.

Motivation (measured on v5e): the XLA decode step costs ~0.28 ms fixed +
~39 µs/layer at B=1 while the int8 weight read is ~1 µs/layer — tiny-batch
decode is *per-op overhead* bound, not bandwidth bound.  This kernel runs
the whole GPT trunk (all L layers: LN1 → qkv → cached attention → proj →
LN2 → MLP) as ONE pallas_call per decode step: weights stream layer-by-
layer through Pallas' block pipeline, the hidden state stays resident in
VMEM scratch, and the KV cache streams through the same pipeline in
T-chunks with an ONLINE (flash-style) softmax — so VMEM use is constant
in the cache length and any cache_len compiles (the earlier whole-cache
working copies hit a Mosaic compiler crash past ~472 slots and VMEM OOM
past ~976).

Mosaic constraints engineered around (micro-bisected on this image):
  * lane↔sublane reshapes (e.g. [1, D] → [H, hd]) crash → the cache is kept
    FLAT per layer ([L, T, D], head-major) and per-head reductions are
    matmuls with a constant 0/1 head-indicator matrix M [D, H]:
        scores[Tc, H] = (k_chunk ⊙ q) @ M
        ctx[1, D]     = Σ_chunks rescale(ctx) + Σ_t (p @ Mᵀ) ⊙ v_chunk
  * dynamic `pl.ds` stores into >2D blocks crash → the current token's K/V
    row is merged into its chunk with an iota mask and emitted as a
    per-layer row output; the caller scatters it into the HBM cache.

Grid: (L, 3 + n_tc + n_chunks), minor axis fastest:
  c == 0               q phase   (+ hidden-state init on layer 0)
  c == 1               k phase
  c == 2               v phase   (+ online-softmax state reset)
  c in [3, 3+n_tc)     attention over cache chunk c-3 (online softmax);
                       chunks past `pos` pin their index map to pos's
                       chunk (no DMA) and skip compute; the last chunk
                       finalises: ctx/Σ, residual, LN2
  c >= 3+n_tc          MLP column block (last one finishes the layer)

Layout tuning, measured on the tunnel v5e at int4/T=384 (all within or
below the ±3%% run noise): baseline 642 µs/step; merging q|k|v into one
program with a [1,Kb,3D] block 694 µs (one fat DMA pipelines worse than
three splits); t_chunk 192 vs 128 neutral; pos-pinned cache maps neutral
at short caches (kept — they can only reduce DMA).  The step is ~2/3
per-program overhead (240 programs) and ~1/3 DMA; restructuring the grid
does not beat the baseline, so the structure stays as round 2 shipped it.

Supports bf16/fp8 caches and int8 weight-only dicts {"q", "s"} (per-output
scales folded into the matmul outputs).  B=1 only — batched decode stays on
XLA where weight reads amortise across the batch.
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


def _kernel(
    pos_ref,                                # scalar-prefetch: [1] int32
    x_ref,                                  # [1, D]
    mask_ref,                               # [Tc, 1] chunk of the mask
    head_mat_ref,                           # [D, H] 0/1 head indicator
    ln1_s_ref, ln1_b_ref,
    qkv_w_ref, qkv_s_ref, qkv_b_ref,        # qkv column phase blocks [1,D,D]
    proj_w_ref, proj_s_ref, proj_b_ref,
    ln2_s_ref, ln2_b_ref,
    fc_w_ref, fc_s_ref, fc_b_ref,
    mproj_w_ref, mproj_s_ref, mproj_b_ref,
    k_ref, v_ref,                           # [1, Tc, D] cache chunk blocks
    x_out_ref, krows_out_ref, vrows_out_ref,  # [1,D], [1,1,D] per-layer rows
    x_scr, h1_scr, h2_scr, acc_scr,         # [1, D] fp32
    qrow_scr, krow_scr, vrow_scr,           # [1, D] fp32 rows
    m_scr, s_scr,                           # [1, H] online-softmax state
    ctx_scr,                                # [1, D] context accumulator
    *, head_dim: int, n_chunks: int, n_tc: int, t_chunk: int, quant: str,
    compute_dtype,
):
    l = pl.program_id(0)
    c = pl.program_id(1)
    L = pl.num_programs(0)
    D = x_scr.shape[1]
    pos = pos_ref[0]
    off = 3  # q|k|v column phases (a merged single-program qkv measured
    #   SLOWER: one fat [1,Kb,3D] DMA pipelines worse than three splits)
    cd = compute_dtype  # bf16 on the production path: int grids are exact
    #   in bf16 and the MXU accumulates fp32, so the dots lose nothing vs
    #   dequantise-to-fp32 — but the VPU convert traffic halves (measured
    #   the fp32 converts at ~2× the whole DMA floor); fp32 when the caller
    #   decodes in fp32 (CPU tests) for bit-exactness vs the XLA path

    def mm(x32, w_ref, s_ref):
        if quant == "int4":
            # nibble-packed block [Kh, N]: low nibbles = first Kh rows of
            # the activation, high = last Kh (ops/quantization packing) —
            # unpack with sign-extending shifts, contract each half.
            q32 = w_ref[0].astype(jnp.int32)
            lo = jnp.right_shift(jnp.left_shift(q32, 28), 28)
            hi = jnp.right_shift(jnp.left_shift(q32, 24), 28)
            kh = lo.shape[0]
            # scale blocks are (1, 2, N), except mproj's chunk-indexed
            # (1, 1, 2, N) (its 3D block would be (1, 2, N) over a
            # [L, 2G, N] array — an illegal second-minor tile on TPU)
            s = (s_ref[0, 0] if s_ref.ndim == 4 else s_ref[0]).astype(jnp.float32)
            x_c = x32.astype(cd)
            y = jax.lax.dot_general(
                x_c[:, :kh], lo.astype(cd),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * s[0:1]
            y = y + jax.lax.dot_general(
                x_c[:, kh:], hi.astype(cd),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * s[1:2]
            return y
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

    def _reset_softmax_state():
        m_scr[:] = jnp.full_like(m_scr, _M_INIT)
        s_scr[:] = jnp.zeros_like(s_scr)
        ctx_scr[:] = jnp.zeros_like(ctx_scr)

    @pl.when(c == 0)
    def _q_phase():
        @pl.when(l == 0)
        def _init():
            x_scr[:] = x_ref[:].astype(jnp.float32)

        h1_scr[:] = layer_norm(x_scr[:], ln1_s_ref, ln1_b_ref)
        qrow_scr[:] = mm(h1_scr[:], qkv_w_ref, qkv_s_ref) \
            + qkv_b_ref[0, 0].astype(jnp.float32)

    @pl.when(c == 1)
    def _k_phase():
        krow_scr[:] = mm(h1_scr[:], qkv_w_ref, qkv_s_ref) \
            + qkv_b_ref[0, 0].astype(jnp.float32)

    @pl.when(c == 2)
    def _v_phase():
        v_new = mm(h1_scr[:], qkv_w_ref, qkv_s_ref) \
            + qkv_b_ref[0, 0].astype(jnp.float32)
        vrow_scr[:] = v_new
        # emit the new rows; the caller scatters them into the HBM cache
        krows_out_ref[0] = krow_scr[:].astype(krows_out_ref.dtype)
        vrows_out_ref[0] = v_new.astype(vrows_out_ref.dtype)
        _reset_softmax_state()

    @pl.when(jnp.logical_and(c >= off, c < off + n_tc))
    def _attention_chunk():
        j = c - off
        head_mat32 = head_mat_ref[:].astype(jnp.float32)     # [D, H]

        # chunks past the current position contribute nothing: their index
        # map pins them to pos's chunk (no new DMA) and the body is skipped
        @pl.when(j * t_chunk <= pos)
        def _accumulate():
            # merge the current token's K/V row into its chunk (iota mask);
            # the cache chunks stay in their stored dtype (bf16) on the
            # production path — converting them up was pure VPU overhead
            t_iota = jax.lax.broadcasted_iota(jnp.int32, (t_chunk, 1), 0) \
                + j * t_chunk
            sel = t_iota == pos
            k_all = jnp.where(sel, krow_scr[:].astype(cd), k_ref[0].astype(cd))
            v_all = jnp.where(sel, vrow_scr[:].astype(cd), v_ref[0].astype(cd))

            scores = jax.lax.dot_general(
                k_all * qrow_scr[:].astype(cd), head_mat_ref[:].astype(cd),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [Tc, H]
            scores = scores / np.sqrt(head_dim) + jnp.where(
                mask_ref[:] != 0, 0.0, NEG_INF)

            m_old = m_scr[:]
            m_new = jnp.maximum(m_old, jnp.max(scores, axis=0, keepdims=True))
            alpha = jnp.exp(m_old - m_new)                   # [1, H]
            p = jnp.exp(scores - m_new)                      # [Tc, H]
            s_scr[:] = s_scr[:] * alpha + jnp.sum(p, axis=0, keepdims=True)
            m_scr[:] = m_new
            pe = jax.lax.dot_general(
                p, head_mat32,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [Tc, D]
            alpha_lanes = jax.lax.dot_general(
                alpha, head_mat32,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [1, D]
            ctx_scr[:] = (ctx_scr[:] * alpha_lanes
                          + jnp.sum(pe.astype(cd) * v_all, axis=0,
                                    keepdims=True, dtype=jnp.float32))

        @pl.when(c == off + n_tc - 1)
        def _finish_attention():
            s_lanes = jax.lax.dot_general(
                s_scr[:], head_mat32,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [1, D]
            ctx = ctx_scr[:] / s_lanes
            attn_out = mm(ctx, proj_w_ref, proj_s_ref)
            x = x_scr[:] + attn_out + proj_b_ref[0, 0].astype(jnp.float32)
            x_scr[:] = x
            h2_scr[:] = layer_norm(x, ln2_s_ref, ln2_b_ref)
            acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(c >= off + n_tc)
    def _mlp_chunk():
        hidden = (mm(h2_scr[:], fc_w_ref, fc_s_ref)
                  + fc_b_ref[0, 0, 0].astype(jnp.float32))
        g = 0.5 * hidden * (1.0 + jnp.tanh(
            np.sqrt(2.0 / np.pi) * (hidden + 0.044715 * hidden ** 3)))
        acc_scr[:] = acc_scr[:] + mm(g, mproj_w_ref, mproj_s_ref)

        @pl.when(c == off + n_tc + n_chunks - 1)
        def _finish_layer():
            x = x_scr[:] + acc_scr[:] + mproj_b_ref[0, 0].astype(jnp.float32)
            x_scr[:] = x

            @pl.when(l == L - 1)
            def _emit():
                x_out_ref[:] = x.astype(x_out_ref.dtype)


@functools.lru_cache(maxsize=4)
def _head_matrix(D: int, heads: int) -> np.ndarray:
    """0/1 indicator [D, H]: column h marks that head's hd lanes."""
    hd = D // heads
    m = np.zeros((D, heads), np.float32)
    for h in range(heads):
        m[h * hd : (h + 1) * hd, h] = 1.0
    return m


def flatten_cache(cache) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA layout [L, 1, H, T, hd] → flat [L, T, H·hd] (one-time per decode)."""
    L, B, H, T, hd = cache.k.shape
    assert B == 1
    k = cache.k[:, 0].transpose(0, 2, 1, 3).reshape(L, T, H * hd)
    v = cache.v[:, 0].transpose(0, 2, 1, 3).reshape(L, T, H * hd)
    return k, v


def unflatten_cache(k_flat: jnp.ndarray, v_flat: jnp.ndarray, heads: int):
    from indextts_tpu.models.gpt2 import KVCache

    L, T, D = k_flat.shape
    hd = D // heads
    k = k_flat.reshape(L, T, heads, hd).transpose(0, 2, 1, 3)[:, None]
    v = v_flat.reshape(L, T, heads, hd).transpose(0, 2, 1, 3)[:, None]
    return KVCache(k, v)


# the cache-chunk block: fixed so VMEM stays constant in cache length;
# cache_len must be a multiple (callers round up — unused slots are masked)
T_CHUNK = 256


def fused_decode_trunk_flat(
    params: Dict[str, Any],
    hidden: jnp.ndarray,          # [1, 1, D]
    k_flat: jnp.ndarray,          # [L, T, D]
    v_flat: jnp.ndarray,          # [L, T, D]
    position: jnp.ndarray,        # scalar int32
    attention_mask: jnp.ndarray,  # [1, T]
    heads: int,
    n_chunks: int = 4,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step over the flat cache.  Returns (trunk hidden [1, 1, D]
    **before** ln_f, k_flat', v_flat')."""
    blocks = params["blocks"]
    aw = blocks["attn"]["qkv_w"]
    quant = ("int4" if "q4" in aw else "int8") if isinstance(aw, dict) else "none"
    int4 = quant == "int4"
    L, D = blocks["ln_1"]["scale"].shape

    def wq(w):
        if quant == "none":
            return w
        return w["q4"] if int4 else w["q"]

    def sc(w, cols):
        if quant == "none":
            return jnp.zeros((L, 1, cols), jnp.float32)
        return w["s"].astype(jnp.float32)

    F = wq(blocks["mlp"]["fc_w"]).shape[2]
    assert F % n_chunks == 0
    Fc = F // n_chunks
    # packed-int4 K dims are halved; scale blocks carry 2 rows (lo/hi half)
    Kb = D // 2 if int4 else D            # qkv/proj/fc contraction block rows
    Mb = Fc // 2 if int4 else Fc          # mproj per-chunk block rows
    S = 2 if int4 else 1                  # scale rows per block
    if int4:
        g = sc(blocks["mlp"]["proj_w"], D).shape[1] // 2
        assert g == n_chunks, (
            f"mlp.proj_w int4 packing has {g} groups but the kernel streams "
            f"{n_chunks} K-chunks — quantize with groups=n_chunks "
            "(ops/quantization.MLP_PROJ_GROUPS)")
    T = k_flat.shape[1]
    assert T % 8 == 0, f"cache_len {T} must be a multiple of 8"
    # cache chunking: the fewest chunks with t_chunk ≤ T_CHUNK (the search
    # terminates: n_tc = T/8 gives t_chunk = 8)
    n_tc = max(1, -(-T // T_CHUNK))
    while T % n_tc or (T // n_tc) % 8:
        n_tc += 1
    t_chunk = T // n_tc
    off = 3
    C = off + n_tc + n_chunks

    rep3 = lambda l, c, *_: (l, 0, 0)
    # qkv column phase: q|k|v at c = 0|1|2, then parked on the v block
    qmap3 = lambda l, c, *_: (l, 0, jnp.minimum(c, 2))
    qmap3b = lambda l, c, *_: (l, 0, jnp.minimum(c, 2))
    # attention chunk c-off; parked on chunk 0 / pos's chunk outside the
    # window; chunks past pos pin to pos's chunk (same index twice in a
    # row = no DMA — skipped chunks cost neither traffic nor compute)
    tmap = lambda l, c, pos_ref: (
        l, jnp.minimum(jnp.clip(c - off, 0, n_tc - 1),
                       pos_ref[0] // t_chunk), 0)
    tmask = lambda l, c, pos_ref: (
        jnp.minimum(jnp.clip(c - off, 0, n_tc - 1),
                    pos_ref[0] // t_chunk), 0)
    # MLP chunk c-off-n_tc, parked on chunk 0 during earlier phases
    mmap3 = lambda l, c, *_: (l, 0, jnp.maximum(c - off - n_tc, 0))
    mmap4 = lambda l, c, *_: (l, jnp.maximum(c - off - n_tc, 0), 0, 0)
    mmap_mp = lambda l, c, *_: (l, jnp.maximum(c - off - n_tc, 0), 0)
    const2 = lambda l, c, *_: (0, 0)

    in_specs = [
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),            # x
        pl.BlockSpec((t_chunk, 1), tmask, memory_space=pltpu.VMEM),       # mask
        pl.BlockSpec((D, heads), const2, memory_space=pltpu.VMEM),        # head mat
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln1 s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln1 b
        pl.BlockSpec((1, Kb, D), qmap3, memory_space=pltpu.VMEM),         # qkv w phase
        pl.BlockSpec((1, S, D), qmap3b, memory_space=pltpu.VMEM),         # qkv s phase
        pl.BlockSpec((1, 1, D), qmap3b, memory_space=pltpu.VMEM),         # qkv b phase
        pl.BlockSpec((1, Kb, D), rep3, memory_space=pltpu.VMEM),          # proj w
        pl.BlockSpec((1, S, D), rep3, memory_space=pltpu.VMEM),           # proj s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # proj b
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln2 s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln2 b
        pl.BlockSpec((1, Kb, Fc), mmap3, memory_space=pltpu.VMEM),        # fc w
        pl.BlockSpec((1, S, Fc), mmap3, memory_space=pltpu.VMEM),         # fc s
        pl.BlockSpec((1, 1, 1, Fc), mmap4, memory_space=pltpu.VMEM),      # fc b
        pl.BlockSpec((1, Mb, D), mmap_mp, memory_space=pltpu.VMEM),       # mproj w
        # int4 packs mproj per K-chunk → its scale rows follow the chunk;
        # shipped 4D [L, G, 2, D] so the block's last-two dims equal the
        # array's (a (1, 2, D) block over [L, 2G, D] is an illegal tile)
        (pl.BlockSpec((1, 1, 2, D), mmap4, memory_space=pltpu.VMEM)
         if int4 else
         pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM)),         # mproj s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # mproj b
        pl.BlockSpec((1, t_chunk, D), tmap, memory_space=pltpu.VMEM),     # k chunk
        pl.BlockSpec((1, t_chunk, D), tmap, memory_space=pltpu.VMEM),     # v chunk
    ]
    out_specs = (
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),
    )

    # bf16 operands on the production path (int grids exact in bf16, fp32
    # MXU accumulate — only the VPU convert traffic changes); fp32 when the
    # caller decodes in fp32 so CPU interpret tests stay bit-exact vs XLA
    compute_dtype = (jnp.float32 if hidden.dtype == jnp.float32
                     else jnp.bfloat16)
    kernel = functools.partial(
        _kernel, head_dim=D // heads, n_chunks=n_chunks, n_tc=n_tc,
        t_chunk=t_chunk, quant=quant, compute_dtype=compute_dtype)

    # qkv weights/scales/biases rearranged so the column phases are blocks
    qkv_w = wq(blocks["attn"]["qkv_w"])                        # [L, D, 3D]
    qkv_s = sc(blocks["attn"]["qkv_w"], 3 * D)                 # [L, 1, 3D]
    qkv_b = blocks["attn"]["qkv_b"][:, None]                   # [L, 1, 3D]

    x_out, k_rows, v_rows = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, C),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((1, D), jnp.float32),      # x
                pltpu.VMEM((1, D), jnp.float32),      # h1
                pltpu.VMEM((1, D), jnp.float32),      # h2
                pltpu.VMEM((1, D), jnp.float32),      # acc
                pltpu.VMEM((1, D), jnp.float32),      # q row
                pltpu.VMEM((1, D), jnp.float32),      # k row
                pltpu.VMEM((1, D), jnp.float32),      # v row
                pltpu.VMEM((1, heads), jnp.float32),  # online-softmax max
                pltpu.VMEM((1, heads), jnp.float32),  # online-softmax denom
                pltpu.VMEM((1, D), jnp.float32),      # context accumulator
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, D), hidden.dtype),
            jax.ShapeDtypeStruct((L, 1, D), k_flat.dtype),
            jax.ShapeDtypeStruct((L, 1, D), v_flat.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # bf16 weights double every streamed block vs the int8 tier the
            # chunking was tuned on: qkv/fc/mproj [D,D]/[D,Fc]/[Fc,D] blocks
            # at D=1280, Fc=1280 are 3.28 MB each and Mosaic double-buffers
            # them — 25.04 MB of simultaneously-live blocks at the flagship
            # shape, over the 16 MB DEFAULT scoped limit (int8 fits at
            # ~12.5 MB).  32 MB is well inside v5e's 128 MB physical VMEM
            # and keeps the t_chunk=256 cache blocks undegraded.
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(
        position.reshape(1).astype(jnp.int32),
        hidden[0],
        attention_mask.astype(jnp.int32).reshape(T, 1),
        jnp.asarray(_head_matrix(D, heads)),
        blocks["ln_1"]["scale"][:, None], blocks["ln_1"]["bias"][:, None],
        qkv_w, qkv_s, qkv_b,
        wq(blocks["attn"]["proj_w"]), sc(blocks["attn"]["proj_w"], D),
        blocks["attn"]["proj_b"][:, None],
        blocks["ln_2"]["scale"][:, None], blocks["ln_2"]["bias"][:, None],
        wq(blocks["mlp"]["fc_w"]), sc(blocks["mlp"]["fc_w"], F),
        blocks["mlp"]["fc_b"].reshape(L, n_chunks, 1, Fc),
        wq(blocks["mlp"]["proj_w"]),
        (sc(blocks["mlp"]["proj_w"], D).reshape(L, n_chunks, 2, D)
         if int4 else sc(blocks["mlp"]["proj_w"], D)),
        blocks["mlp"]["proj_b"][:, None],
        k_flat, v_flat,
    )
    # scatter the new rows into the flat cache (XLA in-place update)
    k_new = jax.lax.dynamic_update_slice(k_flat, k_rows, (0, position, 0))
    v_new = jax.lax.dynamic_update_slice(v_flat, v_rows, (0, position, 0))
    return x_out[None], k_new, v_new


def fused_decode_trunk(
    params: Dict[str, Any],
    hidden: jnp.ndarray,
    cache,
    position: jnp.ndarray,
    attention_mask: jnp.ndarray,
    heads: int,
    n_chunks: int = 4,
    interpret: bool = False,
):
    """Compatibility wrapper over the XLA cache layout: flattens on entry,
    unflattens the updated cache.  Loops that keep the flat layout across
    steps should call fused_decode_trunk_flat directly (the transposes here
    cost a full cache pass per step)."""
    k_flat, v_flat = flatten_cache(cache)
    x, k_new, v_new = fused_decode_trunk_flat(
        params, hidden, k_flat, v_flat, position, attention_mask,
        heads, n_chunks, interpret)
    return x, unflatten_cache(k_new, v_new, heads)
