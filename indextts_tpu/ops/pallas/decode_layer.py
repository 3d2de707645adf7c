"""Fused single-token decode trunk — Pallas TPU kernel.

Motivation (measured on v5e): the XLA decode step costs ~0.28 ms fixed +
~39 µs/layer at B=1 while the int8 weight read is ~1 µs/layer — tiny-batch
decode is *per-op overhead* bound, not bandwidth bound.  This kernel runs
the whole GPT trunk (all L layers: LN1 → qkv → cached attention → proj →
LN2 → MLP) as ONE pallas_call per decode step: weights stream layer-by-
layer through Pallas' block pipeline, the hidden state stays resident in
VMEM scratch, and the KV cache lives in HBM with manual per-layer DMA.

Mosaic constraints engineered around (micro-bisected on this image):
  * lane↔sublane reshapes (e.g. [1, D] → [H, hd]) crash → the cache is kept
    FLAT per layer ([L, T, D], head-major) and per-head reductions are
    matmuls with a constant 0/1 head-indicator matrix M [D, H]:
        scores[T, H] = (k_all ⊙ q) @ M
        ctx[1, D]    = Σ_T (probs @ Mᵀ) ⊙ v_all
  * dynamic `pl.ds` stores into >2D blocks crash → the token's K/V row is
    merged into the VMEM working copy with an iota mask, and written back to
    HBM with a single-row async DMA.

VMEM budget (why the structure looks like this): at 24L/1280d the naive
all-blocks-in-VMEM version needs ~19 MB (> 16 MB).  Here qkv is processed
in three column phases (q, k, v — each selects a static scratch, no dynamic
stores), the MLP in `n_chunks` column blocks, and the cache stays in HBM
(1.5 MB VMEM working copy), for ~11 MB total with double buffering.

Grid: (L, 3 + n_chunks), minor axis fastest:
  c == 0      q phase   (+ hidden-state init on layer 0, cache DMA start)
  c == 1      k phase
  c == 2      v phase + attention (+ h2, MLP accumulator reset)
  c >= 3      MLP column block c-3  (last one finishes the layer)

Supports bf16 weights and int8 weight-only dicts {"q", "s"} (per-output
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


def _kernel(
    pos_ref,                                # scalar-prefetch: [1] int32
    x_ref, mask_ref,                        # [1, D], [T, 1]
    head_mat_ref,                           # [D, H] 0/1 head indicator
    ln1_s_ref, ln1_b_ref,
    qkv_w_ref, qkv_s_ref, qkv_b_ref,        # qkv column phase blocks [1,D,D]
    proj_w_ref, proj_s_ref, proj_b_ref,
    ln2_s_ref, ln2_b_ref,
    fc_w_ref, fc_s_ref, fc_b_ref,
    mproj_w_ref, mproj_s_ref, mproj_b_ref,
    k_hbm_ref, v_hbm_ref,                   # [L, T, D] in ANY/HBM (read-only)
    x_out_ref, krows_out_ref, vrows_out_ref,  # [1,D], [1,1,D] per-layer rows
    x_scr, h1_scr, h2_scr, acc_scr,         # [1, D] fp32
    qrow_scr, krow_scr, vrow_scr,           # [1, D] fp32 / cache-dtype rows
    k_buf, v_buf,                           # [T, D] cache working copies
    in_sems,                                # DMA semaphores (2,)
    *, head_dim: int, n_chunks: int, quant: bool,
):
    l = pl.program_id(0)
    c = pl.program_id(1)
    L = pl.num_programs(0)
    D = x_scr.shape[1]
    T = k_buf.shape[0]
    pos = pos_ref[0]

    def mm(x32, w_ref, s_ref):
        y = jax.lax.dot_general(
            x32, w_ref[0].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if quant:
            y = y * s_ref[0]
        return y

    def layer_norm(x32, s_ref, b_ref):
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)
                * s_ref[0, 0].astype(jnp.float32)
                + b_ref[0, 0].astype(jnp.float32))

    @pl.when(c == 0)
    def _q_phase():
        @pl.when(l == 0)
        def _init():
            x_scr[:] = x_ref[:].astype(jnp.float32)

        # fetch this layer's cache into VMEM (overlaps with q/k phases)
        pltpu.make_async_copy(k_hbm_ref.at[l], k_buf, in_sems.at[0]).start()
        pltpu.make_async_copy(v_hbm_ref.at[l], v_buf, in_sems.at[1]).start()
        h1_scr[:] = layer_norm(x_scr[:], ln1_s_ref, ln1_b_ref)
        qrow_scr[:] = mm(h1_scr[:], qkv_w_ref, qkv_s_ref) \
            + qkv_b_ref[0, 0].astype(jnp.float32)

    @pl.when(c == 1)
    def _k_phase():
        krow_scr[:] = mm(h1_scr[:], qkv_w_ref, qkv_s_ref) \
            + qkv_b_ref[0, 0].astype(jnp.float32)

    @pl.when(c == 2)
    def _v_phase_and_attention():
        v_new = mm(h1_scr[:], qkv_w_ref, qkv_s_ref) \
            + qkv_b_ref[0, 0].astype(jnp.float32)
        vrow_scr[:] = v_new
        pltpu.make_async_copy(k_hbm_ref.at[l], k_buf, in_sems.at[0]).wait()
        pltpu.make_async_copy(v_hbm_ref.at[l], v_buf, in_sems.at[1]).wait()

        # merge the new row at `pos` into the working copies (iota mask)
        t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        sel = t_iota == pos
        k_all = jnp.where(sel, krow_scr[:], k_buf[:].astype(jnp.float32))
        v_all = jnp.where(sel, v_new, v_buf[:].astype(jnp.float32))
        k_buf[:] = k_all.astype(k_buf.dtype)
        v_buf[:] = v_all.astype(v_buf.dtype)

        # emit the new rows; the caller scatters them into the HBM cache
        # (dynamic-position DMA stores crash this Mosaic build)
        krows_out_ref[0] = krow_scr[:].astype(krows_out_ref.dtype)
        vrows_out_ref[0] = v_new.astype(vrows_out_ref.dtype)

        head_mat = head_mat_ref[:].astype(jnp.float32)       # [D, H]
        scores = jax.lax.dot_general(
            k_all * qrow_scr[:], head_mat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [T, H]
        scores = scores / np.sqrt(head_dim) + jnp.where(
            mask_ref[:] != 0, 0.0, NEG_INF)
        smax = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - smax)
        probs = e / jnp.sum(e, axis=0, keepdims=True)        # [T, H]
        pe = jax.lax.dot_general(
            probs, head_mat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [T, D]
        ctx = jnp.sum(pe * v_all, axis=0, keepdims=True)     # [1, D]

        attn_out = mm(ctx, proj_w_ref, proj_s_ref)
        x = x_scr[:] + attn_out + proj_b_ref[0, 0].astype(jnp.float32)
        x_scr[:] = x
        h2_scr[:] = layer_norm(x, ln2_s_ref, ln2_b_ref)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(c >= 3)
    def _mlp_chunk():
        hidden = (mm(h2_scr[:], fc_w_ref, fc_s_ref)
                  + fc_b_ref[0, 0, 0].astype(jnp.float32))
        g = 0.5 * hidden * (1.0 + jnp.tanh(
            np.sqrt(2.0 / np.pi) * (hidden + 0.044715 * hidden ** 3)))
        acc_scr[:] = acc_scr[:] + mm(g, mproj_w_ref, mproj_s_ref)

        @pl.when(c == n_chunks + 2)
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
    quant = isinstance(blocks["attn"]["qkv_w"], dict)
    L, D = blocks["ln_1"]["scale"].shape

    def wq(w):
        return w["q"] if quant else w

    def sc(w, cols):
        if quant:
            return w["s"].astype(jnp.float32)
        return jnp.zeros((L, 1, cols), jnp.float32)

    F = wq(blocks["mlp"]["fc_w"]).shape[2]
    assert F % n_chunks == 0
    Fc = F // n_chunks
    T = k_flat.shape[1]
    C = 3 + n_chunks

    rep3 = lambda l, c, *_: (l, 0, 0)
    # qkv column phase: q|k|v at c = 0|1|2, then parked on the v block
    qmap3 = lambda l, c, *_: (l, 0, jnp.minimum(c, 2))
    qmap3b = lambda l, c, *_: (l, 0, jnp.minimum(c, 2))
    # MLP chunk c-3, parked on chunk 0 during the qkv/attention phases
    mmap3 = lambda l, c, *_: (l, 0, jnp.maximum(c - 3, 0))
    mmap4 = lambda l, c, *_: (l, jnp.maximum(c - 3, 0), 0, 0)
    mmap_mp = lambda l, c, *_: (l, jnp.maximum(c - 3, 0), 0)
    const2 = lambda l, c, *_: (0, 0)

    in_specs = [
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),            # x
        pl.BlockSpec((T, 1), const2, memory_space=pltpu.VMEM),            # mask
        pl.BlockSpec((D, heads), const2, memory_space=pltpu.VMEM),        # head mat
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln1 s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln1 b
        pl.BlockSpec((1, D, D), qmap3, memory_space=pltpu.VMEM),          # qkv w phase
        pl.BlockSpec((1, 1, D), qmap3b, memory_space=pltpu.VMEM),         # qkv s phase
        pl.BlockSpec((1, 1, D), qmap3b, memory_space=pltpu.VMEM),         # qkv b phase
        pl.BlockSpec((1, D, D), rep3, memory_space=pltpu.VMEM),           # proj w
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # proj s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # proj b
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln2 s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln2 b
        pl.BlockSpec((1, D, Fc), mmap3, memory_space=pltpu.VMEM),         # fc w
        pl.BlockSpec((1, 1, Fc), mmap3, memory_space=pltpu.VMEM),         # fc s
        pl.BlockSpec((1, 1, 1, Fc), mmap4, memory_space=pltpu.VMEM),      # fc b
        pl.BlockSpec((1, Fc, D), mmap_mp, memory_space=pltpu.VMEM),       # mproj w
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # mproj s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # mproj b
        pl.BlockSpec(memory_space=pltpu.ANY),                             # k hbm
        pl.BlockSpec(memory_space=pltpu.ANY),                             # v hbm
    ]
    out_specs = (
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(
        _kernel, head_dim=D // heads, n_chunks=n_chunks, quant=quant)

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
                pltpu.VMEM((1, D), jnp.float32),   # x
                pltpu.VMEM((1, D), jnp.float32),   # h1
                pltpu.VMEM((1, D), jnp.float32),   # h2
                pltpu.VMEM((1, D), jnp.float32),   # acc
                pltpu.VMEM((1, D), jnp.float32),   # q row
                pltpu.VMEM((1, D), jnp.float32),   # k row
                pltpu.VMEM((1, D), jnp.float32),   # v row
                pltpu.VMEM((T, D), k_flat.dtype),  # k working copy
                pltpu.VMEM((T, D), v_flat.dtype),  # v working copy
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, D), hidden.dtype),
            jax.ShapeDtypeStruct((L, 1, D), k_flat.dtype),
            jax.ShapeDtypeStruct((L, 1, D), v_flat.dtype),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
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
        wq(blocks["mlp"]["proj_w"]), sc(blocks["mlp"]["proj_w"], D),
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
