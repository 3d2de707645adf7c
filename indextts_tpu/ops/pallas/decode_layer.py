"""Fused single-token decode trunk — Pallas TPU kernel.

Motivation (measured on v5e): the XLA decode step costs ~39µs/layer at B=1
while the int8 weight read is ~1µs/layer — tiny-batch decode is *per-op
overhead* bound, not bandwidth bound.  This kernel runs the whole GPT trunk
(all L layers: LN1 → qkv → cached attention → proj → LN2 → MLP) as ONE
pallas_call per decode step: weights stream layer-by-layer through Pallas'
block pipeline, the hidden state stays resident in VMEM scratch.

Grid: (L, 1 + n_chunks), minor axis fastest.  Chunk 0 of each layer does
attention and writes this token's K/V into the layer's cache block; chunks
1..n do column-blocks of the MLP (fc [D, 4D] is too big to double-buffer
whole).  Block index_maps repeat the same block index across chunks where a
buffer must stay resident — Pallas only re-DMAs on index change — so cache
and per-layer weights move exactly once per layer.

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
    pos_ref,                               # scalar-prefetch: [1] int32
    x_ref, mask_ref,
    ln1_s_ref, ln1_b_ref,
    qkv_w_ref, qkv_s_ref, qkv_b_ref,
    proj_w_ref, proj_s_ref, proj_b_ref,
    ln2_s_ref, ln2_b_ref,
    fc_w_ref, fc_s_ref, fc_b_ref,
    mproj_w_ref, mproj_s_ref, mproj_b_ref,
    k_cache_ref, v_cache_ref,
    x_out_ref, k_out_ref, v_out_ref,
    x_scr, h2_scr, acc_scr,
    *, heads: int, head_dim: int, n_chunks: int, quant: bool,
):
    l = pl.program_id(0)
    c = pl.program_id(1)
    L = pl.num_programs(0)
    D = x_scr.shape[1]
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

    @pl.when(jnp.logical_and(l == 0, c == 0))
    def _init():
        x_scr[:] = x_ref[:].astype(jnp.float32)

    @pl.when(c == 0)
    def _attention():
        x = x_scr[:]
        h1 = layer_norm(x, ln1_s_ref, ln1_b_ref)
        qkv = mm(h1, qkv_w_ref, qkv_s_ref) + qkv_b_ref[0, 0].astype(jnp.float32)
        H, hd = heads, head_dim
        q = qkv[0, :D].reshape(H, hd)
        k = qkv[0, D : 2 * D].reshape(H, hd)
        v = qkv[0, 2 * D :].reshape(H, hd)

        # out blocks are write buffers: merge this token's K/V into the
        # cached history at `pos` via an iota mask (this Mosaic build
        # rejects dynamic-index stores into 4D blocks) and write the full
        # block — a VMEM-local write, no extra HBM traffic
        t_iota = jax.lax.broadcasted_iota(jnp.int32, (H, k_cache_ref.shape[2], hd), 1)
        sel = t_iota == pos
        k_all = jnp.where(sel, k[:, None, :],
                          k_cache_ref[0].astype(jnp.float32))   # [H, T, hd]
        v_all = jnp.where(sel, v[:, None, :],
                          v_cache_ref[0].astype(jnp.float32))
        k_out_ref[0] = k_all.astype(k_out_ref.dtype)
        v_out_ref[0] = v_all.astype(v_out_ref.dtype)
        # per-head matvecs as multiply+reduce (Mosaic has no batched dots);
        # H*T*hd ≈ 0.4M VPU mults — negligible
        scores = jnp.sum(k_all * q[:, None, :], axis=-1)        # [H, T]
        scores = scores / np.sqrt(hd) + jnp.where(
            mask_ref[0] != 0, 0.0, NEG_INF)[None, :]
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.sum(probs[:, :, None] * v_all, axis=1)        # [H, hd]
        attn_out = mm(ctx.reshape(1, D), proj_w_ref, proj_s_ref)
        x = x + attn_out + proj_b_ref[0, 0].astype(jnp.float32)
        x_scr[:] = x
        h2_scr[:] = layer_norm(x, ln2_s_ref, ln2_b_ref)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # every step (incl. c==0, after attention) runs one MLP column block
    hidden = (mm(h2_scr[:], fc_w_ref, fc_s_ref)
              + fc_b_ref[0, 0, 0].astype(jnp.float32))
    g = 0.5 * hidden * (1.0 + jnp.tanh(
        np.sqrt(2.0 / np.pi) * (hidden + 0.044715 * hidden ** 3)))
    acc_scr[:] = acc_scr[:] + mm(g, mproj_w_ref, mproj_s_ref)

    @pl.when(c == n_chunks - 1)
    def _finish_layer():
        x = x_scr[:] + acc_scr[:] + mproj_b_ref[0, 0].astype(jnp.float32)
        x_scr[:] = x

        @pl.when(l == L - 1)
        def _emit():
            x_out_ref[:] = x.astype(x_out_ref.dtype)


def fused_decode_trunk(
    params: Dict[str, Any],
    hidden: jnp.ndarray,          # [1, 1, D]
    cache,                        # gpt2.KVCache ([L, 1, H, T, hd])
    position: jnp.ndarray,        # scalar int32
    attention_mask: jnp.ndarray,  # [1, T]
    heads: int,
    n_chunks: int = 4,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Any]:
    """Drop-in replacement for the trunk part of gpt2.decode_step (B=1).
    Returns (trunk hidden [1, 1, D] **before** ln_f, updated cache)."""
    from indextts_tpu.models.gpt2 import KVCache

    blocks = params["blocks"]
    quant = isinstance(blocks["attn"]["qkv_w"], dict)

    def wq(w):
        return w["q"] if quant else w

    def sc(w, cols):
        if quant:
            return w["s"].astype(jnp.float32)
        L = blocks["ln_1"]["scale"].shape[0]
        return jnp.zeros((L, 1, cols), jnp.float32)

    L, D = blocks["ln_1"]["scale"].shape
    F = wq(blocks["mlp"]["fc_w"]).shape[2]
    assert F % n_chunks == 0
    Fc = F // n_chunks
    hd = D // heads
    T = cache.k.shape[3]
    k_in = cache.k[:, 0]
    v_in = cache.v[:, 0]

    rep2 = lambda l, c, *_: (l, 0)
    rep3 = lambda l, c, *_: (l, 0, 0)
    rep4 = lambda l, c, *_: (l, 0, 0, 0)
    cmap3 = lambda l, c, *_: (l, 0, c)
    cmap4 = lambda l, c, *_: (l, c, 0, 0)
    cmap_mp = lambda l, c, *_: (l, c, 0)
    const2 = lambda l, c, *_: (0, 0)

    in_specs = [
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),            # x
        pl.BlockSpec((1, T), const2, memory_space=pltpu.VMEM),            # mask
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln1 s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln1 b
        pl.BlockSpec((1, D, 3 * D), rep3, memory_space=pltpu.VMEM),       # qkv w
        pl.BlockSpec((1, 1, 3 * D), rep3, memory_space=pltpu.VMEM),       # qkv s
        pl.BlockSpec((1, 1, 3 * D), rep3, memory_space=pltpu.VMEM),       # qkv b
        pl.BlockSpec((1, D, D), rep3, memory_space=pltpu.VMEM),           # proj w
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # proj s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # proj b
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln2 s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # ln2 b
        pl.BlockSpec((1, D, Fc), cmap3, memory_space=pltpu.VMEM),         # fc w
        pl.BlockSpec((1, 1, Fc), cmap3, memory_space=pltpu.VMEM),         # fc s
        pl.BlockSpec((1, 1, 1, Fc), cmap4, memory_space=pltpu.VMEM),      # fc b
        pl.BlockSpec((1, Fc, D), cmap_mp, memory_space=pltpu.VMEM),       # mproj w
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # mproj s
        pl.BlockSpec((1, 1, D), rep3, memory_space=pltpu.VMEM),           # mproj b
        pl.BlockSpec((1, heads, T, hd), rep4, memory_space=pltpu.VMEM),   # k in
        pl.BlockSpec((1, heads, T, hd), rep4, memory_space=pltpu.VMEM),   # v in
    ]
    out_specs = (
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, T, hd), rep4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, T, hd), rep4, memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(
        _kernel, heads=heads, head_dim=hd, n_chunks=n_chunks, quant=quant)

    x_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, n_chunks),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((1, D), jnp.float32),
                pltpu.VMEM((1, D), jnp.float32),
                pltpu.VMEM((1, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, D), hidden.dtype),
            jax.ShapeDtypeStruct(k_in.shape, k_in.dtype),
            jax.ShapeDtypeStruct(v_in.shape, v_in.dtype),
        ),
        interpret=interpret,
    )(
        position.reshape(1).astype(jnp.int32),
        hidden[0], attention_mask.astype(jnp.int32),
        blocks["ln_1"]["scale"][:, None], blocks["ln_1"]["bias"][:, None],
        wq(blocks["attn"]["qkv_w"]), sc(blocks["attn"]["qkv_w"], 3 * D),
        blocks["attn"]["qkv_b"][:, None],
        wq(blocks["attn"]["proj_w"]), sc(blocks["attn"]["proj_w"], D),
        blocks["attn"]["proj_b"][:, None],
        blocks["ln_2"]["scale"][:, None], blocks["ln_2"]["bias"][:, None],
        wq(blocks["mlp"]["fc_w"]), sc(blocks["mlp"]["fc_w"], F),
        blocks["mlp"]["fc_b"].reshape(L, n_chunks, 1, Fc),
        wq(blocks["mlp"]["proj_w"]), sc(blocks["mlp"]["proj_w"], D),
        blocks["mlp"]["proj_b"][:, None],
        k_in, v_in,
    )
    return x_out[None], KVCache(k_new[:, None], v_new[:, None])
