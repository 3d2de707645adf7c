"""Weight-only quantization tiers (int8 / int4).

Capability rebuild of the reference's bitsandbytes path
(indextts/infer.py:50-182,317-353): the GPT trunk + text/mel head weights
are quantised per-output-channel to an int grid and stored as
``{"q": int8, "s": fp32 scale}``.  The matmul helpers
(models/gpt2._mm, models/unified_voice._head_mm) dequantise inside the
einsum, so XLA fuses the convert into the operand load and HBM traffic on
the bandwidth-bound decode path drops ~2× (int8) vs bf16.

int4 is stored in an int8 container with the int4 grid (values in [-8, 7]);
same bandwidth as int8 at rest here, but numerically the int4 tier.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp


def quantize_int(w: jnp.ndarray, bits: int = 8,
                 reduce_axes: Sequence[int] = (-2,)) -> Dict[str, jnp.ndarray]:
    """Symmetric quantisation with per-channel scales; `reduce_axes` are the
    contraction dims (absorbed into the scale)."""
    qmax = 2 ** (bits - 1) - 1
    reduce_axes = tuple(a % w.ndim for a in reduce_axes)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / qmax
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -qmax - 1, qmax)
    return {"q": q.astype(jnp.int8), "s": scale.astype(jnp.float32)}


def dequantize(qw: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    return (qw["q"].astype(jnp.float32) * qw["s"]).astype(dtype)


def quantize_gpt_params(params: Dict[str, Any], bits: int = 8,
                        dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Quantise the trunk + head matrices (the reference quantises `gpt`,
    `text_head`, `mel_head` Linears, infer.py:324-330).  Trunk weights are
    stacked [L, K, N] → scale [L, 1, N]; heads [K, N] → scale [1, N]."""
    out = jax.tree.map(lambda x: x, params)
    blocks = out["gpt"]["blocks"]
    attn = dict(blocks["attn"])
    mlp = dict(blocks["mlp"])
    for group, leaf in (("attn", "qkv_w"), ("attn", "proj_w"),
                        ("mlp", "fc_w"), ("mlp", "proj_w")):
        tgt = attn if group == "attn" else mlp
        tgt[leaf] = quantize_int(tgt[leaf], bits, reduce_axes=(1,))
    out["gpt"] = {**out["gpt"],
                  "blocks": {**blocks, "attn": attn, "mlp": mlp}}
    for head in ("text_head", "mel_head"):
        if head in out:
            out[head] = {**out[head],
                          "kernel": quantize_int(out[head]["kernel"], bits,
                                                  reduce_axes=(0,))}
    return out
