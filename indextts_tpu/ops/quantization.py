"""Weight-only quantization tiers (int8 / int4).

Capability rebuild of the reference's bitsandbytes path
(indextts/infer.py:50-182,317-353): the GPT trunk + text/mel head weights
are quantised per-output-channel to an int grid.  On TPU the compute stays
bf16 (weights are dequantised into the matmul — XLA fuses the scale), so
this reproduces the numeric effect of weight-only PTQ; int8 storage for HBM
savings is applied at rest.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def quantize_int(w: jnp.ndarray, bits: int = 8,
                 axis: int = -1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-channel quantisation along all dims except `axis`.

    Returns (q int8, scale) with w ≈ q * scale broadcast over `axis`."""
    qmax = 2 ** (bits - 1) - 1
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / qmax
    q = jnp.clip(jnp.round(w / scale), -qmax - 1, qmax).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_int(q: jnp.ndarray, scale: jnp.ndarray,
                   dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantized_matmul(x: jnp.ndarray, q: jnp.ndarray,
                     scale: jnp.ndarray) -> jnp.ndarray:
    """x [*, K] @ (q [K, N] * scale [1, N]) with bf16 compute."""
    w = dequantize_int(q, scale, x.dtype)
    return jnp.einsum("...k,kn->...n", x, w, preferred_element_type=jnp.float32).astype(x.dtype)


_QUANT_TARGETS = (
    ("gpt", "blocks", "attn", "qkv_w"),
    ("gpt", "blocks", "attn", "proj_w"),
    ("gpt", "blocks", "mlp", "fc_w"),
    ("gpt", "blocks", "mlp", "proj_w"),
    ("text_head", "kernel"),
    ("mel_head", "kernel"),
)


def quantize_gpt_params(params: Dict[str, Any], bits: int = 8,
                        dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Round-trip the trunk + head matrices through the int grid (the
    reference quantises `gpt`, `text_head`, `mel_head` Linears,
    infer.py:324-330).  Output tree keeps the original structure so every
    forward works unchanged."""
    import copy

    params = jax.tree.map(lambda x: x, params)  # shallow-ish copy of leaves

    def _get(tree, path):
        for p in path[:-1]:
            tree = tree[p]
        return tree, path[-1]

    for path in _QUANT_TARGETS:
        try:
            parent, leaf = _get(params, path)
        except KeyError:
            continue
        w = parent[leaf]
        q, scale = quantize_int(w, bits=bits, axis=-1)
        parent[leaf] = dequantize_int(q, scale, dtype)
    return params
