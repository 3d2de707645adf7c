"""Legacy conditioning paths (reference condition_type="perceiver" and the
mean-pooled default, gpt/model.py:221-245,534-545).

ConditioningEncoder = Conv1d(100→D, k=1) + N AttentionBlocks
(utils/arch_util.py:84-126): GroupNorm → 1×1 qkv conv (head-major
interleave) → scaled-dot attention → zero-init 1×1 projection, residual.
The shipped checkpoints use "conformer_perceiver"; these paths exist for
compatibility with older IndexTTS checkpoints.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def _group_count(channels: int) -> int:
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups = groups // 2
    assert groups > 2
    return groups


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """x: [B, C, T]; torch GroupNorm semantics in fp32."""
    B, C, T = x.shape
    xf = x.astype(jnp.float32).reshape(B, groups, C // groups, T)
    mean = xf.mean(axis=(2, 3), keepdims=True)
    var = xf.var(axis=(2, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, C, T)
    return (xf * scale[None, :, None] + bias[None, :, None]).astype(x.dtype)


def init_attention_block(rng, channels: int, dtype=jnp.float32) -> Dict[str, Any]:
    k1, k2 = jax.random.split(rng)
    fan = channels
    qkv_w = (jax.random.uniform(k1, (3 * channels, channels), jnp.float32, -1, 1)
             / math.sqrt(fan)).astype(dtype)
    return {
        "norm": {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)},
        "qkv": {"w": qkv_w, "b": jnp.zeros((3 * channels,), dtype)},
        # proj_out is zero-initialised in the reference (arch_util.py:9-15)
        "proj": {"w": jnp.zeros((channels, channels), dtype),
                  "b": jnp.zeros((channels,), dtype)},
    }


def attention_block(params: Dict[str, Any], x: jnp.ndarray, heads: int,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: [B, C, T] → [B, C, T] (arch_util.py:118-126)."""
    B, C, T = x.shape
    groups = _group_count(C)
    h = group_norm(x, params["norm"]["scale"], params["norm"]["bias"], groups)
    qkv = jnp.einsum("bct,oc->bot", h, params["qkv"]["w"]) + params["qkv"]["b"][None, :, None]
    # head-major interleave: [H, 3, ch] per channel block (QKVAttentionLegacy)
    ch = C // heads
    qkv = qkv.reshape(B, heads, 3 * ch, T)
    q, k, v = jnp.split(qkv, 3, axis=2)  # [B, H, ch, T]
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    weight = jnp.einsum("bhct,bhcs->bhts", q * scale, k * scale)
    weight = jax.nn.softmax(weight.astype(jnp.float32), axis=-1).astype(x.dtype)
    if mask is not None:
        weight = weight * mask[:, None, None, :]
    a = jnp.einsum("bhts,bhcs->bhct", weight, v).reshape(B, C, T)
    out = jnp.einsum("bct,oc->bot", a, params["proj"]["w"]) + params["proj"]["b"][None, :, None]
    return x + out


def init_conditioning_encoder(rng, spec_dim: int, embedding_dim: int,
                              attn_blocks: int = 6, dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(rng, attn_blocks + 1)
    fan = spec_dim
    init_w = (jax.random.uniform(ks[0], (embedding_dim, spec_dim), jnp.float32, -1, 1)
              / math.sqrt(fan)).astype(dtype)
    return {
        "init": {"w": init_w, "b": jnp.zeros((embedding_dim,), dtype)},
        "attn": [init_attention_block(ks[i + 1], embedding_dim, dtype)
                  for i in range(attn_blocks)],
    }


def conditioning_encoder(params: Dict[str, Any], mel: jnp.ndarray, heads: int,
                         mean: bool = False) -> jnp.ndarray:
    """mel: [B, 100, T] → [B, D, T] or [B, D] with mean pooling
    (gpt/model.py:239-245)."""
    h = jnp.einsum("bct,oc->bot", mel, params["init"]["w"]) + params["init"]["b"][None, :, None]
    for blk in params["attn"]:
        h = attention_block(blk, h, heads)
    if mean:
        return h.mean(axis=2)
    return h
