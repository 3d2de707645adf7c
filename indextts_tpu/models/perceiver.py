"""Perceiver resampler: variable-length conditioning → 32 latent vectors.

Behavioural rebuild of the reference PerceiverResampler
(indextts/gpt/perceiver.py:219-313): learned latents, 2 blocks of
[cross-attention with queries included in the context → GEGLU FF], final
RMSNorm.  Config (gpt/model.py:359-362): dim=1280, dim_context=512,
ff_mult=2, heads=8, dim_head=64, num_latents=32.  No pre-norms inside the
blocks — the reference applies attention/FF on raw residual streams.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class PerceiverSize:
    dim: int = 1280
    dim_context: int = 512
    depth: int = 2
    num_latents: int = 32
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 2

    @property
    def dim_inner(self) -> int:
        return self.dim_head * self.heads

    @property
    def ff_inner(self) -> int:
        # reference FeedForward: int(dim * mult * 2 / 3) (perceiver.py:206)
        return int(self.dim * self.ff_mult * 2 / 3)


def init_params(rng: jax.Array, size: PerceiverSize, dtype=jnp.float32) -> Dict[str, Any]:
    D, Dc, Di, Df = size.dim, size.dim_context, size.dim_inner, size.ff_inner
    L = size.depth
    ks = jax.random.split(rng, 8)

    def u(k, shape, fan_in):
        return (jax.random.uniform(k, shape, jnp.float32, -1, 1) / math.sqrt(fan_in)).astype(dtype)

    return {
        "proj_context": {"kernel": u(ks[0], (Dc, D), Dc), "bias": jnp.zeros((D,), dtype)},
        "latents": (jax.random.normal(ks[1], (size.num_latents, D)) * 0.02).astype(dtype),
        "layers": {
            "attn": {
                "to_q": u(ks[2], (L, D, Di), D),
                "to_kv": u(ks[3], (L, D, 2 * Di), D),
                "to_out": u(ks[4], (L, Di, D), Di),
            },
            "ff": {
                "w1": {"kernel": u(ks[5], (L, D, 2 * Df), D), "bias": jnp.zeros((L, 2 * Df), dtype)},
                "w2": {"kernel": u(ks[6], (L, Df, D), Df), "bias": jnp.zeros((L, D), dtype)},
            },
        },
        "norm": {"gamma": jnp.ones((D,), dtype)},
    }


def rms_norm(x: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """reference RMSNorm (perceiver.py:162-181): l2-normalize * sqrt(dim) * g."""
    dim = x.shape[-1]
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True))
    y = x32 / jnp.maximum(norm, 1e-12) * math.sqrt(dim)
    return (y * gamma.astype(jnp.float32)).astype(x.dtype)


def geglu_ff(ff: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    h = x @ ff["w1"]["kernel"] + ff["w1"]["bias"]
    val, gate = jnp.split(h, 2, axis=-1)  # GEGLU: gelu(gate) * value
    h = jax.nn.gelu(gate, approximate=False) * val
    return h @ ff["w2"]["kernel"] + ff["w2"]["bias"]


def _cross_attention(attn: Dict[str, Any], latents: jnp.ndarray,
                     context: jnp.ndarray, mask: Optional[jnp.ndarray],
                     size: PerceiverSize) -> jnp.ndarray:
    """latents [B,N,D]; context [B,M,D] (queries already prepended);
    mask [B,M] True=attendable or None."""
    B, N, _ = latents.shape
    H, hd = size.heads, size.dim_head
    q = (latents @ attn["to_q"]).reshape(B, N, H, hd).transpose(0, 2, 1, 3)
    kv = context @ attn["to_kv"]
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    ctx = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(latents.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, H * hd)
    return ctx @ attn["to_out"]


def forward(params: Dict[str, Any], x: jnp.ndarray,
            mask: Optional[jnp.ndarray], size: PerceiverSize) -> jnp.ndarray:
    """x: [B, T, dim_context] conformer output; mask: [B, num_latents + T]
    (queries prepended, reference cond_mask_pad gpt/model.py:346,528).
    Returns latents [B, num_latents, dim]."""
    B = x.shape[0]
    x = x @ params["proj_context"]["kernel"] + params["proj_context"]["bias"]
    latents = jnp.broadcast_to(params["latents"][None], (B,) + params["latents"].shape)

    def body(lat, layer):
        context = jnp.concatenate([lat, x], axis=1)
        lat = _cross_attention(layer["attn"], lat, context, mask, size) + lat
        lat = geglu_ff(layer["ff"], lat) + lat
        return lat, None

    latents, _ = jax.lax.scan(body, latents, params["layers"])
    return rms_norm(latents, params["norm"]["gamma"])
