"""Conformer conditioning encoder (functional JAX).

Behavioural rebuild of the reference wenet-style encoder
(indextts/gpt/conformer_encoder.py:389-465, conformer/attention.py:141-242,
conformer/embedding.py:109-140, conformer/subsampling.py:111-143):
conv2d2 front-end (2× time subsampling), 6 blocks of
[rel-pos MHA → conv module (GLU + depthwise k=15 + LayerNorm + SiLU) → FF]
with pre-norm and a final LayerNorm.  dropout_rate=0 in the reference
config, so no dropout here.

All 6 blocks are stacked and scanned.  The rel-pos attention follows the
wenet formulation: scores = ((q+u)·kᵀ + (q+v)·pᵀ)/√d with p the sinusoidal
encoding of absolute positions 0..T-1 (no rel-shift — matching the
reference's actual compute path, attention.py:221-242).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.models.gpt2 import layer_norm

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class ConformerSize:
    input_size: int = 100
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    cnn_kernel: int = 15

    @property
    def head_dim(self) -> int:
        return self.output_size // self.attention_heads


def sinusoidal_pos_encoding(length: int, dim: int) -> np.ndarray:
    """wenet PositionalEncoding table (embedding.py:48-56)."""
    pe = np.zeros((length, dim), dtype=np.float32)
    position = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at padded positions (reference: utils/common.py:89-113)."""
    seq = jnp.arange(max_len)[None, :]
    return seq >= lengths[:, None]


def init_params(rng: jax.Array, size: ConformerSize, dtype=jnp.float32) -> Dict[str, Any]:
    D, H, F = size.output_size, size.attention_heads, size.linear_units
    L = size.num_blocks
    fsub = (size.input_size - 1) // 2
    ks = jax.random.split(rng, 16)
    u = lambda k, shape, fan_in: (
        jax.random.uniform(k, shape, jnp.float32, -1, 1) / math.sqrt(fan_in)
    ).astype(dtype)
    return {
        "embed": {
            "conv": {"w": u(ks[0], (D, 1, 3, 3), 9), "b": jnp.zeros((D,), dtype)},
            "out": {"kernel": u(ks[1], (D * fsub, D), D * fsub), "bias": jnp.zeros((D,), dtype)},
        },
        "blocks": {
            "norm_mha": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
            "attn": {
                "q": {"kernel": u(ks[2], (L, D, D), D), "bias": jnp.zeros((L, D), dtype)},
                "k": {"kernel": u(ks[3], (L, D, D), D), "bias": jnp.zeros((L, D), dtype)},
                "v": {"kernel": u(ks[4], (L, D, D), D), "bias": jnp.zeros((L, D), dtype)},
                "out": {"kernel": u(ks[5], (L, D, D), D), "bias": jnp.zeros((L, D), dtype)},
                "pos": {"kernel": u(ks[6], (L, D, D), D)},
                "pos_bias_u": u(ks[7], (L, H, D // H), D // H),
                "pos_bias_v": u(ks[8], (L, H, D // H), D // H),
            },
            "norm_conv": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
            "conv": {
                # pointwise convs stored as [in, out] matrices (k=1)
                "pw1": {"kernel": u(ks[9], (L, D, 2 * D), D), "bias": jnp.zeros((L, 2 * D), dtype)},
                "dw": {"w": u(ks[10], (L, D, 1, size.cnn_kernel), size.cnn_kernel),
                        "b": jnp.zeros((L, D), dtype)},
                "norm": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
                "pw2": {"kernel": u(ks[11], (L, D, D), D), "bias": jnp.zeros((L, D), dtype)},
            },
            "norm_ff": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
            "ff": {
                "w1": {"kernel": u(ks[12], (L, D, F), D), "bias": jnp.zeros((L, F), dtype)},
                "w2": {"kernel": u(ks[13], (L, F, D), F), "bias": jnp.zeros((L, D), dtype)},
            },
            "norm_final": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
        },
        "after_norm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }


def _subsample(params: Dict[str, Any], x: jnp.ndarray,
               mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conv2dSubsampling2 (subsampling.py:111-143): Conv2d(1,D,3,2)+ReLU over
    (time, freq), flatten, Linear.  x: [B, T, F_in] -> [B, T', D]."""
    B, T, Fin = x.shape
    h = jax.lax.conv_general_dilated(
        x[:, None, :, :], params["embed"]["conv"]["w"],
        window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    h = jax.nn.relu(h + params["embed"]["conv"]["b"][None, :, None, None])
    B, C, Tp, Fp = h.shape
    h = h.transpose(0, 2, 1, 3).reshape(B, Tp, C * Fp)
    h = h @ params["embed"]["out"]["kernel"] + params["embed"]["out"]["bias"]
    return h, mask[:, 2::2]


def _rel_attention(blk_attn, x, pos_emb, key_mask, heads):
    """x: [B,T,D]; pos_emb: [T,D]; key_mask: [B,T] True=valid."""
    B, T, D = x.shape
    hd = D // heads

    def proj(p, inp):
        return (inp @ p["kernel"] + p["bias"]).reshape(B, T, heads, hd)

    q = proj(blk_attn["q"], x)
    k = proj(blk_attn["k"], x)
    v = proj(blk_attn["v"], x)
    p = (pos_emb @ blk_attn["pos"]["kernel"]).reshape(T, heads, hd)

    q_u = (q + blk_attn["pos_bias_u"][None, None]).transpose(0, 2, 1, 3)
    q_v = (q + blk_attn["pos_bias_v"][None, None]).transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k, preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,khd->bhqk", q_v, p, preferred_element_type=jnp.float32)
    scores = (ac + bd) / math.sqrt(hd)
    mask4 = key_mask[:, None, None, :]
    scores = jnp.where(mask4, scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = jnp.where(mask4, probs, 0.0)  # reference zeroes masked attn
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
    return ctx @ blk_attn["out"]["kernel"] + blk_attn["out"]["bias"]


def _conv_module(blk_conv, x, key_mask):
    """ConvolutionModule (conformer_encoder.py:56-164). x: [B,T,D].
    Pointwise convs are plain matmuls (MXU); only the depthwise k=15 is a
    real convolution."""
    h = jnp.where(key_mask[:, :, None], x, 0.0)
    h = h @ blk_conv["pw1"]["kernel"] + blk_conv["pw1"]["bias"]
    a, b = jnp.split(h, 2, axis=-1)  # GLU over channel dim
    h = a * jax.nn.sigmoid(b)
    # depthwise conv over time, same padding; torch weight layout [D, 1, K]
    D = h.shape[-1]
    pad = blk_conv["dw"]["w"].shape[-1] // 2
    h = jax.lax.conv_general_dilated(
        h.transpose(0, 2, 1), blk_conv["dw"]["w"],
        window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=D)
    h = (h + blk_conv["dw"]["b"][None, :, None]).transpose(0, 2, 1)
    h = layer_norm(h, blk_conv["norm"]["scale"], blk_conv["norm"]["bias"])
    h = jax.nn.silu(h)
    h = h @ blk_conv["pw2"]["kernel"] + blk_conv["pw2"]["bias"]
    return jnp.where(key_mask[:, :, None], h, 0.0)


def forward(params: Dict[str, Any], mel: jnp.ndarray, mel_lengths: jnp.ndarray,
            size: ConformerSize) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mel: [B, T, n_mels] (time-major, as get_conditioning transposes,
    gpt/model.py:525); mel_lengths: [B].
    Returns (encoded [B, T', D], valid-mask [B, T'] bool)."""
    B, T, _ = mel.shape
    valid = ~make_pad_mask(mel_lengths, T)
    x, valid = _subsample(params, mel, valid)
    Tp = x.shape[1]
    x = x * math.sqrt(size.output_size)
    pos_emb = jnp.asarray(sinusoidal_pos_encoding(Tp, size.output_size))

    heads = size.attention_heads

    def body(h, blk):
        y = layer_norm(h, blk["norm_mha"]["scale"], blk["norm_mha"]["bias"])
        h = h + _rel_attention(blk["attn"], y, pos_emb, valid, heads)
        y = layer_norm(h, blk["norm_conv"]["scale"], blk["norm_conv"]["bias"])
        h = h + _conv_module(blk["conv"], y, valid)
        y = layer_norm(h, blk["norm_ff"]["scale"], blk["norm_ff"]["bias"])
        y = jax.nn.silu(y @ blk["ff"]["w1"]["kernel"] + blk["ff"]["w1"]["bias"])
        h = h + (y @ blk["ff"]["w2"]["kernel"] + blk["ff"]["w2"]["bias"])
        h = layer_norm(h, blk["norm_final"]["scale"], blk["norm_final"]["bias"])
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["after_norm"]["scale"], params["after_norm"]["bias"])
    return x, valid
