"""ECAPA-TDNN speaker encoder (functional JAX).

Behavioural rebuild of the reference speaker-embedding model
(indextts/BigVGAN/ECAPA_TDNN.py:429-581 and its speechbrain-style wrappers
nnet/CNN.py, nnet/normalization.py): TDNN → 3× SE-Res2Net → MFA →
attentive-statistics pooling → BatchNorm → 1×1 conv to 512-d embedding.

Conv semantics: "same" padding with **reflect** mode and symmetric width
(kernel-1)·dilation/2 per side (speechbrain Conv1d default,
nnet/CNN.py:305-420).  BatchNorm runs in inference mode off running stats —
the vocoder is never trained in this fork (SURVEY.md §2.8).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

_DN = ("NCH", "OIH", "NCH")


@dataclasses.dataclass(frozen=True)
class ECAPASize:
    input_size: int = 100
    lin_neurons: int = 512
    channels: tuple = (512, 512, 512, 512, 1536)
    kernel_sizes: tuple = (5, 3, 3, 3, 1)
    dilations: tuple = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128


def _conv_same(x: jnp.ndarray, p: Dict[str, Any], dilation: int = 1) -> jnp.ndarray:
    """speechbrain 'same' conv: reflect-pad (k-1)d/2 each side."""
    k = p["w"].shape[-1]
    pad = dilation * (k - 1) // 2
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=[(0, 0)],
        rhs_dilation=(dilation,), dimension_numbers=_DN)
    return y + p["b"][None, :, None]


def _bn(x: jnp.ndarray, p: Dict[str, Any], eps: float = 1e-5) -> jnp.ndarray:
    """Inference BatchNorm1d over channel axis of [B, C, T]."""
    mean = p["mean"][None, :, None]
    var = p["var"][None, :, None]
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"][None, :, None] + p["bias"][None, :, None]


def _tdnn(x: jnp.ndarray, p: Dict[str, Any], dilation: int = 1) -> jnp.ndarray:
    """TDNNBlock: conv → ReLU → BN (ECAPA_TDNN.py:79-128)."""
    return _bn(jax.nn.relu(_conv_same(x, p["conv"], dilation)), p["bn"])


def init_params(rng: jax.Array, size: ECAPASize = ECAPASize(),
                dtype=jnp.float32) -> Dict[str, Any]:
    ks = iter(jax.random.split(rng, 64))

    def conv_p(cin, cout, k):
        fan = cin * k
        w = (jax.random.uniform(next(ks), (cout, cin, k), jnp.float32, -1, 1)
             / math.sqrt(fan)).astype(dtype)
        return {"w": w, "b": jnp.zeros((cout,), dtype)}

    def bn_p(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
                "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}

    def tdnn_p(cin, cout, k):
        return {"conv": conv_p(cin, cout, k), "bn": bn_p(cout)}

    ch, kern, dil = size.channels, size.kernel_sizes, size.dilations
    scale = size.res2net_scale
    blocks: List[Dict[str, Any]] = [tdnn_p(size.input_size, ch[0], kern[0])]
    for i in range(1, len(ch) - 1):
        inner = ch[i] // scale
        blocks.append({
            "tdnn1": tdnn_p(ch[i - 1], ch[i], 1),
            "res2net": [tdnn_p(inner, inner, kern[i]) for _ in range(scale - 1)],
            "tdnn2": tdnn_p(ch[i], ch[i], 1),
            "se": {"conv1": conv_p(ch[i], size.se_channels, 1),
                    "conv2": conv_p(size.se_channels, ch[i], 1)},
        })
    mfa_in = ch[-2] * (len(ch) - 2)
    return {
        "blocks": blocks,
        "mfa": tdnn_p(mfa_in, ch[-1], kern[-1]),
        "asp": {"tdnn": tdnn_p(ch[-1] * 3, size.attention_channels, 1),
                 "conv": conv_p(size.attention_channels, ch[-1], 1)},
        "asp_bn": bn_p(ch[-1] * 2),
        "fc": conv_p(ch[-1] * 2, size.lin_neurons, 1),
    }


def _se_res2net(x: jnp.ndarray, p: Dict[str, Any], kernel: int, dilation: int,
                scale: int) -> jnp.ndarray:
    """SERes2NetBlock (ECAPA_TDNN.py:341-426)."""
    residual = x
    h = _tdnn(x, p["tdnn1"])
    # Res2Net (ECAPA_TDNN.py:131-191)
    chunks = jnp.split(h, scale, axis=1)
    ys = [chunks[0]]
    y = None
    for i in range(1, scale):
        inp = chunks[i] if i == 1 else chunks[i] + y
        y = _tdnn(inp, p["res2net"][i - 1], dilation)
        ys.append(y)
    h = jnp.concatenate(ys, axis=1)
    h = _tdnn(h, p["tdnn2"])
    # SEBlock (ECAPA_TDNN.py:194-242), lengths=None → plain mean
    s = jnp.mean(h, axis=2, keepdims=True)
    s = jax.nn.relu(_conv_same(s, p["se"]["conv1"]))
    s = jax.nn.sigmoid(_conv_same(s, p["se"]["conv2"]))
    return s * h + residual


def forward(params: Dict[str, Any], mel: jnp.ndarray,
            size: ECAPASize = ECAPASize()) -> jnp.ndarray:
    """mel: [B, T, n_mels] (time-major, as BigVGAN passes cond_mel.T) →
    speaker embedding [B, 1, lin_neurons] (ECAPA_TDNN.py:543-581)."""
    x = jnp.swapaxes(mel, 1, 2)  # [B, C, T]
    feats = []
    h = _tdnn(x, params["blocks"][0], size.dilations[0])
    for i, blk in enumerate(params["blocks"][1:], start=1):
        h = _se_res2net(h, blk, size.kernel_sizes[i], size.dilations[i],
                        size.res2net_scale)
        feats.append(h)
    h = jnp.concatenate(feats, axis=1)
    h = _tdnn(h, params["mfa"])

    # Attentive statistics pooling with global context (ECAPA_TDNN.py:245-338)
    eps = 1e-12
    L = h.shape[-1]
    mean = jnp.mean(h, axis=2, keepdims=True)
    std = jnp.sqrt(jnp.clip(jnp.mean(jnp.square(h - mean), axis=2, keepdims=True), eps))
    attn_in = jnp.concatenate(
        [h, jnp.broadcast_to(mean, h.shape), jnp.broadcast_to(std, h.shape)], axis=1)
    attn = _conv_same(jnp.tanh(_tdnn(attn_in, params["asp"]["tdnn"])), params["asp"]["conv"])
    attn = jax.nn.softmax(attn, axis=2)
    amean = jnp.sum(attn * h, axis=2)
    astd = jnp.sqrt(jnp.clip(jnp.sum(attn * jnp.square(h - amean[..., None]), axis=2), eps))
    pooled = jnp.concatenate([amean, astd], axis=1)[..., None]  # [B, 2C, 1]
    pooled = _bn(pooled, params["asp_bn"])
    emb = _conv_same(pooled, params["fc"])  # [B, lin, 1]
    return jnp.swapaxes(emb, 1, 2)  # [B, 1, lin]
