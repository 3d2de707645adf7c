"""Kaiser-windowed sinc filters and anti-aliased resampling.

Behavioural rebuild of the reference alias-free-torch ops
(indextts/BigVGAN/alias_free_torch/filter.py:29-95, resample.py:10-48,
act.py:9-28): 2× upsample → activation → 2× downsample with 12-tap
kaiser-sinc low-pass filters and replication padding.

TPU mapping: the transposed conv becomes `lax.conv_general_dilated` with
`lhs_dilation` (XLA's native zero-stuffing — no explicit conv_transpose),
grouped per channel.  The filters are even-symmetric so no kernel flip is
needed.  A fused Pallas kernel for the full up-snake-down pipeline lives in
ops/pallas/anti_alias.py; these XLA compositions are its reference
implementation and fallback.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NCH", "OIH", "NCH")


def _kaiser_beta(A: float) -> float:
    if A > 50.0:
        return 0.1102 * (A - 8.7)
    if A >= 21.0:
        return 0.5842 * (A - 21.0) ** 0.4 + 0.07886 * (A - 21.0)
    return 0.0


def _kaiser_window(n: int, beta: float) -> np.ndarray:
    """Symmetric (periodic=False) Kaiser window, as torch.kaiser_window."""
    k = np.arange(n, dtype=np.float64)
    alpha = (n - 1) / 2.0
    return np.i0(beta * np.sqrt(1 - ((k - alpha) / alpha) ** 2)) / np.i0(beta)


@functools.lru_cache(maxsize=16)
def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """Low-pass prototype, sum-normalised (filter.py:29-58). Shape [K]."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    beta = _kaiser_beta(A)
    window = _kaiser_window(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def upsample2x(x: jnp.ndarray, kernel_size: int = 12) -> jnp.ndarray:
    """[B, C, T] → [B, C, 2T] anti-aliased upsample (resample.py:10-33)."""
    ratio = 2
    C = x.shape[1]
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    w = jnp.broadcast_to(jnp.asarray(ratio * filt)[None, None, :],
                         (C, 1, kernel_size)).astype(x.dtype)
    # transposed conv via lhs_dilation; even-symmetric kernel ⇒ no flip
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(ratio,), dimension_numbers=_DN, feature_group_count=C)
    return y[..., pad_left:-pad_right]


def downsample2x(x: jnp.ndarray, kernel_size: int = 12) -> jnp.ndarray:
    """[B, C, 2T] → [B, C, T] anti-aliased downsample (resample.py:36-48)."""
    ratio = 2
    C = x.shape[1]
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (pad_left, pad_right)), mode="edge")
    w = jnp.broadcast_to(jnp.asarray(filt)[None, None, :],
                         (C, 1, kernel_size)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(ratio,), padding=[(0, 0)],
        dimension_numbers=_DN, feature_group_count=C)


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
               logscale: bool = True) -> jnp.ndarray:
    """SnakeBeta: x + (1/β)·sin²(αx), per-channel α/β
    (BigVGAN/activations.py:63-122).  x: [B, C, T]; alpha/beta: [C]."""
    a = alpha[None, :, None]
    b = beta[None, :, None]
    if logscale:
        a = jnp.exp(a)
        b = jnp.exp(b)
    s = jnp.sin(x * a)
    return x + (1.0 / (b + 1e-9)) * s * s


def snake(x: jnp.ndarray, alpha: jnp.ndarray, logscale: bool = True) -> jnp.ndarray:
    """Snake: x + (1/α)·sin²(αx) (activations.py:9-60)."""
    a = alpha[None, :, None]
    if logscale:
        a = jnp.exp(a)
    s = jnp.sin(x * a)
    return x + (1.0 / (a + 1e-9)) * s * s


def anti_aliased_activation(x: jnp.ndarray, alpha: jnp.ndarray,
                            beta: jnp.ndarray, logscale: bool = True,
                            kernel_size: int = 12) -> jnp.ndarray:
    """Activation1d: upsample2x → snakebeta → downsample2x
    (alias_free_torch/act.py:9-28) — the XLA-composed reference path for the
    fused Pallas kernel."""
    y = upsample2x(x, kernel_size)
    y = snake_beta(y, alpha, beta, logscale)
    return downsample2x(y, kernel_size)
