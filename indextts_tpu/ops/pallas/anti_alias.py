"""Fused anti-aliased SnakeBeta activation — Pallas TPU kernel.

TPU-native equivalent of the reference's only first-party CUDA kernel
(indextts/BigVGAN/alias_free_activation/cuda/anti_alias_activation_cuda.cu:
44-256): 2× kaiser-sinc upsample → x + (1/β)sin²(αx) → 2× kaiser-sinc
downsample, fused so the 2×-rate intermediate never touches HBM.

Polyphase derivation (12-tap filter f, replicate padding; indices into the
unpadded input x, clamped):

    u_e[n] = 2 Σ_j f[2j]   x[n+j-3]        a_e = snake(u_e)
    u_o[n] = 2 Σ_j f[2j+1] x[n+j-2]        a_o = snake(u_o)
    y[t]   = Σ_j f[2j] a_o[t+j-3] + Σ_j f[2j+1] a_e[t+j-2]

so the fused op is 4 six-tap shift-accumulate passes + 2 elementwise snakes
at *input* rate, entirely in VMEM — instead of a transposed conv, an
activation and a strided conv with two HBM round-trips at 2× rate.

The first/last 3 outputs additionally involve the downsampler's replicate
padding of the *activated* 2×-rate signal (clamping crosses polyphase
parity there); the wrapper recomputes those 6 columns exactly with XLA ops.
Falls back to the XLA composition (ops/filters.anti_aliased_activation) on
non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.ops import filters

_K = 12  # taps (up_kernel_size = down_kernel_size = 12, act.py:14-15)


@functools.lru_cache(maxsize=1)
def _phase_filters() -> Tuple[np.ndarray, np.ndarray]:
    f = filters.kaiser_sinc_filter1d(0.25, 0.3, _K)
    return f[0::2].copy(), f[1::2].copy()  # even taps, odd taps


def _kernel(body_ref, halo_ref, alpha_ref, beta_ref, y_ref, *, tile_t: int):
    """body_ref: [1, Cb, tile_t] tile of the edge-padded input xe
    (xe = edge_pad(x, 6), so tile tt starts at xe[tt*tile_t]);
    halo_ref: [1, 1, Cb, 16] — the next 12 columns xe[tt*tile_t + tile_t ..]
    (padded to 16 lanes for tiling); alpha/beta: [Cb, 1] already exp()'d;
    y_ref: [1, Cb, tile_t]."""
    fe, fo = _phase_filters()
    x = jnp.concatenate(
        [body_ref[0].astype(jnp.float32),
         halo_ref[0, 0, :, :12].astype(jnp.float32)], axis=-1)
    alpha = alpha_ref[:].astype(jnp.float32)
    beta = beta_ref[:].astype(jnp.float32)

    def snake(u):
        s = jnp.sin(u * alpha)
        return u + (1.0 / (beta + 1e-9)) * s * s

    ext = tile_t + 6
    u_e = jnp.zeros((x.shape[0], ext), jnp.float32)
    u_o = jnp.zeros((x.shape[0], ext), jnp.float32)
    for j in range(6):
        u_e = u_e + (2.0 * float(fe[j])) * x[:, j : j + ext]
        u_o = u_o + (2.0 * float(fo[j])) * x[:, j + 1 : j + 1 + ext]
    a_e = snake(u_e)
    a_o = snake(u_o)

    y = jnp.zeros((x.shape[0], tile_t), jnp.float32)
    for j in range(6):
        y = y + float(fe[j]) * a_o[:, j : j + tile_t]
        y = y + float(fo[j]) * a_e[:, j + 1 : j + 1 + tile_t]
    y_ref[0, :, :] = y.astype(y_ref.dtype)


def _interior(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
              tile_t: int, tile_c: int, interpret: bool = False) -> jnp.ndarray:
    """Run the fused kernel over the whole sequence (interior clamp
    semantics: replicate padding in the input domain).

    The +12 right halo each tile needs is NOT materialised as overlapping
    windows (a gather + full transposed copy of the input — measured 1.4-2x
    the whole kernel's runtime at the late BigVGAN stages); instead the
    padded input is tiled in place and a tiny side array [B, n_t, Cp, 16]
    carries just the 12 halo columns per tile, concatenated in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C, T = x.shape
    tile_c = min(tile_c, C)
    # keep per-block work roughly constant: narrow-channel stages (the big-T
    # late BigVGAN stages) get proportionally longer tiles, otherwise
    # per-block overhead dominates (measured 2x at C=24)
    tile_t = tile_t * max(1, min(16, 256 // tile_c))
    tile_t = min(tile_t, int(-(-T // 128)) * 128)
    pad_c = (-C) % tile_c
    pad_t = (-T) % tile_t
    xe = jnp.pad(x, ((0, 0), (0, 0), (6, 6)), mode="edge")
    xe = jnp.pad(xe, ((0, 0), (0, pad_c), (0, pad_t)))  # [B, Cp, Tp+12]
    a = jnp.pad(alpha, (0, pad_c)).reshape(-1, 1)
    b = jnp.pad(beta, (0, pad_c), constant_values=1.0).reshape(-1, 1)
    Cp, Tp = C + pad_c, T + pad_t
    n_t = Tp // tile_t

    # halo[i] = xe[:, :, (i+1)*tile_t : (i+1)*tile_t + 12]: a strided slice
    # of a free reshape — XLA copies only n_t*16 columns, not the input
    z = xe[:, :, tile_t:]
    z = jnp.pad(z, ((0, 0), (0, 0), (0, n_t * tile_t - z.shape[-1])))
    halo = z.reshape(B, Cp, n_t, tile_t)[..., :16]
    halo = jnp.transpose(halo, (0, 2, 1, 3))  # [B, n_t, Cp, 16] (small)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_t=tile_t),
        grid=(B, Cp // tile_c, n_t),
        in_specs=[
            # xe's last dim is Tp+12, not a tile_t multiple: tile tt covers
            # [tt*tile_t, tt*tile_t + tile_t) ⊂ [0, Tp) — always in bounds
            pl.BlockSpec((1, tile_c, tile_t),
                          lambda bb, cc, tt: (bb, cc, tt),
                          memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_c, 16),
                          lambda bb, cc, tt: (bb, tt, cc, 0),
                          memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, 1), lambda bb, cc, tt: (cc, 0),
                          memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, 1), lambda bb, cc, tt: (cc, 0),
                          memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_c, tile_t),
                                lambda bb, cc, tt: (bb, cc, tt),
                                memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cp, Tp), x.dtype),
        interpret=interpret,
    )(xe, halo, a, b)
    return out[:, :C, :T]


def _boundary_fix(x: jnp.ndarray, y: jnp.ndarray, a_exp: jnp.ndarray,
                  b_exp: jnp.ndarray) -> jnp.ndarray:
    """Recompute the first/last 3 outputs with the exact 2×-domain replicate
    clamp the downsampler applies to the activated signal
    (resample.py:36-48): y[t] = Σ_k f[k] a[clip(2t+k-5, 0, 2T-1)]."""
    fe, fo = _phase_filters()
    f = filters.kaiser_sinc_filter1d(0.25, 0.3, _K)
    T = x.shape[-1]
    alpha = a_exp[None, :, None]
    beta = b_exp[None, :, None]

    def snake(u):
        s = jnp.sin(u * alpha)
        return u + (1.0 / (beta + 1e-9)) * s * s

    xe = jnp.pad(x, ((0, 0), (0, 0), (6, 6)), mode="edge")
    n_edge = 8

    def u_slice(parity_even: bool, n0: int):
        # u_e[n] = 2 Σ f[2j] xe[n+j+3] ; u_o[n] = 2 Σ f[2j+1] xe[n+j+4]
        taps, off = (fe, 3) if parity_even else (fo, 4)
        acc = jnp.zeros(x.shape[:2] + (n_edge,), jnp.float32)
        for j in range(6):
            acc = acc + 2.0 * float(taps[j]) * jax.lax.dynamic_slice_in_dim(
                xe, n0 + j + off, n_edge, axis=2)
        return acc

    a_e_l = snake(u_slice(True, 0))
    a_o_l = snake(u_slice(False, 0))
    a_e_r = snake(u_slice(True, T - n_edge))
    a_o_r = snake(u_slice(False, T - n_edge))

    def a_at(c: int):
        c = min(max(c, 0), 2 * T - 1)
        n, parity = divmod(c, 2)
        if n < n_edge:
            return (a_e_l if parity == 0 else a_o_l)[:, :, n]
        return (a_e_r if parity == 0 else a_o_r)[:, :, n - (T - n_edge)]

    for t in list(range(3)) + list(range(T - 3, T)):
        acc = None
        for k in range(_K):
            term = float(f[k]) * a_at(2 * t + k - 5)
            acc = term if acc is None else acc + term
        y = y.at[:, :, t].set(acc.astype(y.dtype))
    return y


def fused_anti_alias_activation(x: jnp.ndarray, alpha: jnp.ndarray,
                                beta: jnp.ndarray, logscale: bool = True,
                                tile_t: int = 512, tile_c: int = 256,
                                force_pallas: bool = False) -> jnp.ndarray:
    """Drop-in fused replacement for
    filters.anti_aliased_activation(x, alpha, beta).  x: [B, C, T].
    `force_pallas` runs the kernel in interpreter mode off-TPU (tests)."""
    on_tpu = jax.default_backend() == "tpu"
    if (not on_tpu and not force_pallas) or x.shape[-1] < 16:
        return filters.anti_aliased_activation(x, alpha, beta, logscale)
    a = (jnp.exp(alpha) if logscale else alpha).astype(jnp.float32)
    b = (jnp.exp(beta) if logscale else beta).astype(jnp.float32)
    y = _interior(x, a, b, tile_t, tile_c, interpret=not on_tpu)
    return _boundary_fix(x.astype(jnp.float32), y, a, b).astype(x.dtype)
