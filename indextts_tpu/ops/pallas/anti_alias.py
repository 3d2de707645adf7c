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

so the fused op is 4 six-tap passes + 2 elementwise snakes at *input* rate,
entirely in VMEM — instead of a transposed conv, an activation and a strided
conv with two HBM round-trips at 2× rate.

This kernel is self-contained end to end (v2, round 3):

* **No host-side full-tensor prep.**  x is passed raw.  Each tile's ±8-column
  context comes from two tiny side arrays (the neighbouring tiles' edge
  columns, built with a free reshape+slice — not a gather, not a pad of the
  whole input).  The earlier design edge-padded x on the host and patched the
  first/last 3 outputs with XLA scatter ops; in-network that materialised
  2-3 extra full-tensor copies *per activation call* (the pads and the fp32
  cast feeding them can't fuse into a custom call), which profiling showed
  cost more than the kernel itself — 294 ms of a 361 ms BigVGAN forward sat
  in the 108 activation call sites.
* **Boundary clamp semantics in-kernel.**  Replicate padding in the input
  domain is exact everywhere except the first/last 3 outputs, where the
  downsampler's clamp crosses polyphase parity (it replicates the *activated*
  2×-rate signal, resample.py:36-48).  Those 6 columns are recomputed from
  the already-available a_e/a_o columns under `pl.when` on the edge tiles —
  column positions are static because shapes are.
* **Two math variants.**  `vpu`: the 4 tap passes as shift-FMAs in fp32
  (exact; used for fp32 inputs and narrow-channel stages).  `mxu`: the tap
  passes as two banded matmuls U = X·S_up, Y = snake(U)·S_dn on the
  otherwise-idle MXU (bf16 operands / fp32 accumulate — the same precision
  class as the XLA conv composition it replaces, whose taps are cast to
  x.dtype).  The VPU is this op's bottleneck in-network (even a bare snake
  runs ~3× off the HBM roofline at BigVGAN's late-stage shapes), so moving
  ~24 of the ~40 VPU ops/element to the MXU is the win; below the measured
  crossover (C = 48 on v5e) the 128-row systolic array is mostly padding and
  the narrowest stages stay on the VPU.

Falls back to the XLA composition (ops/filters.anti_aliased_activation) on
non-TPU backends and shapes the tiler can't cover (T < 16, C not a multiple
of 8, ragged tail < 8).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.ops import filters

_K = 12  # taps (up_kernel_size = down_kernel_size = 12, act.py:14-15)


@functools.lru_cache(maxsize=1)
def _phase_filters() -> Tuple[np.ndarray, np.ndarray]:
    f = filters.kaiser_sinc_filter1d(0.25, 0.3, _K)
    return f[0::2].copy(), f[1::2].copy()  # even taps, odd taps


@functools.lru_cache(maxsize=16)
def _band_matrices(tile_t: int) -> Tuple[np.ndarray, np.ndarray]:
    """S_up [L, 2·ext], S_dn [2·ext, tile_t] for the mxu variant.

    Local coords: xx[m] = x_clamped[g - 8 + m] (L = tile_t + 16 columns),
    a_e/a_o[i] ↔ true index g - 3 + i (ext = tile_t + 6 columns), outputs
    y[t_loc] ↔ g + t_loc.  Bands:
        u_e[i] = 2 Σ_j fe[j] xx[i+j+2]   →  S_up[m, i]       = 2 fe[m-i-2]
        u_o[i] = 2 Σ_j fo[j] xx[i+j+3]   →  S_up[m, ext+i]   = 2 fo[m-i-3]
        y[t]   = Σ_j fo[j] a_e[t+j+1]    →  S_dn[i, t]       = fo[i-t-1]
               + Σ_j fe[j] a_o[t+j]      →  S_dn[ext+i, t]   = fe[i-t]
    """
    fe, fo = _phase_filters()
    L, ext = tile_t + 16, tile_t + 6
    s_up = np.zeros((L, 2 * ext), np.float32)
    s_dn = np.zeros((2 * ext, tile_t), np.float32)
    for j in range(6):
        for i in range(ext):
            if i + j + 2 < L:
                s_up[i + j + 2, i] = 2.0 * fe[j]
            if i + j + 3 < L:
                s_up[i + j + 3, ext + i] = 2.0 * fo[j]
        for t in range(tile_t):
            if t + j + 1 < ext:
                s_dn[t + j + 1, t] = fo[j]
            if t + j < ext:
                s_dn[ext + t + j, t] = fe[j]
    return s_up, s_dn


def _edge_cols(T: int, t: int) -> list:
    """Exact 2×-domain clamp for output t: (filter tap, a-parity, a-index)."""
    f = filters.kaiser_sinc_filter1d(0.25, 0.3, _K)
    cols = []
    for k in range(_K):
        c = min(max(2 * t + k - 5, 0), 2 * T - 1)
        cols.append((float(f[k]), c % 2, c // 2))
    return cols


def _kernel(body_ref, lh_ref, rh_ref, alpha_ref, beta_ref, *rest,
            tile_t: int, n_t: int, T: int, mxu: bool, out_dtype):
    if mxu:
        s_up_ref, s_dn_ref, y_ref = rest
    else:
        (y_ref,) = rest
    fe, fo = _phase_filters()
    tt = pl.program_id(2)
    is_first = tt == 0
    is_last = tt == n_t - 1
    g_last = (n_t - 1) * tile_t
    t_last = (T - 1) - g_last  # static column of x[T-1] in the last tile

    body = body_ref[0]
    lh = lh_ref[0, 0, :, 8:]  # prev tile's last 8 cols
    rh = rh_ref[0, 0, :, :8]  # next tile's first 8 cols
    edge_r = body[:, t_last : t_last + 1]
    lh = jnp.where(is_first, body[:, 0:1], lh)
    rh = jnp.where(is_last, edge_r, rh)
    if T % tile_t:  # ragged last tile: its OOB tail must read as x[T-1]
        col = jax.lax.broadcasted_iota(jnp.int32, body.shape, 1) + tt * tile_t
        body = jnp.where(col < T, body, edge_r)
    xx = jnp.concatenate([lh, body, rh], axis=-1)  # [tile_c, tile_t+16]

    alpha = alpha_ref[:].astype(jnp.float32)
    beta = beta_ref[:].astype(jnp.float32)

    def snake(u):
        s = jnp.sin(u * alpha)
        return u + (1.0 / (beta + 1e-9)) * s * s

    ext = tile_t + 6
    if mxu:
        u = jax.lax.dot_general(
            xx.astype(jnp.bfloat16), s_up_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        a = snake(u)  # [tile_c, 2·ext]: a_e | a_o
        y = jax.lax.dot_general(
            a.astype(jnp.bfloat16), s_dn_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        a_e, a_o = a[:, :ext], a[:, ext:]
    else:
        xf = xx.astype(jnp.float32)
        u_e = jnp.zeros((xf.shape[0], ext), jnp.float32)
        u_o = jnp.zeros((xf.shape[0], ext), jnp.float32)
        for j in range(6):
            u_e = u_e + (2.0 * float(fe[j])) * xf[:, 2 + j : 2 + j + ext]
            u_o = u_o + (2.0 * float(fo[j])) * xf[:, 3 + j : 3 + j + ext]
        a_e = snake(u_e)
        a_o = snake(u_o)
        y = jnp.zeros((xf.shape[0], tile_t), jnp.float32)
        for j in range(6):
            y = y + float(fe[j]) * a_o[:, j : j + tile_t]
            y = y + float(fo[j]) * a_e[:, j + 1 : j + 1 + tile_t]
    y_ref[0] = y.astype(out_dtype)

    # Exact first/last-3 outputs: the downsampler clamps the *activated*
    # 2×-rate signal, crossing polyphase parity.  a-index n is at local
    # column n - g + 3; g is static per edge tile.
    def fix(t_glob: int, g: int):
        acc = None
        for tap, parity, n in _edge_cols(T, t_glob):
            i = n - g + 3
            term = tap * (a_o if parity else a_e)[:, i : i + 1]
            acc = term if acc is None else acc + term
        y_ref[0, :, t_glob - g : t_glob - g + 1] = acc.astype(out_dtype)

    @pl.when(is_first)
    def _():
        for t in range(min(3, T)):
            fix(t, 0)

    @pl.when(is_last)
    def _():
        for t in range(max(T - 3, 3), T):
            fix(t, g_last)


# Imported lazily so non-TPU installs can still import the module.
try:  # pragma: no cover - trivial import guard
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None


def _pick_tiles(C: int, T: int, tile_t: int, tile_c: int,
                mxu: bool) -> Optional[Tuple[int, int]]:
    if C % 8 or T < 16:
        return None
    # TPU blocks need the second-to-last dim to be a multiple of 8; a
    # non-multiple tile_c argument (e.g. 100) would let the divisibility
    # loop land on a 4-row block that only interpret mode accepts (ADVICE r3)
    tile_c = max(8, min(tile_c, C) & ~7)
    while C % tile_c:
        tile_c -= 8
    if not mxu:
        # narrow-channel stages get longer tiles so per-block work stays
        # roughly constant (the late BigVGAN stages are C=24..96)
        tile_t = tile_t * max(1, min(16, 256 // tile_c))
    tile_t = min(tile_t, -(-T // 128) * 128)
    # the in-kernel edge fix needs the last tile to hold ≥ 8 real columns
    while tile_t > 128 and 0 < T % tile_t < 8:
        tile_t -= 128
    if 0 < T % tile_t < 8:
        return None
    return tile_c, tile_t


def _halo_arrays(x: jnp.ndarray, tile_t: int, n_t: int):
    """[B, n_t-1, C, 16] neighbour-edge arrays via free reshape+slice.

    lh[t] = last 16 cols of tile t (consumed by tile t+1); rh[t] = first 16
    cols of tile t+1 (consumed by tile t).  XLA fuses the pad/reshape/slice
    into a copy of only the 16·(n_t-1) needed columns.  Edge tiles get their
    replicate columns in-kernel, so n_t == 1 needs no real halo at all.
    """
    B, C, T = x.shape
    if n_t == 1:
        dummy = jnp.zeros((B, 1, C, 16), x.dtype)
        return dummy, dummy
    head = x[:, :, : (n_t - 1) * tile_t]
    lh = head.reshape(B, C, n_t - 1, tile_t)[..., tile_t - 16 :]
    z = x[:, :, tile_t:]
    z = jnp.pad(z, ((0, 0), (0, 0), (0, (n_t - 1) * tile_t - z.shape[-1])))
    rh = z.reshape(B, C, n_t - 1, tile_t)[..., :16]
    return jnp.transpose(lh, (0, 2, 1, 3)), jnp.transpose(rh, (0, 2, 1, 3))


def fused_anti_alias_activation(x: jnp.ndarray, alpha: jnp.ndarray,
                                beta: jnp.ndarray, logscale: bool = True,
                                tile_t: int = 512, tile_c: int = 256,
                                force_pallas: bool = False,
                                mxu: Optional[bool] = None) -> jnp.ndarray:
    """Drop-in fused replacement for
    filters.anti_aliased_activation(x, alpha, beta).  x: [B, C, T].
    `force_pallas` runs the kernel in interpreter mode off-TPU (tests);
    `mxu` overrides the banded-matmul variant choice (default: bf16 input
    and C ≥ 48, the measured v5e crossover)."""
    on_tpu = jax.default_backend() == "tpu"
    B, C, T = x.shape
    if mxu is None:
        # measured crossover on v5e: the banded matmuls win down to C=48
        # (1.75 vs 1.85 ms at stage 4); at C=24 the 128-row systolic padding
        # loses to the VPU shift-FMAs (1.93 vs 1.78 ms)
        mxu = x.dtype == jnp.bfloat16 and C >= 48
    tiles = _pick_tiles(C, T, tile_t, tile_c, mxu) if pl is not None else None
    if (not on_tpu and not force_pallas) or tiles is None:
        return filters.anti_aliased_activation(x, alpha, beta, logscale)
    tile_c, tile_t = tiles
    n_t = -(-T // tile_t)

    a = (jnp.exp(alpha) if logscale else alpha).astype(jnp.float32).reshape(-1, 1)
    b = (jnp.exp(beta) if logscale else beta).astype(jnp.float32).reshape(-1, 1)
    lh, rh = _halo_arrays(x, tile_t, n_t)

    halo_spec = pl.BlockSpec(
        (1, 1, tile_c, 16),
        lambda bb, cc, tt, _n=n_t: (bb, jnp.clip(tt - 1, 0, max(_n - 2, 0)), cc, 0),
        memory_space=pltpu.VMEM)
    rh_spec = pl.BlockSpec(
        (1, 1, tile_c, 16),
        lambda bb, cc, tt, _n=n_t: (bb, jnp.clip(tt, 0, max(_n - 2, 0)), cc, 0),
        memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((tile_c, 1), lambda bb, cc, tt: (cc, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, tile_c, tile_t), lambda bb, cc, tt: (bb, cc, tt),
                     memory_space=pltpu.VMEM),
        halo_spec, rh_spec, chan_spec, chan_spec,
    ]
    operands = [x, lh, rh, a, b]
    if mxu:
        s_up, s_dn = _band_matrices(tile_t)
        ones = lambda bb, cc, tt: (0, 0)
        in_specs += [
            pl.BlockSpec(s_up.shape, ones, memory_space=pltpu.VMEM),
            pl.BlockSpec(s_dn.shape, ones, memory_space=pltpu.VMEM),
        ]
        operands += [jnp.asarray(s_up, jnp.bfloat16),
                     jnp.asarray(s_dn, jnp.bfloat16)]

    return pl.pallas_call(
        functools.partial(_kernel, tile_t=tile_t, n_t=n_t, T=T, mxu=mxu,
                          out_dtype=x.dtype),
        grid=(B, C // tile_c, n_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_c, tile_t),
                               lambda bb, cc, tt: (bb, cc, tt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, T), x.dtype),
        interpret=not on_tpu,
    )(*operands)
