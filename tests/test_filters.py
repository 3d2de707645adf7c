"""Anti-alias filter ops vs a torch oracle implementing the reference's
alias-free-torch semantics (filter.py/resample.py) with native torch ops."""

import math

import jax.numpy as jnp

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from indextts_tpu.ops import filters


def torch_kaiser_sinc(cutoff, half_width, kernel_size):
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
    if even:
        time = torch.arange(-half_size, half_size) + 0.5
    else:
        time = torch.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt


def torch_upsample2x(x, kernel_size=12):
    ratio, stride = 2, 2
    filt = torch_kaiser_sinc(0.5 / ratio, 0.6 / ratio, kernel_size).view(1, 1, -1)
    C = x.shape[1]
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    x = F.pad(x, (pad, pad), mode="replicate")
    y = ratio * F.conv_transpose1d(x, filt.expand(C, -1, -1), stride=stride, groups=C)
    return y[..., pad_left:-pad_right]


def torch_downsample2x(x, kernel_size=12):
    ratio = 2
    filt = torch_kaiser_sinc(0.5 / ratio, 0.6 / ratio, kernel_size).view(1, 1, -1)
    C = x.shape[1]
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    x = F.pad(x, (pad_left, pad_right), mode="replicate")
    return F.conv1d(x, filt.expand(C, -1, -1), stride=ratio, groups=C)


def test_kaiser_sinc_filter_matches_torch():
    ours = filters.kaiser_sinc_filter1d(0.25, 0.3, 12)
    ref = torch_kaiser_sinc(0.25, 0.3, 12).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_upsample2x_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 50)).astype(np.float32)
    ours = np.asarray(filters.upsample2x(x))
    ref = torch_upsample2x(torch.from_numpy(x)).numpy()
    assert ours.shape == ref.shape == (2, 3, 100)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_downsample2x_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 100)).astype(np.float32)
    ours = np.asarray(filters.downsample2x(x))
    ref = torch_downsample2x(torch.from_numpy(x)).numpy()
    assert ours.shape == ref.shape == (2, 3, 50)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_snakebeta_matches_reference_formula():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 20)).astype(np.float32)
    alpha = rng.standard_normal(4).astype(np.float32)
    beta = rng.standard_normal(4).astype(np.float32)
    ours = np.asarray(filters.snake_beta(x, alpha, beta, logscale=True))
    a = np.exp(alpha)[None, :, None]
    b = np.exp(beta)[None, :, None]
    ref = x + (1.0 / (b + 1e-9)) * np.sin(x * a) ** 2
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_anti_aliased_activation_pipeline():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 64)).astype(np.float32)
    alpha = np.zeros(4, np.float32)
    beta = np.zeros(4, np.float32)
    y = np.asarray(filters.anti_aliased_activation(x, alpha, beta))
    assert y.shape == x.shape
    xt = torch.from_numpy(x)
    up = torch_upsample2x(xt)
    act = up + torch.sin(up) ** 2 / (1 + 1e-9)
    ref = torch_downsample2x(act).numpy()
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mxu", [False, True])
@pytest.mark.parametrize(
    "B,C,T,tile_t",
    [
        (1, 8, 64, 128),     # single tile, T < tile_t
        (2, 16, 384, 128),   # multiple tiles, divisible
        (1, 8, 200, 128),    # ragged last tile (72 cols)
        (1, 24, 1288, 128),  # ragged tail of exactly 8
    ],
)
def test_fused_anti_alias_kernel_matches_xla(mxu, B, C, T, tile_t):
    """Interpret-mode equivalence of the Pallas kernel (both math variants)
    vs the XLA composition, covering edge tiles, halos and ragged tails."""
    from indextts_tpu.ops.pallas import anti_alias

    rng = np.random.default_rng(7)
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    alpha = rng.standard_normal(C).astype(np.float32) * 0.1
    beta = rng.standard_normal(C).astype(np.float32) * 0.1
    ref = np.asarray(
        filters.anti_aliased_activation(jnp.asarray(x), alpha, beta))
    got = np.asarray(anti_alias.fused_anti_alias_activation(
        jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta),
        tile_t=tile_t, force_pallas=True, mxu=mxu))
    assert got.shape == ref.shape
    # mxu variant uses bf16 matmul operands (same class as bf16-network
    # XLA convs); vpu variant is exact fp32
    tol = 3e-2 if mxu else 2e-5
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)


def test_fused_anti_alias_kernel_bf16_network_dtype(monkeypatch):
    """bf16 in/out (the in-network dtype) stays close to the fp32 XLA path."""
    from indextts_tpu.ops.pallas import anti_alias

    rng = np.random.default_rng(11)
    C, T = 96, 640
    x = rng.standard_normal((1, C, T)).astype(np.float32)
    alpha = rng.standard_normal(C).astype(np.float32) * 0.1
    beta = rng.standard_normal(C).astype(np.float32) * 0.1
    ref = np.asarray(
        filters.anti_aliased_activation(jnp.asarray(x), alpha, beta))
    got = np.asarray(anti_alias.fused_anti_alias_activation(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(alpha), jnp.asarray(beta),
        force_pallas=True)).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)


def test_pick_tiles_rounds_tile_c_to_lane_multiple():
    """A non-multiple-of-8 tile_c (e.g. 100 with C=128) must not produce a
    block whose second-to-last dim violates the TPU (8,128) tiling rule —
    interpret mode doesn't check it, real hardware rejects it (ADVICE r3)."""
    from indextts_tpu.ops.pallas.anti_alias import _pick_tiles

    for C in (128, 96, 24, 8):
        for req in (100, 7, 12, 1024):
            picked = _pick_tiles(C, 640, 512, req, mxu=False)
            if picked is None:
                continue
            tile_c, tile_t = picked
            assert tile_c % 8 == 0 and C % tile_c == 0, (C, req, picked)
            assert tile_c >= 8
