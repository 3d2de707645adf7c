"""Discriminators vs a torch mirror of the reference classes.

The jax modules (models/discriminators.py) rebuild BigVGAN's
DiscriminatorP / DiscriminatorR / GAN losses (reference
indextts/BigVGAN/models.py:280-453).  These tests load the SAME weights
into torch modules written to the reference's structure (conv stacks,
paddings, stft spectrogram with window=None → rectangular) and require
numerical agreement — the same verification bar the generator got
(tests/test_bigvgan.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from indextts_tpu.models import discriminators as d  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def torch_period_forward(params, x):
    """Reference DiscriminatorP.forward (models.py:297-316)."""
    period = params["period"]
    b, c, t = x.shape
    if t % period != 0:
        n_pad = period - (t % period)
        x = F.pad(x, (0, n_pad), "reflect")
        t = t + n_pad
    x = x.view(b, c, t // period, period)
    fmap = []
    for i, conv in enumerate(params["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        x = F.conv2d(x, _t(conv["w"]), _t(conv["b"]), stride=stride,
                     padding=(2, 0))
        x = F.leaky_relu(x, d.LRELU_SLOPE)
        fmap.append(x)
    x = F.conv2d(x, _t(params["conv_post"]["w"]), _t(params["conv_post"]["b"]),
                 padding=(1, 0))
    fmap.append(x)
    return torch.flatten(x, 1, -1), fmap


def torch_resolution_forward(params, x):
    """Reference DiscriminatorR.forward + spectrogram (models.py:368-391):
    torch.stft with window=None (rectangular), center=False after a manual
    (n_fft-hop)/2 reflect pad."""
    n_fft, hop, win = params["resolution"]
    x = F.pad(x, ((n_fft - hop) // 2, (n_fft - hop) // 2), mode="reflect")
    x = x.squeeze(1)
    spec = torch.stft(x, n_fft=n_fft, hop_length=hop, win_length=win,
                      center=False, return_complex=True)
    mag = torch.abs(spec)
    x = mag.unsqueeze(1)
    fmap = []
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    pads = [(1, 4)] * 4 + [(1, 1)]
    for conv, s, p in zip(params["convs"], strides, pads):
        x = F.conv2d(x, _t(conv["w"]), _t(conv["b"]), stride=s, padding=p)
        x = F.leaky_relu(x, d.LRELU_SLOPE)
        fmap.append(x)
    x = F.conv2d(x, _t(params["conv_post"]["w"]), _t(params["conv_post"]["b"]),
                 padding=(1, 1))
    fmap.append(x)
    return torch.flatten(x, 1, -1), fmap


def test_period_discriminator_vs_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 100)).astype(np.float32)  # 100 % 3 != 0
    params = d.init_period_discriminator(jax.random.PRNGKey(0), period=3)
    s_j, f_j = d.period_discriminator_forward(params, jnp.asarray(x))
    s_t, f_t = torch_period_forward(params, torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(s_j), s_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    assert len(f_j) == len(f_t) == 6
    for a, b in zip(f_j, f_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_resolution_discriminator_vs_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 1, 512)).astype(np.float32)
    params = d.init_resolution_discriminator(
        jax.random.PRNGKey(1), resolution=(128, 32, 64))
    s_j, f_j = d.resolution_discriminator_forward(params, jnp.asarray(x))
    s_t, f_t = torch_resolution_forward(params, torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(s_j), s_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    assert len(f_j) == len(f_t) == 6
    for a, b in zip(f_j, f_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(),
                                   rtol=1e-4, atol=1e-4)
    # reference channel width: 32 * d_mult (config.yaml:121 → 32)
    assert params["convs"][0]["w"].shape[0] == 32


def test_gan_losses_vs_torch():
    """feature/discriminator/generator losses == the reference formulas
    (models.py:420-453)."""
    rng = np.random.default_rng(2)
    r_scores = [jnp.asarray(rng.standard_normal((2, 7)), jnp.float32)
                for _ in range(3)]
    g_scores = [jnp.asarray(rng.standard_normal((2, 7)), jnp.float32)
                for _ in range(3)]
    f_r = [[jnp.asarray(rng.standard_normal((2, 4, 5)), jnp.float32)
            for _ in range(2)] for _ in range(3)]
    f_g = [[jnp.asarray(rng.standard_normal((2, 4, 5)), jnp.float32)
            for _ in range(2)] for _ in range(3)]

    def tref(xs):
        return [_t(x) for x in xs]

    # torch reference formulas
    dl = sum(torch.mean((1 - dr) ** 2) + torch.mean(dg ** 2)
             for dr, dg in zip(tref(r_scores), tref(g_scores)))
    gl = sum(torch.mean((1 - dg) ** 2) for dg in tref(g_scores))
    fl = 2 * sum(torch.mean(torch.abs(_t(a) - _t(b)))
                 for fr, fg in zip(f_r, f_g) for a, b in zip(fr, fg))

    np.testing.assert_allclose(float(d.discriminator_loss(r_scores, g_scores)),
                               float(dl), rtol=1e-6)
    np.testing.assert_allclose(float(d.generator_loss(g_scores)),
                               float(gl), rtol=1e-6)
    np.testing.assert_allclose(float(d.feature_loss(f_r, f_g)),
                               float(fl), rtol=1e-6)
