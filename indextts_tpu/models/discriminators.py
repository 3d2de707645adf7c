"""BigVGAN training-side discriminators + GAN losses.

Capability rebuild of the reference classes (indextts/BigVGAN/models.py:
280-453): MultiPeriodDiscriminator (periods 2/3/5/7/11),
MultiResolutionDiscriminator (STFT resolutions config.yaml:118), and the
feature / discriminator / generator losses.  The fork ships no vocoder
training script, but the classes are part of the surface — provided here as
functional modules so a vocoder fine-tune can be assembled.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1
_DN2 = ("NCHW", "OIHW", "NCHW")


def _conv2d(x, p, stride=(1, 1), padding=((0, 0), (0, 0))):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=list(padding),
        dimension_numbers=_DN2)
    return y + p["b"][None, :, None, None]


def _leaky(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def init_period_discriminator(rng, period: int, d_mult: int = 1,
                              dtype=jnp.float32) -> Dict[str, Any]:
    """DiscriminatorP (models.py:280-314): 5 strided (k,1) conv2d stages."""
    ks = iter(jax.random.split(rng, 8))
    chans = [1, 32 * d_mult, 128 * d_mult, 512 * d_mult, 1024 * d_mult, 1024 * d_mult]

    def conv_p(cin, cout, kh):
        fan = cin * kh
        w = (jax.random.normal(next(ks), (cout, cin, kh, 1)) / math.sqrt(fan)).astype(dtype)
        return {"w": w, "b": jnp.zeros((cout,), dtype)}

    return {
        "period": period,
        "convs": [conv_p(chans[i], chans[i + 1], 5) for i in range(4)]
                  + [conv_p(chans[4], chans[5], 5)],
        "conv_post": conv_p(chans[5], 1, 3),
    }


def period_discriminator_forward(params: Dict[str, Any], x: jnp.ndarray
                                  ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """x: [B, 1, T] → (score, feature maps)."""
    period = params["period"]
    B, C, T = x.shape
    if T % period != 0:
        pad = period - T % period
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect")
        T = T + pad
    x = x.reshape(B, C, T // period, period)
    fmap = []
    for i, conv in enumerate(params["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        pad = ((2, 2), (0, 0))
        x = _leaky(_conv2d(x, conv, stride, pad))
        fmap.append(x)
    x = _conv2d(x, params["conv_post"], (1, 1), ((1, 1), (0, 0)))
    fmap.append(x)
    return x.reshape(B, -1), fmap


def init_resolution_discriminator(rng, resolution: Sequence[int],
                                   channels: int = 32,
                                   dtype=jnp.float32) -> Dict[str, Any]:
    """DiscriminatorR over |STFT| (models.py:341-391): 32·d_mult channels
    (config.yaml:121 d_mult=1), (3,9) convs then (3,3)."""
    ks = iter(jax.random.split(rng, 8))

    def conv_p(cin, cout, kh, kw):
        fan = cin * kh * kw
        w = (jax.random.normal(next(ks), (cout, cin, kh, kw)) / math.sqrt(fan)).astype(dtype)
        return {"w": w, "b": jnp.zeros((cout,), dtype)}

    return {
        "resolution": tuple(resolution),  # (n_fft, hop, win)
        "convs": [
            conv_p(1, channels, 3, 9),
            conv_p(channels, channels, 3, 9),
            conv_p(channels, channels, 3, 9),
            conv_p(channels, channels, 3, 9),
            conv_p(channels, channels, 3, 3),
        ],
        "conv_post": conv_p(channels, 1, 3, 3),
    }


def _stft_mag(x: jnp.ndarray, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    """x: [B, T] → magnitude [B, F, frames]."""
    pad = (n_fft - hop) // 2
    if x.shape[-1] <= pad:
        # reflect needs pad < T; tiny smoke inputs zero-extend first
        x = jnp.pad(x, ((0, 0), (0, pad + 1 - x.shape[-1])))
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    if x.shape[-1] < n_fft:
        # guarantee at least one frame (else the score is a mean over an
        # empty axis → NaN losses on signals shorter than the window)
        x = jnp.pad(x, ((0, 0), (0, n_fft - x.shape[-1])))
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    import numpy as np

    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[:, idx]
    # reference torch.stft is called with window=None (models.py:387) →
    # a RECTANGULAR ones(win_length) window zero-padded to n_fft centred
    window = jnp.ones((win,), jnp.float32)
    if win < n_fft:
        lpad = (n_fft - win) // 2
        window = jnp.pad(window, (lpad, n_fft - win - lpad))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    return jnp.abs(spec).swapaxes(-1, -2)


def resolution_discriminator_forward(params: Dict[str, Any], x: jnp.ndarray
                                      ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """x: [B, 1, T] → (score, feature maps)."""
    n_fft, hop, win = params["resolution"]
    mag = _stft_mag(x[:, 0, :], n_fft, hop, win)[:, None]  # [B, 1, F, frames]
    fmap = []
    h = mag
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    pads = [((1, 1), (4, 4))] * 4 + [((1, 1), (1, 1))]
    for conv, s, p in zip(params["convs"], strides, pads):
        h = _leaky(_conv2d(h, conv, s, p))
        fmap.append(h)
    h = _conv2d(h, params["conv_post"], (1, 1), ((1, 1), (1, 1)))
    fmap.append(h)
    return h.reshape(h.shape[0], -1), fmap


def init_discriminators(rng, periods=(2, 3, 5, 7, 11),
                        resolutions=((1024, 120, 600), (2048, 240, 1200),
                                      (512, 50, 240)),
                        dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(rng, len(periods) + len(resolutions))
    return {
        "mpd": [init_period_discriminator(ks[i], p, dtype=dtype)
                 for i, p in enumerate(periods)],
        "mrd": [init_resolution_discriminator(ks[len(periods) + i], r, dtype=dtype)
                 for i, r in enumerate(resolutions)],
    }


def discriminators_forward(params: Dict[str, Any], wav: jnp.ndarray):
    """wav [B, 1, T] → (scores, fmaps) over all sub-discriminators."""
    scores, fmaps = [], []
    for p in params["mpd"]:
        s, f = period_discriminator_forward(p, wav)
        scores.append(s)
        fmaps.append(f)
    for p in params["mrd"]:
        s, f = resolution_discriminator_forward(p, wav)
        scores.append(s)
        fmaps.append(f)
    return scores, fmaps


# --- losses (models.py:422-453) -------------------------------------------

def feature_loss(fmap_real, fmap_gen) -> jnp.ndarray:
    loss = 0.0
    for fr, fg in zip(fmap_real, fmap_gen):
        for r, g in zip(fr, fg):
            loss = loss + jnp.mean(jnp.abs(r - g))
    return loss * 2.0


def discriminator_loss(real_scores, gen_scores) -> jnp.ndarray:
    loss = 0.0
    for r, g in zip(real_scores, gen_scores):
        loss = loss + jnp.mean(jnp.square(1.0 - r)) + jnp.mean(jnp.square(g))
    return loss


def generator_loss(gen_scores) -> jnp.ndarray:
    loss = 0.0
    for g in gen_scores:
        loss = loss + jnp.mean(jnp.square(1.0 - g))
    return loss


def multiscale_mel_loss(real: jnp.ndarray, gen: jnp.ndarray,
                        sample_rate: int = 24000,
                        scales=((512, 128), (1024, 256), (2048, 512))
                        ) -> jnp.ndarray:
    """Multi-scale log-mel L1 (use_multiscale_melloss, config.yaml:125-126)."""
    from indextts_tpu.ops.mel import mel_spectrogram

    loss = 0.0
    for n_fft, hop in scales:
        mr = mel_spectrogram(real, sample_rate, n_fft, hop, n_fft, 80)
        mg = mel_spectrogram(gen, sample_rate, n_fft, hop, n_fft, 80)
        loss = loss + jnp.mean(jnp.abs(mr - mg))
    return loss / len(scales)
