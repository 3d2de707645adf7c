"""Jittable mel-spectrogram front-end.

Numerically matches the reference extractor
(indextts/utils/feature_extractors.py:26-68): torchaudio
``MelSpectrogram(sample_rate=24000, n_fft=1024, hop_length=256,
win_length=1024, power=1, normalized=False, f_min=0, f_max=None, n_mels=100,
center=True)`` followed by ``safe_log`` = log(clip(x, 1e-7))
(indextts/utils/common.py:116-135).

torchaudio semantics reproduced here:
  * centered frames, reflect padding of n_fft//2 on both sides
  * periodic Hann window
  * magnitude spectrum (power=1)
  * HTK mel scale, no filterbank normalisation (torchaudio defaults
    mel_scale="htk", norm=None)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sample_rate: int = 24000,
    n_fft: int = 1024,
    n_mels: int = 100,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_freqs, n_mels), HTK scale, no norm
    — matches torchaudio.functional.melscale_fbanks defaults."""
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min, m_max = hz_to_mel_htk(fmin), hz_to_mel_htk(fmax)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _hann_window(win_length: int) -> np.ndarray:
    # periodic Hann, as torch.hann_window default
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def frame_signal(audio: jnp.ndarray, n_fft: int, hop_length: int,
                 center: bool = True) -> jnp.ndarray:
    """Center-pad (reflect) and frame a signal: (..., T) -> (..., F, n_fft).

    With center=False the caller has already applied its own padding (the
    batched extractor reflect-pads host-side per clip so zero-padded batch
    tails cannot leak into valid frames)."""
    if center:
        pad = n_fft // 2
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)],
                        mode="reflect")
    n_frames = 1 + (audio.shape[-1] - n_fft) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return audio[..., idx]


def spectrogram(
    audio: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    power: float = 1.0,
    center: bool = True,
) -> jnp.ndarray:
    """Magnitude (power=1) STFT: (..., T) -> (..., n_freqs, F)."""
    frames = frame_signal(audio.astype(jnp.float32), n_fft, hop_length, center)
    window = jnp.asarray(_hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag**power
    return jnp.swapaxes(mag, -1, -2)


def safe_log(x: jnp.ndarray, clip_val: float = 1e-7) -> jnp.ndarray:
    """reference: indextts/utils/common.py:116-135."""
    return jnp.log(jnp.clip(x, min=clip_val))


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop_length", "win_length",
                     "n_mels", "mel_fmin", "mel_fmax"),
)
def mel_spectrogram(
    audio: jnp.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 100,
    mel_fmin: float = 0.0,
    mel_fmax: float | None = None,
) -> jnp.ndarray:
    """Log-mel features for conditioning/extraction: (..., T) -> (..., n_mels, F).

    Equivalent of MelSpectrogramFeatures.__call__
    (reference: indextts/utils/feature_extractors.py:62-68).
    """
    spec = spectrogram(audio, n_fft, hop_length, win_length, power=1.0)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels,
                                    mel_fmin, mel_fmax))
    mel = jnp.einsum("...ft,fm->...mt", spec, fb)
    return safe_log(mel)


class MelSpectrogramFeatures:
    """Object-style wrapper mirroring the reference class surface."""

    def __init__(
        self,
        sample_rate: int = 24000,
        n_fft: int = 1024,
        hop_length: int = 256,
        win_length: int | None = None,
        n_mels: int = 100,
        mel_fmin: float = 0.0,
        mel_fmax: float | None = None,
        normalize: bool = False,
        padding: str = "center",
    ):
        if padding not in ("center", "same"):
            raise ValueError("padding must be 'center' or 'same'")
        del normalize  # reference always passes False
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length or n_fft
        self.n_mels = n_mels
        self.mel_fmin = mel_fmin
        self.mel_fmax = mel_fmax
        self.padding = padding

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        if self.padding == "same":
            pad = self.win_length - self.hop_length
            audio = jnp.pad(
                audio,
                [(0, 0)] * (audio.ndim - 1) + [(pad // 2, pad // 2)],
                mode="reflect",
            )
            spec = spectrogram(audio, self.n_fft, self.hop_length, self.win_length)
            fb = jnp.asarray(
                mel_filterbank(
                    self.sample_rate, self.n_fft, self.n_mels, self.mel_fmin, self.mel_fmax
                )
            )
            return safe_log(jnp.einsum("...ft,fm->...mt", spec, fb))
        return mel_spectrogram(
            audio,
            sample_rate=self.sample_rate,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            n_mels=self.n_mels,
            mel_fmin=self.mel_fmin,
            mel_fmax=self.mel_fmax,
        )
