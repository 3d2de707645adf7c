"""Mel front-end numerics vs an independent torch.stft oracle.

The reference pipeline's fidelity gate (SURVEY.md §7.3): the mel extractor
must match torchaudio's MelSpectrogram(power=1, center=True) + safe_log.
torchaudio itself is not installed, but torch.stft implements the identical
framing/window/fft semantics, so it serves as the oracle for the STFT stage.
"""

import numpy as np
import pytest
import torch

from indextts_tpu.ops.mel import (
    MelSpectrogramFeatures,
    mel_filterbank,
    mel_spectrogram,
    spectrogram,
)


def _torch_magspec(x: np.ndarray, n_fft=1024, hop=256, win=1024) -> np.ndarray:
    xt = torch.from_numpy(x.astype(np.float32))
    window = torch.hann_window(win)
    spec = torch.stft(
        xt,
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return spec.abs().numpy()


def test_spectrogram_matches_torch_stft():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 24000)).astype(np.float32)
    ours = np.asarray(spectrogram(x))
    ref = _torch_magspec(x)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 1024, 100)
    assert fb.shape == (513, 100)
    # triangles: non-negative, each filter has a single apex, and interior
    # frequency bins are covered by at least one filter
    assert (fb >= 0).all()
    coverage = fb.sum(axis=1)
    assert (coverage[5:-1] > 0).all()
    # HTK scale without norm: apex height of wide triangles approaches 1
    assert 0.5 < fb.max() <= 1.0001


def test_mel_spectrogram_log_floor():
    x = np.zeros((1, 4096), dtype=np.float32)
    mel = np.asarray(mel_spectrogram(x))
    # safe_log floor = log(1e-7)
    np.testing.assert_allclose(mel, np.log(1e-7), rtol=1e-5)


def test_mel_shapes_match_reference_contract():
    # 1 mel code = 1024 samples = 4 frames @ hop 256 (config.yaml:58)
    x = np.random.default_rng(1).standard_normal((1, 24000)).astype(np.float32)
    mel = np.asarray(mel_spectrogram(x))
    assert mel.shape == (1, 100, 24000 // 256 + 1)


def test_same_padding_mode():
    x = np.random.default_rng(2).standard_normal((1, 10000)).astype(np.float32)
    feats = MelSpectrogramFeatures(padding="same")
    mel = np.asarray(feats(x))
    assert mel.shape[1] == 100


def test_mel_fmin_fmax_honored_on_center_path():
    """Constructor mel_fmin/mel_fmax must reach the filterbank on the
    default padding='center' path (they already did on 'same')."""
    x = np.random.default_rng(3).standard_normal((1, 8192)).astype(np.float32)
    full = np.asarray(MelSpectrogramFeatures()(x))
    band = np.asarray(MelSpectrogramFeatures(mel_fmin=300.0, mel_fmax=8000.0)(x))
    assert full.shape == band.shape
    assert not np.allclose(full, band)
    # and the band-limited filterbank itself respects the range
    fb = mel_filterbank(24000, 1024, 100, 300.0, 8000.0)
    freqs = np.linspace(0.0, 12000.0, 513)
    assert fb[freqs < 290.0].sum() == 0.0
    assert fb[freqs > 8100.0].sum() == 0.0
