"""Audio I/O + resampler tests, using the real reference prompt WAVs."""

import numpy as np
import pytest

from indextts_tpu.utils.audio import (
    load_prompt_audio,
    read_wav,
    resample,
    to_mono,
    write_wav,
)

SAMPLE = "/root/reference/tests/sample_prompt.wav"


def test_read_reference_wav():
    audio, sr = read_wav(SAMPLE)
    assert audio.ndim == 2
    assert sr > 0
    assert np.abs(audio).max() <= 1.0001


def test_roundtrip(tmp_path):
    sr = 24000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, x * 32767.0, sr)
    y, sr2 = read_wav(path)
    assert sr2 == sr
    np.testing.assert_allclose(y[0], x, atol=2e-4)


def test_resample_preserves_tone():
    # 440 Hz tone resampled 16k->24k keeps its frequency and amplitude
    sr0, sr1 = 16000, 24000
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    y = resample(x, sr0, sr1)
    assert y.shape[-1] == int(np.ceil(sr1 * x.shape[-1] / sr0))
    t1 = np.arange(y.shape[-1]) / sr1
    ref = np.sin(2 * np.pi * 440 * t1)
    # ignore filter edge transients
    sl = slice(500, -500)
    np.testing.assert_allclose(y[0][sl], ref[sl], atol=5e-3)


def test_resample_identity():
    x = np.random.default_rng(0).standard_normal((1, 1000)).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 24000, 24000), x)


def test_load_prompt_audio():
    audio = load_prompt_audio(SAMPLE, 24000)
    assert audio.shape[0] == 1
    assert audio.dtype == np.float32
    assert audio.shape[1] > 24000  # at least a second of prompt


def test_speaker_similarity_accepts_channel_shapes():
    """speaker_embedding/_similarity take [T], (1, T) and (C, T) audio —
    the shapes read_wav and load_prompt_audio actually produce (the
    eval_quality main path feeds these directly)."""
    import jax

    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models import bigvgan as bigvgan_model
    from indextts_tpu.utils.eval_metrics import speaker_embedding, speaker_similarity

    cfg = BigVGANConfig(upsample_rates=[2], upsample_kernel_sizes=[4],
                        upsample_initial_channel=16,
                        resblock_kernel_sizes=[3],
                        resblock_dilation_sizes=[[1]],
                        speaker_embedding_dim=8, gpt_dim=64,
                        use_fused_kernel=False)
    params = jax.tree.map(lambda x: np.asarray(x, np.float32),
                          bigvgan_model.init_params(jax.random.PRNGKey(0), cfg))
    wav = np.random.default_rng(0).standard_normal(8000).astype(np.float32) * 0.1
    e1 = speaker_embedding(params, wav)
    e2 = speaker_embedding(params, wav[None])          # (1, T) prompt shape
    np.testing.assert_allclose(e1, e2, rtol=1e-6)
    stereo = np.stack([wav, wav])                       # (C, T) read_wav shape
    assert abs(speaker_similarity(params, wav, stereo) - 1.0) < 1e-4
