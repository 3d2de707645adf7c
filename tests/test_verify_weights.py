"""The verify-weights gate (indextts_tpu/verify.py): synthetic-checkpoint
rehearsal of the exact path real weights will take — export ``.pth`` →
strict convert/load → battery → quality report.

The full 11-case battery already runs in test_engine.py; here a 2-case
subset keeps the focus on the gate plumbing (checkpoint detection, report
shape, failure modes) without doubling suite time."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from indextts_tpu import verify


@pytest.fixture(scope="module")
def synthetic_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("verify_model")
    return verify.make_synthetic_model_dir(str(d))


def test_synthetic_dir_has_reference_artifacts(synthetic_dir):
    for name in ("config.yaml", "vocab.txt", "gpt.pth",
                 "bigvgan_generator.pth"):
        assert os.path.exists(os.path.join(synthetic_dir, name)), name


def test_missing_checkpoints_refused(tmp_path):
    """Random-init fallback must NOT silently pass for a weight gate."""
    from indextts_tpu.config import Config
    import shutil

    d = tmp_path / "empty_model"
    d.mkdir()
    cfg = Config.from_dict({})
    cfg.save(str(d / "config.yaml"))
    shutil.copy("/root/reference/vocab.txt", d / "vocab.txt")
    with pytest.raises(FileNotFoundError, match="missing"):
        verify.verify_model_dir(str(d))


def test_dry_run_gate(synthetic_dir, tmp_path, monkeypatch):
    """Exported .pth → engine build → battery subset → quality report."""
    monkeypatch.setattr(verify, "REGRESSION_BATTERY",
                        verify.REGRESSION_BATTERY[:1]
                        + verify.REGRESSION_BATTERY[-1:])
    report = verify.verify_model_dir(
        synthetic_dir,
        out_dir=str(tmp_path / "out"),
        decode_kw=dict(max_mel_tokens=8, do_sample=False,
                       repetition_penalty=1.0, num_beams=1))
    assert report["battery_ok"] is True
    assert report["checkpoints"]["missing"] == []
    assert len(report["cases"]) == 2
    modes = {r["mode"] for r in report["cases"]}
    assert modes == {"infer", "infer_fast"}
    for r in report["cases"]:
        assert r["samples"] >= 1024
        assert -1.0 <= r["speaker_sim"] <= 1.0
    assert -1.0 <= report["speaker_sim_mean"] <= 1.0
    assert report["speaker_sim_min"] <= report["speaker_sim_mean"]
    # the report is one JSON line (the CLI contract)
    json.dumps(report)


def test_speaker_sim_sees_full_scale_audio(synthetic_dir, tmp_path,
                                           monkeypatch):
    """Regression: run_battery once divided read_wav output (already float32
    in [-1, 1]) by 32768 again, flooring the mel at safe_log's 1e-7 clip and
    degenerating the embeddings toward silence.  Both signals must reach the
    metric at waveform scale."""
    from indextts_tpu.utils import eval_metrics

    monkeypatch.setattr(verify, "REGRESSION_BATTERY",
                        verify.REGRESSION_BATTERY[:1])
    seen = []
    real = eval_metrics.speaker_similarity

    def spy(params, wav_a, wav_b, sample_rate=24000):
        seen.append((float(np.abs(wav_a).max()), float(np.abs(wav_b).max())))
        return real(params, wav_a, wav_b, sample_rate)

    monkeypatch.setattr(eval_metrics, "speaker_similarity", spy)
    report = verify.verify_model_dir(
        synthetic_dir, out_dir=str(tmp_path / "out_scale"),
        decode_kw=dict(max_mel_tokens=8, do_sample=False,
                       repetition_penalty=1.0, num_beams=1))
    assert seen, "speaker_similarity never called"
    from indextts_tpu.utils.audio import read_wav

    for rec, (amp_a, amp_b) in zip(report["cases"], seen):
        # the synthesized side must arrive at exactly read_wav scale
        # (random-weight output can be legitimately tiny, so compare to the
        # file, not to an absolute threshold)
        file_amp = float(np.abs(read_wav(rec["wav"])[0]).max())
        assert amp_a == pytest.approx(file_amp, abs=1e-9), \
            f"synthesized wav rescaled: metric saw {amp_a}, file is {file_amp}"
        # the prompt is a full-scale signal; double-dividing it would have
        # shown up here as ~3e-5
        assert amp_b > 1e-3, f"prompt wav reached metric at {amp_b}"


def test_speaker_sim_gate_fails_loud(synthetic_dir, tmp_path, monkeypatch):
    """--min-speaker-sim above any possible cosine must raise."""
    monkeypatch.setattr(verify, "REGRESSION_BATTERY",
                        verify.REGRESSION_BATTERY[:1])
    with pytest.raises(RuntimeError, match="speaker-sim gate"):
        verify.verify_model_dir(
            synthetic_dir, out_dir=str(tmp_path / "out2"),
            min_speaker_sim=1.01,
            decode_kw=dict(max_mel_tokens=8, do_sample=False,
                           repetition_penalty=1.0, num_beams=1))


def test_asr_hook_wires_wer(synthetic_dir, tmp_path, monkeypatch):
    """--asr-cmd template is invoked per wav and fills wer/cer."""
    monkeypatch.setattr(verify, "REGRESSION_BATTERY",
                        [("hello world", "infer")])
    # "ASR" that always prints a fixed transcript
    asr = f"{sys.executable} -c \"print('hello world')\" {{wav}}"
    report = verify.verify_model_dir(
        synthetic_dir, out_dir=str(tmp_path / "out3"), asr_cmd=asr,
        decode_kw=dict(max_mel_tokens=8, do_sample=False,
                       repetition_penalty=1.0, num_beams=1))
    assert report["wer_mean"] == 0.0
    assert report["cer_mean"] == 0.0
