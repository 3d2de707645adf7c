"""Fine-tune quality evaluation (BASELINE config 3: speaker-sim / WER over
validation clips).

For each ``audio_path<TAB>transcript`` line of ``--audio_list`` (the same
format extraction consumes), this synthesizes the transcript with the clip
as the zero-shot prompt and reports:

  * **speaker_sim** — cosine similarity between the ECAPA speaker embedding
    of the prompt clip and of the synthesized audio (always available: the
    framework's own speaker encoder, utils/eval_metrics.py);
  * **wer/cer** — ONLY when ``--asr-cmd`` supplies an external ASR.  No ASR
    model ships in this image, so transcription is an explicit hook: the
    command template receives ``{wav}`` and must print the transcript to
    stdout, e.g. ``--asr-cmd "whisper-cli --output - {wav}"``.

Prints one JSON line with the mean metrics.  ``--self-test`` runs the
metric pipeline on a synthetic waveform pair (no checkpoints needed) so
``run.sh test`` can routinely exercise the quality path.
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _asr_transcribe(asr_cmd: str, wav_path: str) -> str:
    cmd = [p.format(wav=wav_path) for p in shlex.split(asr_cmd)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    if out.returncode != 0:
        raise RuntimeError(f"ASR command failed ({out.returncode}): "
                           f"{out.stderr[-500:]}")
    return out.stdout.strip()


def self_test() -> dict:
    """Metric-pipeline check with random weights/audio: speaker-sim of a
    waveform with itself must be 1.0 and the WER/CER math must be exact."""
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models import bigvgan as bigvgan_model
    from indextts_tpu.utils.eval_metrics import cer, speaker_similarity, wer

    cfg = BigVGANConfig(upsample_rates=[2], upsample_kernel_sizes=[4],
                        upsample_initial_channel=16,
                        resblock_kernel_sizes=[3],
                        resblock_dilation_sizes=[[1]],
                        speaker_embedding_dim=8, gpt_dim=64,
                        use_fused_kernel=False)
    params = jax.tree.map(
        lambda x: np.asarray(x, np.float32),
        bigvgan_model.init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(24000).astype(np.float32) * 0.1
    sim = speaker_similarity(params, wav, wav)
    ok = abs(sim - 1.0) < 1e-4 and wer("a b", "a b") == 0.0 \
        and abs(cer("你好世界", "你好地球") - 0.5) < 1e-9
    return {"metric": "quality_selftest", "speaker_sim_self": round(sim, 6),
            "ok": bool(ok)}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--audio_list", help="audio_path<TAB>transcript lines")
    p.add_argument("--config", default="checkpoints/config.yaml")
    p.add_argument("--model_dir", default="checkpoints")
    p.add_argument("--gpt_path", default=None)
    p.add_argument("--asr-cmd", default=None,
                   help="external ASR command template with {wav}; enables "
                        "WER/CER (none ships in-image)")
    p.add_argument("--max_clips", type=int, default=0)
    p.add_argument("--self-test", action="store_true",
                   help="run the metric pipeline on synthetic data")
    args = p.parse_args(argv)

    if args.self_test:
        print(json.dumps(self_test()))
        return
    if not args.audio_list:
        p.error("--audio_list is required (or use --self-test)")

    from indextts_tpu.engine import IndexTTS
    from indextts_tpu.utils import audio as audio_io
    from indextts_tpu.utils.eval_metrics import cer, speaker_similarity, wer

    import numpy as np

    eng = IndexTTS(cfg_path=args.config, model_dir=args.model_dir,
                   gpt_path=args.gpt_path)
    sims, wers, cers = [], [], []
    with open(args.audio_list, encoding="utf-8") as f:
        lines = [l.rstrip("\n").split("\t") for l in f if l.strip()]
    if args.max_clips:
        lines = lines[: args.max_clips]
    bigvgan_fp32 = None
    for i, (clip, text) in enumerate(lines):
        with tempfile.TemporaryDirectory() as d:
            out = os.path.join(d, "synth.wav")
            eng.infer(clip, text, out, verbose=False)
            # read_wav already returns float32 in [-1, 1] shaped (C, T);
            # speaker_similarity mixes multi-channel input to mono itself
            synth, sr = audio_io.read_wav(out)
            prompt = audio_io.load_prompt_audio(clip, sr)
            if bigvgan_fp32 is None:
                import jax

                bigvgan_fp32 = jax.tree.map(
                    lambda x: np.asarray(x, np.float32), eng.bigvgan_params)
            sims.append(speaker_similarity(bigvgan_fp32, prompt, synth, sr))
            if args.asr_cmd:
                hyp = _asr_transcribe(args.asr_cmd, out)
                wers.append(wer(text, hyp))
                cers.append(cer(text, hyp))
        print(f"[{i + 1}/{len(lines)}] sim={sims[-1]:.4f}", file=sys.stderr)

    result = {"metric": "finetune_quality", "clips": len(sims),
              "speaker_sim_mean": round(float(np.mean(sims)), 4)}
    if wers:
        result["wer_mean"] = round(float(np.mean(wers)), 4)
        result["cer_mean"] = round(float(np.mean(cers)), 4)
    else:
        result["wer"] = "requires --asr-cmd (no ASR ships in-image)"
    print(json.dumps(result, ensure_ascii=False))


if __name__ == "__main__":
    main()
