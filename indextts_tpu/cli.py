"""Command-line synthesis (reference surface: indextts/cli.py:7-59)."""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="indextts", description="IndexTTS-TPU synthesis")
    p.add_argument("text", help="text to synthesize")
    p.add_argument("-v", "--voice", required=True, help="prompt/reference WAV")
    p.add_argument("-o", "--output_path", default="gen.wav")
    p.add_argument("-c", "--config", default=None, help="config.yaml path")
    p.add_argument("--model_dir", default="checkpoints")
    p.add_argument("-d", "--device", default=None, help="accepted for compat")
    p.add_argument("--fp16", action="store_true", default=True)
    p.add_argument("--no-fp16", dest="fp16", action="store_false")
    p.add_argument("-f", "--force", action="store_true", help="overwrite output")
    p.add_argument("--fast", action="store_true", help="use infer_fast")
    p.add_argument("--stream", action="store_true",
                   help="sentence-streaming synthesis: chunks append to the "
                        "output as they're ready; prints time-to-first-audio")
    p.add_argument("--speaker_id", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--num_beams", type=int, default=None)
    p.add_argument("--cfg_scale", type=float, default=None,
                   help="classifier-free guidance scale (sampling mode; "
                        "1.0 = off)")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel inference over N chips (trunk "
                        "matmuls sharded over a 'model' mesh axis; the "
                        "analogue of the reference's multi-GPU "
                        "parallelize(), gpt/model.py:64-79)")
    args = p.parse_args(argv)

    if os.path.exists(args.output_path) and not args.force:
        print(f"error: {args.output_path} exists (use -f to overwrite)", file=sys.stderr)
        return 1
    if not os.path.exists(args.voice):
        print(f"error: voice file {args.voice} not found", file=sys.stderr)
        return 1
    cfg_path = args.config or os.path.join(args.model_dir, "config.yaml")

    from indextts_tpu.engine import IndexTTS

    tts = IndexTTS(cfg_path=cfg_path, model_dir=args.model_dir,
                   is_fp16=args.fp16, seed=args.seed, tp=args.tp)
    gen = {}
    if args.num_beams is not None:
        gen["num_beams"] = args.num_beams
    if args.cfg_scale is not None:
        gen["cfg_scale"] = args.cfg_scale
    if args.stream:
        import numpy as np

        from indextts_tpu.utils.audio import write_wav

        chunks, sr = [], 24000
        for sr, chunk in tts.infer_stream(args.voice, args.text, verbose=True,
                                          speaker_id=args.speaker_id, **gen):
            chunks.append(chunk)
            # progressive output: rewrite after each sentence so a player
            # tailing the file hears audio before synthesis finishes
            write_wav(args.output_path, np.concatenate(chunks), sr)
        if not chunks:
            print("error: no audio produced (empty text?)", file=sys.stderr)
            return 1
        ttfa = tts.last_stats.get("time_to_first_audio")
        print(f">> saved: {args.output_path} (TTFA "
              f"{ttfa if ttfa is not None else -1:.2f}s)")
        return 0
    infer = tts.infer_fast if args.fast else tts.infer
    kwargs = {"speaker_id": args.speaker_id, **gen}
    infer(args.voice, args.text, args.output_path, **kwargs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
