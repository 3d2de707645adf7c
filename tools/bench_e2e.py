"""End-to-end engine RTF on the real TPU (random weights, full-size model).

Measures the public `IndexTTS.infer` / `infer_fast` / `infer_stream`
surfaces — conditioning, decode, latent re-forward, vocoder, WAV — at the
flagship config.  No released checkpoints exist in this image, so the
numbers characterise pipeline speed, not audio quality (PARITY.md).

  python tools/bench_e2e.py [--quant int8|int4|none] [--beams N]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int8", choices=["none", "int8", "int4"])
    ap.add_argument("--beams", type=int, default=1)
    ap.add_argument("--model_dir", default="checkpoints_test")
    ap.add_argument("--long", action="store_true",
                    help="16-sentence long text; also measures infer_fast")
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                os.path.expanduser("~/.cache/jax_indextts"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from indextts_tpu.engine import IndexTTS

    prec = ({"gpt": "bf16"} if args.quant == "none"
            else {"gpt": args.quant})
    tts = IndexTTS(cfg_path=os.path.join(args.model_dir, "config.yaml"),
                   model_dir=args.model_dir, precision_config=prec, seed=0)

    prompt = "/root/reference/tests/sample_prompt.wav"
    text = "親愛的夥伴們，大家好！每一次的努力都是為了更好的未來。"
    if args.long:
        # multi-sentence long-text case (exercises bucketed multi-row beam
        # decode + per-bucket batched vocoding)
        text = text * 8
    out = tempfile.NamedTemporaryFile(suffix=".wav", delete=False).name
    kw = dict(num_beams=args.beams)

    tts.infer(prompt, text, out, **kw)             # warm/compile
    t0 = time.perf_counter()
    tts.infer(prompt, text, out, **kw)
    dt = time.perf_counter() - t0
    s = tts.last_stats
    print(f"[e2e {args.quant} beams={args.beams}] infer RTF {s['rtf']:.4f} "
          f"({dt:.2f}s wall, {s['wav_seconds']:.2f}s audio, "
          f"TTFA {s.get('time_to_first_audio', -1):.2f}s)")
    if args.long:
        tts.infer_fast(prompt, text, out, **kw)    # warm/compile
        t0 = time.perf_counter()
        tts.infer_fast(prompt, text, out, **kw)
        dt = time.perf_counter() - t0
        s = tts.last_stats
        print(f"[e2e {args.quant} beams={args.beams} long] infer_fast RTF "
              f"{s['rtf']:.4f} ({dt:.2f}s wall, {s['wav_seconds']:.2f}s audio)")

    chunks = list(tts.infer_stream(prompt, text, **kw))  # warm shapes shared
    t0 = time.perf_counter()
    got_first = None
    for i, (sr, c) in enumerate(tts.infer_stream(prompt, text, **kw)):
        if i == 0:
            got_first = time.perf_counter() - t0
    s = tts.last_stats
    print(f"[e2e {args.quant} beams={args.beams}] stream RTF {s['rtf']:.4f} "
          f"TTFA {got_first:.2f}s ({len(chunks)} chunks)")
    os.unlink(out)


if __name__ == "__main__":
    main()
