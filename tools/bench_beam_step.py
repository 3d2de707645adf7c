"""Per-step cost of the beam decode loop at ENGINE lengths.

The reference's default decode is num_beams=3 (infer.py:628-635); the e2e
RTF of that path is dominated by the per-step cost of
`inference_speech_beam` at T ≈ prefix+600.  This tool times the full jitted
loop (600 steps, random weights never emit stop) for each cache-reorder
strategy and KV dtype, so regressions and wins are attributable.

  python tools/bench_beam_step.py [--reorders dslice,none] [--beams 3]
      [--batch 1] [--text-len 100] [--max-new 600] [--kv fp8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reorders", default="lineage,none",
                    help="comma list: lineage (production default), none "
                         "(diagnostic floor), dslice/pallas/full/onehot "
                         "(physical-permute ablations)")
    ap.add_argument("--beams", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--text-len", type=int, default=100)
    ap.add_argument("--max-new", type=int, default=600)
    ap.add_argument("--kv", default="fp8", choices=["fp8", "bf16"])
    ap.add_argument("--quant", default="int8", choices=["int8", "int4", "none"])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                os.path.expanduser("~/.cache/jax_bench"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from indextts_tpu.config import GPTConfig
    from indextts_tpu.models import unified_voice as uv
    from indextts_tpu.ops import quantization as quant

    cfg = GPTConfig()
    params = jax.jit(lambda k: uv.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    if args.quant != "none":
        bits = 8 if args.quant == "int8" else 4
        params = jax.jit(lambda p: quant.quantize_gpt_params(p, bits=bits))(params)
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    cond = jnp.asarray(
        rng.standard_normal((1, cfg.condition_num_latent, cfg.model_dim)),
        jnp.bfloat16)
    texts = [rng.integers(2, cfg.number_text_tokens, (args.text_len,))
             for _ in range(args.batch)]
    prep = uv.prepare_text_prompt(texts, cfg.start_text_token,
                                   cfg.stop_text_token)
    tokens = jnp.asarray(prep.text_tokens)
    mask = jnp.asarray(prep.attn_text)
    kv = jnp.float8_e4m3fn if args.kv == "fp8" else None

    for reorder in args.reorders.split(","):
        def run(key):
            return uv.inference_speech_beam(
                params, cfg, cond, tokens, mask, key, max_new=args.max_new,
                num_beams=args.beams, temperature=1.0, top_k=30, top_p=0.8,
                repetition_penalty=10.0, do_sample=True, kv_dtype=kv,
                reorder=reorder)

        for i in range(2):
            _ = np.asarray(run(jax.random.PRNGKey(i)).lengths)  # compile+warm
        total_steps = 0
        t0 = time.perf_counter()
        for i in range(args.iters):
            r = run(jax.random.PRNGKey(i + 2))
            total_steps += int(np.minimum(np.asarray(r.lengths) + 1,
                                          args.max_new).max())
        dt = time.perf_counter() - t0
        ms = dt / total_steps * 1000
        out_rate = total_steps * args.batch / dt
        print(f"[beam-step {reorder} kv={args.kv} B={args.batch} "
              f"nb={args.beams} T≈{args.text_len}+{args.max_new}] "
              f"{ms:.2f} ms/step  {out_rate:.0f} out-tok/s  "
              f"(GPT RTF {23.4 * ms / 1000:.4f})", file=sys.stderr)


if __name__ == "__main__":
    main()
