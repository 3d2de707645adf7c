"""Beam-pool serving throughput — reference-DEFAULT decode (num_beams=3,
reference api.py:253) through the continuous beam pool (serve/beam_pool.py).

Mixed traffic: R requests (20-110 text tokens, 60-200 max_new budgets)
through G beam groups of nb=3 beams; reports steady-state OUTPUT tokens/s
(finalized best-hypothesis tokens, the tokens a client actually receives)
plus group-step rate.  Companion to tools/bench_pool.py (sampling pool)
and bench.py's dedicated-call beam rows.

  python tools/bench_beam_pool.py [--groups 8] [--reqs 32] [--bits 8]
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
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--reqs", type=int, default=32)
    ap.add_argument("--steps-per-tick", type=int, default=16)
    ap.add_argument("--bits", type=int, default=8, choices=[4, 8])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test config (CPU-sized model, short "
                         "budgets) — validates the harness, not the chip")
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
    from indextts_tpu.serve.beam_pool import BeamPoolBatcher

    if args.tiny:
        cfg = GPTConfig(layers=2, model_dim=64, heads=4,
                        max_mel_tokens=48, max_text_tokens=30,
                        number_text_tokens=120, number_mel_codes=80,
                        start_mel_token=78, stop_mel_token=79)
        max_text_width, max_new, lo, hi = 16, 24, 8, 20
        dtype, kv = jnp.float32, jnp.float32
    else:
        cfg = GPTConfig()
        max_text_width, max_new, lo, hi = 128, 200, 60, 200
        dtype, kv = jnp.bfloat16, jnp.float8_e4m3fn
    params = jax.jit(lambda k: uv.init_params(k, cfg, dtype=dtype))(
        jax.random.PRNGKey(0))
    if not args.tiny:
        layout = "shared" if args.bits == 4 else None
        params = jax.jit(lambda p: quant.quantize_gpt_params(
            p, bits=args.bits,
            **({"int4_layout": layout} if layout else {})))(params)
    jax.block_until_ready(params)

    rng = np.random.default_rng(args.seed)
    cond = jnp.asarray(rng.standard_normal((1, cfg.condition_num_latent,
                                            cfg.model_dim)), dtype)

    def make_reqs(n):
        return [(rng.integers(2, cfg.number_text_tokens - 4,
                              (int(rng.integers(5 if args.tiny else 20,
                                                max_text_width - 10)),)),
                 int(rng.integers(lo, hi))) for _ in range(n)]

    def run_pass(reqs, label):
        pool = BeamPoolBatcher(
            params, cfg, cond, num_groups=args.groups, num_beams=3,
            max_text_width=max_text_width, max_new=max_new, kv_dtype=kv,
            cache_dtype=dtype,
            steps_per_tick=args.steps_per_tick)
        for i, (text, budget) in enumerate(reqs):
            pool.submit(text, max_new=budget, seed=i)
        t0 = time.perf_counter()
        results = pool.run()
        dt = time.perf_counter() - t0
        out_tokens = int(sum(len(v) for v in results.values()))
        steps = pool.step_count
        print(f"[beam-pool:{label}] {len(results)} reqs, {out_tokens} output "
              f"tokens, {steps} group-steps in {dt:.2f}s -> "
              f"{out_tokens / dt:.0f} out-tok/s "
              f"({steps * args.groups / dt:.0f} group-slot-steps/s)",
              file=sys.stderr)
        return out_tokens / dt

    run_pass(make_reqs(min(8, args.reqs)), "warm")   # compiles
    rate = run_pass(make_reqs(args.reqs), "measured")
    import json
    print(json.dumps({"metric": "beam_pool_out_tok_per_sec", "groups":
                      args.groups, "num_beams": 3, "bits": args.bits,
                      "reqs": args.reqs, "value": round(rate, 1)}))


if __name__ == "__main__":
    main()
