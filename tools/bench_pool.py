"""Continuous-batching pool throughput under mixed traffic.

Measures serve/scheduler.ContinuousBatcher steady-state output tokens/s
with the PARITY.md traffic mix (32 requests, 20-110 text tokens, 60-200
max_new, 8 slots, int8 weights, fp8 KV) — the serving-path counterpart of
bench.py's per-batch decode numbers.

  python tools/bench_pool.py [--slots 8] [--reqs 32] [--steps-per-tick 16]
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
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--reqs", type=int, default=32)
    ap.add_argument("--steps-per-tick", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bits", type=int, default=8, choices=[4, 8],
                    help="weight tier: 8 = int8; 4 = shared-scale int4 "
                         "(nativized to jnp.int4 inside each tick)")
    ap.add_argument("--staging", type=int, default=None,
                    help="staging rows for in-kernel refill (default: "
                         "scheduler auto — min(slots, max(8, 3·slots/8)) for multi-step "
                         "ticks; 0 disables)")
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
    from indextts_tpu.serve.scheduler import ContinuousBatcher

    cfg = GPTConfig()
    params = jax.jit(lambda k: uv.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    params = jax.jit(lambda p: quant.quantize_gpt_params(
        p, bits=args.bits,
        int4_layout="shared" if args.bits == 4 else "fused"))(params)
    jax.block_until_ready(params)
    rng = np.random.default_rng(args.seed)
    cond = jnp.asarray(
        rng.standard_normal((1, cfg.condition_num_latent, cfg.model_dim)),
        jnp.bfloat16)

    def traffic():
        return [(rng.integers(2, cfg.number_text_tokens,
                              (int(rng.integers(20, 111)),)),
                 int(rng.integers(60, 201))) for _ in range(args.reqs)]

    def run_once(reqs) -> float:
        b = ContinuousBatcher(
            params, cfg, cond, num_slots=args.slots, max_text_width=128,
            max_new=200, kv_dtype=jnp.float8_e4m3fn,
            steps_per_tick=args.steps_per_tick, seed=args.seed,
            staging_rows=args.staging)
        ids = [b.submit(t, max_new=m) for t, m in reqs]
        t0 = time.perf_counter()
        results = b.run()
        dt = time.perf_counter() - t0
        total = sum(len(results[i]) + 1 for i in ids)  # +1: stop token step
        return total / dt, total, dt

    reqs = traffic()
    run_once(reqs)  # warm/compile (same shapes as the measured run)
    best = max(run_once(reqs) for _ in range(3))
    rate, total, dt = best
    print(f"[pool] {args.reqs} reqs, {args.slots} slots, "
          f"steps_per_tick={args.steps_per_tick}: {total} tokens in "
          f"{dt:.2f}s -> {rate:.0f} tok/s")


if __name__ == "__main__":
    main()
