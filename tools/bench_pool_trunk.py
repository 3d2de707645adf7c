"""Fused S-row pool trunk (ops/pallas/pool_trunk.py) vs the XLA pool step —
the VERDICT r4 #2 decision microbench.

Times `steps` decode steps under one jitted lax.scan (donated cache, one
fetch) for three implementations at the flagship 64-slot pool shape:

  xla-rows   gpt2.decode_step_rows (head-split cache — the production
             scheduler's step core today)
  xla-flat   gpt2.decode_step_rows_flat (flat [L,S,T,D] cache, XLA attn)
  fused      pool_trunk.fused_pool_step (one pallas_call per step)

  python tools/bench_pool_trunk.py [--slots 64] [--steps 32] [--t 768]
         [--bits 8] [--kv fp8]
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
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--t", type=int, default=768,
                    help="cache length (flagship pool: 763 → 768)")
    ap.add_argument("--bits", type=int, default=8, choices=[0, 8],
                    help="0 = bf16 weights, 8 = int8 weight-only")
    ap.add_argument("--kv", default="fp8", choices=["fp8", "bf16"])
    ap.add_argument("--impl", default="all",
                    choices=["all", "xla-rows", "xla-flat", "fused"])
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_bench"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from indextts_tpu.config import GPTConfig
    from indextts_tpu.models import gpt2
    from indextts_tpu.models import unified_voice as uv
    from indextts_tpu.ops import quantization as quant
    from indextts_tpu.ops.pallas import pool_trunk as pt

    cfg = GPTConfig()
    size = uv.trunk_size(cfg)
    S, T, D, L = args.slots, args.t, cfg.model_dim, cfg.layers
    kv_dtype = jnp.float8_e4m3fn if args.kv == "fp8" else jnp.bfloat16

    full = jax.jit(lambda k: uv.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    if args.bits == 8:
        full = jax.jit(lambda p: quant.quantize_gpt_params(p, bits=8))(full)
    params = full["gpt"]
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    # 5 chained calls advance pos by 5*steps — keep every write in range.
    # Host copies only: every device array is minted fresh per impl because
    # the donated carry consumes it.
    pos_np = rng.integers(min(200, T - 6 * args.steps - 3),
                          T - 6 * args.steps - 2, (S,)).astype(np.int32)
    mask_np = np.zeros((S, T), np.int32)
    for s in range(S):
        mask_np[s, : int(pos_np[s]) + 1] = 1
    hid_np = rng.standard_normal((S, D))

    def common_init():
        return (jnp.asarray(pos_np), jnp.asarray(mask_np),
                jnp.asarray(hid_np, jnp.bfloat16))

    def step_flat(params, carry, _, fused: bool):
        k_all, v_all, pos, mask, hid = carry
        rows = jnp.arange(S)
        mask = mask.at[rows, pos].set(1)
        if fused:
            x, k_rows, v_rows = pt.fused_pool_step(
                params, hid, k_all, v_all, pos, mask, cfg.heads)
            k_all = k_all.at[:, rows, pos, :].set(k_rows)
            v_all = v_all.at[:, rows, pos, :].set(v_rows)
            out = gpt2.layer_norm(x[:, None, :], params["ln_f"]["scale"],
                                  params["ln_f"]["bias"])
        else:
            out, k_all, v_all = gpt2.decode_step_rows_flat(
                params, hid[:, None, :], k_all, v_all, pos, mask, size)
        return (k_all, v_all, pos + 1, mask, out[:, 0].astype(jnp.bfloat16)
                ), out[:, 0, :1]

    def step_rows(params, carry, _):
        cache, pos, mask, hid = carry
        rows = jnp.arange(S)
        mask = mask.at[rows, pos].set(1)
        out, cache = gpt2.decode_step_rows(
            params, hid[:, None, :], cache, pos, mask, size)
        return (cache, pos + 1, mask, out[:, 0].astype(jnp.bfloat16)
                ), out[:, 0, :1]

    import functools

    def run(label, scan_fn, init):
        # params are an ARGUMENT, not a closure: closed-over arrays embed
        # as HLO constants and blow past the remote-compile body limit
        # (HTTP 413) at flagship size.  The carry is DONATED (production
        # pools donate their state) — without it the in+out KV caches
        # double the ~3 GB fp8 footprint and the chip OOMs; each timed
        # call chains the previous call's carry.
        f = jax.jit(lambda p, c: jax.lax.scan(
            functools.partial(scan_fn, p), c, None, length=args.steps),
            donate_argnums=(1,))
        t0 = time.perf_counter()
        state, toks = f(params, init)
        _ = np.asarray(toks)
        print(f"  [{label}] compile+first: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            state, toks = f(params, state)
            _ = np.asarray(toks)  # host fetch = real sync on the tunnel
            best = min(best, time.perf_counter() - t0)
        ms = best / args.steps * 1e3
        print(f"[pool-trunk] {label}: {ms:.3f} ms/step at S={S} T={T} "
              f"bits={args.bits} kv={args.kv} "
              f"({S / ms * 1e3:.0f} slot-tokens/s)")
        return ms

    if args.impl in ("all", "xla-rows"):
        cache = gpt2.KVCache(
            jnp.asarray(rng.standard_normal(
                (L, S, cfg.heads, T, D // cfg.heads)), kv_dtype),
            jnp.asarray(rng.standard_normal(
                (L, S, cfg.heads, T, D // cfg.heads)), kv_dtype))
        run("xla-rows", step_rows, (cache, *common_init()))
        del cache

    def flat_init():  # fresh per impl — the donated carry is consumed
        return (jnp.asarray(rng.standard_normal((L, S, T, D)), kv_dtype),
                jnp.asarray(rng.standard_normal((L, S, T, D)), kv_dtype),
                *common_init())

    if args.impl in ("all", "xla-flat"):
        run("xla-flat", lambda p, c, x: step_flat(p, c, x, fused=False),
            flat_init())
    if args.impl in ("all", "fused"):
        run("fused", lambda p, c, x: step_flat(p, c, x, fused=True),
            flat_init())


if __name__ == "__main__":
    main()
