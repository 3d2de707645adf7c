"""Benchmark: GPT autoregressive decode throughput on the flagship model.

Prints ONE JSON line:
  {"metric": "gpt_decode_tokens_per_sec_per_chip", "value": N,
   "unit": "tokens/s", "vs_baseline": N / 1000}

Baseline: BASELINE.md rebuild target — ≥1,000 decode tokens/s/chip on
TPU v5e (the reference publishes no absolute numbers; RTF ≈ 23.4 ÷ tok/s,
so 1k tok/s ⇒ RTF ≈ 0.023 for the GPT stage).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="decode batch size; 0 = measure 1 (latency) and "
                         "8/16/32/64/128/256 (serving; 256 is the ceiling "
                         "probe — the headline is the best; per-stream rate "
                         "at 128 is still ~5x realtime)")
    ap.add_argument("--max-new", type=int, default=200)
    args = ap.parse_args()

    import jax

    # persistent compile cache: the decode program is a large while_loop and
    # cold-compiles in minutes; cache makes reruns start in seconds
    import os

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
    # one jitted program for init: the tunnel-attached chip has high
    # per-dispatch latency, so eager per-tensor init is pathological
    params = jax.jit(lambda k: uv.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    params_q = jax.jit(lambda p: quant.quantize_gpt_params(p, bits=8))(params)
    jax.block_until_ready(params_q)
    params_q4 = jax.jit(lambda p: quant.quantize_gpt_params(p, bits=4))(params)
    jax.block_until_ready(params_q4)
    # batched int4 layout: shared-scale pack, nativized to jnp.int4 inside
    # the decode program (quantization.quantize_int4_shared)
    params_q4s = jax.jit(lambda p: quant.quantize_gpt_params(
        p, bits=4, int4_layout="shared"))(params)
    jax.block_until_ready(params_q4s)

    text_len = 60
    max_new = args.max_new
    rng = np.random.default_rng(0)
    cond = jnp.asarray(
        rng.standard_normal((1, cfg.condition_num_latent, cfg.model_dim)),
        jnp.bfloat16)

    def measure(p, label, B, fused=False, kv=None):
        texts = [rng.integers(2, cfg.number_text_tokens, (text_len,))
                 for _ in range(B)]
        prep = uv.prepare_text_prompt(texts, cfg.start_text_token,
                                       cfg.stop_text_token)
        tokens = jnp.asarray(prep.text_tokens)
        mask = jnp.asarray(prep.attn_text)

        def run(key):
            return uv.inference_speech(
                p, cfg, cond, tokens, mask, key, max_new=max_new,
                temperature=1.0, top_k=30, top_p=0.8,
                repetition_penalty=10.0, do_sample=True,
                use_fused_trunk=fused, kv_dtype=kv)

        # warmup/compile — fetch a value to host: on the tunnel-attached
        # backend only a real transfer guarantees completion
        for i in range(2):
            _ = np.asarray(run(jax.random.PRNGKey(i)).lengths)
        n_iters = 5
        total_tokens = 0
        t0 = time.perf_counter()
        for i in range(n_iters):
            r = run(jax.random.PRNGKey(i + 2))
            steps = np.minimum(np.asarray(r.lengths) + 1, max_new)
            total_tokens += int(steps.sum())
        dt = time.perf_counter() - t0
        rate = total_tokens / dt
        print(f"[bench:{label} B={B}] {total_tokens} tokens in {dt:.2f}s "
              f"→ {rate:.1f} tok/s", file=sys.stderr)
        return rate

    def measure_beam(p, label, num_beams=3, kv=None):
        """Output tok/s at the reference DEFAULT decode settings
        (num_beams=3, infer.py:628-635)."""
        texts = [rng.integers(2, cfg.number_text_tokens, (text_len,))]
        prep = uv.prepare_text_prompt(texts, cfg.start_text_token,
                                       cfg.stop_text_token)
        tokens = jnp.asarray(prep.text_tokens)
        mask = jnp.asarray(prep.attn_text)

        def run(key):
            return uv.inference_speech_beam(
                p, cfg, cond, tokens, mask, key, max_new=max_new,
                num_beams=num_beams, temperature=1.0, top_k=30, top_p=0.8,
                repetition_penalty=10.0, do_sample=True, kv_dtype=kv)

        for i in range(2):
            _ = np.asarray(run(jax.random.PRNGKey(i)).lengths)
        n_iters = 5
        total = 0
        t0 = time.perf_counter()
        for i in range(n_iters):
            r = run(jax.random.PRNGKey(i + 2))
            total += int(np.minimum(np.asarray(r.lengths) + 1, max_new).sum())
        dt = time.perf_counter() - t0
        rate = total / dt
        print(f"[bench:{label} beams={num_beams}] {total} output tokens in "
              f"{dt:.2f}s → {rate:.1f} out-tok/s (RTF {23.4 / rate:.4f})",
              file=sys.stderr)
        return rate

    def safe(fn, *a, **kw):
        """One tier's failure (e.g. a Mosaic VMEM regression on a new
        backend) must not kill the driver's JSON line — log and move on."""
        try:
            return fn(*a, **kw)
        except Exception as e:  # noqa: BLE001
            label = a[1] if len(a) > 1 else kw.get("label", "?")
            print(f"[bench:{label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            return 0.0

    FP8 = jnp.float8_e4m3fn
    # throughput saturates ~B=128-256 (measured v5e: 15.5k @128, 15.9k @256
    # int4shared+fp8kv); past 128 the per-stream rate drops below ~5x
    # realtime, so 256 is the headline ceiling probe, 128 the serving point
    batches = [args.batch] if args.batch else [1, 8, 16, 32, 64, 128, 256]
    best = 0.0
    for B in batches:
        if B <= 8:
            # full precision-tier sweep at the latency (1) and default
            # serving (8) batch; at 16 the weight stream is already
            # amortized and only the quantized tiers are competitive
            safe(measure, params, "bf16", B)
            best = max(best, safe(measure, params_q, "int8-weights", B))
        best = max(best, safe(measure, params_q, "int8+fp8kv", B, kv=FP8))
        if B > 1:
            best = max(best, safe(measure, params_q4s, "int4shared+fp8kv",
                                  B, kv=FP8))
        if B == 1 and jax.default_backend() == "tpu":
            safe(measure, params, "bf16-fused-trunk", B, fused=True)
            best = max(best, safe(measure, params_q, "int8-fused-trunk", B,
                                  fused=True))
            best = max(best, safe(measure, params_q4, "int4-fused-trunk", B,
                                  fused=True))
            safe(measure_beam, params_q, "int8-beam+fp8kv", kv=FP8)
            safe(measure_beam, params_q4s, "int4s-beam+fp8kv", kv=FP8)
    tok_per_sec = best
    gpt_rtf = 23.4 / max(tok_per_sec, 1e-9)  # codes/sec of audio ÷ decode rate
    print(f"[bench] best config implies GPT-stage RTF={gpt_rtf:.4f} "
          f"(prompt={text_len})", file=sys.stderr)
    print(json.dumps({
        "metric": "gpt_decode_tokens_per_sec_per_chip",
        "value": round(tok_per_sec, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_per_sec / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
