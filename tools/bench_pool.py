"""Continuous-batching pool throughput under mixed traffic.

Measures serve/scheduler.ContinuousBatcher steady-state output tokens/s
with the PARITY.md traffic mix (32 requests, 20-110 text tokens, 60-200
max_new, 8 slots, int8 weights, fp8 KV) — the serving-path counterpart of
bench.py's per-batch decode numbers.

  python tools/bench_pool.py [--slots 8] [--reqs 32] [--steps-per-tick 16]

`--e2e` measures the FULL serving path instead (VERDICT r4 #3): N client
threads drive `engine.pool_infer_stream` against one shared pool + drive
thread (exactly the `--continuous` server's architecture, minus the HTTP
socket) at the flagship GPT config with a realistic BigVGAN.  Reports
requests/s, per-request RTF p50/p95, time-to-first-audio p50/p95, and the
vocode+latent share of wall time — the codes-only number above excludes
the `_codes_to_wav` tail every real request pays.

  python tools/bench_pool.py --e2e [--clients 8] [--reqs 32] [--slots 8]
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
    ap.add_argument("--e2e", action="store_true",
                    help="measure full requests (pool decode + latent "
                         "re-forward + vocoder + WAV fetch) under "
                         "concurrent clients instead of codes-only")
    ap.add_argument("--clients", type=int, default=8,
                    help="--e2e: concurrent client threads")
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

    if args.e2e:
        return e2e_main(args)

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


def e2e_main(args) -> None:
    """Full-request serving benchmark: concurrent clients over one shared
    pool + drive thread (the `--continuous` server minus the HTTP socket).
    Every request pays the real tail — latent re-forward, vocoder, WAV
    fetch — so this is the number BASELINE config 5 is actually about."""
    import json
    import tempfile
    import threading
    import shutil

    import jax
    import jax.numpy as jnp

    from indextts_tpu import engine as engine_mod
    from indextts_tpu.config import Config

    d = tempfile.mkdtemp(prefix="bench_e2e_")
    cfg = Config()  # flagship defaults (24L/1280d GPT, full BigVGAN)
    cfg.save(os.path.join(d, "config.yaml"))
    shutil.copy("/root/reference/vocab.txt", os.path.join(d, "vocab.txt"))
    prompt = os.path.join(d, "prompt.wav")
    sr = 24000
    t = np.arange(sr * 3) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    from indextts_tpu.utils.audio import write_wav

    write_wav(prompt, wav, sr)

    prec = {"gpt": "int8" if args.bits == 8 else "int4", "vocoder": "bf16"}
    eng = engine_mod.IndexTTS(cfg_path=os.path.join(d, "config.yaml"),
                              model_dir=d, precision_config=prec)

    # cross-request vocode micro-batching, as the --continuous servers run
    eng.enable_vocode_batching()

    # wrap the coordinator's group tail (with batching on, EVERY pool tail
    # flows through it) to measure the vocode+latent share; each group call
    # counts the request rows it served
    tail = {"wall": 0.0, "calls": 0, "rows": 0}
    tail_lock = threading.Lock()
    orig_group = eng._codes_to_wav_group

    def timed_group(group):
        t0 = time.perf_counter()
        out = orig_group(group)
        with tail_lock:
            tail["wall"] += time.perf_counter() - t0
            tail["calls"] += 1
            tail["rows"] += sum(j.rows for j in group)
        return out

    eng._codes_to_wav_group = timed_group

    pool = eng.create_batcher(num_slots=args.slots,
                              steps_per_tick=args.steps_per_tick,
                              staging_rows=args.staging)
    # precompile EVERY admission/staging batch bucket before the drive
    # loop exists (r5: without this, concurrent bursts of 2-7 requests hit
    # lazy admit compiles mid-measurement — TTFA p50 was 23.7 s of compile
    # wait, not serving time)
    pool.warmup()
    stop = threading.Event()

    def drive():
        while not stop.is_set():
            live = pool.step()
            if live == 0 and not pool._queue:
                stop.wait(0.002)

    texts = [
        "大家好，我現在正在 bilibili 體驗 ai 科技，說實話，來之前我絕對想不到！"
        "AI技術已經發展到這樣匪夷所思的地步了！",
        "The weather is really nice today, perfect for studying at home. "
        "Thank you very much!",
        "親愛的夥伴們，大家好！每一次的努力都是為了更好的未來，"
        "要善於從失敗中汲取經驗，讓我們一起勇敢前行，邁向更加美好的明天！",
        "There is a vehicle arriving in dock number 7. Please stand clear "
        "of the doors while they are closing.",
    ]
    reqs = [(texts[i % len(texts)], i) for i in range(args.reqs)]
    results = []
    res_lock = threading.Lock()

    def client(worklist):
        for text, i in worklist:
            t0 = time.perf_counter()
            ttfa = None
            audio_s = 0.0
            chunks = eng.pool_infer_stream(pool, prompt, text, seed=i,
                                           max_mel_tokens=200)
            for csr, chunk in chunks:
                if ttfa is None:
                    ttfa = time.perf_counter() - t0
                audio_s += len(chunk) / csr
            wall = time.perf_counter() - t0
            with res_lock:
                results.append((wall, ttfa or wall, audio_s))

    # warm pass (latent/vocoder width compiles) — CONCURRENT like the
    # measured pass, so the traffic shape (burst sizes, overlap) matches
    drv = threading.Thread(target=drive, daemon=True)
    drv.start()
    warm = reqs[: min(2 * args.clients, len(reqs))]
    warm_lists = [warm[i :: args.clients] for i in range(args.clients)]
    warm_threads = [threading.Thread(target=client, args=(wl,))
                    for wl in warm_lists if wl]
    for th in warm_threads:
        th.start()
    for th in warm_threads:
        th.join()
    results.clear()
    tail["wall"], tail["calls"], tail["rows"] = 0.0, 0, 0

    # measured pass: clients share the worklist round-robin
    lists = [reqs[i::args.clients] for i in range(args.clients)]
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(wl,)) for wl in lists]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall_total = time.perf_counter() - t0
    stop.set()
    drv.join(10)

    walls = np.asarray([r[0] for r in results])
    ttfas = np.asarray([r[1] for r in results])
    audio = np.asarray([r[2] for r in results])
    rtf = walls / np.maximum(audio, 1e-9)
    out = {
        "metric": "e2e_pool_serving",
        "requests": len(results),
        "clients": args.clients,
        "slots": args.slots,
        "requests_per_sec": round(len(results) / wall_total, 3),
        "audio_sec_per_sec": round(float(audio.sum()) / wall_total, 2),
        "rtf_p50": round(float(np.percentile(rtf, 50)), 4),
        "rtf_p95": round(float(np.percentile(rtf, 95)), 4),
        "ttfa_p50_s": round(float(np.percentile(ttfas, 50)), 3),
        "ttfa_p95_s": round(float(np.percentile(ttfas, 95)), 3),
        "vocode_latent_share": round(tail["wall"] / wall_total, 3),
        "vocode_calls": tail["calls"],
        "vocode_rows": tail["rows"],
        "wall_s": round(wall_total, 2),
    }
    print(json.dumps(out, ensure_ascii=False))


if __name__ == "__main__":
    main()
