"""UnifiedVoice core invariants on a tiny config.

The padding/batching invariance test is the rebuild of the reference's only
correctness test (tests/padding_test.py): greedy decode must be bit-identical
across left-padding and batch composition.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.config import ConditionModuleConfig, GPTConfig
from indextts_tpu.models import unified_voice as uv

CFG = GPTConfig(
    model_dim=64,
    layers=2,
    heads=4,
    max_mel_tokens=48,
    max_text_tokens=30,
    number_text_tokens=40,
    number_mel_codes=50,
    start_mel_token=46,
    stop_mel_token=47,
    condition_module=ConditionModuleConfig(
        output_size=32, linear_units=64, attention_heads=4, num_blocks=2,
        perceiver_mult=2,
    ),
)


@pytest.fixture(scope="module")
def params():
    return uv.init_params(jax.random.PRNGKey(0), CFG)


def test_get_conditioning_shape(params):
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 100, 40)), jnp.float32)
    lengths = jnp.asarray([40, 25])
    conds = uv.get_conditioning(params, CFG, mel, lengths)
    assert conds.shape == (2, CFG.condition_num_latent, CFG.model_dim)
    assert np.isfinite(np.asarray(conds)).all()


def test_conditioning_ignores_padding(params):
    """Padded frames must not influence the conditioning latents."""
    rng = np.random.default_rng(1)
    base = rng.standard_normal((1, 100, 30)).astype(np.float32)
    padded = np.concatenate([base, rng.standard_normal((1, 100, 10)).astype(np.float32) * 50], axis=2)
    c1 = np.asarray(uv.get_conditioning(params, CFG, jnp.asarray(base), jnp.asarray([30])))
    c2 = np.asarray(uv.get_conditioning(params, CFG, jnp.asarray(padded), jnp.asarray([30])))
    np.testing.assert_allclose(c1, c2, rtol=1e-4, atol=1e-5)


def test_train_forward_losses(params):
    rng = np.random.default_rng(2)
    B, Tt, Tm = 3, 8, 12
    cond = jnp.asarray(rng.standard_normal((B, 32, CFG.model_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(2, 40, (B, Tt)), jnp.int32)
    mel = jnp.asarray(rng.integers(0, 46, (B, Tm)), jnp.int32)
    tl = jnp.asarray([8, 5, 3])
    ml = jnp.asarray([12, 9, 6])
    out = uv.train_forward(params, CFG, cond, text, tl, mel, ml)
    assert np.isfinite(float(out["loss_text"]))
    assert np.isfinite(float(out["loss_mel"]))
    # random-init loss should be near log(vocab)
    assert 2.0 < float(out["loss_mel"]) < 8.0
    accs = uv.top_k_accuracy(out["mel_logits"], out["mel_targets"], out["mel_mask"])
    assert 0.0 <= float(accs["acc_1"]) <= float(accs["acc_10"]) <= float(accs["acc_20"]) <= 100.0


def test_train_forward_padding_invariance(params):
    """Batch padding must not change per-sample losses: compare loss of a
    single sample vs the same sample inside a padded batch."""
    rng = np.random.default_rng(3)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(2, 40, (1, 6)), jnp.int32)
    mel = jnp.asarray(rng.integers(0, 46, (1, 10)), jnp.int32)
    out1 = uv.train_forward(params, CFG, cond, text, jnp.asarray([6]), mel, jnp.asarray([10]))
    # pad to longer buffers
    text_p = jnp.pad(text, ((0, 0), (0, 5)))
    mel_p = jnp.pad(mel, ((0, 0), (0, 7)))
    out2 = uv.train_forward(params, CFG, cond, text_p, jnp.asarray([6]), mel_p, jnp.asarray([10]))
    np.testing.assert_allclose(float(out1["loss_mel"]), float(out2["loss_mel"]), rtol=1e-4)
    np.testing.assert_allclose(float(out1["loss_text"]), float(out2["loss_text"]), rtol=1e-4)


def test_latent_forward_shape(params):
    rng = np.random.default_rng(4)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(2, 40, (1, 7)), jnp.int32)
    codes = jnp.asarray(rng.integers(0, 46, (1, 15)), jnp.int32)
    lat = uv.latent_forward(params, CFG, cond, text, jnp.asarray([7]), codes, jnp.asarray([15]))
    assert lat.shape == (1, 15, CFG.model_dim)


def greedy_decode(params, cond, texts, max_new=20):
    prep = uv.prepare_text_prompt(texts, CFG.start_text_token, CFG.stop_text_token)
    return uv.inference_speech(
        params, CFG, cond, jnp.asarray(prep.text_tokens), jnp.asarray(prep.attn_text),
        jax.random.PRNGKey(7), max_new=max_new, do_sample=False,
        repetition_penalty=1.0, cache_dtype=jnp.float32,
    )


def test_decode_padding_batching_invariance(params):
    """Rebuild of reference tests/padding_test.py:34-97: batched decode with
    left padding == per-sample decode, greedy."""
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t1 = rng.integers(2, 40, (9,))
    t2 = rng.integers(2, 40, (4,))

    r1 = greedy_decode(params, cond, [t1])
    r2 = greedy_decode(params, cond, [t2])
    rb = greedy_decode(params, cond, [t1, t2])

    n1, n2 = int(r1.lengths[0]), int(r2.lengths[0])
    nb1, nb2 = int(rb.lengths[0]), int(rb.lengths[1])
    assert n1 == nb1
    assert n2 == nb2
    np.testing.assert_array_equal(np.asarray(r1.codes[0, :n1]), np.asarray(rb.codes[0, :nb1]))
    np.testing.assert_array_equal(np.asarray(r2.codes[0, :n2]), np.asarray(rb.codes[1, :nb2]))


def test_decode_with_bos_eos_invariance(params):
    """Adding start/stop tokens to the input text must not change the output
    (prepare strips them — gpt/model.py:631-634)."""
    rng = np.random.default_rng(6)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t = rng.integers(2, 40, (6,))
    t_wrapped = np.concatenate([[CFG.start_text_token], t, [CFG.stop_text_token]])
    r1 = greedy_decode(params, cond, [t])
    r2 = greedy_decode(params, cond, [t_wrapped])
    np.testing.assert_array_equal(np.asarray(r1.codes), np.asarray(r2.codes))


def test_cfg_guided_decode(params):
    """Classifier-free guidance invariants (the reference documents
    cfg_scale, config.yaml:270, but never implements it at inference):

    1. with ZERO conditioning the guided rows equal the conditioned rows,
       so ANY cfg_scale must reproduce the unguided decode bit-exactly;
    2. with real conditioning, guidance must change the trajectory;
    3. batched guided decode matches per-sample guided decode."""
    rng = np.random.default_rng(11)
    zero_cond = jnp.zeros((1, 32, CFG.model_dim), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t1 = rng.integers(2, 40, (8,))
    t2 = rng.integers(2, 40, (5,))

    def dec(c, texts, scale):
        prep = uv.prepare_text_prompt(texts, CFG.start_text_token,
                                      CFG.stop_text_token)
        return uv.inference_speech(
            params, CFG, c, jnp.asarray(prep.text_tokens),
            jnp.asarray(prep.attn_text), jax.random.PRNGKey(7), max_new=16,
            do_sample=False, repetition_penalty=1.0,
            cache_dtype=jnp.float32, cfg_scale=scale)

    base = dec(zero_cond, [t1], 1.0)
    guided_null = dec(zero_cond, [t1], 2.5)
    np.testing.assert_array_equal(np.asarray(base.codes),
                                  np.asarray(guided_null.codes))

    plain = dec(cond, [t1], 1.0)
    guided = dec(cond, [t1], 4.0)
    assert not np.array_equal(np.asarray(plain.codes), np.asarray(guided.codes))

    gb = dec(cond, [t1, t2], 3.0)
    for i, t in enumerate([t1, t2]):
        gs = dec(cond, [t], 3.0)
        n = int(gs.lengths[0])
        assert int(gb.lengths[i]) == n
        np.testing.assert_array_equal(np.asarray(gb.codes[i, :n]),
                                      np.asarray(gs.codes[0, :n]))


def test_sampling_reproducible(params):
    rng = np.random.default_rng(8)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t = rng.integers(2, 40, (5,))
    prep = uv.prepare_text_prompt([t], CFG.start_text_token, CFG.stop_text_token)
    kwargs = dict(max_new=16, do_sample=True, temperature=1.0, top_k=10,
                  top_p=0.9, repetition_penalty=2.0, cache_dtype=jnp.float32)
    r1 = uv.inference_speech(params, CFG, cond, jnp.asarray(prep.text_tokens),
                             jnp.asarray(prep.attn_text), jax.random.PRNGKey(3), **kwargs)
    r2 = uv.inference_speech(params, CFG, cond, jnp.asarray(prep.text_tokens),
                             jnp.asarray(prep.attn_text), jax.random.PRNGKey(3), **kwargs)
    np.testing.assert_array_equal(np.asarray(r1.codes), np.asarray(r2.codes))


def test_latent_forward_batch_invariance(params):
    """Batched right-padded latent re-forward must equal per-sample exact
    runs (the engine batches per bucket; the reference runs B=1)."""
    rng = np.random.default_rng(9)
    cond = jnp.asarray(rng.standard_normal((2, 32, CFG.model_dim)), jnp.float32)
    t1, t2 = rng.integers(2, 40, (7,)), rng.integers(2, 40, (4,))
    c1, c2 = rng.integers(0, 46, (12,)), rng.integers(0, 46, (8,))

    lat1 = uv.latent_forward(params, CFG, cond[:1], jnp.asarray(t1[None]),
                             jnp.asarray([7]), jnp.asarray(c1[None]), jnp.asarray([12]))
    lat2 = uv.latent_forward(params, CFG, cond[1:], jnp.asarray(t2[None]),
                             jnp.asarray([4]), jnp.asarray(c2[None]), jnp.asarray([8]))

    text_b = np.zeros((2, 7), np.int32)
    text_b[0] = t1
    text_b[1, :4] = t2
    codes_b = np.full((2, 12), CFG.stop_mel_token, np.int32)
    codes_b[0] = c1
    codes_b[1, :8] = c2
    lat_b = uv.latent_forward(params, CFG, cond, jnp.asarray(text_b),
                              jnp.asarray([7, 4]), jnp.asarray(codes_b),
                              jnp.asarray([12, 8]))
    np.testing.assert_allclose(np.asarray(lat_b[0, :12]), np.asarray(lat1[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lat_b[1, :8]), np.asarray(lat2[0]),
                               rtol=1e-4, atol=1e-5)


def test_fp8_kv_cache_decode():
    """The fp8 KV tier must decode greedily to (near-)identical tokens as a
    full-precision cache on the tiny model, and run end to end."""
    import jax

    params = uv.init_params(jax.random.PRNGKey(3), CFG)
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t = rng.integers(2, 40, (6,))
    prep = uv.prepare_text_prompt([t], CFG.start_text_token, CFG.stop_text_token)
    kw = dict(max_new=16, do_sample=False, repetition_penalty=1.0,
              cache_dtype=jnp.float32)
    r32 = uv.inference_speech(params, CFG, cond, jnp.asarray(prep.text_tokens),
                              jnp.asarray(prep.attn_text), jax.random.PRNGKey(0),
                              **kw)
    r8 = uv.inference_speech(params, CFG, cond, jnp.asarray(prep.text_tokens),
                             jnp.asarray(prep.attn_text), jax.random.PRNGKey(0),
                             kv_dtype=jnp.float8_e4m3fn, **kw)
    a, b = np.asarray(r32.codes[0]), np.asarray(r8.codes[0])
    n = min(int(r32.lengths[0]), int(r8.lengths[0]))
    # random tiny models have near-uniform logits, so allow a small number
    # of divergent positions from fp8 quantisation noise
    agree = float(np.mean(a[:n] == b[:n])) if n else 1.0
    assert agree >= 0.75, (agree, a[:n], b[:n])


def test_float_sampling_knobs_do_not_recompile(params):
    """temperature/top_p/repetition_penalty/typical_mass/cfg_scale/
    length_penalty are TRACED: changing a value must reuse the compiled
    decode program (a recompile costs ~5 min over the remote-compile
    tunnel; a WebUI slider can never be a static key — r3 review)."""
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.standard_normal((1, 32, 64)), jnp.float32)
    toks = jnp.asarray(rng.integers(2, 40, (1, 6)), jnp.int32)
    mask = jnp.ones((1, 6), jnp.int32)

    base = uv._inference_speech_impl._cache_size()
    for t, p, r in [(1.0, 0.8, 10.0), (0.3, 0.95, 2.5), (1.7, 0.5, 1.0)]:
        uv.inference_speech(params, CFG, cond, toks, mask,
                            jax.random.PRNGKey(0), max_new=8,
                            temperature=t, top_p=p, repetition_penalty=r,
                            cache_dtype=jnp.float32)
    assert uv._inference_speech_impl._cache_size() == base + 1
    # guidance values share one program too (only on/off is static)
    for s in (1.5, 2.0, 3.3):
        uv.inference_speech(params, CFG, cond, toks, mask,
                            jax.random.PRNGKey(0), max_new=8, cfg_scale=s,
                            cache_dtype=jnp.float32)
    assert uv._inference_speech_impl._cache_size() == base + 2

    base_beam = uv.inference_speech_beam._cache_size()
    for lp, t in [(0.0, 1.0), (1.1, 0.7), (-0.5, 1.3)]:
        uv.inference_speech_beam(params, CFG, cond, toks, mask,
                                 jax.random.PRNGKey(0), max_new=8,
                                 num_beams=2, length_penalty=lp,
                                 temperature=t, cache_dtype=jnp.float32)
    assert uv.inference_speech_beam._cache_size() == base_beam + 1
