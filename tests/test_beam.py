"""Beam decode: correctness properties on the tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_unified_voice import CFG
from indextts_tpu.models import unified_voice as uv


@pytest.fixture(scope="module")
def params():
    return uv.init_params(jax.random.PRNGKey(0), CFG)


def _decode(params, texts, **kw):
    prep = uv.prepare_text_prompt(texts, CFG.start_text_token, CFG.stop_text_token)
    return uv.inference_speech_beam(
        params, CFG, kw.pop("cond"), jnp.asarray(prep.text_tokens),
        jnp.asarray(prep.attn_text), kw.pop("rng", jax.random.PRNGKey(0)),
        cache_dtype=jnp.float32, **kw)


def _seq_logprob(params, cond, text, codes):
    """Cumulative greedy-path log-prob of a generated sequence under the
    model (teacher-forced) — the quantity beam search maximises."""
    prep = uv.prepare_text_prompt([text], CFG.start_text_token, CFG.stop_text_token)
    r = uv.inference_speech(
        params, CFG, cond, jnp.asarray(prep.text_tokens),
        jnp.asarray(prep.attn_text), jax.random.PRNGKey(0), max_new=len(codes),
        do_sample=False, repetition_penalty=1.0, cache_dtype=jnp.float32)
    return r


def test_beam_runs_and_shapes(params):
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t = rng.integers(2, 40, (6,))
    r = _decode(params, [t], cond=cond, max_new=16, num_beams=3,
                do_sample=False, repetition_penalty=1.0, top_k=0, top_p=1.0)
    assert r.codes.shape == (1, 16)
    assert 0 <= int(r.lengths[0]) <= 16


def test_beam1_greedy_equals_greedy(params):
    """num_beams=1 deterministic beam search must reduce to greedy."""
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t = rng.integers(2, 40, (5,))
    rb = _decode(params, [t], cond=cond, max_new=12, num_beams=1,
                 do_sample=False, repetition_penalty=1.0, top_k=0, top_p=1.0)
    prep = uv.prepare_text_prompt([t], CFG.start_text_token, CFG.stop_text_token)
    rg = uv.inference_speech(
        params, CFG, cond, jnp.asarray(prep.text_tokens),
        jnp.asarray(prep.attn_text), jax.random.PRNGKey(0), max_new=12,
        do_sample=False, repetition_penalty=1.0, cache_dtype=jnp.float32)
    n = min(int(rb.lengths[0]), int(rg.lengths[0]))
    np.testing.assert_array_equal(np.asarray(rb.codes[0, :n]),
                                  np.asarray(rg.codes[0, :n]))


def test_beam_sample_reproducible(params):
    rng = np.random.default_rng(2)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t = rng.integers(2, 40, (5,))
    kw = dict(cond=cond, max_new=10, num_beams=3, do_sample=True,
              repetition_penalty=2.0, top_k=10, top_p=0.9)
    r1 = _decode(params, [t], rng=jax.random.PRNGKey(5), **kw)
    r2 = _decode(params, [t], rng=jax.random.PRNGKey(5), **kw)
    np.testing.assert_array_equal(np.asarray(r1.codes), np.asarray(r2.codes))


def test_beam_batched(params):
    rng = np.random.default_rng(3)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    t1 = rng.integers(2, 40, (7,))
    t2 = rng.integers(2, 40, (4,))
    r = _decode(params, [t1, t2], cond=cond, max_new=12, num_beams=2,
                do_sample=False, repetition_penalty=1.0, top_k=0, top_p=1.0)
    assert r.codes.shape == (2, 12)
