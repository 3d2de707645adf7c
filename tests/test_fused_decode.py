"""Fused decode-trunk Pallas kernel (interpret mode): exactness vs the XLA
decode step, bf16 and int8, inside and outside the full decode loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_unified_voice import CFG
from indextts_tpu.models import gpt2, unified_voice as uv
from indextts_tpu.ops import quantization as quant
from indextts_tpu.ops.pallas.decode_layer import fused_decode_trunk

SIZE = gpt2.GPT2Size(layers=3, dim=64, heads=4)


def _setup(params):
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((1, 6, 64)).astype(np.float32))
    mask = jnp.ones((1, 6), jnp.int32)
    _, cache = gpt2.prefill(params, emb, mask, SIZE, 16)
    full_mask = jnp.zeros((1, 16), jnp.int32).at[:, :7].set(1)
    tok = jnp.asarray(rng.standard_normal((1, 1, 64)).astype(np.float32))
    return tok, cache, full_mask


def test_fused_matches_xla_step():
    params = gpt2.init_gpt2_params(jax.random.PRNGKey(0), SIZE)
    tok, cache, full_mask = _setup(params)
    ref, ref_cache = gpt2.decode_step(params, tok, cache, jnp.int32(6), full_mask, SIZE)
    x, nc = fused_decode_trunk(params, tok, cache, jnp.int32(6), full_mask,
                               heads=4, n_chunks=4, interpret=True)
    x_ln = gpt2.layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"])
    np.testing.assert_allclose(np.asarray(x_ln), np.asarray(ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nc.k), np.asarray(ref_cache.k), atol=1e-6)


def test_fused_int8_matches_xla_step():
    full = {"blocks": gpt2.init_gpt2_params(jax.random.PRNGKey(1), SIZE)["blocks"],
            "ln_f": gpt2.init_gpt2_params(jax.random.PRNGKey(1), SIZE)["ln_f"]}
    qtree = quant.quantize_gpt_params({"gpt": full}, bits=8, dtype=jnp.float32)
    params = qtree["gpt"]
    tok, cache, full_mask = _setup(full)
    ref, _ = gpt2.decode_step(params, tok, cache, jnp.int32(6), full_mask, SIZE)
    x, _ = fused_decode_trunk(params, tok, cache, jnp.int32(6), full_mask,
                              heads=4, n_chunks=4, interpret=True)
    x_ln = gpt2.layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"])
    np.testing.assert_allclose(np.asarray(x_ln), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_int4_matches_xla_step():
    """Packed-int4 kernel path == the XLA _mm q4 path, bit-close."""
    full = gpt2.init_gpt2_params(jax.random.PRNGKey(2), SIZE)
    qtree = quant.quantize_gpt_params({"gpt": full}, bits=4, dtype=jnp.float32)
    params = qtree["gpt"]
    tok, cache, full_mask = _setup(full)
    ref, ref_cache = gpt2.decode_step(params, tok, cache, jnp.int32(6), full_mask, SIZE)
    x, nc = fused_decode_trunk(params, tok, cache, jnp.int32(6), full_mask,
                               heads=4, n_chunks=4, interpret=True)
    x_ln = gpt2.layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"])
    np.testing.assert_allclose(np.asarray(x_ln), np.asarray(ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nc.k), np.asarray(ref_cache.k), atol=1e-6)


def test_fused_decode_loop_greedy_equal():
    params = uv.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    prep = uv.prepare_text_prompt([rng.integers(2, 40, (6,))], 0, 1)
    kw = dict(max_new=10, do_sample=False, repetition_penalty=1.0,
              cache_dtype=jnp.float32)
    r1 = uv.inference_speech(params, CFG, cond, jnp.asarray(prep.text_tokens),
                             jnp.asarray(prep.attn_text), jax.random.PRNGKey(0), **kw)
    r2 = uv.inference_speech(params, CFG, cond, jnp.asarray(prep.text_tokens),
                             jnp.asarray(prep.attn_text), jax.random.PRNGKey(0),
                             use_fused_trunk=True, **kw)
    np.testing.assert_array_equal(np.asarray(r1.codes), np.asarray(r2.codes))
