"""int8/int4 weight-only quantization: structure, accuracy, forward compat."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.models import gpt2
from indextts_tpu.ops import quantization as q

SIZE = gpt2.GPT2Size(layers=2, dim=64, heads=4)


def test_quantize_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 64, 128)).astype(np.float32) * 0.02)
    qw = q.quantize_int(w, bits=8, reduce_axes=(1,))
    assert qw["q"].dtype == jnp.int8
    assert qw["s"].shape == (3, 1, 128)
    back = q.dequantize(qw, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert err < 0.01  # int8 grid: < 1% of range


def test_quantized_trunk_forward_close():
    import tests.test_unified_voice as tu
    from indextts_tpu.models import unified_voice as uv

    params = uv.init_params(jax.random.PRNGKey(0), tu.CFG)
    qparams = q.quantize_gpt_params(params, bits=8, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.standard_normal((1, 32, tu.CFG.model_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(2, 40, (1, 6)), jnp.int32)
    mel = jnp.asarray(rng.integers(0, 46, (1, 10)), jnp.int32)
    out = uv.train_forward(params, tu.CFG, cond, text, jnp.asarray([6]), mel, jnp.asarray([10]))
    qout = uv.train_forward(qparams, tu.CFG, cond, text, jnp.asarray([6]), mel, jnp.asarray([10]))
    # quantisation perturbs, but losses stay close at int8
    assert abs(float(out["loss_mel"]) - float(qout["loss_mel"])) < 0.1
    assert abs(float(out["loss_text"]) - float(qout["loss_text"])) < 0.1


def test_quantized_decode_runs():
    import tests.test_unified_voice as tu
    from indextts_tpu.models import unified_voice as uv

    params = uv.init_params(jax.random.PRNGKey(0), tu.CFG)
    qparams = q.quantize_gpt_params(params, bits=8, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    cond = jnp.asarray(rng.standard_normal((1, 32, tu.CFG.model_dim)), jnp.float32)
    t = rng.integers(2, 40, (5,))
    prep = uv.prepare_text_prompt([t], tu.CFG.start_text_token, tu.CFG.stop_text_token)
    r = uv.inference_speech(qparams, tu.CFG, cond, jnp.asarray(prep.text_tokens),
                            jnp.asarray(prep.attn_text), jax.random.PRNGKey(0),
                            max_new=8, do_sample=False, repetition_penalty=1.0,
                            cache_dtype=jnp.float32)
    assert r.codes.shape == (1, 8)


def test_int4_grid():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    qw = q.quantize_int(w, bits=4, reduce_axes=(0,))
    vals = np.unique(np.asarray(qw["q"]))
    assert vals.min() >= -8 and vals.max() <= 7


def test_int4_packed_roundtrip():
    """Pack → dequantize reproduces the per-(chunk-half, channel) int4 grid:
    error ≤ half a grid step everywhere."""
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal((3, 256, 64)).astype(np.float32))
    qw = q.quantize_int4_packed(w, k_axis=1, groups=4)
    assert qw["q4"].shape == (3, 128, 64) and qw["q4"].dtype == jnp.int8
    assert qw["s"].shape == (3, 8, 64)
    back = np.asarray(q.dequantize(qw, jnp.float32))
    # per-group step = amax/7; |w - deq| <= step/2
    wg = np.asarray(w).reshape(3, 4, 2, 32, 64)
    step = np.abs(wg).max(axis=3, keepdims=True) / 7.0
    err = np.abs(np.asarray(w).reshape(wg.shape) - back.reshape(wg.shape))
    assert (err <= step / 2 + 1e-6).all()


def test_int4_packed_mm_matches_dequant():
    """gpt2._mm on the packed dict == plain matmul on the dequantised w."""
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32) * 0.05)
    qw = q.quantize_int4_packed(w, k_axis=0, groups=4)
    x = jnp.asarray(rng.standard_normal((2, 3, 256)).astype(np.float32))
    got = gpt2._mm(x, qw)
    want = jnp.einsum("btk,kn->btn", x, q.dequantize(qw, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_int4_shared_roundtrip():
    """Shared-scale pack → dequantize reproduces the per-channel int4 grid
    (one scale over full K): error ≤ half a grid step everywhere."""
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((3, 256, 64)).astype(np.float32))
    qw = q.quantize_int4_shared(w)
    assert qw["q4s"].shape == (3, 128, 64) and qw["q4s"].dtype == jnp.int8
    assert qw["s"].shape == (3, 1, 64)
    back = np.asarray(q.dequantize(qw, jnp.float32))
    step = np.abs(np.asarray(w)).max(axis=1, keepdims=True) / 7.0
    assert (np.abs(np.asarray(w) - back) <= step / 2 + 1e-6).all()


def test_int4_shared_mm_and_nativize_match_dequant():
    """gpt2._mm on q4s == plain matmul on the dequantised weights, and the
    nativized jnp.int4 form produces the IDENTICAL result (same grid)."""
    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32) * 0.05)
    qw = q.quantize_int4_shared(w)
    x = jnp.asarray(rng.standard_normal((2, 3, 256)).astype(np.float32))
    want = jnp.einsum("btk,kn->btn", x, q.dequantize(qw, jnp.float32))
    got = gpt2._mm(x, qw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    qn = jax.jit(q.nativize_int4)(qw)
    assert qn["q4n"].dtype == jnp.int4 and qn["q4n"].shape == (256, 64)
    got_n = jax.jit(lambda x, w: gpt2._mm(x, w))(x, qn)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_int4_shared_decode_runs():
    """inference_speech with the shared-scale batched layout (exercises the
    in-program nativize at the top of the decode program)."""
    import tests.test_unified_voice as tu
    from indextts_tpu.models import unified_voice as uv

    params = uv.init_params(jax.random.PRNGKey(0), tu.CFG)
    qparams = q.quantize_gpt_params(params, bits=4, dtype=jnp.float32,
                                    int4_layout="shared")
    blk = qparams["gpt"]["blocks"]
    assert "q4s" in blk["attn"]["qkv_w"]
    assert blk["mlp"]["proj_w"]["s"].shape[1] == 1
    assert "q4s" in qparams["mel_head"]["kernel"]
    rng = np.random.default_rng(9)
    cond = jnp.asarray(rng.standard_normal((2, 32, tu.CFG.model_dim)), jnp.float32)
    t = [rng.integers(2, 40, (5,)), rng.integers(2, 40, (7,))]
    prep = uv.prepare_text_prompt(t, tu.CFG.start_text_token, tu.CFG.stop_text_token)
    r = uv.inference_speech(qparams, tu.CFG, cond, jnp.asarray(prep.text_tokens),
                            jnp.asarray(prep.attn_text), jax.random.PRNGKey(0),
                            max_new=8, do_sample=False, repetition_penalty=1.0,
                            cache_dtype=jnp.float32)
    assert r.codes.shape == (2, 8)


def test_int4_packed_trunk_forward_close():
    import tests.test_unified_voice as tu
    from indextts_tpu.models import unified_voice as uv

    params = uv.init_params(jax.random.PRNGKey(0), tu.CFG)
    qparams = q.quantize_gpt_params(params, bits=4, dtype=jnp.float32)
    # trunk leaves packed: half the K rows, 2G scale rows
    blk = qparams["gpt"]["blocks"]
    assert blk["attn"]["qkv_w"]["q4"].shape[1] == tu.CFG.model_dim // 2
    assert blk["mlp"]["proj_w"]["s"].shape[1] == 2 * q.MLP_PROJ_GROUPS
    rng = np.random.default_rng(6)
    cond = jnp.asarray(rng.standard_normal((1, 32, tu.CFG.model_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(2, 40, (1, 6)), jnp.int32)
    mel = jnp.asarray(rng.integers(0, 46, (1, 10)), jnp.int32)
    out = uv.train_forward(params, tu.CFG, cond, text, jnp.asarray([6]), mel, jnp.asarray([10]))
    qout = uv.train_forward(qparams, tu.CFG, cond, text, jnp.asarray([6]), mel, jnp.asarray([10]))
    # int4 grid is coarse; losses stay in the same neighbourhood
    assert abs(float(out["loss_mel"]) - float(qout["loss_mel"])) < 0.5
    assert np.isfinite(float(qout["loss_text"]))
