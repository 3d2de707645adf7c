"""Fused S-row pool decode trunk (ops/pallas/pool_trunk.py): interpret-mode
parity vs the XLA flat decode step (gpt2.decode_step_rows_flat) — full
trunk, plain and int8 weights, multi-tile and partial-chunk masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.config import GPTConfig
from indextts_tpu.models import gpt2
from indextts_tpu.models import unified_voice as uv
from indextts_tpu.ops import quantization as quant
from indextts_tpu.ops.pallas import pool_trunk as pt

CFG = GPTConfig(model_dim=128, layers=2, heads=2, max_mel_tokens=64,
                max_text_tokens=120)


def _setup(S, T, seed=0):
    rng = np.random.default_rng(seed)
    full = uv.init_params(jax.random.PRNGKey(seed), CFG)
    _setup.full = full
    params = full["gpt"]
    hidden = jnp.asarray(rng.standard_normal((S, CFG.model_dim)), jnp.float32)
    k_all = jnp.asarray(rng.standard_normal((CFG.layers, S, T, CFG.model_dim)),
                        jnp.float32)
    v_all = jnp.asarray(rng.standard_normal((CFG.layers, S, T, CFG.model_dim)),
                        jnp.float32)
    pos = rng.integers(T // 2, T - 1, (S,)).astype(np.int32)
    mask = np.zeros((S, T), np.int32)
    for s in range(S):
        mask[s, : pos[s] + 1] = 1
        mask[s, 2 : 2 + rng.integers(0, 6)] = 0  # left-pad hole
    return params, hidden, k_all, v_all, jnp.asarray(pos), jnp.asarray(mask)


def _xla_step(params, hidden, k_all, v_all, pos, mask):
    return gpt2.decode_step_rows_flat(
        params, hidden[:, None, :], k_all, v_all, pos, mask,
        uv.trunk_size(CFG))


def _scatter_rows(k_all, v_all, k_rows, v_rows, pos):
    S = pos.shape[0]
    rows = jnp.arange(S)
    # adjacent advanced indices (rows, pos) stay in place → value [L, S, D]
    k_new = k_all.at[:, rows, pos, :].set(k_rows)
    v_new = v_all.at[:, rows, pos, :].set(v_rows)
    return k_new, v_new


@pytest.mark.parametrize("S,T", [(8, 40), (16, 264), (4, 48)])
def test_fused_pool_step_matches_xla(S, T):
    """Whole trunk at S rows equals the XLA flat step: ln_f output AND the
    scattered K/V rows.  T=264 exercises multi-chunk online softmax with
    tile-wise live-chunk pinning; S=4 the sub-tile pool."""
    params, hidden, k_all, v_all, pos, mask = _setup(S, T)
    want_out, want_k, want_v = _xla_step(params, hidden, k_all, v_all,
                                         pos, mask)
    x, k_rows, v_rows = pt.fused_pool_step(
        params, hidden, k_all, v_all, pos, mask, CFG.heads, interpret=True)
    got_out = gpt2.layer_norm(x[:, None, :], params["ln_f"]["scale"],
                              params["ln_f"]["bias"])
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=2e-4, atol=2e-4)
    got_k, got_v = _scatter_rows(k_all, v_all, k_rows, v_rows, pos)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=2e-4, atol=2e-4)


def test_fused_pool_step_int8(S=8, T=40):
    """int8 weight-only dicts through the kernel equal the XLA step run on
    the same quantized weights."""
    params, hidden, k_all, v_all, pos, mask = _setup(S, T, seed=1)
    q = quant.quantize_gpt_params(_setup.full, bits=8,
                                  dtype=jnp.float32)["gpt"]
    want_out, want_k, want_v = _xla_step(q, hidden, k_all, v_all, pos, mask)
    x, k_rows, v_rows = pt.fused_pool_step(
        q, hidden, k_all, v_all, pos, mask, CFG.heads, interpret=True)
    got_out = gpt2.layer_norm(x[:, None, :], q["ln_f"]["scale"],
                              q["ln_f"]["bias"])
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=2e-4, atol=2e-4)
    got_k, got_v = _scatter_rows(k_all, v_all, k_rows, v_rows, pos)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=2e-4, atol=2e-4)
