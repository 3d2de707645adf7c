"""Multi-chip SPMD paths on the virtual 8-device CPU mesh — the test layer
the reference lacks entirely (SURVEY.md §4: no distributed tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_unified_voice import CFG
from indextts_tpu.config import TrainConfig
from indextts_tpu.models import dvae as dvae_model
from indextts_tpu.models import unified_voice as uv
from indextts_tpu.parallel.mesh import data_sharding, make_mesh, replicated
from indextts_tpu.train import trainer


def test_mesh_construction():
    mesh = make_mesh((("data", -1),))
    assert mesh.devices.size == jax.device_count() == 8


def test_data_parallel_train_step_matches_single_device():
    """The sharded train step must compute the same loss as unsharded."""
    mesh = make_mesh((("data", 8),))
    base = uv.init_params(jax.random.PRNGKey(0), CFG)
    tc = TrainConfig()
    opt = trainer.make_optimizer(tc, total_steps=10)
    state = trainer.init_train_state(jax.random.PRNGKey(1), CFG, tc.lora, opt)

    rng = np.random.default_rng(0)
    B = 8
    batch = trainer.Batch(
        text_ids=rng.integers(2, 40, (B, 8)).astype(np.int32),
        text_lengths=np.full((B,), 8, np.int32),
        mel_codes=rng.integers(0, 46, (B, 12)).astype(np.int32),
        codes_lengths=np.full((B,), 12, np.int32),
        cond_mel=rng.standard_normal((B, 100, 20)).astype(np.float32),
        cond_lengths=np.full((B,), 20, np.int32),
    )

    _, m_single = trainer.train_step(
        state, base, trainer.Batch(*(jnp.asarray(x) for x in batch)),
        jax.random.PRNGKey(2), CFG, tc.lora, opt, 0.1, 0.0)

    state2 = trainer.init_train_state(jax.random.PRNGKey(1), CFG, tc.lora, opt)
    with mesh:
        state2 = trainer.replicate(state2, mesh)
        base_r = trainer.replicate(base, mesh)
        sharded = trainer.shard_batch(batch, mesh)
        _, m_multi = trainer.train_step(
            state2, base_r, sharded, jax.random.PRNGKey(2), CFG, tc.lora, opt,
            0.1, 0.0)
    np.testing.assert_allclose(float(m_single["loss"]), float(m_multi["loss"]),
                               rtol=1e-4)


def test_tensor_parallel_trunk_forward():
    """Trunk params sharded over a 'model' axis (heads/mlp sharded) — the
    TPU analogue of the reference's layer-wise inference model parallelism
    (gpt/model.py:64-79).  XLA inserts the collectives."""
    from indextts_tpu.models import gpt2
    from indextts_tpu.parallel.tp import shard_gpt_params

    mesh = make_mesh((("model", 2), ("data", 4)))
    size = gpt2.GPT2Size(layers=2, dim=64, heads=4)
    params = gpt2.init_gpt2_params(jax.random.PRNGKey(0), size)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 64)).astype(np.float32))

    ref = np.asarray(gpt2.forward(params, x, None, size))
    with mesh:
        sharded_params = shard_gpt_params(params, mesh)
        out = jax.jit(lambda p, h: gpt2.forward(p, h, None, size))(sharded_params, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_dvae_ema_psum():
    """VQ EMA stats all-reduce via psum under shard_map (the XLA-collective
    replacement for dist.all_reduce, xtts_dvae.py:113-115)."""
    from jax.experimental.shard_map import shard_map

    mesh = make_mesh((("data", 8),))
    cb = {
        "embed": jax.random.normal(jax.random.PRNGKey(0), (8, 16)),
        "cluster_size": jnp.zeros((16,)),
        "embed_avg": jax.random.normal(jax.random.PRNGKey(0), (8, 16)),
    }
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    codes = dvae_model.quantize_indices(cb, z)

    # single-device reference over the full batch
    ref = dvae_model.ema_update(cb, z, codes)

    fn = shard_map(
        lambda c, zz, cc: dvae_model.ema_update(c, zz, cc, axis_name="data"),
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P(),
    )
    out = fn(cb, z, codes)
    np.testing.assert_allclose(np.asarray(out["embed"]),
                               np.asarray(ref["embed"]), rtol=1e-4, atol=1e-5)


def test_tensor_parallel_decode():
    """Full KV-cache decode under tensor parallelism: UnifiedVoice params
    sharded over a 'model' axis (trunk column/row-parallel, rest
    replicated), greedy inference_speech — the KV cache shards on heads by
    GSPMD propagation and XLA inserts the all-reduces.  Codes must equal
    the unsharded decode."""
    from indextts_tpu.parallel.tp import shard_uv_params

    params = uv.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(7)
    cond = jnp.asarray(rng.standard_normal((1, 32, CFG.model_dim)), jnp.float32)
    prep = uv.prepare_text_prompt([rng.integers(2, 40, (8,))],
                                  CFG.start_text_token, CFG.stop_text_token)
    args = (jnp.asarray(prep.text_tokens), jnp.asarray(prep.attn_text),
            jax.random.PRNGKey(3))
    kw = dict(max_new=16, do_sample=False, repetition_penalty=1.0,
              cache_dtype=jnp.float32)

    ref = uv.inference_speech(params, CFG, cond, *args, **kw)
    mesh = make_mesh((("model", 2), ("data", 4)))
    with mesh:
        sp = shard_uv_params(params, mesh)
        got = uv.inference_speech(sp, CFG, cond, *args, **kw)
    np.testing.assert_array_equal(np.asarray(got.codes), np.asarray(ref.codes))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_multihost_two_process_execution():
    """The multi-process path (jax.distributed.initialize + shard_batch's
    make_array_from_process_local_data branch) must EXECUTE and agree with
    the single-controller loss — the reference's cross-node torchrun/NCCL
    capability (train_ddp.py:68-93), run as 2 OS processes × 4 virtual CPU
    devices with a localhost coordinator (VERDICT r2 #2)."""
    from indextts_tpu.parallel import multihost

    reports = multihost.launch_check(num_processes=2, devices_per_process=4)
    assert len(reports) == 2
    assert all(r["num_processes"] == 2 for r in reports)
    assert all(r["global_devices"] == 8 for r in reports)
    ref_loss = multihost.run_toy_step(multihost.toy_batch(16))
    for r in reports:
        np.testing.assert_allclose(r["loss"], ref_loss, atol=1e-4)


def test_flagship_aot_train_sharding():
    """Flagship dims (24L/1280d/20h) must lower + compile under the data
    mesh with grad all-reduces present (VERDICT r2 #3).  Abstract args —
    nothing executes."""
    from indextts_tpu.parallel import aot_check

    hlo = aot_check.flagship_train_aot(make_mesh((("data", 8),)))
    assert aot_check.has_collective(hlo)


def test_flagship_aot_tp_decode_sharding():
    """The tensor-parallel KV-cache decode program must lower + compile at
    flagship dims on a ("model", 2) × ("data", 4) mesh with collectives."""
    from indextts_tpu.parallel import aot_check

    hlo = aot_check.flagship_tp_decode_aot(
        make_mesh((("model", 2), ("data", 4))))
    assert aot_check.has_collective(hlo)


@pytest.mark.parametrize("layout", ["int8", "int4", "int4shared"])
def test_tensor_parallel_quantized_trunk(layout):
    """Weight-only-quantised trunks ({"q"|"q4"|"q4s","s"} dicts) must shard
    under the same TP specs as fp weights: the int tensor keeps the fp spec,
    the per-output-channel scale shards with the output dim (column-
    parallel) or replicates (row-parallel), and the jitted forward matches
    the unsharded quantised forward."""
    from indextts_tpu.models import gpt2
    from indextts_tpu.ops.quantization import quantize_gpt_params
    from indextts_tpu.parallel.tp import shard_gpt_params

    bits = 8 if layout == "int8" else 4
    mesh = make_mesh((("model", 2), ("data", 4)))
    size = gpt2.GPT2Size(layers=2, dim=64, heads=4)
    params = gpt2.init_gpt2_params(jax.random.PRNGKey(0), size)
    qparams = quantize_gpt_params(
        {"gpt": params}, bits=bits,
        int4_layout="shared" if layout == "int4shared" else "fused")["gpt"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 64)).astype(np.float32))

    ref = np.asarray(gpt2.forward(qparams, x, None, size))
    with mesh:
        sp = shard_gpt_params(qparams, mesh)
        out = jax.jit(lambda p, h: gpt2.forward(p, h, None, size))(sp, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)

    qkey = {"int8": "q", "int4": "q4", "int4shared": "q4s"}[layout]
    attn = sp["blocks"]["attn"]
    # column-parallel qkv: int tensor AND scale shard the output dim
    assert attn["qkv_w"][qkey].sharding.spec == P(None, None, "model")
    assert attn["qkv_w"]["s"].sharding.spec == P(None, None, "model")
    # row-parallel proj: int tensor shards K, scale replicates
    assert attn["proj_w"][qkey].sharding.spec == P(None, "model", None)
    assert attn["proj_w"]["s"].sharding.spec == P()
