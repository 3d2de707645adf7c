"""Flagship-shape AOT sharding validation (no weights, no execution).

`dryrun_multichip` exercises the multi-chip programs at toy dims (the CPU
mesh can't *run* 24L/1280d cheaply), but sharding-propagation surprises are
shape-dependent.  This module lowers **and compiles** the full train step
and the tensor-parallel KV-cache decode at the flagship configuration
(24L/1280d/20h, SURVEY §2.1) over a virtual mesh, using abstract
`ShapeDtypeStruct` arguments carrying the real `NamedSharding`s — proving
the flagship shapes lower, shard and compile, and that XLA actually inserts
the expected cross-device collectives.

Reference analogue: the reference validates its parallelism by running the
real model under HF layer-wise parallel (gpt/model.py:64-79) and DDP
(train_ddp.py); here compilation is the hardware-free equivalent.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _abstract(tree, sharding: NamedSharding):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
        tree)


def flagship_train_aot(mesh: Mesh, batch_per_device: int = 2,
                       text_width: int = 120, mel_width: int = 400) -> str:
    """Lower+compile the LoRA train step at flagship dims on a data mesh.

    Returns the optimized HLO text (caller greps for collectives)."""
    from indextts_tpu.config import GPTConfig, LoRAConfig, TrainConfig
    from indextts_tpu.models import unified_voice as uv
    from indextts_tpu.train import trainer

    cfg = GPTConfig()  # flagship defaults: 24L / 1280d / 20h
    lora_cfg = LoRAConfig()
    optimizer = trainer.make_optimizer(TrainConfig(), total_steps=100)

    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))
    base_shapes = _abstract(
        jax.eval_shape(lambda: uv.init_params(jax.random.PRNGKey(0), cfg)),
        rep)
    state_shapes = _abstract(
        jax.eval_shape(lambda: trainer.init_train_state(
            jax.random.PRNGKey(1), cfg, lora_cfg, optimizer)), rep)

    B = mesh.devices.size * batch_per_device
    batch = trainer.Batch(
        text_ids=jax.ShapeDtypeStruct((B, text_width), jnp.int32, sharding=dat),
        text_lengths=jax.ShapeDtypeStruct((B,), jnp.int32, sharding=dat),
        mel_codes=jax.ShapeDtypeStruct((B, mel_width), jnp.int32, sharding=dat),
        codes_lengths=jax.ShapeDtypeStruct((B,), jnp.int32, sharding=dat),
        cond_mel=jax.ShapeDtypeStruct((B, 100, 200), jnp.float32, sharding=dat),
        cond_lengths=jax.ShapeDtypeStruct((B,), jnp.int32, sharding=dat),
    )
    with mesh:
        lowered = trainer.train_step.lower(
            state_shapes, base_shapes, batch, jax.random.PRNGKey(2), cfg,
            lora_cfg, optimizer, 0.1, 0.0)
        compiled = lowered.compile()
    return compiled.as_text()


def flagship_tp_decode_aot(tp_mesh: Mesh, max_new: int = 600,
                           text_len: int = 64) -> str:
    """Lower+compile the full tensor-parallel decode program (prefill +
    while_loop, KV cache sharded on heads) at flagship dims.

    Returns the optimized HLO text."""
    from indextts_tpu.config import GPTConfig
    from indextts_tpu.models import unified_voice as uv
    from indextts_tpu.parallel.tp import gpt_param_specs

    cfg = GPTConfig()
    rep = NamedSharding(tp_mesh, P())
    param_shapes = jax.eval_shape(
        lambda: uv.init_params(jax.random.PRNGKey(0), cfg))
    specs = gpt_param_specs("model")
    sharded_params: Dict = {
        k: (jax.tree.map(
                lambda x, s: jax.ShapeDtypeStruct(
                    x.shape, x.dtype, sharding=NamedSharding(tp_mesh, s)),
                v, specs)
            if k == "gpt" else _abstract(v, rep))
        for k, v in param_shapes.items()}

    cond = jax.ShapeDtypeStruct(
        (1, cfg.condition_num_latent, cfg.model_dim), jnp.float32,
        sharding=rep)
    tokens = jax.ShapeDtypeStruct((1, text_len), jnp.int32, sharding=rep)
    mask = jax.ShapeDtypeStruct((1, text_len), jnp.int32, sharding=rep)
    with tp_mesh:
        # the public inference_speech is a plain wrapper (float knobs are
        # traced); AOT-lower the jitted impl directly
        lowered = uv._inference_speech_impl.lower(
            sharded_params, cfg, cond, tokens, mask, jax.random.PRNGKey(1),
            max_new=max_new, do_sample=False, repetition_penalty=1.0,
            cache_dtype=jnp.float32, guided=False)
        compiled = lowered.compile()
    return compiled.as_text()


def has_collective(hlo: str) -> bool:
    t = hlo.lower()
    return any(k in t for k in ("all-reduce", "reduce-scatter", "all-gather",
                                "collective-permute"))
