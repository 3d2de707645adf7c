"""LoRA fine-tune trainer: one SPMD program over a data mesh.

Rebuild of the reference trainers (train.py:373-978 single-node,
train_ddp.py:96-620 DDP) as a single jitted train step under
`Mesh(('data',))`: the batch is sharded over chips, params replicated, and
XLA inserts the gradient all-reduce — no NCCL process groups, samplers, or
NaN-lockstep workarounds (SURVEY.md §2.19/2.20 TPU mapping).

Matches the reference recipe: frozen conditioning encoder, LoRA-only
gradients, weighted dual CE (text_weight·text + (1−text_weight)·mel,
train.py:897), LoRA+ two-group AdamW (B matrices lr×ratio), cosine schedule
with warmup, grad clipping, bf16 compute with fp32 optimizer state,
CFG conditioning dropout (train.py:228-231), non-finite-loss step skipping
(train.py:899-902), top-1/10/20 mel accuracy metrics.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from indextts_tpu.config import GPTConfig, LoRAConfig, TrainConfig
from indextts_tpu.models import unified_voice as uv
from indextts_tpu.train import lora as lora_lib


class Batch(NamedTuple):
    """Device batch (collate_finetune_fn contract, data_utils.py:752-791)."""

    text_ids: jnp.ndarray        # [B, Tt] int32, right-padded
    text_lengths: jnp.ndarray    # [B]
    mel_codes: jnp.ndarray       # [B, Tm] int32, right-padded
    codes_lengths: jnp.ndarray   # [B]
    cond_mel: jnp.ndarray        # [B, n_mels, Tc]
    cond_lengths: jnp.ndarray    # [B]


class TrainState(NamedTuple):
    lora_params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(train_cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    """LoRA+ AdamW with cosine warmup (train.py:587-605 + scheduler).

    `total_steps` counts optimizer *updates*.  With
    `gradient_accumulation_steps` k > 1 the returned transformation is
    wrapped in `optax.MultiSteps`: each call accumulates the micro-batch
    gradient and only every k-th call applies the (mean) update — the
    effective batch is k x micro-batch (config.yaml:213 semantics; the
    trainer feeds micro-batches of batch_size/k so the effective batch
    stays batch_size)."""
    opt = train_cfg.optimizer
    warmup = max(1, int(total_steps * opt.warmup_ratio))
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=opt.learning_rate, warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1), end_value=0.0)
    sched_b = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=opt.learning_rate * opt.loraplus_lr_ratio,
        warmup_steps=warmup, decay_steps=max(total_steps, warmup + 1), end_value=0.0)

    def adamw(s):
        return optax.adamw(s, weight_decay=opt.weight_decay)

    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.max_grad_norm),
        optax.multi_transform(
            {"a": adamw(sched), "b": adamw(sched_b)},
            param_labels=lambda tree: lora_lib.loraplus_labels(tree)),
    )
    k = max(1, int(train_cfg.gradient_accumulation_steps))
    if k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    return tx


def loss_fn(lora_params, base_params, batch: Batch, rng, cfg: GPTConfig,
            lora_cfg: LoRAConfig, text_weight: float,
            cfg_dropout_ratio: float = 0.0) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Weighted dual-CE loss with frozen conditioning (train.py:168-346,897)."""
    params = lora_lib.materialize(base_params, lora_params, lora_cfg)
    cond_latent = uv.get_conditioning(
        jax.lax.stop_gradient(base_params), cfg, batch.cond_mel, batch.cond_lengths)
    if cfg_dropout_ratio > 0.0:
        drop = jax.random.bernoulli(rng, cfg_dropout_ratio)
        cond_latent = jnp.where(drop, jnp.zeros_like(cond_latent), cond_latent)
    # remat the layer scan: trade recompute for activation memory so the
    # full-size trunk trains at real batch sizes (jax.checkpoint is the XLA
    # equivalent of the reference's gradient checkpointing option,
    # gpt/model.py:277-278)
    out = uv.train_forward(
        params, cfg, cond_latent, batch.text_ids, batch.text_lengths,
        batch.mel_codes, batch.codes_lengths, remat=True)
    loss = text_weight * out["loss_text"] + (1.0 - text_weight) * out["loss_mel"]
    metrics = {
        "loss": loss,
        "loss_text": out["loss_text"],
        "loss_mel": out["loss_mel"],
        **uv.top_k_accuracy(out["mel_logits"], out["mel_targets"], out["mel_mask"]),
    }
    return loss, metrics


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "lora_cfg", "optimizer", "text_weight", "cfg_dropout_ratio"),
    donate_argnames=("state",),
)
def train_step(state: TrainState, base_params, batch: Batch, rng,
               cfg: GPTConfig, lora_cfg: LoRAConfig,
               optimizer: optax.GradientTransformation,
               text_weight: float = 0.1,
               cfg_dropout_ratio: float = 0.0) -> Tuple[TrainState, Dict[str, Any]]:
    """One optimizer step.  Under a data mesh the batch arrives sharded and
    XLA all-reduces the grads over ICI."""
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.lora_params, base_params, batch, rng, cfg, lora_cfg,
        text_weight, cfg_dropout_ratio)
    # non-finite guard (replaces NaN skip / DDP lockstep fix,
    # train.py:899-902, train_ddp.py:381-386).  A TRUE skip: zeroed grads
    # alone would still move params through AdamW's stale momentum and
    # weight decay and advance the schedule — so the whole (params,
    # opt_state, step) update is discarded on a non-finite loss, exactly
    # the reference's `continue` (r3 review).
    finite = jnp.isfinite(loss)
    grads = jax.tree.map(lambda x: jnp.where(finite, x, 0.0), grads)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.lora_params)
    lora_params = optax.apply_updates(state.lora_params, updates)
    keep = lambda new, old: jax.tree.map(
        lambda a, b: jnp.where(finite, a, b), new, old)
    lora_params = keep(lora_params, state.lora_params)
    opt_state = keep(opt_state, state.opt_state)
    step = jnp.where(finite, state.step + 1, state.step)
    metrics["grad_norm"] = optax.global_norm(grads)
    metrics["skipped"] = (~finite).astype(jnp.float32)
    return TrainState(lora_params, opt_state, step), metrics


@functools.partial(jax.jit, static_argnames=("cfg", "lora_cfg", "text_weight"))
def eval_step(lora_params, base_params, batch: Batch, cfg: GPTConfig,
              lora_cfg: LoRAConfig, text_weight: float = 0.1) -> Dict[str, Any]:
    _, metrics = loss_fn(lora_params, base_params, batch,
                         jax.random.PRNGKey(0), cfg, lora_cfg, text_weight, 0.0)
    return metrics


def _per_row_ce(logits, targets, mask):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1)


@functools.partial(jax.jit, static_argnames=("cfg", "lora_cfg", "text_weight"))
def eval_step_per_sample(lora_params, base_params, batch: Batch,
                         cfg: GPTConfig, lora_cfg: LoRAConfig,
                         text_weight: float = 0.1) -> jnp.ndarray:
    """Per-sample weighted dual-CE [B] — lets the validation loop drop
    padding-duplicate rows exactly instead of biasing the batch mean
    (replaces the reference's drop_last=True, train_ddp.py:297-309)."""
    params = lora_lib.materialize(base_params, lora_params, lora_cfg)
    cond_latent = uv.get_conditioning(base_params, cfg, batch.cond_mel,
                                      batch.cond_lengths)
    out = uv.train_forward(params, cfg, cond_latent, batch.text_ids,
                           batch.text_lengths, batch.mel_codes,
                           batch.codes_lengths, remat=True)
    lt = _per_row_ce(out["text_logits"], out["text_targets"], out["text_mask"])
    lm = _per_row_ce(out["mel_logits"], out["mel_targets"], out["mel_mask"])
    return text_weight * lt + (1.0 - text_weight) * lm


def shard_batch(batch: Batch, mesh: Mesh) -> Batch:
    """Place a host batch sharded over the data axis.  In multi-host runs
    each process passes its local shard and the global array is assembled
    across processes."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return Batch(*(
            jax.make_array_from_process_local_data(sharding, np.asarray(x))
            for x in batch))
    return Batch(*(jax.device_put(np.asarray(x), sharding) for x in batch))


def shard_batch_array(x: np.ndarray, mesh: Mesh):
    """Place one array batch-sharded over the data axis (multi-host aware)."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(np.asarray(x), sharding)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def init_train_state(rng, cfg: GPTConfig, lora_cfg: LoRAConfig,
                     optimizer: optax.GradientTransformation) -> TrainState:
    lora_params = lora_lib.init_lora_params(rng, cfg, lora_cfg)
    return TrainState(lora_params, optimizer.init(lora_params), jnp.int32(0))
