"""LoRA adapters as fused low-rank deltas on the GPT trunk.

Capability rebuild of the reference's PEFT usage (train.py:548-605,
config.yaml:244-252): rank-4 adapters on attn.c_attn / attn.c_proj /
mlp.c_fc / mlp.c_proj, α=8, merged into base weights for the inference
checkpoint (train.py:795-833).

TPU-shaped design: adapters live in a small pytree stacked over layers,
mirroring the trunk's scanned layout.  `materialize` folds ΔW = (α/r)·A·B
into the base params — at r=4 this is a handful of [D,r]×[r,D'] matmuls,
cheap enough to run inside every training step, so the forward pass is the
*unmodified* base forward (no per-layer adapter plumbing) and gradients
flow to the adapters through the fold.  `merge` produces the final
inference params exactly like PEFT's merge_and_unload.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from indextts_tpu.config import GPTConfig, LoRAConfig

# our-layout targets (reference target_modules, config.yaml:248-252)
TARGETS = {
    "attn.c_attn": ("attn", "qkv_w"),
    "attn.c_proj": ("attn", "proj_w"),
    "mlp.c_fc": ("mlp", "fc_w"),
    "mlp.c_proj": ("mlp", "proj_w"),
}


def init_lora_params(rng: jax.Array, cfg: GPTConfig, lora_cfg: LoRAConfig,
                     dtype=jnp.float32) -> Dict[str, Any]:
    """A ~ kaiming-uniform, B = 0 (PEFT defaults) — stacked over layers.
    Layout per target: a [L, in, r], b [L, r, out] so ΔW = a @ b."""
    L, D = cfg.layers, cfg.model_dim
    r = lora_cfg.r
    dims = {
        "attn.c_attn": (D, 3 * D),
        "attn.c_proj": (D, D),
        "mlp.c_fc": (D, 4 * D),
        "mlp.c_proj": (4 * D, D),
    }
    params: Dict[str, Any] = {}
    keys = jax.random.split(rng, len(lora_cfg.target_modules))
    for key, name in zip(keys, lora_cfg.target_modules):
        din, dout = dims[name]
        # PEFT init: kaiming_uniform(a=sqrt(5)) on A [r, din] → bound √(1/din)
        bound = math.sqrt(1.0 / din)
        a = jax.random.uniform(key, (L, din, r), jnp.float32, -bound, bound)
        params[name] = {"a": a.astype(dtype), "b": jnp.zeros((L, r, dout), dtype)}
    return params


def materialize(base_params: Dict[str, Any], lora_params: Dict[str, Any],
                lora_cfg: LoRAConfig) -> Dict[str, Any]:
    """base + (α/r)·A·B, differentiable w.r.t. the adapters."""
    scaling = lora_cfg.lora_alpha / lora_cfg.r
    gpt = dict(base_params["gpt"])
    blocks = {k: dict(v) for k, v in base_params["gpt"]["blocks"].items()}
    for name, ab in lora_params.items():
        group, leaf = TARGETS[name]
        delta = jnp.einsum("lir,lro->lio", ab["a"], ab["b"],
                           preferred_element_type=jnp.float32) * scaling
        blocks[group] = dict(blocks[group])
        blocks[group][leaf] = (blocks[group][leaf]
                               + delta.astype(blocks[group][leaf].dtype))
    gpt["blocks"] = blocks
    return {**base_params, "gpt": gpt}


def merge(base_params: Dict[str, Any], lora_params: Dict[str, Any],
          lora_cfg: LoRAConfig, save_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Merged inference params (PEFT merge_and_unload equivalent,
    train.py:795-833), cast to the save dtype."""
    merged = materialize(base_params, lora_params, lora_cfg)
    return jax.tree.map(lambda x: x.astype(save_dtype), merged)


def loraplus_labels(lora_params: Dict[str, Any]) -> Dict[str, Any]:
    """Optimizer group labels for LoRA+ (B matrices get lr × ratio,
    reference create_loraplus_optimizer, train.py:587-605)."""
    return {name: {"a": "a", "b": "b"} for name in lora_params}
