"""Tensor-parallel parameter sharding for the GPT trunk.

The TPU analogue of the reference's layer-wise inference model parallelism
(HF parallelize()/get_device_map, gpt/model.py:64-79): instead of placing
whole layers on different devices (serialising them), the trunk's matmuls
are sharded over a ``model`` mesh axis — qkv/fc column-parallel, proj
row-parallel — and XLA inserts the all-reduces over ICI.  The flagship fits
one chip, so this is an option for bigger variants / lower latency, not a
requirement.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gpt_param_specs(axis: str = "model") -> Dict[str, Any]:
    """PartitionSpecs matching models/gpt2 param layout (blocks stacked on a
    leading layer axis)."""
    rep = P()
    return {
        "blocks": {
            "ln_1": {"scale": rep, "bias": rep},
            "attn": {
                # column-parallel qkv: shard the 3D output dim
                "qkv_w": P(None, None, axis),
                "qkv_b": P(None, axis),
                # row-parallel proj: shard the input dim → psum after
                "proj_w": P(None, axis, None),
                "proj_b": rep,
            },
            "ln_2": {"scale": rep, "bias": rep},
            "mlp": {
                "fc_w": P(None, None, axis),
                "fc_b": P(None, axis),
                "proj_w": P(None, axis, None),
                "proj_b": rep,
            },
        },
        "ln_f": {"scale": rep, "bias": rep},
    }


def _is_quantized_leaf(p) -> bool:
    return isinstance(p, dict) and ("q" in p or "q4" in p or "q4s" in p)


def shard_gpt_params(params: Dict[str, Any], mesh: Mesh,
                     axis: str = "model") -> Dict[str, Any]:
    """Place trunk params with tensor-parallel shardings; XLA propagates the
    shardings through the scan and inserts collectives.

    Weight-only-quantized trunks (ops/quantization: ``{"q"|"q4", "s"}``
    dicts in place of fp tensors) are supported: the integer tensor keeps
    the fp weight's spec (same rank — int4's packed K/2 still sits on the
    K dim), and the per-output-channel scales shard with the output dim
    for column-parallel weights but replicate for row-parallel ones (their
    broadcast K-dim of 1 — or 2·G int4 groups — is not divisible)."""
    specs = gpt_param_specs(axis)

    def place(p, spec):
        if _is_quantized_leaf(p):
            qkey = next(k for k in ("q", "q4", "q4s") if k in p)
            s_spec = spec if (len(spec) and spec[-1] == axis) else P()
            return {
                qkey: jax.device_put(p[qkey], NamedSharding(mesh, spec)),
                "s": jax.device_put(p["s"], NamedSharding(mesh, s_spec)),
            }
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs, is_leaf=_is_quantized_leaf)


def shard_uv_params(params: Dict[str, Any], mesh: Mesh,
                    axis: str = "model") -> Dict[str, Any]:
    """Tensor-parallel placement for the full UnifiedVoice param tree: the
    GPT trunk shards per `gpt_param_specs`; embeddings, heads and the
    conditioning encoder replicate (they are a few %% of the weights).
    With these input shardings, `inference_speech`'s jitted prefill +
    while_loop propagate the sharding through the KV cache (heads axis)
    and XLA inserts the qkv/proj all-reduces over ICI — a decode-latency
    option for variants too big (or too latency-sensitive) for one chip."""
    rep = NamedSharding(mesh, P())
    # the trunk (the overwhelming bulk of the weights) must NEVER pass
    # through a replicated placement — that would OOM exactly the
    # too-big-for-one-chip variants this function exists for
    out = {k: (jax.tree.map(lambda p: jax.device_put(p, rep), v)
               if k != "gpt" else shard_gpt_params(v, mesh, axis))
           for k, v in params.items()}
    return out
