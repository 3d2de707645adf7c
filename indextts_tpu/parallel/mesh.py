"""Device/mesh management — the TPU-native replacement for the reference's
GPU manager and NCCL plumbing (reference: indextts/gpu_manager.py:34-227,
train_ddp.py:68-93).

On TPU there is no per-process device picking or NCCL env tuning: parallelism
is expressed as a `jax.sharding.Mesh` over the devices of the slice, and XLA
inserts the collectives.  This module centralises mesh construction and the
standard sharding rules used by the trainers and the serving engine.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_info() -> dict:
    """Inventory of visible accelerator devices (replaces
    gpu_manager.GPUManager.get_gpu_info)."""
    devs = jax.devices()
    return {
        "platform": devs[0].platform if devs else "none",
        "num_devices": len(devs),
        "num_local_devices": jax.local_device_count(),
        "process_index": jax.process_index(),
        "num_processes": jax.process_count(),
        "devices": [str(d) for d in devs],
    }


def make_mesh(
    axes: Sequence[Tuple[str, int]] = (("data", -1),),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named mesh over the slice.

    `axes` is an ordered list of (name, size); one size may be -1 meaning
    "all remaining devices".  Default: pure data-parallel over every chip,
    the TPU equivalent of the reference's DDP world (train_ddp.py:68-93).
    """
    devs = list(devices if devices is not None else jax.devices())
    sizes = [s for _, s in axes]
    if sizes.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    known = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    if -1 in sizes:
        if len(devs) % known != 0:
            raise ValueError(f"{len(devs)} devices not divisible by {known}")
        sizes[sizes.index(-1)] = len(devs) // known
    total = int(np.prod(sizes))
    if total > len(devs):
        raise ValueError(f"mesh needs {total} devices, have {len(devs)}")
    mesh_devices = np.asarray(devs[:total]).reshape(sizes)
    return Mesh(mesh_devices, axis_names=[n for n, _ in axes])


def data_sharding(mesh: Mesh, batch_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(batch_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed() -> None:
    """Multi-host init (replaces setup_ddp / NCCL process-group creation,
    reference train_ddp.py:68-93).  No-op for single-process runs."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


@dataclasses.dataclass(frozen=True)
class ShardingRules:
    """Logical-axis → mesh-axis rules for model parameter sharding.

    The flagship models fit on one chip, so the default is data-parallel
    (params replicated, batch sharded).  `tensor` rules are provided for the
    GPT trunk so the same code scales to tp=N via mesh axes when needed.
    """

    batch: Optional[str] = "data"
    # GPT trunk tensor-parallel axes (used when the mesh has a "model" axis).
    attn_heads: Optional[str] = None
    mlp_hidden: Optional[str] = None
    vocab: Optional[str] = None

    @classmethod
    def data_parallel(cls) -> "ShardingRules":
        return cls()

    @classmethod
    def tensor_parallel(cls) -> "ShardingRules":
        return cls(attn_heads="model", mlp_hidden="model", vocab="model")
