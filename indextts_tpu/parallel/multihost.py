"""Multi-process ("multi-host") SPMD execution check.

The reference trains across nodes with torchrun + an NCCL process group
(/root/reference/train_ddp.py:68-93, run_train.sh:166-186).  The TPU-native
equivalent is N controller processes joined by
``jax.distributed.initialize`` into ONE global mesh, running the SAME jitted
train step; per-process batches enter through
``jax.make_array_from_process_local_data`` (train/trainer.py:shard_batch)
and XLA all-reduces grads over ICI/DCN.

This module makes that path *executable without a cluster*: ``launch_check``
spawns ``num_processes`` OS subprocesses on the CPU backend, each with
``devices_per_process`` virtual devices and a localhost coordinator, runs one
real LoRA ``train_step`` through the multi-process branch of
``shard_batch``, and returns each process's loss.  The losses must agree
with a single-process run of the same global batch — asserted by
tests/test_multichip.py and by ``__graft_entry__.dryrun_multichip``
(``multihost_ok``).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile
from typing import Dict, List


# deterministic toy problem shared by workers, tests and the dryrun
TOY = dict(model_dim=64, layers=2, heads=4, max_mel_tokens=48,
           max_text_tokens=30, number_text_tokens=40, number_mel_codes=50,
           start_mel_token=46, stop_mel_token=47)


def toy_config():
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig

    return GPTConfig(
        condition_module=ConditionModuleConfig(
            output_size=32, linear_units=64, attention_heads=4, num_blocks=2,
            perceiver_mult=2),
        **TOY)


def toy_batch(global_batch: int):
    """The full global batch, regenerated identically in every process."""
    import numpy as np

    from indextts_tpu.train import trainer

    rng = np.random.default_rng(0)
    return trainer.Batch(
        text_ids=rng.integers(2, 40, (global_batch, 8)).astype(np.int32),
        text_lengths=np.full((global_batch,), 8, np.int32),
        mel_codes=rng.integers(0, 46, (global_batch, 12)).astype(np.int32),
        codes_lengths=np.full((global_batch,), 12, np.int32),
        cond_mel=rng.standard_normal((global_batch, 100, 20)).astype("float32"),
        cond_lengths=np.full((global_batch,), 20, np.int32),
    )


def run_toy_step(local_batch=None, n_mesh_devices=None) -> float:
    """One LoRA train step on the toy problem over a data mesh.

    With ``jax.process_count() == 1`` this is the single-controller
    reference value; in a worker it runs the true multi-process path
    (per-process local shards, global mesh).  ``n_mesh_devices`` restricts
    the mesh (e.g. 1 for the single-device comparison value with the SAME
    global batch).  Returns the step loss.
    """
    import jax
    import numpy as np

    from indextts_tpu.config import LoRAConfig, TrainConfig
    from indextts_tpu.models import unified_voice as uv
    from indextts_tpu.parallel.mesh import make_mesh
    from indextts_tpu.train import trainer

    cfg = toy_config()
    lora_cfg = LoRAConfig()
    n = n_mesh_devices or jax.device_count()
    mesh = make_mesh((("data", n),), devices=jax.devices()[:n])
    base = uv.init_params(jax.random.PRNGKey(0), cfg)
    optimizer = trainer.make_optimizer(TrainConfig(), total_steps=100)
    state = trainer.init_train_state(jax.random.PRNGKey(1), cfg, lora_cfg,
                                     optimizer)
    if local_batch is None:
        local_batch = toy_batch(jax.device_count() * 2)
    with mesh:
        state = trainer.replicate(state, mesh)
        base = trainer.replicate(base, mesh)
        device_batch = trainer.shard_batch(local_batch, mesh)
        state, metrics = trainer.train_step(
            state, base, device_batch, jax.random.PRNGKey(2), cfg, lora_cfg,
            optimizer, 0.1, 0.0)
        return float(np.asarray(jax.device_get(metrics["loss"])))


def worker_main(argv=None) -> None:
    """Subprocess entry: join the distributed runtime, run one step, report.

    The environment (JAX_PLATFORMS=cpu, XLA_FLAGS device count) is prepared
    by ``launch_check`` BEFORE the interpreter starts, so the platform is
    decided ahead of any backend touch.
    """
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        initialization_timeout=120,
    )
    # every process regenerates the same GLOBAL batch and contributes the
    # rows its devices own (mesh device order == jax.devices() order, which
    # lists process 0's devices first)
    full = toy_batch(jax.device_count() * 2)
    local_rows = full.text_ids.shape[0] // args.num_processes
    lo = args.process_id * local_rows
    local = type(full)(*(x[lo:lo + local_rows] for x in full))
    loss = run_toy_step(local)
    with open(args.out, "w") as f:
        json.dump({
            "process_id": args.process_id,
            "num_processes": jax.process_count(),
            "global_devices": jax.device_count(),
            "local_devices": jax.local_device_count(),
            "loss": loss,
        }, f)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch_check(num_processes: int = 2, devices_per_process: int = 4,
                 timeout: float = 900.0) -> List[Dict]:
    """Spawn the multi-process toy step; returns each worker's report.

    Raises on any worker failure.  Each worker runs in a clean CPU-backend
    environment (no TPU/axon registration, ``devices_per_process`` virtual
    devices) with this repo on PYTHONPATH.
    """
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    coordinator = f"127.0.0.1:{_free_port()}"
    outdir = tempfile.mkdtemp(prefix="multihost_check_")
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": repo_root,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS":
            f"--xla_force_host_platform_device_count={devices_per_process}",
        # workers are pure-CPU: never register the axon TPU backend
    }
    procs = []
    outs = []
    for pid in range(num_processes):
        out = os.path.join(outdir, f"p{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "indextts_tpu.parallel.multihost",
             "--coordinator", coordinator,
             "--num_processes", str(num_processes),
             "--process_id", str(pid), "--out", out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    reports = []
    errors = []
    for pid, proc in enumerate(procs):
        try:
            stdout, stderr = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            stdout, stderr = proc.communicate()
            errors.append(f"process {pid} timed out\n{stderr.decode()[-2000:]}")
            continue
        if proc.returncode != 0:
            errors.append(f"process {pid} rc={proc.returncode}\n"
                          f"{stderr.decode()[-2000:]}")
            continue
        with open(outs[pid]) as f:
            reports.append(json.load(f))
    if errors:
        raise RuntimeError("multihost check failed:\n" + "\n".join(errors))
    return reports


if __name__ == "__main__":
    worker_main()
