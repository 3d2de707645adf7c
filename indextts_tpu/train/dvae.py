"""DVAE (mel VQ-VAE) training loop — SPMD over a data mesh.

The reference fork ships the ``DiscreteVAE`` model with training-side
machinery (EMA vector quantiser with distributed all_reduce, dead-code
rebalancing, DiscretizationLoss — /root/reference/indextts/vqvae/
xtts_dvae.py:54-174,364-386) but **no training script**; this module
supplies the loop those pieces exist for, TPU-first:

  * one jitted ``train_step`` under a ``Mesh(('data',))`` — gradients on
    encoder/decoder params, EMA codebook update from global (mesh-summed)
    batch statistics, usage histogram threaded functionally;
  * dead/dominant-code rebalancing on a fixed cadence via ``lax.cond``
    inside the step (models/dvae.rebalance_codes = the reference's
    balancing_heuristic, xtts_dvae.py:78-87) — no host round-trip;
  * static shapes: training samples are random fixed-width mel windows,
    so the whole run is one compiled program.

Data: pre-extracted ``*.npy`` mel spectrograms ([100, T] or [T, 100]),
either globbed or discovered through the extraction pipeline's
``speaker_info.json`` (data/extract.py).
"""

from __future__ import annotations

import dataclasses
import glob as globlib
import json
import os
import time
from typing import Any, Dict, Iterator, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from indextts_tpu.config import VQVAEConfig
from indextts_tpu.models import dvae
from indextts_tpu.parallel.mesh import initialize_distributed, make_mesh
from indextts_tpu.train import trainer as _trainer
from indextts_tpu.io import checkpoint as ckpt_io


@dataclasses.dataclass(frozen=True)
class DVAETrainConfig:
    batch_size: int = 32
    mel_width: int = 256          # random-crop window (frames, multiple of 4)
    steps: int = 2000
    lr: float = 3e-4
    warmup_steps: int = 100
    commitment_weight: float = 0.25
    discretization_weight: float = 0.0   # DiscretizationLoss, off by default
    ema_decay: float = 0.99
    rebalance_every: int = 0      # 0 = off (reference default: heuristic off)
    rebalance_hi: float = 0.9
    rebalance_lo: float = 0.01
    seed: int = 42
    log_every: int = 50
    checkpoint_every: int = 500


class DVAETrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    usage: jnp.ndarray            # [n_embed] code counts since last rebalance
    step: jnp.ndarray


def make_optimizer(tc: DVAETrainConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, tc.lr, tc.warmup_steps, max(tc.steps, tc.warmup_steps + 1))
    return optax.chain(optax.clip_by_global_norm(1.0),
                       optax.adamw(sched, weight_decay=0.01))


def init_state(rng: jax.Array, cfg: VQVAEConfig,
               optimizer: optax.GradientTransformation) -> DVAETrainState:
    params = dvae.init_params(rng, cfg)
    grads_like = {k: v for k, v in params.items() if k != "codebook"}
    return DVAETrainState(params, optimizer.init(grads_like),
                          jnp.zeros((cfg.num_tokens,), jnp.float32),
                          jnp.int32(0))


def _loss(grad_params: Dict[str, Any], codebook: Dict[str, Any],
          mel: jnp.ndarray, cfg: VQVAEConfig, tc: DVAETrainConfig):
    params = {**grad_params, "codebook": codebook}
    out = dvae.forward_loss(params, mel, cfg)
    loss = out["recon_loss"] + tc.commitment_weight * out["commitment_loss"]
    if tc.discretization_weight > 0.0:
        onehot = jax.nn.one_hot(out["codes"], cfg.num_tokens, dtype=jnp.float32)
        loss = loss + tc.discretization_weight * dvae.discretization_loss(
            onehot, dim=onehot.ndim - 1,
            expected_variance=1.0 / cfg.num_tokens)
    return loss, out


def train_step(state: DVAETrainState, mel: jnp.ndarray, rng: jax.Array,
               cfg: VQVAEConfig, optimizer: optax.GradientTransformation,
               tc: DVAETrainConfig) -> Tuple[DVAETrainState, Dict[str, jnp.ndarray]]:
    """One SPMD step: grads on encoder/decoder, EMA on the codebook.

    Under jit with a batch sharded over the data axis, XLA inserts the
    cross-chip reductions for both the gradients and the EMA statistics —
    the collective-free rewrite of the reference's DDP all_reduce
    (xtts_dvae.py:113-115)."""
    grad_params = {k: v for k, v in state.params.items() if k != "codebook"}
    codebook = state.params["codebook"]
    (loss, out), grads = jax.value_and_grad(_loss, has_aux=True)(
        grad_params, codebook, mel, cfg, tc)
    updates, opt_state = optimizer.update(grads, state.opt_state, grad_params)
    grad_params = optax.apply_updates(grad_params, updates)

    codebook = dvae.ema_update(codebook, out["z"], out["codes"],
                               decay=tc.ema_decay)
    counts = jnp.bincount(out["codes"].reshape(-1), length=cfg.num_tokens
                          ).astype(jnp.float32)
    usage = state.usage + counts
    step = state.step + 1

    n_reset = jnp.int32(0)
    if tc.rebalance_every > 0:
        def do_rebalance(args):
            cb, u = args
            frac = u / jnp.maximum(u.sum(), 1.0)
            cb2, n = dvae.rebalance_codes(cb, frac, jax.random.fold_in(rng, 1),
                                          hi=tc.rebalance_hi, lo=tc.rebalance_lo)
            return cb2, jnp.zeros_like(u), n

        codebook, usage, n_reset = jax.lax.cond(
            step % tc.rebalance_every == 0, do_rebalance,
            lambda args: (args[0], args[1], jnp.int32(0)), (codebook, usage))

    probs = counts / jnp.maximum(counts.sum(), 1.0)
    perplexity = jnp.exp(-jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs), 0.0)))
    metrics = {"loss": loss, "recon_loss": out["recon_loss"],
               "commitment_loss": out["commitment_loss"],
               "codebook_perplexity": perplexity,
               "codes_reset": n_reset.astype(jnp.float32)}
    return DVAETrainState({**grad_params, "codebook": codebook},
                          opt_state, usage, step), metrics


# ---------------------------------------------------------------------------
# data: random fixed-width windows over extracted mel .npy files
# ---------------------------------------------------------------------------

def discover_mels(source: str) -> List[str]:
    """`source` may be a glob, a directory of .npy files, or an extraction
    output dir containing speaker_info.json (data/extract.py contract)."""
    info = os.path.join(source, "speaker_info.json")
    if os.path.isfile(info):
        from indextts_tpu.train.vocoder import speaker_dirs

        paths: List[str] = []
        for _, d in speaker_dirs(source):
            for split in ("metadata_train.jsonl", "metadata_valid.jsonl"):
                mpath = os.path.join(d, split)
                if not os.path.isfile(mpath):
                    continue
                with open(mpath) as f:
                    for line in f:
                        rec = json.loads(line)
                        paths.append(os.path.join(d, rec["mels"]))
        return sorted(set(paths))
    if os.path.isdir(source):
        return sorted(globlib.glob(os.path.join(source, "**", "*.npy"),
                                   recursive=True))
    return sorted(globlib.glob(source))


def mel_window_batches(paths: List[str], batch: int, width: int,
                       seed: int) -> Iterator[np.ndarray]:
    """Endless [batch, 100, width] crops; short clips are tile-padded."""
    rng = np.random.default_rng(seed)
    assert paths, "no mel files found"
    while True:
        rows = []
        for i in rng.integers(0, len(paths), size=batch):
            m = np.load(paths[int(i)])
            if m.ndim != 2:
                m = m.reshape(m.shape[-2], m.shape[-1])
            if m.shape[0] != 100 and m.shape[1] == 100:
                m = m.T
            T = m.shape[1]
            if T < width:
                m = np.tile(m, (1, -(-width // T)))
                T = m.shape[1]
            t0 = int(rng.integers(0, T - width + 1))
            rows.append(m[:, t0:t0 + width])
        yield np.stack(rows).astype(np.float32)


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------

def train_dvae(cfg: VQVAEConfig, tc: DVAETrainConfig, mel_paths: List[str],
               out_dir: str, writer=None) -> DVAETrainState:
    initialize_distributed()
    mesh = make_mesh((("data", -1),))
    optimizer = make_optimizer(tc)
    state = init_state(jax.random.PRNGKey(tc.seed), cfg, optimizer)
    step_fn = jax.jit(train_step, static_argnames=("cfg", "optimizer", "tc"))

    n_dev = jax.device_count()
    per_host = max(tc.batch_size // jax.process_count(), 1)
    # align the per-step batch to the data mesh
    per_host = max(per_host // n_dev, 1) * n_dev
    batches = mel_window_batches(mel_paths, per_host, tc.mel_width, tc.seed)
    os.makedirs(out_dir, exist_ok=True)

    with mesh:
        state = _trainer.replicate(state, mesh)
        rng = jax.random.PRNGKey(tc.seed + 1)
        t0 = time.perf_counter()
        for i in range(tc.steps):
            mel = next(batches)
            dev_mel = _trainer.shard_batch_array(mel, mesh)
            state, metrics = step_fn(state, dev_mel,
                                     jax.random.fold_in(rng, i),
                                     cfg=cfg, optimizer=optimizer, tc=tc)
            if (i + 1) % tc.log_every == 0 or i + 1 == tc.steps:
                m = {k: float(v) for k, v in metrics.items()}
                rate = (i + 1) * tc.batch_size / (time.perf_counter() - t0)
                print(f"[dvae {i+1}/{tc.steps}] loss={m['loss']:.4f} "
                      f"recon={m['recon_loss']:.4f} "
                      f"ppl={m['codebook_perplexity']:.1f} "
                      f"({rate:.1f} windows/s)")
                if writer is not None:
                    for k, v in m.items():
                        writer.add_scalar(f"dvae/{k}", v, i + 1)
            if tc.checkpoint_every and (i + 1) % tc.checkpoint_every == 0:
                _save(state, out_dir, i + 1)
    _save(state, out_dir, tc.steps)
    return state


def _save(state: DVAETrainState, out_dir: str, step: int) -> None:
    if jax.process_index() != 0:
        return
    ckpt_io.save_pytree(os.path.join(out_dir, f"dvae_step_{step}"),
                        {"params": jax.device_get(state.params),
                         "step": step})
    print(f"[dvae ckpt] step {step} → {out_dir}/dvae_step_{step}")


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="Train the DVAE mel tokenizer")
    ap.add_argument("--mels", required=True,
                    help="mel .npy glob, directory, or extraction output dir")
    ap.add_argument("--out", default="finetune_models/dvae")
    ap.add_argument("--model_dir", default=None,
                    help="dir with config.yaml (vqvae section); default config "
                         "otherwise")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--rebalance-every", type=int, default=0)
    ap.add_argument("--discretization-weight", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    tc = DVAETrainConfig(batch_size=args.batch, mel_width=args.width,
                         steps=args.steps, lr=args.lr,
                         rebalance_every=args.rebalance_every,
                         discretization_weight=args.discretization_weight,
                         seed=args.seed)
    cfg = VQVAEConfig()
    if args.model_dir:
        from indextts_tpu.config import Config

        cfg_path = os.path.join(args.model_dir, "config.yaml")
        if os.path.exists(cfg_path):
            cfg = Config.load(cfg_path).vqvae
    paths = discover_mels(args.mels)
    print(f"[dvae] {len(paths)} mel files")
    train_dvae(cfg, tc, paths, args.out)


if __name__ == "__main__":
    main()
