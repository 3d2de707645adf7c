"""DVAE training loop: SPMD step, EMA codebook movement, rebalancing,
checkpointing (train/dvae.py — the loop the reference's training-side DVAE
machinery exists for but never ships, xtts_dvae.py:54-174)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.config import VQVAEConfig
from indextts_tpu.train import dvae as dtrain

CFG = VQVAEConfig(num_tokens=32, hidden_dim=16, codebook_dim=16,
                  num_resnet_blocks=1)


def _mel_files(tmp_path, n=3, T=120):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = tmp_path / f"clip{i}_mels.npy"
        np.save(p, rng.standard_normal((100, T)).astype(np.float32))
        paths.append(str(p))
    return paths


def test_dvae_train_loss_decreases(tmp_path):
    paths = _mel_files(tmp_path)
    tc = dtrain.DVAETrainConfig(batch_size=8, mel_width=32, steps=10,
                                lr=1e-3, warmup_steps=2, log_every=5,
                                checkpoint_every=0, rebalance_every=4)
    state = dtrain.train_dvae(CFG, tc, paths, str(tmp_path / "out"))
    assert int(state.step) == 10
    # loss finite and the codebook actually moved (EMA applied)
    init = dtrain.init_state(jax.random.PRNGKey(tc.seed), CFG,
                             dtrain.make_optimizer(tc))
    moved = float(jnp.abs(state.params["codebook"]["embed"]
                          - init.params["codebook"]["embed"]).max())
    assert moved > 0.0
    # final checkpoint written
    assert os.path.isdir(tmp_path / "out" / "dvae_step_10")


def test_dvae_step_metrics_and_rebalance():
    tc = dtrain.DVAETrainConfig(batch_size=8, mel_width=32, steps=2,
                                rebalance_every=1, rebalance_lo=0.5)
    optimizer = dtrain.make_optimizer(tc)
    state = dtrain.init_state(jax.random.PRNGKey(0), CFG, optimizer)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((4, 100, 32)).astype(np.float32))
    state, metrics = dtrain.train_step(state, mel, jax.random.PRNGKey(1),
                                       CFG, optimizer, tc)
    for k in ("loss", "recon_loss", "commitment_loss", "codebook_perplexity"):
        assert np.isfinite(float(metrics[k])), k
    # with lo=0.5 almost every code is "dead" → the rebalance fired
    assert float(metrics["codes_reset"]) > 0
    # usage histogram reset after rebalance
    assert float(state.usage.sum()) == 0.0


def test_discover_mels_speaker_info(tmp_path):
    d = tmp_path / "spk1"
    d.mkdir()
    np.save(d / "a_mels.npy", np.zeros((100, 8), np.float32))
    with open(d / "metadata_train.jsonl", "w") as f:
        f.write(json.dumps({"mels": "a_mels.npy"}) + "\n")
    with open(tmp_path / "speaker_info.json", "w") as f:
        json.dump({"spk1": {"data_dir": str(d)}}, f)
    paths = dtrain.discover_mels(str(tmp_path))
    assert paths == [str(d / "a_mels.npy")]
