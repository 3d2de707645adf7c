"""Data pipeline + trainer integration on synthetic processed_data."""

import json
import time
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_unified_voice import CFG
from indextts_tpu.config import Config, LoRAConfig, TrainConfig
from indextts_tpu.data.dataset import DataLoader, FinetuneDataset, collate
from indextts_tpu.models import unified_voice as uv
from indextts_tpu.train import lora as lora_lib
from indextts_tpu.train import trainer
from indextts_tpu.utils.textnorm import TextNormalizer
from indextts_tpu.utils.tokenizer import TextTokenizer

VOCAB = "/root/reference/vocab.txt"


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("processed_data")
    rng = np.random.default_rng(0)
    speakers = ["spk_a", "spk_b"]
    for spk in speakers:
        d = root / spk
        (d / "codes").mkdir(parents=True)
        (d / "mels").mkdir()
        records = {"train": [], "valid": []}
        for i in range(6):
            n_codes = int(rng.integers(8, 16))
            codes = rng.integers(0, 46, (n_codes,)).astype(np.int64)
            mel = rng.standard_normal((100, n_codes * 4)).astype(np.float32)
            np.save(d / "codes" / f"c{i}.npy", codes)
            np.save(d / "mels" / f"c{i}.npy", mel)
            rec = {
                "audio": f"/fake/{spk}/c{i}.wav",
                "text": "你好世界" if i % 2 == 0 else "今天天氣很好",
                "duration": float(n_codes * 1024 / 24000 + 1.0),
                "codes": f"codes/c{i}.npy",
                "mels": f"mels/c{i}.npy",
            }
            records["train" if i < 5 else "valid"].append(rec)
        for split, recs in records.items():
            with open(d / f"metadata_{split}.jsonl", "w") as f:
                for rec in recs:
                    f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    with open(root / "speaker_info.json", "w") as f:
        json.dump([{"speaker": s} for s in speakers], f)
    return str(root)


@pytest.fixture(scope="module")
def tokenizer():
    return TextTokenizer(VOCAB, TextNormalizer())


def test_dataset_loads(data_dir, tokenizer):
    ds = FinetuneDataset(data_dir, "train", tokenizer)
    assert len(ds) == 10  # 2 speakers × 5 train clips
    rng = np.random.default_rng(0)
    item = ds.get_item(0, rng)
    assert item["mel_codes"].ndim == 1
    assert item["cond_mel"].shape[0] == 100
    assert len(item["text_ids"]) > 0


def test_conditioning_is_different_clip(data_dir, tokenizer):
    ds = FinetuneDataset(data_dir, "train", tokenizer)
    rng = np.random.default_rng(1)
    # same-speaker conditioning: cond mel should usually differ from own mel
    diffs = 0
    for _ in range(5):
        item = ds.get_item(0, rng, load_mel=True)
        if item["cond_mel"].shape != item["mel"].shape or \
           not np.allclose(item["cond_mel"], item["mel"]):
            diffs += 1
    assert diffs >= 4


def test_index_cache_roundtrip(data_dir, tokenizer):
    ds1 = FinetuneDataset(data_dir, "train", tokenizer)
    assert os.path.exists(os.path.join(data_dir, "train_index.pkl"))
    ds2 = FinetuneDataset(data_dir, "train", tokenizer)
    assert len(ds1) == len(ds2)


def test_loader_batches(data_dir, tokenizer):
    ds = FinetuneDataset(data_dir, "train", tokenizer)
    loader = DataLoader(ds, batch_size=4, seed=0, pad_multiple=8)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["text_ids"].shape[0] == 4
    assert b["text_ids"].shape[1] % 8 == 0
    assert b["mel_codes"].shape[1] % 8 == 0
    assert (b["codes_lengths"] > 0).all()


def test_loader_sharding(data_dir, tokenizer):
    ds = FinetuneDataset(data_dir, "train", tokenizer)
    l0 = DataLoader(ds, batch_size=2, seed=0, num_shards=2, shard_index=0)
    l1 = DataLoader(ds, batch_size=2, seed=0, num_shards=2, shard_index=1)
    i0 = l0._epoch_indices()
    i1 = l1._epoch_indices()
    assert set(i0).isdisjoint(set(i1))
    assert len(i0) + len(i1) == len(ds)


def test_train_step_learns(data_dir, tokenizer):
    """A few LoRA steps on one batch must reduce the loss."""
    ds = FinetuneDataset(data_dir, "train", tokenizer)
    loader = DataLoader(ds, batch_size=4, seed=0, pad_multiple=8)
    raw = next(iter(loader))
    batch = trainer.Batch(
        text_ids=raw["text_ids"] % 40,  # tiny model vocab
        text_lengths=raw["text_lengths"],
        mel_codes=raw["mel_codes"], codes_lengths=raw["codes_lengths"],
        cond_mel=raw["cond_mel"], cond_lengths=raw["cond_lengths"])

    base = uv.init_params(jax.random.PRNGKey(0), CFG)
    tc = TrainConfig()
    lora_cfg = tc.lora
    # crank lr so a few steps visibly move the loss on the tiny model;
    # accumulation off so every step applies an update
    tc_fast = TrainConfig(optimizer=type(tc.optimizer)(learning_rate=1e-2),
                          gradient_accumulation_steps=1)
    opt = trainer.make_optimizer(tc_fast, total_steps=20)
    state = trainer.init_train_state(jax.random.PRNGKey(1), CFG, lora_cfg, opt)

    losses = []
    for i in range(8):
        state, metrics = trainer.train_step(
            state, base, batch, jax.random.PRNGKey(i), CFG, lora_cfg, opt, 0.1, 0.0)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))


def test_lora_merge_matches_materialize():
    lora_cfg = LoRAConfig()
    base = uv.init_params(jax.random.PRNGKey(0), CFG)
    lora = lora_lib.init_lora_params(jax.random.PRNGKey(1), CFG, lora_cfg)
    # make B nonzero so the delta is real
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    mat = lora_lib.materialize(base, lora, lora_cfg)
    merged = lora_lib.merge(base, lora, lora_cfg, save_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mat["gpt"]["blocks"]["attn"]["qkv_w"]),
        np.asarray(merged["gpt"]["blocks"]["attn"]["qkv_w"]), rtol=1e-6)
    # non-target leaves untouched
    np.testing.assert_array_equal(
        np.asarray(base["text_embedding"]["weight"]),
        np.asarray(merged["text_embedding"]["weight"]))


def _synthetic_batch(B, rng):
    """Fixed-length rows so masked-CE token counts are equal per sample."""
    return trainer.Batch(
        text_ids=rng.integers(2, 40, (B, 8)).astype(np.int32),
        text_lengths=np.full((B,), 8, np.int32),
        mel_codes=rng.integers(0, 46, (B, 12)).astype(np.int32),
        codes_lengths=np.full((B,), 12, np.int32),
        cond_mel=rng.standard_normal((B, 100, 20)).astype(np.float32),
        cond_lengths=np.full((B,), 20, np.int32))


def test_gradient_accumulation_parity():
    """k micro-batches under optax.MultiSteps must produce the same update
    as one optimizer step on the concatenated batch (config.yaml:213
    effective-batch semantics)."""
    rng = np.random.default_rng(3)
    big = _synthetic_batch(4, rng)
    micro = [trainer.Batch(*(np.asarray(x)[i:i + 2] for x in big))
             for i in (0, 2)]
    base = uv.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda k: TrainConfig(
        optimizer=type(TrainConfig().optimizer)(learning_rate=1e-2),
        gradient_accumulation_steps=k)
    lora_cfg = TrainConfig().lora
    key = jax.random.PRNGKey(9)

    opt1 = trainer.make_optimizer(mk(1), total_steps=10)
    s1 = trainer.init_train_state(jax.random.PRNGKey(1), CFG, lora_cfg, opt1)
    s1, _ = trainer.train_step(s1, base, trainer.Batch(*(jnp.asarray(x) for x in big)),
                               key, CFG, lora_cfg, opt1, 0.1, 0.0)

    opt2 = trainer.make_optimizer(mk(2), total_steps=10)
    s2 = trainer.init_train_state(jax.random.PRNGKey(1), CFG, lora_cfg, opt2)
    for mb in micro:
        s2, _ = trainer.train_step(s2, base, trainer.Batch(*(jnp.asarray(x) for x in mb)),
                                   key, CFG, lora_cfg, opt2, 0.1, 0.0)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=1e-6),
        s1.lora_params, s2.lora_params)


def test_eval_per_sample_matches_singletons():
    """Per-sample eval rows must equal independent B=1 evaluations — the
    de-biased validation contract (duplicated pad rows can be dropped
    exactly)."""
    rng = np.random.default_rng(4)
    batch = _synthetic_batch(3, rng)
    base = uv.init_params(jax.random.PRNGKey(0), CFG)
    lora_cfg = LoRAConfig()
    lora = lora_lib.init_lora_params(jax.random.PRNGKey(1), CFG, lora_cfg)
    batched = trainer.eval_step_per_sample(
        lora, base, trainer.Batch(*(jnp.asarray(x) for x in batch)),
        CFG, lora_cfg, 0.1)
    for i in range(3):
        single = trainer.eval_step_per_sample(
            lora, base,
            trainer.Batch(*(jnp.asarray(np.asarray(x)[i:i + 1]) for x in batch)),
            CFG, lora_cfg, 0.1)
        np.testing.assert_allclose(float(batched[i]), float(single[0]),
                                   rtol=1e-4, atol=1e-6)


def test_eval_step(data_dir, tokenizer):
    ds = FinetuneDataset(data_dir, "valid", tokenizer)
    loader = DataLoader(ds, batch_size=2, seed=0, shuffle=False, drop_last=False,
                        pad_multiple=8)
    raw = next(iter(loader))
    batch = trainer.Batch(
        text_ids=raw["text_ids"] % 40, text_lengths=raw["text_lengths"],
        mel_codes=raw["mel_codes"], codes_lengths=raw["codes_lengths"],
        cond_mel=raw["cond_mel"], cond_lengths=raw["cond_lengths"])
    base = uv.init_params(jax.random.PRNGKey(0), CFG)
    lora_cfg = LoRAConfig()
    lora = lora_lib.init_lora_params(jax.random.PRNGKey(1), CFG, lora_cfg)
    m = trainer.eval_step(lora, base, batch, CFG, lora_cfg, 0.1)
    assert np.isfinite(float(m["loss"]))


def test_nonfinite_loss_is_a_true_skip(data_dir, tokenizer):
    """A non-finite loss must leave params, optimizer state AND step
    untouched (the reference `continue`s, train.py:899-902) — zeroed grads
    alone would still move params through AdamW momentum + weight decay
    (r3 review)."""
    ds = FinetuneDataset(data_dir, "train", tokenizer)
    loader = DataLoader(ds, batch_size=4, seed=0, pad_multiple=8)
    raw = next(iter(loader))
    batch = trainer.Batch(
        text_ids=raw["text_ids"] % 40, text_lengths=raw["text_lengths"],
        mel_codes=raw["mel_codes"], codes_lengths=raw["codes_lengths"],
        cond_mel=raw["cond_mel"], cond_lengths=raw["cond_lengths"])
    base = uv.init_params(jax.random.PRNGKey(0), CFG)
    tc = TrainConfig(gradient_accumulation_steps=1)
    opt = trainer.make_optimizer(tc, total_steps=20)
    state = trainer.init_train_state(jax.random.PRNGKey(1), CFG, tc.lora, opt)
    # two normal steps build nonzero AdamW moments
    for i in range(2):
        state, _ = trainer.train_step(state, base, batch,
                                      jax.random.PRNGKey(i), CFG, tc.lora,
                                      opt, 0.1, 0.0)
    # poison the batch → non-finite loss
    bad = trainer.Batch(
        text_ids=batch.text_ids, text_lengths=batch.text_lengths,
        mel_codes=batch.mel_codes, codes_lengths=batch.codes_lengths,
        cond_mel=np.full_like(batch.cond_mel, np.nan),
        cond_lengths=batch.cond_lengths)
    before = jax.device_get(state)
    state, metrics = trainer.train_step(state, base, bad,
                                        jax.random.PRNGKey(9), CFG, tc.lora,
                                        opt, 0.1, 0.0)
    after = jax.device_get(state)
    assert float(metrics["skipped"]) == 1.0
    assert int(after.step) == int(before.step)
    for a, b in zip(jax.tree.leaves(after.lora_params),
                    jax.tree.leaves(before.lora_params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(after.opt_state),
                    jax.tree.leaves(before.opt_state)):
        np.testing.assert_array_equal(a, b)


def test_loader_shards_have_equal_batch_counts(data_dir, tokenizer):
    """Ragged tails must be dropped so every host shard yields the SAME
    number of batches — unequal counts would hang the training collectives
    on the last step (r3 review)."""
    ds = FinetuneDataset(data_dir, "train", tokenizer)
    n = len(ds)
    assert n >= 3
    counts = []
    for shard in range(2):
        loader = DataLoader(ds, batch_size=1, seed=0, shuffle=False,
                            num_shards=2, shard_index=shard)
        counts.append(sum(1 for _ in loader))
    assert counts[0] == counts[1] == n // 2


def test_loader_early_stop_shuts_down_producer(data_dir, tokenizer):
    """Breaking out of the batch loop (max_steps_per_epoch) must not leak
    a producer thread blocked on the queue (r3 review)."""
    import threading

    ds = FinetuneDataset(data_dir, "train", tokenizer)
    loader = DataLoader(ds, batch_size=1, seed=0, prefetch=1)
    before = threading.active_count()
    for _ in range(3):
        it = iter(loader)
        next(it)
        it.close()  # consumer stops after one batch
    # the producers must exit promptly once their consumer closes
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
