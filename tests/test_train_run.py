"""End-to-end test of the training entry point (train/run.py): epochs,
validation, TensorBoard, merged checkpoints, auto-resume — on synthetic
data with a tiny model."""

import json
import os

import numpy as np
import pytest

from indextts_tpu.config import Config


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_ws")
    data = root / "processed_data"
    rng = np.random.default_rng(0)
    spk = data / "spk"
    (spk / "codes").mkdir(parents=True)
    (spk / "mels").mkdir()
    recs = {"train": [], "valid": []}
    for i in range(10):
        n = int(rng.integers(8, 14))
        np.save(spk / "codes" / f"c{i}.npy", rng.integers(0, 46, (n,)))
        np.save(spk / "mels" / f"c{i}.npy",
                rng.standard_normal((100, n * 4)).astype(np.float32))
        rec = {"audio": f"a{i}.wav", "text": "你好世界",
               "duration": 2.0, "codes": f"codes/c{i}.npy",
               "mels": f"mels/c{i}.npy"}
        recs["train" if i < 8 else "valid"].append(rec)
    for split, rs in recs.items():
        with open(spk / f"metadata_{split}.jsonl", "w") as f:
            for r in rs:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
    with open(data / "speaker_info.json", "w") as f:
        json.dump([{"speaker": "spk"}], f)
    # medoid artifacts (extraction contract) — embedded in exported .pth
    np.save(spk / "medoid_condition.npy",
            rng.standard_normal((1, 32, 64)).astype(np.float32))
    np.save(spk / "medoid_mel.npy",
            rng.standard_normal((100, 40)).astype(np.float32))

    model_dir = root / "models"
    model_dir.mkdir()
    import shutil

    shutil.copy("/root/reference/vocab.txt", model_dir / "vocab.txt")
    cfg = Config.from_dict({
        "gpt": {
            "model_dim": 64, "layers": 2, "heads": 4, "max_mel_tokens": 48,
            "max_text_tokens": 30, "number_text_tokens": 12000,
            "number_mel_codes": 50, "start_mel_token": 46, "stop_mel_token": 47,
            "condition_module": {"output_size": 32, "linear_units": 64,
                                  "attention_heads": 4, "num_blocks": 2,
                                  "perceiver_mult": 2},
        },
        "train": {
            "finetune_model_dir": str(root / "out"),
            "epochs": 2, "batch_size": 4, "valid_batch_size": 4,
            "max_steps_per_epoch": 2, "data_path": str(data),
            "early_stopping_patience": 5,
        },
    })
    cfg_path = model_dir / "config.yaml"
    cfg.save(str(cfg_path))
    return str(cfg_path), str(model_dir), str(root / "out")


def test_training_run_and_resume(workspace):
    cfg_path, model_dir, out_root = workspace
    from indextts_tpu.train.run import Trainer

    cfg = Config.load(cfg_path)
    t = Trainer(cfg, model_dir, run_name="testrun")
    t.train()

    out_dir = os.path.join(out_root, "testrun")
    names = os.listdir(out_dir)
    assert any(n.startswith("checkpoint_epoch_") for n in names)
    assert any(n.startswith("model_epoch_") for n in names)
    assert "config_finetuned.yaml" in names

    # reference-format .pth twins (train.py:954-967 artifact names), with
    # the speaker medoids embedded, loadable by our own converter
    assert {"gpt_epoch_1.pth", "gpt_best.pth", "gpt_finetuned.pth"} <= set(names)
    from indextts_tpu.io.checkpoint import load_gpt_checkpoint

    params, extras = load_gpt_checkpoint(
        os.path.join(out_dir, "gpt_finetuned.pth"), cfg.gpt)
    assert extras["speakers"] == ["spk"]
    assert extras["speaker_conditions"]["spk"].shape == (1, 32, 64)
    assert extras["speaker_mels"]["spk"].shape == (100, 40)
    assert params["text_embedding"]["weight"].shape[0] == 12001

    # resume: a fresh Trainer picks up the newest checkpoint
    t2 = Trainer(cfg, model_dir, run_name="testrun")
    t2.try_resume()
    assert t2.start_epoch >= 1
    t2.close()  # t1's writer was closed by train(); t2 never trains
