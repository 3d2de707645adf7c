"""Native C++ jsonl indexer vs Python fallback + lazy dataset mode."""

import json
import os

import numpy as np
import pytest

from indextts_tpu.data.native_index import (
    _get_lib,
    index_manifest,
    read_record,
)


@pytest.fixture()
def manifest(tmp_path):
    path = tmp_path / "metadata_train.jsonl"
    with open(path, "w", encoding="utf-8") as f:
        f.write(json.dumps({"audio": "a.wav", "text": "你好 world",
                             "duration": 2.25, "codes": "c0.npy",
                             "mels": "m0.npy"}, ensure_ascii=False) + "\n")
        f.write("\n")  # blank line must be skipped
        f.write(json.dumps({"audio": "b.wav", "text": "escaped \" quote",
                             "duration": 19.5, "codes": "c1.npy",
                             "mels": "m1.npy"}) + "\n")
        # final line without trailing newline
        f.write(json.dumps({"audio": "c.wav", "text": "x",
                             "duration": 0.5, "codes": "c2.npy",
                             "mels": "m2.npy"}))
    return str(path)


def test_native_lib_builds():
    assert _get_lib() is not None, "g++ toolchain should build the indexer"


def test_native_matches_python(manifest):
    mi_n = index_manifest(manifest, prefer_native=True)
    mi_p = index_manifest(manifest, prefer_native=False)
    np.testing.assert_array_equal(mi_n.offsets, mi_p.offsets)
    np.testing.assert_array_equal(mi_n.lengths, mi_p.lengths)
    np.testing.assert_allclose(mi_n.durations, mi_p.durations)
    np.testing.assert_array_equal(mi_n.text_lens, mi_p.text_lens)
    assert len(mi_n.offsets) == 3


def test_record_roundtrip(manifest):
    mi = index_manifest(manifest)
    for i in range(len(mi.offsets)):
        rec = read_record(manifest, int(mi.offsets[i]), int(mi.lengths[i]))
        assert "codes" in rec and "text" in rec


def test_lazy_dataset_mode(tmp_path):
    from indextts_tpu.data.dataset import FinetuneDataset
    from indextts_tpu.utils.textnorm import TextNormalizer
    from indextts_tpu.utils.tokenizer import TextTokenizer

    rng = np.random.default_rng(0)
    spk = tmp_path / "spk"
    (spk / "codes").mkdir(parents=True)
    (spk / "mels").mkdir()
    with open(spk / "metadata_train.jsonl", "w", encoding="utf-8") as f:
        for i in range(4):
            codes = rng.integers(0, 46, (10,)).astype(np.int64)
            mel = rng.standard_normal((100, 40)).astype(np.float32)
            np.save(spk / "codes" / f"c{i}.npy", codes)
            np.save(spk / "mels" / f"c{i}.npy", mel)
            f.write(json.dumps({
                "audio": f"a{i}.wav", "text": "你好世界",
                "duration": 2.0 + i if i < 3 else 99.0,  # last one filtered
                "codes": f"codes/c{i}.npy", "mels": f"mels/c{i}.npy",
            }, ensure_ascii=False) + "\n")

    tok = TextTokenizer("/root/reference/vocab.txt", TextNormalizer())
    ds = FinetuneDataset(str(tmp_path), "train", tok, lazy=True,
                         use_index_cache=False)
    assert len(ds) == 3  # duration filter applied from the native index
    item = ds.get_item(0, np.random.default_rng(1))
    assert item["mel_codes"].shape == (10,)
    assert item["cond_mel"].shape[0] == 100
    assert len(item["text_ids"]) > 0


def test_native_counts_unicode_escapes(tmp_path):
    """json.dumps default ensure_ascii=True writes CJK as \\uXXXX escapes;
    the native counter must read them as ONE codepoint each (and surrogate
    PAIRS as one), matching Python len() after json.loads (r3 review)."""
    path = tmp_path / "metadata_train.jsonl"
    texts = ["你好世界", "mixed 你好 ok", "astral 𝄞 clef", "🎵🎵"]
    with open(path, "w", encoding="utf-8") as f:
        for i, t in enumerate(texts):
            f.write(json.dumps({"audio": f"{i}.wav", "text": t,
                                 "duration": 1.5, "codes": "c.npy",
                                 "mels": "m.npy"}) + "\n")  # ensure_ascii=True
    mi_n = index_manifest(str(path), prefer_native=True)
    mi_p = index_manifest(str(path), prefer_native=False)
    expect = [len(t) for t in texts]
    assert list(mi_n.text_lens) == expect
    assert list(mi_p.text_lens) == expect
