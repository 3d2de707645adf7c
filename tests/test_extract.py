"""Codec extraction pipeline on synthetic audio (reconstruction of the
missing tools/extract_codec.py — data contract per SURVEY.md §2.12)."""

import json
import os

import numpy as np
import pytest

from indextts_tpu.config import Config
from indextts_tpu.data.extract import (
    extract_audio_list,
    medoid_index,
    parse_audio_list,
    speaker_of,
)
from indextts_tpu.utils.audio import write_wav

TINY = Config.from_dict({
    "gpt": {
        "model_dim": 64, "layers": 2, "heads": 4,
        "condition_module": {"output_size": 32, "linear_units": 64,
                              "attention_heads": 4, "num_blocks": 2,
                              "perceiver_mult": 2},
    },
    "vqvae": {"channels": 100, "num_tokens": 64, "hidden_dim": 16,
               "codebook_dim": 24, "num_resnet_blocks": 2},
})


@pytest.fixture(scope="module")
def audio_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    lists_dir = root / "audio_list"
    lists_dir.mkdir()
    lines = []
    spk_dir = root / "spk_x"
    spk_dir.mkdir()
    for i in range(4):
        wav = (rng.standard_normal(24000 + i * 4000) * 3000).astype(np.int16)
        path = spk_dir / f"clip{i}.wav"
        write_wav(str(path), wav, 24000)
        lines.append(f"{path}\t這是第{i}句測試文本。")
    list_path = lists_dir / "spk_x.list"
    list_path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(root), str(list_path)


def test_parse_and_speaker(audio_tree):
    root, list_path = audio_tree
    entries = parse_audio_list(list_path)
    assert len(entries) == 4
    assert speaker_of(entries[0][0]) == "spk_x"


def test_medoid_index():
    rng = np.random.default_rng(1)
    lat = rng.standard_normal((5, 32, 8))
    lat[3] = lat.mean(axis=0)  # closest to the centroid → medoid
    assert medoid_index(lat) == 3


def test_extraction_outputs(audio_tree, tmp_path):
    root, list_path = audio_tree
    out = str(tmp_path / "processed")
    info = extract_audio_list(list_path, out, TINY, model_dir="/nonexistent",
                              valid_ratio=0.25, extract_condition=True)
    assert "spk_x" in info
    st = info["spk_x"]
    assert st["num_clips"] == 4
    assert st["num_train"] + st["num_valid"] == 4

    spk = os.path.join(out, "spk_x")
    # per-clip artifacts
    codes = np.load(os.path.join(spk, "codes", "clip0.npy"))
    mel = np.load(os.path.join(spk, "mels", "clip0.npy"))
    assert mel.shape[0] == 100
    assert codes.shape[0] == mel.shape[1] // 4  # 4x time reduction
    # manifests with the reference keys
    with open(os.path.join(spk, "metadata_train.jsonl")) as f:
        rec = json.loads(f.readline())
    assert set(rec) == {"audio", "text", "duration", "codes", "mels"}
    # medoid condition (1, 32, D)
    med = np.load(os.path.join(spk, "medoid_condition.npy"))
    assert med.shape == (1, 32, TINY.gpt.model_dim)
    # global speaker_info.json
    with open(os.path.join(out, "speaker_info.json")) as f:
        speakers = json.load(f)
    assert speakers[0]["speaker"] == "spk_x"


def test_batched_matches_per_clip(audio_tree, tmp_path):
    """Batched/bucketed extraction vs the exact per-clip path: mels must be
    bit-close everywhere (host-side reflect pad + center=False makes batch
    padding invisible); codes identical except a bounded encoder-receptive-
    field tail window; conditioning latents close (masked)."""
    from indextts_tpu.data.extract import CodecExtractor
    from indextts_tpu.utils.audio import load_prompt_audio

    _, list_path = audio_tree
    ex = CodecExtractor(TINY, "/nonexistent", batch_size=4)
    entries = parse_audio_list(list_path)
    wavs = [np.asarray(load_prompt_audio(p, 24000), np.float32).reshape(-1)
            for p, _ in entries]
    batched = ex.extract_batch(wavs, extract_condition=True)
    for w, feat in zip(wavs, batched):
        mel_ref, codes_ref = ex.extract_clip_features(w[None])
        cond_ref = ex.conditioning_latent(mel_ref)
        np.testing.assert_allclose(feat["mel"], mel_ref, rtol=1e-4, atol=1e-4)
        n = codes_ref.shape[0]
        assert feat["codes"].shape[0] == n
        # tail window: 2 stride-2 convs (k=5ish) + resblocks ⇒ a few codes
        tail = 8
        np.testing.assert_array_equal(feat["codes"][: n - tail],
                                      codes_ref[: n - tail])
        np.testing.assert_allclose(feat["cond"], cond_ref, rtol=5e-3, atol=5e-3)


def test_medoid_mel_saved(audio_tree, tmp_path):
    _, list_path = audio_tree
    out = str(tmp_path / "proc")
    extract_audio_list(list_path, out, TINY, model_dir="/nonexistent",
                       valid_ratio=0.25, extract_condition=True)
    mel = np.load(os.path.join(out, "spk_x", "medoid_mel.npy"))
    assert mel.ndim == 2 and mel.shape[0] == 100
    assert np.abs(mel).max() > 0


def test_extraction_feeds_training_loaders(audio_tree, tmp_path):
    """The extraction output dir is the data contract for BOTH training
    loaders: train/dvae.discover_mels and train/vocoder.latent_batches must
    consume speaker_info.json + metadata + medoid artifacts as written
    (the real file is a LIST of stats dicts, not a name->dir map)."""
    import jax
    import jax.numpy as jnp

    from indextts_tpu.models import unified_voice as uv
    from indextts_tpu.train import dvae as dvae_train
    from indextts_tpu.train import vocoder as vtrain
    from indextts_tpu.utils.tokenizer import TextTokenizer

    root, list_path = audio_tree
    out = str(tmp_path / "proc")
    extract_audio_list(list_path, out, TINY, model_dir="/nonexistent",
                       valid_ratio=0.25, extract_condition=True)

    # DVAE loader: finds every referenced mel
    mels = dvae_train.discover_mels(out)
    assert len(mels) == 4 and all(os.path.exists(p) for p in mels)

    # vocoder loader: yields correctly-shaped batches from real artifacts
    gpt_params = uv.init_params(jax.random.PRNGKey(0), TINY.gpt)
    tok = TextTokenizer("/root/reference/vocab.txt")
    tc = vtrain.VocoderTrainConfig(batch_size=2, segment_codes=8, seed=0)
    it = vtrain.latent_batches(out, gpt_params, TINY.gpt, tok, tc,
                               mel_ref_frames=32)
    b = next(it)
    assert b.latent.shape == (2, 8, TINY.gpt.model_dim)
    assert b.mel_ref.shape == (2, 32, 100)
    assert b.wav.shape == (2, 1, 8 * 1024)
    assert np.isfinite(b.latent).all() and np.isfinite(b.wav).all()


def test_bucket_saturating_unaligned_clip(tmp_path):
    """A clip whose frame count exactly fills its bucket WITHOUT being
    hop-aligned used to overflow the dispatch buffer (broadcast ValueError,
    r3 review): frames == Fb only bounds T <= Fb*hop - 1, but the reflect
    pad adds n_fft, up to hop-1 past the (Fb-1)*hop + n_fft row."""
    from indextts_tpu.data.extract import CodecExtractor, frames_for

    ex = CodecExtractor(TINY, model_dir="/nonexistent", batch_size=2)
    hop = TINY.dataset.mel.hop_length
    T = 255 * hop + hop // 2  # frames = 256 == smallest bucket, T % hop != 0
    assert frames_for(T, hop) == 256
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(T).astype(np.float32) * 0.1,
            rng.standard_normal(T // 2).astype(np.float32) * 0.1]
    feats = ex.extract_batch(wavs, extract_condition=False)
    assert feats[0]["mel"].shape == (100, 256)
    assert feats[1]["mel"].shape[1] == frames_for(T // 2, hop)


def test_same_stem_clips_do_not_overwrite(tmp_path):
    """Two clips of one speaker sharing a basename must get distinct
    codes/mels files (the manifest keeps both records — silently sharing
    one array pairs a clip's codes with another's text, r3 review)."""
    from indextts_tpu.data.extract import extract_audio_list
    from indextts_tpu.utils.audio import write_wav

    rng = np.random.default_rng(1)
    lines = []
    for sub in ("a", "b"):
        d = tmp_path / sub / "spk_y"
        d.mkdir(parents=True)
        wav = (rng.standard_normal(24000) * 3000).astype(np.int16)
        write_wav(str(d / "take.wav"), wav, 24000)
        lines.append(f"{d / 'take.wav'}\t{sub}句測試。")
    lp = tmp_path / "spk_y.list"
    lp.write_text("\n".join(lines) + "\n", encoding="utf-8")
    out = str(tmp_path / "proc")
    extract_audio_list(str(lp), out, TINY, model_dir="/nonexistent",
                       valid_ratio=0.0, extract_condition=False)
    recs = []
    for split in ("train", "valid"):  # >1 clips always reserves 1 for valid
        mp = os.path.join(out, "spk_y", f"metadata_{split}.jsonl")
        if os.path.exists(mp):
            with open(mp) as f:
                recs += [json.loads(l) for l in f if l.strip()]
    assert len(recs) == 2
    assert recs[0]["codes"] != recs[1]["codes"]
    for r in recs:
        assert os.path.exists(os.path.join(out, "spk_y", r["codes"]))
