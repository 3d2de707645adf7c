"""Reference-format .pth EXPORT (io/export.py): our pytrees → torch
checkpoints the reference stack loads.  The reference loads gpt.pth with
strict=True (train.py:67-75) and bigvgan_generator.pth with strict=True
(infer.py:392-393), so these tests verify (a) strict-load compatibility
against the reference-named torch mirrors, (b) bit-exact round-trips
through our own converters, (c) the full save→engine-load path."""

import os
import re
import shutil

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from indextts_tpu.config import Config  # noqa: E402
from indextts_tpu.io import export as export_io  # noqa: E402
from indextts_tpu.io.checkpoint import (  # noqa: E402
    convert_bigvgan_state_dict, convert_dvae_state_dict,
    convert_gpt_state_dict, load_gpt_checkpoint)

VOCAB = "/root/reference/vocab.txt"


def _assert_trees_equal(a, b, rtol=0.0, atol=0.0):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"tree structures differ:\n{ta}\nvs\n{tb}"
    for x, y in zip(la, lb):
        if rtol == 0.0 and atol == 0.0:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        else:
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# GPT
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def gpt_mirror_and_params():
    from tests.test_conditioning import CFG, TorchUnifiedVoice

    torch.manual_seed(0)
    tm = TorchUnifiedVoice(CFG).eval()
    params = convert_gpt_state_dict(tm.reference_state_dict(), CFG)
    return tm, CFG, params


def test_gpt_export_key_set_matches_reference(gpt_mirror_and_params):
    tm, cfg, params = gpt_mirror_and_params
    exported = export_io.export_gpt_state_dict(params, cfg)
    ref_keys = {k for k in tm.reference_state_dict()
                if not re.search(r"\.attn\.(bias|masked_bias)$", k)}
    assert set(exported) == ref_keys


def test_gpt_export_strict_loads_into_torch(gpt_mirror_and_params):
    """The reference loads gpt.pth strict=True on a module whose wte/wpe
    were deleted (gpt/model.py:281-284); the mirror keeps HF's wte/wpe, so
    `unexpected == []` + `missing ⊆ {wte, wpe, attn buffers}` is exactly
    reference-strict."""
    tm, cfg, params = gpt_mirror_and_params
    sd = export_io._to_torch_sd(
        export_io.export_gpt_state_dict(params, cfg), "fp32")
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert unexpected == []
    assert all(re.search(r"(wte|wpe|\.attn\.(bias|masked_bias))", k)
               for k in missing), missing
    # shapes landed: the loaded mirror still produces the same state_dict
    for k, v in sd.items():
        assert tm.state_dict()[k].shape == v.shape


def test_gpt_export_roundtrip_bitexact(gpt_mirror_and_params):
    _, cfg, params = gpt_mirror_and_params
    exported = export_io.export_gpt_state_dict(params, cfg)
    back = convert_gpt_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in exported.items()}, cfg)
    _assert_trees_equal(params, back)


def test_gpt_legacy_perceiver_export_roundtrip():
    """Legacy 'perceiver' condition type: AttentionBlock encoder + Identity
    context proj — the exporter must OMIT proj_context keys (the reference
    module has none, perceiver.py:234)."""
    from tests.test_legacy_conditioning_oracle import (
        TorchLegacyCondEncoder, TorchLegacyPerceiver, _cfg, _full_state_dict)

    torch.manual_seed(0)
    cfg = _cfg("perceiver")
    enc = TorchLegacyCondEncoder(100, 64, heads=cfg.heads).eval()
    perc = TorchLegacyPerceiver(64).eval()
    ref_sd = _full_state_dict(enc, perc)
    params = convert_gpt_state_dict(ref_sd, cfg)
    exported = export_io.export_gpt_state_dict(params, cfg)
    assert not any("proj_context" in k for k in exported)
    ref_keys = {k for k in ref_sd
                if not re.search(r"\.attn\.(bias|masked_bias)$", k)}
    assert set(exported) == ref_keys
    back = convert_gpt_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in exported.items()}, cfg)
    _assert_trees_equal(params, back)


def test_save_gpt_pth_fp16_with_speakers_roundtrips(gpt_mirror_and_params, tmp_path):
    """save_gpt_pth default fp16 (= reference save_dtype, train.py:817) +
    speaker extras load back through load_gpt_checkpoint."""
    _, cfg, params = gpt_mirror_and_params
    path = str(tmp_path / "finetuned_epoch_1.pth")
    cond = np.random.default_rng(0).standard_normal((1, 32, 64)).astype(np.float32)
    export_io.save_gpt_pth(path, params, cfg, extras={
        "speaker_conditions": {"kaishu": cond},
        "speaker_mels": {"kaishu": np.zeros((100, 12), np.float32)},
    })
    back, extras = load_gpt_checkpoint(path, cfg)
    assert extras["speakers"] == ["kaishu"]
    assert extras["speaker_conditions"]["kaishu"].shape == (1, 32, 64)
    np.testing.assert_allclose(extras["speaker_conditions"]["kaishu"], cond)
    # fp16 save: values equal after fp16 rounding
    expect = jax.tree.map(
        lambda x: np.asarray(x, np.float32).astype(np.float16).astype(np.float32),
        params)
    _assert_trees_equal(expect, back)
    # the raw file is reference-shaped: {'model': sd} + numpy conditions
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ckpt) == {"model", "speaker_conditions", "speakers",
                         "speaker_mels"}
    assert isinstance(ckpt["speaker_conditions"]["kaishu"], np.ndarray)
    assert ckpt["model"]["text_embedding.weight"].dtype == torch.float16


def test_exported_pth_drives_engine(gpt_mirror_and_params, tmp_path):
    """End-to-end: the exported artifact IS a servable model dir input."""
    from indextts_tpu.engine import IndexTTS

    _, gcfg, params = gpt_mirror_and_params
    d = tmp_path / "exported_model"
    d.mkdir()
    cfg = Config.from_dict({
        "gpt": {
            "model_dim": 64, "layers": 2, "heads": 4, "max_mel_tokens": 48,
            "max_text_tokens": 30, "number_text_tokens": 40,
            "number_mel_codes": 50, "start_mel_token": 46, "stop_mel_token": 47,
            "condition_module": {"output_size": 32, "linear_units": 48,
                                  "attention_heads": 4, "num_blocks": 2,
                                  "perceiver_mult": 2},
        },
        "bigvgan": {
            "upsample_rates": [2], "upsample_kernel_sizes": [4],
            "upsample_initial_channel": 16, "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1]], "speaker_embedding_dim": 8,
            "gpt_dim": 64, "use_fused_kernel": False,
        },
    })
    cfg.save(str(d / "config.yaml"))
    shutil.copy(VOCAB, d / "vocab.txt")
    export_io.save_gpt_pth(str(d / "gpt.pth"), params, gcfg, extras={
        "speaker_conditions": {
            "kaishu": np.zeros((1, 32, 64), np.float32)},
    })
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = IndexTTS(cfg_path=str(d / "config.yaml"), model_dir=str(d),
                       precision_config={"gpt": "fp32", "vocoder": "fp32"})
    assert tts.speaker_list == ["kaishu"]
    w = np.asarray(tts.gpt_params["text_embedding"]["weight"])
    np.testing.assert_allclose(
        w, np.asarray(params["text_embedding"]["weight"], np.float32)
        .astype(np.float16).astype(np.float32), rtol=0, atol=0)


# ---------------------------------------------------------------------------
# BigVGAN
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bigvgan_mirror_and_params():
    from tests.test_bigvgan import CFG, ECAPA_SIZE, TorchBigVGAN

    torch.manual_seed(0)
    tm = TorchBigVGAN(CFG, ECAPA_SIZE).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    params = convert_bigvgan_state_dict(
        {k: v for k, v in tm.state_dict().items() if "num_batches" not in k},
        CFG)
    return tm, CFG, ECAPA_SIZE, params


def test_bigvgan_export_strict_loads_and_forward_matches(bigvgan_mirror_and_params):
    """infer.py:393 is a strict load including weight_g/weight_v and BN
    buffers — load the export into a FRESH mirror and require identical
    waveforms."""
    from tests.test_bigvgan import TorchBigVGAN

    tm, cfg, ecapa_size, _ = bigvgan_mirror_and_params
    exported = export_io._to_torch_sd(
        export_io.export_bigvgan_state_dict(
            convert_bigvgan_state_dict(
                {k: v for k, v in tm.state_dict().items()
                 if "num_batches" not in k}, cfg), cfg), "fp32")
    torch.manual_seed(123)  # fresh != original weights before the load
    tm2 = TorchBigVGAN(cfg, ecapa_size).eval()
    tm2.load_state_dict(exported, strict=True)
    rng = np.random.default_rng(1)
    latent = torch.from_numpy(rng.standard_normal((1, 6, 16)).astype(np.float32))
    mel_ref = torch.from_numpy(rng.standard_normal((1, 25, 12)).astype(np.float32))
    with torch.no_grad():
        np.testing.assert_allclose(tm(latent, mel_ref).numpy(),
                                   tm2(latent, mel_ref).numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_bigvgan_export_roundtrip(bigvgan_mirror_and_params, tmp_path):
    _, cfg, _, params = bigvgan_mirror_and_params
    path = str(tmp_path / "bigvgan_generator.pth")
    export_io.save_bigvgan_pth(path, params, cfg)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ckpt) == {"generator"}
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        back = convert_bigvgan_state_dict(ckpt["generator"], cfg)
    # weight-norm split→fold is float-rounded, not bitwise
    _assert_trees_equal(params, back, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# DVAE
# ---------------------------------------------------------------------------

def test_dvae_export_roundtrip(tmp_path):
    from tests.test_dvae import CFG, TorchDVAE

    torch.manual_seed(0)
    tm = TorchDVAE(CFG).eval()
    ref_sd = tm.state_dict_reference_names()
    params = convert_dvae_state_dict(ref_sd, CFG)
    exported = export_io.export_dvae_state_dict(params, CFG)
    assert set(exported) == set(ref_sd)
    path = str(tmp_path / "dvae.pth")
    export_io.save_dvae_pth(path, params, CFG)
    back = convert_dvae_state_dict(
        torch.load(path, map_location="cpu", weights_only=False), CFG)
    _assert_trees_equal(params, back)
