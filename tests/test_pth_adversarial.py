"""Adversarial .pth converter battery (VERDICT r2 #4): the variants that
bite on real-checkpoint day — fp16/bf16-saved tensors, `module.` prefixes,
`model`/`state_dict` nesting vs flat, unexpected extra buffers, missing
keys — must either load correctly or fail with an ACTIONABLE error, never
produce silent garbage.  Reference handles the analogous variance at
utils/checkpoint.py:23-89 and train.py:40."""

import os
import warnings

import numpy as np
import pytest
import torch

import jax

from indextts_tpu.config import GPTConfig
from indextts_tpu.io import checkpoint as ckpt_io


@pytest.fixture(scope="module")
def oracle():
    from tests.test_conditioning import CFG, TorchUnifiedVoice

    torch.manual_seed(0)
    tm = TorchUnifiedVoice(CFG).eval()
    sd = tm.reference_state_dict()
    base = ckpt_io.convert_gpt_state_dict(dict(sd), CFG)
    return CFG, sd, base


def _assert_tree_close(a, b, atol=0.0):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=atol and 1e-2)


def test_fp16_saved_tensors_load(oracle):
    cfg, sd, base = oracle
    half = {k: (v.half() if torch.is_floating_point(v) else v)
            for k, v in sd.items()}
    got = ckpt_io.convert_gpt_state_dict(half, cfg)
    # values round-trip through fp16: close, not exact
    _assert_tree_close(got, base, atol=2e-3)


def test_bf16_saved_tensors_load(oracle):
    """bf16 torch tensors cannot be viewed by numpy directly — the converter
    must go through torch's fp32 upcast, not np.asarray."""
    cfg, sd, base = oracle
    bf = {k: (v.bfloat16() if torch.is_floating_point(v) else v)
          for k, v in sd.items()}
    got = ckpt_io.convert_gpt_state_dict(bf, cfg)
    _assert_tree_close(got, base, atol=2e-2)


def test_module_prefixed_keys_load(oracle):
    cfg, sd, base = oracle
    pref = {"module." + k: v for k, v in sd.items()}
    got = ckpt_io.convert_gpt_state_dict(pref, cfg)
    _assert_tree_close(got, base)


def test_nesting_variants_load_equal(oracle, tmp_path):
    cfg, sd, base = oracle
    for name, ckpt in [
        ("flat.pth", dict(sd)),
        ("model.pth", {"model": dict(sd)}),
        ("sdict.pth", {"state_dict": dict(sd)}),
        ("module.pth", {"model": {"module." + k: v for k, v in sd.items()}}),
    ]:
        p = str(tmp_path / name)
        torch.save(ckpt, p)
        got, extras = ckpt_io.load_gpt_checkpoint(p, cfg)
        _assert_tree_close(got, base)


def test_unexpected_extra_buffers_warn_not_crash(oracle):
    cfg, sd, base = oracle
    noisy = dict(sd)
    noisy["totally.unknown.buffer"] = torch.zeros(3)
    noisy["gpt.h.0.attn.rotary_inv_freq"] = torch.zeros(8)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        got = ckpt_io.convert_gpt_state_dict(noisy, cfg)
    _assert_tree_close(got, base)
    msgs = [str(w.message) for w in rec]
    assert any("unexpected" in m and "totally.unknown.buffer" in m
               for m in msgs), msgs


def test_known_reference_noise_keys_are_silent(oracle):
    """Real reference checkpoints carry HF GPT2's unused wte/wpe tables and
    causal-mask buffers — these are expected and must NOT warn."""
    cfg, sd, base = oracle
    noisy = dict(sd)
    D = base["final_norm"]["scale"].shape[0]
    noisy["gpt.wte.weight"] = torch.zeros(32, D)
    noisy["gpt.wpe.weight"] = torch.zeros(256, D)
    noisy["gpt.h.0.attn.bias"] = torch.ones(1, 1, 8, 8)
    noisy["gpt.h.0.attn.masked_bias"] = torch.tensor(-1e4)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        got = ckpt_io.convert_gpt_state_dict(noisy, cfg)
    _assert_tree_close(got, base)
    assert not [w for w in rec if "unexpected" in str(w.message)], (
        [str(w.message) for w in rec])


def test_missing_required_key_is_actionable(oracle):
    cfg, sd, _ = oracle
    broken = {k: v for k, v in sd.items() if k != "gpt.h.1.mlp.c_fc.weight"}
    with pytest.raises(KeyError) as ei:
        ckpt_io.convert_gpt_state_dict(broken, cfg)
    msg = str(ei.value)
    assert "gpt.h.1.mlp.c_fc.weight" in msg
    assert "UnifiedVoice" in msg  # names the expected format


def test_raw_tensor_checkpoint_rejected(tmp_path, oracle):
    cfg = oracle[0]
    p = str(tmp_path / "garbage.pth")
    torch.save(torch.zeros(4), p)
    with pytest.raises(ValueError, match="expected a dict"):
        ckpt_io.load_gpt_checkpoint(p, cfg)


def test_speaker_extras_bf16_and_missing(oracle, tmp_path):
    """Speaker extras saved as bf16 torch tensors must load (numpy cannot
    view bf16); entirely missing extras must also load fine."""
    cfg, sd, base = oracle
    D = base["final_norm"]["scale"].shape[0]
    p = str(tmp_path / "spk.pth")
    torch.save({
        "model": dict(sd),
        "speaker_conditions": {
            "kaishu": torch.randn(1, 32, D).bfloat16()},
        "speakers": ["kaishu"],
    }, p)
    got, extras = ckpt_io.load_gpt_checkpoint(p, cfg)
    assert extras["speaker_conditions"]["kaishu"].dtype == np.float32
    assert extras["speaker_conditions"]["kaishu"].shape == (1, 32, D)

    p2 = str(tmp_path / "nospk.pth")
    torch.save({"model": dict(sd)}, p2)
    got2, extras2 = ckpt_io.load_gpt_checkpoint(p2, cfg)
    assert "speaker_conditions" not in extras2
    _assert_tree_close(got2, base)


def test_flat_mean_condition_extraction(oracle, tmp_path):
    """Learnable per-speaker conditions stored flat in the state dict
    (mean_condition_<id>) must be pulled into extras, fp16-safe."""
    cfg, sd, base = oracle
    D = base["final_norm"]["scale"].shape[0]
    noisy = dict(sd)
    noisy["mean_condition"] = torch.randn(1, 32, D).half()
    noisy["mean_condition_spk1"] = torch.randn(1, 32, D).half()
    p = str(tmp_path / "mc.pth")
    torch.save({"model": noisy}, p)
    got, extras = ckpt_io.load_gpt_checkpoint(p, cfg)
    assert extras["mean_condition"].shape == (1, 32, D)
    assert "spk1" in extras["speaker_conditions"]
    _assert_tree_close(got, base)
