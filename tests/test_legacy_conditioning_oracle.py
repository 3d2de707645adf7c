"""Legacy conditioning checkpoint conversion vs torch mirrors.

The reference has three conditioning variants (gpt/model.py:349-365):
conformer_perceiver (covered by tests/test_conditioning.py), the legacy
"perceiver" (AttentionBlock encoder + PerceiverResampler with an Identity
context proj), and the mean-pooled default.  These tests build torch
mirrors of the legacy variants, feed their state_dicts through
io/checkpoint.convert_gpt_state_dict, and require get_conditioning parity.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from indextts_tpu.config import ConditionModuleConfig, GPTConfig  # noqa: E402
from indextts_tpu.models import unified_voice as uv  # noqa: E402

D = 64


def _cfg(condition_type):
    return GPTConfig(
        model_dim=D, layers=2, heads=4, max_mel_tokens=48, max_text_tokens=30,
        number_text_tokens=40, number_mel_codes=50, start_mel_token=46,
        stop_mel_token=47, condition_type=condition_type,
        condition_module=ConditionModuleConfig(
            output_size=32, linear_units=64, attention_heads=4, num_blocks=2,
            perceiver_mult=2))


def _groups(channels):
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups:
        groups //= 2
    return groups


class TorchAttentionBlock(nn.Module):
    """Reference AttentionBlock + QKVAttentionLegacy (arch_util.py:44-126)."""

    def __init__(self, channels, heads):
        super().__init__()
        self.heads = heads
        self.norm = nn.GroupNorm(_groups(channels), channels)
        self.qkv = nn.Conv1d(channels, channels * 3, 1)
        self.proj_out = nn.Conv1d(channels, channels, 1)

    def forward(self, x):
        b, c, t = x.shape
        qkv = self.qkv(self.norm(x))
        ch = c // self.heads
        q, k, v = qkv.reshape(b * self.heads, ch * 3, t).split(ch, dim=1)
        scale = 1 / math.sqrt(math.sqrt(ch))
        w = torch.einsum("bct,bcs->bts", q * scale, k * scale)
        w = torch.softmax(w.float(), dim=-1).type(w.dtype)
        a = torch.einsum("bts,bcs->bct", w, v)
        h = a.reshape(b, -1, t)
        return x + self.proj_out(h)


class TorchLegacyCondEncoder(nn.Module):
    """Reference ConditioningEncoder (gpt/model.py:216-246)."""

    def __init__(self, spec_dim, embedding_dim, heads, mean=False):
        super().__init__()
        self.init = nn.Conv1d(spec_dim, embedding_dim, kernel_size=1)
        self.attn = nn.Sequential(
            *[TorchAttentionBlock(embedding_dim, heads) for _ in range(6)])
        self.mean = mean

    def forward(self, x):
        h = self.attn(self.init(x))
        return h.mean(dim=2) if self.mean else h


class TorchLegacyPerceiver(nn.Module):
    """Reference PerceiverResampler(dim, dim_context=dim) — proj_context is
    nn.Identity so no keys are emitted (perceiver.py:234)."""

    def __init__(self, dim, heads=8, dim_head=64, ff_mult=4, num_latents=32):
        super().__init__()
        from tests.test_conditioning import PerceiverAttention

        inner = int(dim * ff_mult * 2 / 3)
        self.latents = nn.Parameter(torch.randn(num_latents, dim) * 0.02)
        self.layers = nn.ModuleList()
        for _ in range(2):
            ff = nn.Sequential(nn.Linear(dim, inner * 2), nn.Identity(),
                               nn.Linear(inner, dim))
            self.layers.append(nn.ModuleList(
                [PerceiverAttention(dim, heads, dim_head), ff]))
        self.norm = nn.Module()
        self.norm.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        lat = self.latents.unsqueeze(0).expand(x.shape[0], -1, -1)
        mask = torch.ones(x.shape[0], lat.shape[1] + x.shape[1], dtype=torch.bool)
        for attn, ff in self.layers:
            lat = attn(lat, x, mask) + lat
            h = ff[0](lat)
            val, gate = h.chunk(2, dim=-1)
            lat = ff[2](F.gelu(gate) * val) + lat
        scale = lat.shape[-1] ** 0.5
        return F.normalize(lat, dim=-1) * scale * self.norm.gamma


def _full_state_dict(cond_encoder, perceiver=None):
    """Wrap the conditioning modules with trunk/embedding/head tensors so
    convert_gpt_state_dict sees a complete reference checkpoint."""
    from tests.test_conditioning import TorchUnifiedVoice

    tm = TorchUnifiedVoice(_cfg("conformer_perceiver")).eval()
    sd = {k: v for k, v in tm.reference_state_dict().items()
          if not k.startswith(("conditioning_encoder.", "perceiver_encoder."))}
    for k, v in cond_encoder.state_dict().items():
        sd["conditioning_encoder." + k] = v
    if perceiver is not None:
        for k, v in perceiver.state_dict().items():
            sd["perceiver_encoder." + k] = v
    return sd


def test_legacy_perceiver_conditioning_parity():
    from indextts_tpu.io.checkpoint import convert_gpt_state_dict

    torch.manual_seed(0)
    cfg = _cfg("perceiver")
    enc = TorchLegacyCondEncoder(100, D, heads=cfg.heads).eval()
    perc = TorchLegacyPerceiver(D).eval()
    params = jax.tree.map(jnp.asarray,
                          convert_gpt_state_dict(_full_state_dict(enc, perc), cfg))

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 100, 37)).astype(np.float32)
    with torch.no_grad():
        h = enc(torch.from_numpy(mel))
        ref = perc(h.transpose(1, 2)).numpy()
    ours = np.asarray(uv.get_conditioning(
        params, cfg, jnp.asarray(mel), jnp.asarray([37, 37])))
    assert ours.shape == ref.shape == (2, 32, D)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_legacy_mean_conditioning_parity():
    from indextts_tpu.io.checkpoint import convert_gpt_state_dict

    torch.manual_seed(1)
    cfg = _cfg("default_mean")
    enc = TorchLegacyCondEncoder(100, D, heads=cfg.heads, mean=True).eval()
    params = jax.tree.map(jnp.asarray,
                          convert_gpt_state_dict(_full_state_dict(enc), cfg))

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 100, 29)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(mel)).unsqueeze(1).numpy()  # [B, 1, D]
    ours = np.asarray(uv.get_conditioning(
        params, cfg, jnp.asarray(mel), jnp.asarray([29, 29])))
    assert ours.shape == ref.shape == (2, 1, D)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
