"""Full conditioning-stack + latent-forward parity vs a torch mirror of the
reference UnifiedVoice (conformer per conformer_encoder.py:389-465 +
attention.py:141-242, perceiver per perceiver.py:219-313, trunk = the real
HF GPT2Model).  The mirror's state_dict uses reference naming and feeds
convert_gpt_state_dict, so this validates the whole gpt.pth conversion and
the numerics end-to-end."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from indextts_tpu.config import ConditionModuleConfig, GPTConfig
from indextts_tpu.io.checkpoint import convert_gpt_state_dict
from indextts_tpu.models import unified_voice as uv

CFG = GPTConfig(
    model_dim=64, layers=2, heads=4, max_mel_tokens=48, max_text_tokens=30,
    number_text_tokens=40, number_mel_codes=50, start_mel_token=46,
    stop_mel_token=47,
    condition_module=ConditionModuleConfig(
        output_size=32, linear_units=48, attention_heads=4, num_blocks=2,
        perceiver_mult=2),
)


# --- conformer mirror ------------------------------------------------------

class RelPosMHA(nn.Module):
    def __init__(self, heads, dim):
        super().__init__()
        self.h, self.d_k = heads, dim // heads
        self.linear_q = nn.Linear(dim, dim)
        self.linear_k = nn.Linear(dim, dim)
        self.linear_v = nn.Linear(dim, dim)
        self.linear_out = nn.Linear(dim, dim)
        self.linear_pos = nn.Linear(dim, dim, bias=False)
        self.pos_bias_u = nn.Parameter(torch.randn(self.h, self.d_k) * 0.1)
        self.pos_bias_v = nn.Parameter(torch.randn(self.h, self.d_k) * 0.1)

    def forward(self, x, mask, pos_emb):
        B, T, D = x.shape
        q = self.linear_q(x).view(B, T, self.h, self.d_k)
        k = self.linear_k(x).view(B, T, self.h, self.d_k).transpose(1, 2)
        v = self.linear_v(x).view(B, T, self.h, self.d_k).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(1, -1, self.h, self.d_k).transpose(1, 2)
        q_u = (q + self.pos_bias_u).transpose(1, 2)
        q_v = (q + self.pos_bias_v).transpose(1, 2)
        scores = (q_u @ k.transpose(-2, -1) + q_v @ p.transpose(-2, -1)) / math.sqrt(self.d_k)
        m = mask.unsqueeze(1).eq(0)  # (B,1,1,T)
        scores = scores.masked_fill(m, -float("inf"))
        attn = torch.softmax(scores, dim=-1).masked_fill(m, 0.0)
        ctx = (attn @ v).transpose(1, 2).reshape(B, T, D)
        return self.linear_out(ctx)


class ConvModule(nn.Module):
    def __init__(self, ch, k=15):
        super().__init__()
        self.pointwise_conv1 = nn.Conv1d(ch, 2 * ch, 1)
        self.depthwise_conv = nn.Conv1d(ch, ch, k, padding=(k - 1) // 2, groups=ch)
        self.norm = nn.LayerNorm(ch)
        self.pointwise_conv2 = nn.Conv1d(ch, ch, 1)

    def forward(self, x, mask_pad):
        x = x.transpose(1, 2)
        x = x.masked_fill(~mask_pad, 0.0)
        x = F.glu(self.pointwise_conv1(x), dim=1)
        x = self.depthwise_conv(x)
        x = F.silu(self.norm(x.transpose(1, 2))).transpose(1, 2)
        x = self.pointwise_conv2(x)
        x = x.masked_fill(~mask_pad, 0.0)
        return x.transpose(1, 2)


class FF(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.w_1 = nn.Linear(dim, hidden)
        self.w_2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.w_2(F.silu(self.w_1(x)))


class ConformerLayer(nn.Module):
    def __init__(self, dim, heads, hidden):
        super().__init__()
        self.self_attn = RelPosMHA(heads, dim)
        self.feed_forward = FF(dim, hidden)
        self.conv_module = ConvModule(dim)
        self.norm_mha = nn.LayerNorm(dim)
        self.norm_conv = nn.LayerNorm(dim)
        self.norm_ff = nn.LayerNorm(dim)
        self.norm_final = nn.LayerNorm(dim)

    def forward(self, x, mask, pos_emb, mask_pad):
        x = x + self.self_attn(self.norm_mha(x), mask, pos_emb)
        x = x + self.conv_module(self.norm_conv(x), mask_pad)
        x = x + self.feed_forward(self.norm_ff(x))
        return self.norm_final(x)


class TorchConformer(nn.Module):
    def __init__(self, in_dim, dim, heads, hidden, blocks):
        super().__init__()
        self.dim = dim
        self.embed = nn.Module()
        self.embed.conv = nn.Sequential(nn.Conv2d(1, dim, 3, 2), nn.ReLU())
        self.embed.out = nn.Sequential(nn.Linear(dim * ((in_dim - 1) // 2), dim))
        self.encoders = nn.ModuleList(
            [ConformerLayer(dim, heads, hidden) for _ in range(blocks)])
        self.after_norm = nn.LayerNorm(dim)

    @staticmethod
    def pos_table(T, dim):
        pe = torch.zeros(T, dim)
        pos = torch.arange(T).unsqueeze(1).float()
        div = torch.exp(torch.arange(0, dim, 2).float() * -(math.log(10000.0) / dim))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        return pe.unsqueeze(0)

    def forward(self, mel, lengths):  # mel [B, T, F]
        B, T, _ = mel.shape
        mask = (torch.arange(T)[None, :] < lengths[:, None]).unsqueeze(1)  # (B,1,T)
        x = self.embed.conv(mel.unsqueeze(1))
        b, c, t, f = x.shape
        x = self.embed.out(x.transpose(1, 2).contiguous().view(b, t, c * f))
        mask = mask[:, :, 2::2]
        x = x * math.sqrt(self.dim)
        pos_emb = self.pos_table(x.size(1), self.dim)
        for layer in self.encoders:
            x = layer(x, mask, pos_emb, mask.transpose(1, 2).transpose(1, 2))
        return self.after_norm(x), mask


# --- perceiver mirror ------------------------------------------------------

class PerceiverAttention(nn.Module):
    def __init__(self, dim, heads=4, dim_head=64):
        super().__init__()
        inner = heads * dim_head
        self.h, self.dh = heads, dim_head
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)

    def forward(self, latents, context, mask):
        B, N, _ = latents.shape
        ctx = torch.cat([latents, context], dim=1)
        q = self.to_q(latents).view(B, N, self.h, self.dh).transpose(1, 2)
        k, v = self.to_kv(ctx).chunk(2, dim=-1)
        k = k.view(B, -1, self.h, self.dh).transpose(1, 2)
        v = v.view(B, -1, self.h, self.dh).transpose(1, 2)
        sim = (q @ k.transpose(-2, -1)) * self.dh ** -0.5
        sim = sim.masked_fill(~mask[:, None, None, :], -torch.finfo(sim.dtype).max)
        out = (sim.softmax(-1) @ v).transpose(1, 2).reshape(B, N, -1)
        return self.to_out(out)


class TorchPerceiver(nn.Module):
    def __init__(self, dim, dim_ctx, heads, ff_mult, num_latents=32):
        super().__init__()
        inner = int(dim * ff_mult * 2 / 3)
        self.proj_context = nn.Linear(dim_ctx, dim)
        self.latents = nn.Parameter(torch.randn(num_latents, dim) * 0.02)
        self.layers = nn.ModuleList()
        for _ in range(2):
            ff = nn.Sequential(nn.Linear(dim, inner * 2), nn.Identity(),
                                nn.Linear(inner, dim))
            self.layers.append(nn.ModuleList([PerceiverAttention(dim, heads), ff]))
        self.norm = nn.Module()
        self.norm.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x, mask):
        x = self.proj_context(x)
        lat = self.latents.unsqueeze(0).expand(x.shape[0], -1, -1)
        for attn, ff in self.layers:
            lat = attn(lat, x, mask) + lat
            h = ff[0](lat)
            val, gate = h.chunk(2, dim=-1)
            lat = ff[2](F.gelu(gate) * val) + lat
        scale = lat.shape[-1] ** 0.5
        return F.normalize(lat, dim=-1) * scale * self.norm.gamma


class TorchUnifiedVoice(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        from transformers import GPT2Config, GPT2Model

        cm = cfg.condition_module
        self.cfg = cfg
        self.conditioning_encoder = TorchConformer(
            100, cm.output_size, cm.attention_heads, cm.linear_units, cm.num_blocks)
        self.perceiver_encoder = TorchPerceiver(
            cfg.model_dim, cm.output_size, cm.attention_heads, cm.perceiver_mult)
        self.text_embedding = nn.Embedding(cfg.number_text_tokens + 1, cfg.model_dim)
        self.mel_embedding = nn.Embedding(cfg.number_mel_codes, cfg.model_dim)
        self.text_pos_embedding = nn.Module()
        self.text_pos_embedding.emb = nn.Embedding(cfg.max_text_seq_len, cfg.model_dim)
        self.mel_pos_embedding = nn.Module()
        self.mel_pos_embedding.emb = nn.Embedding(cfg.max_mel_seq_len, cfg.model_dim)
        gcfg = GPT2Config(
            vocab_size=32, n_positions=256, n_embd=cfg.model_dim,
            n_layer=cfg.layers, n_head=cfg.heads, activation_function="gelu_new",
            attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
        self.gpt = GPT2Model(gcfg)
        with torch.no_grad():
            self.gpt.wpe.weight.zero_()
        self.final_norm = nn.LayerNorm(cfg.model_dim)
        self.text_head = nn.Linear(cfg.model_dim, cfg.number_text_tokens + 1)
        self.mel_head = nn.Linear(cfg.model_dim, cfg.number_mel_codes)

    def reference_state_dict(self):
        sd = {}
        for k, v in self.state_dict().items():
            if k.startswith("gpt."):
                if "wpe" in k or "wte" in k:
                    continue
            sd[k] = v
        return sd

    def get_conditioning(self, mel, lengths):  # mel [B, 100, T]
        enc, mask = self.conditioning_encoder(mel.transpose(1, 2), lengths)
        conds_mask = F.pad(mask.squeeze(1), (32, 0), value=True)
        return self.perceiver_encoder(enc, conds_mask)

    def latent_forward(self, cond, text_ids, codes):
        B, Lt = text_ids.shape
        Lc = codes.shape[1]
        text_in = F.pad(F.pad(text_ids, (0, 1), value=self.cfg.stop_text_token),
                        (1, 0), value=self.cfg.start_text_token)
        mel_in = F.pad(F.pad(codes, (0, 1), value=self.cfg.stop_mel_token),
                       (1, 0), value=self.cfg.start_mel_token)
        text_emb = (self.text_embedding(text_in)
                    + self.text_pos_embedding.emb.weight[: Lt + 2][None])
        mel_emb = (self.mel_embedding(mel_in)
                   + self.mel_pos_embedding.emb.weight[: Lc + 2][None])
        emb = torch.cat([cond, text_emb, mel_emb], dim=1)
        h = self.gpt(inputs_embeds=emb).last_hidden_state
        latent = self.final_norm(h[:, cond.shape[1]:])
        return latent[:, Lt + 2:][:, :-2]


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TorchUnifiedVoice(CFG).eval()
    params = convert_gpt_state_dict(tm.reference_state_dict(), CFG)
    return tm, jax.tree.map(jnp.asarray, params)


def test_get_conditioning_matches(models):
    tm, params = models
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 100, 41)).astype(np.float32)
    lengths = np.asarray([41, 30])
    with torch.no_grad():
        ref = tm.get_conditioning(torch.from_numpy(mel), torch.from_numpy(lengths)).numpy()
    ours = np.asarray(uv.get_conditioning(params, CFG, jnp.asarray(mel),
                                           jnp.asarray(lengths)))
    assert ours.shape == ref.shape == (2, 32, CFG.model_dim)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_latent_forward_matches(models):
    tm, params = models
    rng = np.random.default_rng(1)
    cond = rng.standard_normal((1, 32, CFG.model_dim)).astype(np.float32)
    text = rng.integers(2, 40, (1, 7)).astype(np.int64)
    codes = rng.integers(0, 46, (1, 11)).astype(np.int64)
    with torch.no_grad():
        ref = tm.latent_forward(torch.from_numpy(cond), torch.from_numpy(text),
                                torch.from_numpy(codes)).numpy()
    ours = np.asarray(uv.latent_forward(
        params, CFG, jnp.asarray(cond), jnp.asarray(text, jnp.int32),
        jnp.asarray([7]), jnp.asarray(codes, jnp.int32), jnp.asarray([11])))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)
