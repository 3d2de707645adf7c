"""BigVGAN + ECAPA numerics vs a torch oracle with reference-identical
module structure, naming and weight_norm (models.py:130-252,
ECAPA_TDNN.py:79-581, nnet/CNN.py same-reflect padding) — scaled down.
The oracle's state_dict feeds our converter, so forward math, layout
translation (lhs_dilation transposed convs) and weight-norm folding are all
validated together."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm

import jax
import jax.numpy as jnp

from indextts_tpu.config import BigVGANConfig
from indextts_tpu.io.checkpoint import convert_bigvgan_state_dict
from indextts_tpu.models import bigvgan as bv
from indextts_tpu.models import ecapa as ecapa_jax
from tests.test_filters import torch_downsample2x, torch_upsample2x

CFG = BigVGANConfig(
    upsample_rates=[2, 2],
    upsample_kernel_sizes=[4, 4],
    upsample_initial_channel=32,
    resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 3]],
    speaker_embedding_dim=8,
    gpt_dim=16,
    num_mels=12,
    use_fused_kernel=False,
)
ECAPA_SIZE = ecapa_jax.ECAPASize(
    input_size=12, lin_neurons=8, channels=(16, 16, 16, 16, 48),
    kernel_sizes=(5, 3, 3, 3, 1), dilations=(1, 2, 3, 4, 1),
    attention_channels=8, res2net_scale=8, se_channels=8)


# --- speechbrain-style wrappers (naming: .conv / .norm) --------------------

class SBConv1d(nn.Module):
    def __init__(self, cin, cout, k, dilation=1):
        super().__init__()
        self.conv = nn.Conv1d(cin, cout, k, dilation=dilation)
        self.k, self.d = k, dilation

    def forward(self, x):
        pad = self.d * (self.k - 1) // 2
        if pad > 0:
            x = F.pad(x, (pad, pad), mode="reflect")
        return self.conv(x)


class SBBatchNorm(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.BatchNorm1d(c)

    def forward(self, x):
        return self.norm(x)


class TDNNBlock(nn.Module):
    def __init__(self, cin, cout, k, dilation=1):
        super().__init__()
        self.conv = SBConv1d(cin, cout, k, dilation)
        self.norm = SBBatchNorm(cout)

    def forward(self, x):
        return self.norm(torch.relu(self.conv(x)))


class Res2NetBlock(nn.Module):
    def __init__(self, ch, scale, k, dilation):
        super().__init__()
        inner = ch // scale
        self.blocks = nn.ModuleList(
            [TDNNBlock(inner, inner, k, dilation) for _ in range(scale - 1)])
        self.scale = scale

    def forward(self, x):
        ys = []
        y = None
        for i, xi in enumerate(torch.chunk(x, self.scale, dim=1)):
            if i == 0:
                y_i = xi
            elif i == 1:
                y_i = self.blocks[i - 1](xi)
            else:
                y_i = self.blocks[i - 1](xi + y)
            if i >= 1:
                y = y_i
            ys.append(y_i)
        return torch.cat(ys, dim=1)


class SEBlock(nn.Module):
    def __init__(self, ch, se):
        super().__init__()
        self.conv1 = SBConv1d(ch, se, 1)
        self.conv2 = SBConv1d(se, ch, 1)

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        s = torch.sigmoid(self.conv2(torch.relu(self.conv1(s))))
        return s * x


class SERes2Net(nn.Module):
    def __init__(self, cin, cout, scale, se, k, dilation):
        super().__init__()
        self.tdnn1 = TDNNBlock(cin, cout, 1)
        self.res2net_block = Res2NetBlock(cout, scale, k, dilation)
        self.tdnn2 = TDNNBlock(cout, cout, 1)
        self.se_block = SEBlock(cout, se)

    def forward(self, x):
        r = x
        x = self.tdnn1(x)
        x = self.res2net_block(x)
        x = self.tdnn2(x)
        return self.se_block(x) + r


class TorchECAPA(nn.Module):
    def __init__(self, s):
        super().__init__()
        ch, ks, dil = s.channels, s.kernel_sizes, s.dilations
        self.blocks = nn.ModuleList([TDNNBlock(s.input_size, ch[0], ks[0], dil[0])])
        for i in range(1, len(ch) - 1):
            self.blocks.append(SERes2Net(ch[i - 1], ch[i], s.res2net_scale,
                                          s.se_channels, ks[i], dil[i]))
        self.mfa = TDNNBlock(ch[-2] * (len(ch) - 2), ch[-1], ks[-1], dil[-1])
        self.asp = nn.Module()
        self.asp.tdnn = TDNNBlock(ch[-1] * 3, s.attention_channels, 1)
        self.asp.conv = SBConv1d(s.attention_channels, ch[-1], 1)
        self.asp_bn = SBBatchNorm(ch[-1] * 2)
        self.fc = SBConv1d(ch[-1] * 2, s.lin_neurons, 1)

    def forward(self, x):  # x: [B, T, C]
        x = x.transpose(1, 2)
        feats = []
        h = self.blocks[0](x)
        for blk in self.blocks[1:]:
            h = blk(h)
            feats.append(h)
        h = self.mfa(torch.cat(feats, dim=1))
        eps = 1e-12
        mean = h.mean(dim=2, keepdim=True)
        std = torch.sqrt(((h - mean) ** 2).mean(dim=2, keepdim=True).clamp(eps))
        attn_in = torch.cat([h, mean.expand_as(h), std.expand_as(h)], dim=1)
        attn = self.asp.conv(torch.tanh(self.asp.tdnn(attn_in)))
        attn = F.softmax(attn, dim=2)
        amean = (attn * h).sum(dim=2)
        astd = torch.sqrt((attn * (h - amean.unsqueeze(2)) ** 2).sum(dim=2).clamp(eps))
        pooled = torch.cat([amean, astd], dim=1).unsqueeze(2)
        return self.fc(self.asp_bn(pooled)).transpose(1, 2)


class TorchActivation1d(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.act = nn.Module()
        self.act.alpha = nn.Parameter(torch.randn(ch) * 0.1)
        self.act.beta = nn.Parameter(torch.randn(ch) * 0.1)

    def forward(self, x):
        up = torch_upsample2x(x)
        a = torch.exp(self.act.alpha)[None, :, None]
        b = torch.exp(self.act.beta)[None, :, None]
        act = up + (1.0 / (b + 1e-9)) * torch.sin(up * a) ** 2
        return torch_downsample2x(act)


class TorchAMPBlock(nn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, dilation=d, padding=(k * d - d) // 2))
            for d in dilations])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
            for _ in dilations])
        self.activations = nn.ModuleList(
            [TorchActivation1d(ch) for _ in range(2 * len(dilations))])

    def forward(self, x):
        acts1, acts2 = self.activations[::2], self.activations[1::2]
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2, acts1, acts2):
            xt = c1(a1(x))
            xt = c2(a2(xt))
            x = xt + x
        return x


class TorchBigVGAN(nn.Module):
    def __init__(self, cfg, ecapa_size):
        super().__init__()
        C0 = cfg.upsample_initial_channel
        self.conv_pre = weight_norm(nn.Conv1d(cfg.gpt_dim, C0, 7, padding=3))
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            self.ups.append(nn.ModuleList([
                weight_norm(nn.ConvTranspose1d(C0 // (2 ** i), C0 // (2 ** (i + 1)),
                                                 k, u, padding=(k - u) // 2))]))
            for kr, dr in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                self.resblocks.append(TorchAMPBlock(C0 // (2 ** (i + 1)), kr, dr))
        ch = C0 // (2 ** len(cfg.upsample_rates))
        self.activation_post = TorchActivation1d(ch)
        self.conv_post = weight_norm(nn.Conv1d(ch, 1, 7, padding=3))
        self.speaker_encoder = TorchECAPA(ecapa_size)
        self.cond_layer = nn.Conv1d(cfg.speaker_embedding_dim, C0, 1)
        self.conds = nn.ModuleList([
            nn.Conv1d(cfg.speaker_embedding_dim, C0 // (2 ** (i + 1)), 1)
            for i in range(len(cfg.upsample_rates))])
        self.num_kernels = len(cfg.resblock_kernel_sizes)

    def forward(self, latent, mel_ref):
        spk = self.speaker_encoder(mel_ref).transpose(1, 2)
        x = latent.transpose(1, 2)
        x = self.conv_pre(x) + self.cond_layer(spk)
        for i in range(len(self.ups)):
            x = self.ups[i][0](x)
            x = x + self.conds[i](spk)
            xs = None
            for j in range(self.num_kernels):
                y = self.resblocks[i * self.num_kernels + j](x)
                xs = y if xs is None else xs + y
            x = xs / self.num_kernels
        x = self.activation_post(x)
        return torch.tanh(self.conv_post(x))


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TorchBigVGAN(CFG, ECAPA_SIZE).eval()
    # randomize BN stats so inference BN is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    params = convert_bigvgan_state_dict(
        {k: v for k, v in tm.state_dict().items() if "num_batches" not in k}, CFG)
    params = jax.tree.map(jnp.asarray, params)
    return tm, params


def test_ecapa_matches(models):
    tm, params = models
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 25, 12)).astype(np.float32)
    with torch.no_grad():
        ref = tm.speaker_encoder(torch.from_numpy(mel)).numpy()
    ours = np.asarray(ecapa_jax.forward(params["speaker_encoder"],
                                         jnp.asarray(mel), ECAPA_SIZE))
    assert ours.shape == ref.shape == (2, 1, 8)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_generator_matches(models):
    tm, params = models
    rng = np.random.default_rng(1)
    latent = rng.standard_normal((1, 6, 16)).astype(np.float32)
    mel_ref = rng.standard_normal((1, 25, 12)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(latent), torch.from_numpy(mel_ref)).numpy()
    ours = np.asarray(bv.forward(params, jnp.asarray(latent), jnp.asarray(mel_ref),
                                  CFG, ecapa_size=ECAPA_SIZE))
    assert ours.shape == ref.shape == (1, 1, 6 * 4)  # 2*2 upsampling
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_feat_upsample(models):
    """feat_upsample interpolates the latent 4x before conv_pre
    (models.py:214-221) — previously parsed but silently ignored."""
    import dataclasses

    import jax

    _, params = models
    cfg_up = dataclasses.replace(CFG, feat_upsample=True)
    rng = np.random.default_rng(2)
    latent = rng.standard_normal((1, 6, 16)).astype(np.float32)
    mel_ref = rng.standard_normal((1, 25, 12)).astype(np.float32)
    out = np.asarray(bv.forward(params, jnp.asarray(latent),
                                jnp.asarray(mel_ref), cfg_up,
                                ecapa_size=ECAPA_SIZE))
    assert out.shape == (1, 1, 6 * 4 * 4)  # 4x feat upsample x 2*2 stages

    # the interpolation itself matches torch F.interpolate(mode="linear",
    # align_corners=False) — both use half-pixel centers
    x = rng.standard_normal((1, 3, 7)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=4, mode="linear").numpy()
    ours = np.asarray(jax.image.resize(jnp.asarray(x), (1, 3, 28),
                                       method="linear"))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
