"""DVAE numerics vs a torch oracle built with reference-identical module
structure and state_dict naming (xtts_dvae.py:205-356 at the shipped
config, scaled down).  The oracle's state_dict feeds our converter, so this
validates both the forward math and the checkpoint name mapping."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from indextts_tpu.config import VQVAEConfig
from indextts_tpu.io.checkpoint import convert_dvae_state_dict
from indextts_tpu.models import dvae

CFG = VQVAEConfig(channels=10, num_tokens=32, hidden_dim=16, codebook_dim=24,
                  num_resnet_blocks=3, num_layers=2, kernel_size=3)


class TorchResBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.net = nn.Sequential(
            nn.Conv1d(ch, ch, 3, padding=1), nn.ReLU(),
            nn.Conv1d(ch, ch, 3, padding=1), nn.ReLU(),
            nn.Conv1d(ch, ch, 1),
        )

    def forward(self, x):
        return self.net(x) + x


class TorchUpsampledConv(nn.Module):
    def __init__(self, cin, cout, k, stride, padding):
        super().__init__()
        self.stride = stride
        self.conv = nn.Conv1d(cin, cout, k, padding=padding)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=self.stride, mode="nearest"))


class TorchDVAE(nn.Module):
    """Structure & naming mirror of DiscreteVAE at the shipped config."""

    def __init__(self, cfg):
        super().__init__()
        C, H, CB = cfg.channels, cfg.hidden_dim, cfg.codebook_dim
        H2 = H * 2
        self.encoder = nn.Sequential(
            nn.Sequential(nn.Conv1d(C, H, 3, stride=2, padding=1), nn.ReLU()),
            nn.Sequential(nn.Conv1d(H, H2, 3, stride=2, padding=1), nn.ReLU()),
            TorchResBlock(H2), TorchResBlock(H2), TorchResBlock(H2),
            nn.Conv1d(H2, CB, 1),
        )
        self.decoder = nn.Sequential(
            nn.Conv1d(CB, H2, 1),
            TorchResBlock(H2), TorchResBlock(H2), TorchResBlock(H2),
            nn.Sequential(TorchUpsampledConv(H2, H2, 3, 2, 1), nn.ReLU()),
            nn.Sequential(TorchUpsampledConv(H2, H, 3, 2, 1), nn.ReLU()),
            nn.Conv1d(H, C, 1),
        )
        self.register_buffer("codebook_embed", torch.randn(CB, cfg.num_tokens))

    def state_dict_reference_names(self):
        sd = {k: v for k, v in self.state_dict().items() if k != "codebook_embed"}
        sd["codebook.embed"] = self.codebook_embed
        sd["codebook.cluster_size"] = torch.zeros(self.codebook_embed.shape[1])
        sd["codebook.embed_avg"] = self.codebook_embed.clone()
        return sd

    def get_codebook_indices(self, mel):
        logits = self.encoder(mel).permute(0, 2, 1)
        flat = logits.reshape(-1, logits.shape[-1])
        dist = (flat.pow(2).sum(1, keepdim=True)
                - 2 * flat @ self.codebook_embed
                + self.codebook_embed.pow(2).sum(0, keepdim=True))
        return (-dist).max(1).indices.view(logits.shape[:-1])

    def decode(self, codes):
        embeds = F.embedding(codes, self.codebook_embed.T).permute(0, 2, 1)
        return self.decoder(embeds)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TorchDVAE(CFG).eval()
    import jax

    params = convert_dvae_state_dict(tm.state_dict_reference_names(), CFG)
    params = jax.tree.map(jnp.asarray, params)
    return tm, params


def test_encode_codes_match(models):
    tm, params = models
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 10, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm.get_codebook_indices(torch.from_numpy(mel)).numpy()
    z = dvae.encode(params, jnp.asarray(mel), CFG)
    ours = np.asarray(dvae.quantize_indices(params["codebook"], z))
    assert ours.shape == ref.shape == (2, 8)  # 4x time reduction
    np.testing.assert_array_equal(ours, ref)


def test_decode_matches(models):
    tm, params = models
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 32, (2, 8))
    with torch.no_grad():
        ref = tm.decode(torch.from_numpy(codes)).numpy()
    ours = np.asarray(dvae.decode(params, jnp.asarray(codes), CFG))
    assert ours.shape == ref.shape == (2, 10, 32)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_forward_loss_finite(models):
    _, params = models
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, 10, 32)).astype(np.float32))
    out = dvae.forward_loss(params, mel, CFG)
    assert np.isfinite(float(out["recon_loss"]))
    assert np.isfinite(float(out["commitment_loss"]))


def test_ema_update_moves_codebook(models):
    _, params = models
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((64, 24)).astype(np.float32))
    codes = dvae.quantize_indices(params["codebook"], z)
    new_cb = dvae.ema_update(params["codebook"], z, codes)
    assert not np.allclose(np.asarray(new_cb["cluster_size"]),
                           np.asarray(params["codebook"]["cluster_size"]))
    assert np.isfinite(np.asarray(new_cb["embed"])).all()


def test_rebalance_codes_matches_torch():
    """Dead/dominant-code rebalancing vs the reference heuristic
    (xtts_dvae.py:78-87) on the same usage histogram."""
    import torch

    from indextts_tpu.models import dvae as dvae_model

    import jax

    rng = np.random.default_rng(0)
    n_embed, dim = 16, 8
    embed = rng.standard_normal((dim, n_embed)).astype(np.float32)
    cluster = rng.uniform(0, 5, (n_embed,)).astype(np.float32)
    usage = rng.uniform(0, 0.5, (n_embed,)).astype(np.float32)
    usage[3] = 0.95   # dominant
    usage[7] = 0.001  # dead
    cb = {"embed": jnp.asarray(embed), "cluster_size": jnp.asarray(cluster),
          "embed_avg": jnp.asarray(embed.copy())}
    new, n_reset = dvae_model.rebalance_codes(cb, jnp.asarray(usage),
                                              jax.random.PRNGKey(0))
    assert int(n_reset) == 2
    # torch-mirror of the masking math (random values differ by RNG; check
    # the kept/zeroed structure)
    mask = np.logical_or(usage > 0.9, usage < 0.01)
    np.testing.assert_array_equal(np.asarray(new["cluster_size"])[mask], 0.0)
    np.testing.assert_allclose(np.asarray(new["cluster_size"])[~mask],
                               cluster[~mask])
    np.testing.assert_allclose(np.asarray(new["embed"])[:, ~mask],
                               embed[:, ~mask])
    assert not np.allclose(np.asarray(new["embed"])[:, mask], embed[:, mask])


def test_discretization_loss_matches_torch():
    import torch

    from indextts_tpu.models import dvae as dvae_model

    rng = np.random.default_rng(1)
    x = np.abs(rng.standard_normal((4, 10, 6))).astype(np.float32)
    ours = float(dvae_model.discretization_loss(jnp.asarray(x), dim=2,
                                                expected_variance=0.2))
    t = torch.from_numpy(x)
    other = (0, 1)
    averaged = t.sum(dim=other) / t.sum()
    averaged = averaged - averaged.mean()
    dist = torch.distributions.Normal(0, scale=0.2)
    ref = float(torch.sum(-dist.log_prob(averaged)))
    assert abs(ours - ref) < 1e-4 * max(1.0, abs(ref))
