"""DVAE mel tokenizer — 1-D conv VQ-VAE over mel spectrograms.

Behavioural rebuild of the reference DiscreteVAE
(indextts/vqvae/xtts_dvae.py:54-398) at the shipped config
(config.yaml:76-87): channels=100, 8192 codes, codebook_dim 512,
hidden 512, two stride-2 conv layers (4× time reduction), 3 residual
blocks, nearest-upsample decoder, EMA vector quantiser.

One mel code covers 4 mel frames = 1024 audio samples @ 24 kHz
(mel_length_compression, config.yaml:58).

The EMA codebook update is expressed as a pure function returning new
quantiser state; under a data-parallel mesh the statistics are reduced with
`lax.psum` — the TPU-native equivalent of the reference's
`distributed.all_reduce` of EMA stats (xtts_dvae.py:113-115).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu.config import VQVAEConfig

_DN = ("NCH", "OIH", "NCH")


def _conv(x, p, stride=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=_DN)
    return y + p["b"][None, :, None]


def _resblock(x, p):
    """ResBlock (xtts_dvae.py:177-189): conv3-act-conv3-act-conv1 + residual."""
    h = jax.nn.relu(_conv(x, p["c1"], padding=1))
    h = jax.nn.relu(_conv(h, p["c2"], padding=1))
    h = _conv(h, p["c3"])
    return h + x


def init_params(rng: jax.Array, cfg: VQVAEConfig, dtype=jnp.float32) -> Dict[str, Any]:
    import math

    ks = jax.random.split(rng, 16)
    C, H, CB = cfg.channels, cfg.hidden_dim, cfg.codebook_dim
    H2 = H * 2  # innermost width (hidden * 2**(num_layers-1) for num_layers=2)
    kn = cfg.kernel_size

    def conv_p(k, cin, cout, ksz):
        fan = cin * ksz
        w = (jax.random.uniform(k, (cout, cin, ksz), jnp.float32, -1, 1)
             / math.sqrt(fan)).astype(dtype)
        return {"w": w, "b": jnp.zeros((cout,), dtype)}

    def res_p(k, ch, n):
        kk = jax.random.split(k, 3 * n)
        return {
            "c1": jax.tree.map(lambda *xs: jnp.stack(xs), *[conv_p(kk[3 * i], ch, ch, kn) for i in range(n)]),
            "c2": jax.tree.map(lambda *xs: jnp.stack(xs), *[conv_p(kk[3 * i + 1], ch, ch, kn) for i in range(n)]),
            "c3": jax.tree.map(lambda *xs: jnp.stack(xs), *[conv_p(kk[3 * i + 2], ch, ch, 1) for i in range(n)]),
        }

    return {
        "enc_conv0": conv_p(ks[0], C, H, kn),
        "enc_conv1": conv_p(ks[1], H, H2, kn),
        "enc_res": res_p(ks[2], H2, cfg.num_resnet_blocks),
        "enc_out": conv_p(ks[3], H2, CB, 1),
        "codebook": {
            "embed": jax.random.normal(ks[4], (CB, cfg.num_tokens)).astype(dtype),
            "cluster_size": jnp.zeros((cfg.num_tokens,), dtype),
            "embed_avg": jax.random.normal(ks[4], (CB, cfg.num_tokens)).astype(dtype),
        },
        "dec_in": conv_p(ks[5], CB, H2, 1),
        "dec_res": res_p(ks[6], H2, cfg.num_resnet_blocks),
        "dec_up0": conv_p(ks[7], H2, H2, kn),
        "dec_up1": conv_p(ks[8], H2, H, kn),
        "dec_out": conv_p(ks[9], H, C, 1),
    }


def encode(params: Dict[str, Any], mel: jnp.ndarray, cfg: VQVAEConfig) -> jnp.ndarray:
    """mel [B, 100, T] → pre-VQ logits [B, T//4, codebook_dim]."""
    pad = (cfg.kernel_size - 1) // 2
    h = jax.nn.relu(_conv(mel, params["enc_conv0"], stride=cfg.stride, padding=pad))
    h = jax.nn.relu(_conv(h, params["enc_conv1"], stride=cfg.stride, padding=pad))

    def body(x, p):
        return _resblock(x, p), None

    h, _ = jax.lax.scan(body, h, params["enc_res"])
    h = _conv(h, params["enc_out"])
    return jnp.swapaxes(h, 1, 2)


def quantize_indices(codebook: Dict[str, Any], z: jnp.ndarray) -> jnp.ndarray:
    """Nearest-codebook assignment (xtts_dvae.py:92-97).  z [..., D] → [...]"""
    embed = codebook["embed"]  # [D, N]
    dist = (jnp.sum(jnp.square(z), -1, keepdims=True)
            - 2.0 * jnp.einsum("...d,dn->...n", z, embed,
                               preferred_element_type=jnp.float32)
            + jnp.sum(jnp.square(embed), 0)[None])
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def embed_code(codebook: Dict[str, Any], codes: jnp.ndarray) -> jnp.ndarray:
    """codes [...] → vectors [..., D] (xtts_dvae.py:134-135)."""
    return jnp.swapaxes(codebook["embed"], 0, 1)[codes]


@jax.jit
def get_codebook_indices(params: Dict[str, Any], mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, 100, T] → codes [B, T//4] (xtts_dvae.py:328-335).
    This is the extraction-pipeline entry point."""
    cfg = VQVAEConfig()
    z = encode(params, mel, cfg)
    return quantize_indices(params["codebook"], z)


def decode(params: Dict[str, Any], codes: jnp.ndarray,
           cfg: Optional[VQVAEConfig] = None) -> jnp.ndarray:
    """codes [B, T'] → reconstructed mel [B, 100, T'*4] (xtts_dvae.py:337-356)."""
    cfg = cfg or VQVAEConfig()
    pad = (cfg.kernel_size - 1) // 2
    h = jnp.swapaxes(embed_code(params["codebook"], codes), 1, 2)  # [B, D, T']
    h = _conv(h, params["dec_in"])

    def body(x, p):
        return _resblock(x, p), None

    h, _ = jax.lax.scan(body, h, params["dec_res"])
    # nearest-neighbour 2x upsample + conv (UpsampledConv, xtts_dvae.py:192-202)
    h = jnp.repeat(h, cfg.stride, axis=2)
    h = jax.nn.relu(_conv(h, params["dec_up0"], padding=pad))
    h = jnp.repeat(h, cfg.stride, axis=2)
    h = jax.nn.relu(_conv(h, params["dec_up1"], padding=pad))
    return _conv(h, params["dec_out"])


def forward_loss(params: Dict[str, Any], mel: jnp.ndarray,
                 cfg: Optional[VQVAEConfig] = None) -> Dict[str, jnp.ndarray]:
    """Training forward: recon (smooth-L1) + commitment losses
    (xtts_dvae.py:364-386)."""
    cfg = cfg or VQVAEConfig()
    z = encode(params, mel, cfg)
    codes = quantize_indices(params["codebook"], z)
    quantised = embed_code(params["codebook"], codes)
    commitment = jnp.mean(jnp.square(jax.lax.stop_gradient(quantised) - z))
    # straight-through estimator
    z_q = z + jax.lax.stop_gradient(quantised - z)
    recon = decode({**params, "codebook": jax.lax.stop_gradient(params["codebook"])},
                   codes, cfg)
    recon = recon[..., : mel.shape[-1]]
    diff = recon - mel
    if cfg.smooth_l1_loss:
        absd = jnp.abs(diff)
        recon_loss = jnp.mean(jnp.where(absd < 1.0, 0.5 * diff * diff, absd - 0.5))
    else:
        recon_loss = jnp.mean(diff * diff)
    return {"recon_loss": recon_loss, "commitment_loss": commitment,
            "codes": codes, "z": z}


def ema_update(codebook: Dict[str, Any], z: jnp.ndarray, codes: jnp.ndarray,
               decay: float = 0.99, eps: float = 1e-5,
               axis_name: Optional[str] = None) -> Dict[str, Any]:
    """EMA codebook update (xtts_dvae.py:109-122).  When `axis_name` is set
    the batch statistics are summed across the mesh with lax.psum — the
    XLA-collective replacement for the reference's dist.all_reduce."""
    n_embed = codebook["embed"].shape[1]
    onehot = jax.nn.one_hot(codes.reshape(-1), n_embed, dtype=z.dtype)
    flat = z.reshape(-1, z.shape[-1])
    onehot_sum = onehot.sum(0)
    embed_sum = flat.T @ onehot
    if axis_name is not None:
        onehot_sum = jax.lax.psum(onehot_sum, axis_name)
        embed_sum = jax.lax.psum(embed_sum, axis_name)
    cluster_size = codebook["cluster_size"] * decay + onehot_sum * (1 - decay)
    embed_avg = codebook["embed_avg"] * decay + embed_sum * (1 - decay)
    n = cluster_size.sum()
    smoothed = (cluster_size + eps) / (n + n_embed * eps) * n
    embed = embed_avg / smoothed[None]
    return {"embed": embed, "cluster_size": cluster_size, "embed_avg": embed_avg}


def rebalance_codes(codebook: Dict[str, Any], usage: jnp.ndarray,
                    rng: jax.Array, hi: float = 0.9, lo: float = 0.01
                    ) -> Tuple[Dict[str, Any], jnp.ndarray]:
    """Dead/dominant-code rebalancing (the reference's balancing_heuristic,
    xtts_dvae.py:78-87): codes whose recent usage fraction is > hi or < lo
    are re-initialised to random embeddings and their EMA cluster size is
    zeroed.  Functional TPU form: the caller maintains `usage` (a [n_embed]
    fraction histogram over the recent code window, xtts_dvae.py:100-107)
    and threads the codebook state.  Returns (codebook', n_reset)."""
    n_embed = codebook["embed"].shape[1]
    mask = jnp.logical_or(usage > hi, usage < lo)              # [n_embed]
    rand = jax.random.normal(rng, codebook["embed"].shape,
                             codebook["embed"].dtype)
    keep = ~mask[None, :]
    embed = jnp.where(keep, codebook["embed"], rand)
    embed_avg = jnp.where(keep, codebook["embed_avg"], rand)
    cluster = jnp.where(mask, 0.0, codebook["cluster_size"])
    return ({"embed": embed, "cluster_size": cluster, "embed_avg": embed_avg},
            jnp.sum(mask.astype(jnp.int32)))


def discretization_loss(x: jnp.ndarray, dim: int, expected_variance: float,
                        past_mean: Optional[jnp.ndarray] = None,
                        past_count: int = 0) -> jnp.ndarray:
    """DiscretizationLoss (xtts_dvae.py:141-174): pushes the per-bin usage
    distribution of `x` (summed over all axes but `dim`, normalised, mean-
    subtracted) toward a zero-mean Normal with the expected variance.  The
    reference's optional `store_past` accumulator becomes explicit state:
    pass the running mean of past windows (and how many) to blend
    (past_mean*(n-1) + current)/n exactly as xtts_dvae.py:160-173."""
    other = tuple(i for i in range(x.ndim) if i != dim)
    averaged = x.sum(axis=other) / x.sum()
    averaged = averaged - averaged.mean()
    if past_mean is not None and past_count > 0:
        acc = past_count
        averaged = past_mean * (acc - 1) / acc + averaged / acc
    var = expected_variance
    logp = (-0.5 * jnp.square(averaged / var)
            - jnp.log(jnp.sqrt(2.0 * jnp.pi) * var))
    return jnp.sum(-logp)
