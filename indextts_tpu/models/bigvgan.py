"""BigVGAN latent-conditioned vocoder (functional JAX).

Behavioural rebuild of the reference generator
(indextts/BigVGAN/models.py:130-252): GPT latent (1280-d per mel code) →
conv_pre(7) → 6 transposed-conv upsample stages [4,4,4,4,2,2] (1024×
total — exactly mel_length_compression samples per latent frame) → 3 AMP
resblocks per stage (k 3/7/11, dilations 1/3/5) with anti-aliased SnakeBeta
activations → conv_post(7) → tanh.  Speaker conditioning: ECAPA-TDNN
embedding injected by 1×1 convs at the input and at every upsample stage
(cond_d_vector_in_each_upsampling_layer, models.py:193-199,228-236).

Weight norm is folded into plain weights at load time (the reference calls
remove_weight_norm() before inference, models.py:254-262).  Transposed
convs are expressed with `lhs_dilation` (XLA-native).  The anti-aliased
activations route through the fused Pallas kernel when enabled.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from indextts_tpu.config import BigVGANConfig
from indextts_tpu.models import ecapa
from indextts_tpu.ops import filters

_DN = ("NCH", "OIH", "NCH")


def _conv(x, p, padding=0, dilation=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=_DN)
    return y + p["b"][None, :, None]


def _conv_transpose(x, p, stride: int, padding: int):
    """torch ConvTranspose1d semantics. p["w"]: torch layout [Cin, Cout, K]."""
    w = jnp.flip(jnp.swapaxes(p["w"], 0, 1), axis=-1)  # → [Cout, Cin, K]
    K = w.shape[-1]
    side = K - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(side, side)],
        lhs_dilation=(stride,), dimension_numbers=_DN)
    return y + p["b"][None, :, None]


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def init_params(rng: jax.Array, cfg: BigVGANConfig, dtype=jnp.float32) -> Dict[str, Any]:
    ks = iter(jax.random.split(rng, 256))

    def conv_p(cin, cout, k, std=0.01):
        w = (jax.random.normal(next(ks), (cout, cin, k)) * std).astype(dtype)
        return {"w": w, "b": jnp.zeros((cout,), dtype)}

    def convT_p(cin, cout, k, std=0.01):
        w = (jax.random.normal(next(ks), (cin, cout, k)) * std).astype(dtype)
        return {"w": w, "b": jnp.zeros((cout,), dtype)}

    C0 = cfg.upsample_initial_channel
    params: Dict[str, Any] = {
        "conv_pre": conv_p(cfg.gpt_dim, C0, 7),
        "cond_layer": conv_p(cfg.speaker_embedding_dim, C0, 1),
        "speaker_encoder": ecapa.init_params(
            next(ks), ecapa.ECAPASize(input_size=cfg.num_mels,
                                       lin_neurons=cfg.speaker_embedding_dim), dtype),
        "ups": [], "conds": [], "resblocks": [],
    }
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = C0 // (2 ** i)
        cout = C0 // (2 ** (i + 1))
        params["ups"].append(convT_p(cin, cout, k))
        params["conds"].append(conv_p(cfg.speaker_embedding_dim, cout, 1))
        for kr, dr in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            block = {
                "convs1": [conv_p(cout, cout, kr) for _ in dr],
                "convs2": [conv_p(cout, cout, kr) for _ in dr],
                "acts": [{"alpha": jnp.zeros((cout,), dtype),
                           "beta": jnp.zeros((cout,), dtype)}
                          for _ in range(2 * len(dr))],
            }
            params["resblocks"].append(block)
    ch = C0 // (2 ** len(cfg.upsample_rates))
    params["activation_post"] = {"alpha": jnp.zeros((ch,), dtype),
                                  "beta": jnp.zeros((ch,), dtype)}
    params["conv_post"] = conv_p(ch, 1, 7)
    return params


def _activation(x, act, cfg: BigVGANConfig):
    """Anti-aliased SnakeBeta — Pallas-fused when enabled, XLA otherwise."""
    if cfg.use_fused_kernel:
        from indextts_tpu.ops.pallas import anti_alias

        return anti_alias.fused_anti_alias_activation(
            x, act["alpha"], act["beta"], logscale=cfg.snake_logscale)
    return filters.anti_aliased_activation(
        x, act["alpha"], act["beta"], logscale=cfg.snake_logscale)


def _amp_block(x, blk, kernel: int, dilations, cfg: BigVGANConfig):
    """AMPBlock1 (models.py:20-74)."""
    acts1 = blk["acts"][::2]
    acts2 = blk["acts"][1::2]
    for c1, c2, d, a1, a2 in zip(blk["convs1"], blk["convs2"], dilations, acts1, acts2):
        xt = _activation(x, a1, cfg)
        xt = _conv(xt, c1, padding=get_padding(kernel, d), dilation=d)
        xt = _activation(xt, a2, cfg)
        xt = _conv(xt, c2, padding=get_padding(kernel, 1), dilation=1)
        x = xt + x
    return x


def forward(params: Dict[str, Any], latent: jnp.ndarray, mel_ref: jnp.ndarray,
            cfg: Optional[BigVGANConfig] = None,
            ecapa_size: Optional[ecapa.ECAPASize] = None) -> jnp.ndarray:
    """latent: [B, T_codes, gpt_dim]; mel_ref: [B, T_mel, n_mels]
    (time-major, as infer.py:888 passes cond_mel.transpose(1,2)).
    Returns waveform [B, 1, T_codes * 1024] (models.py:203-252)."""
    cfg = cfg or BigVGANConfig()
    spk = ecapa.forward(params["speaker_encoder"], mel_ref,
                        ecapa_size or ecapa.ECAPASize(
                            input_size=cfg.num_mels,
                            lin_neurons=cfg.speaker_embedding_dim))
    spk = jnp.swapaxes(spk, 1, 2)  # [B, 512, 1]

    x = jnp.swapaxes(latent, 1, 2)  # [B, gpt_dim, T]
    if cfg.feat_upsample:
        # linear 4x time interpolation before conv_pre (models.py:214-221,
        # torch F.interpolate mode="linear", align_corners=False — matched
        # by jax.image.resize's half-pixel-center linear method)
        B_, C_, T_ = x.shape
        x = jax.image.resize(x, (B_, C_, T_ * 4), method="linear")
    x = _conv(x, params["conv_pre"], padding=3)
    x = x + _conv(spk, params["cond_layer"])

    n_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = _conv_transpose(x, params["ups"][i], stride=u, padding=(k - u) // 2)
        if cfg.cond_d_vector_in_each_upsampling_layer:
            x = x + _conv(spk, params["conds"][i])
        acc = None
        for j, (kr, dr) in enumerate(zip(cfg.resblock_kernel_sizes,
                                          cfg.resblock_dilation_sizes)):
            y = _amp_block(x, params["resblocks"][i * n_kernels + j], kr, dr, cfg)
            acc = y if acc is None else acc + y
        x = acc / n_kernels

    x = _activation(x, params["activation_post"], cfg)
    x = _conv(x, params["conv_post"], padding=3)
    return jnp.tanh(x)
