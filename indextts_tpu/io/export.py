"""Reference-format ``.pth`` export: our param pytrees → torch state_dicts.

The exact inverse of :mod:`indextts_tpu.io.checkpoint`'s converters, so a
TPU-trained (or TPU-converted) model can be deployed on the reference CUDA
stack unchanged:

  * ``save_gpt_pth`` writes the artifact the reference trainer emits
    (``{'model': state_dict}`` + optional top-level ``speaker_conditions`` /
    ``speakers``, train.py:795-844) and the reference loads with
    ``strict=True`` (train.py:67-75, utils/checkpoint.py:23-89);
  * ``save_bigvgan_pth`` writes ``{'generator': state_dict}`` with
    weight-norm ``weight_g``/``weight_v`` splits restored, loadable by
    ``BigVGAN.load_state_dict`` (strict, infer.py:392-393) before its
    ``remove_weight_norm()`` folds them back;
  * ``save_dvae_pth`` writes a flat DiscreteVAE state_dict
    (vqvae/xtts_dvae.py:205-335).

Round-trip guarantee (tested): ``convert_*_state_dict(export_*(params))``
reproduces ``params`` bit-exactly at fp32.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from indextts_tpu.config import BigVGANConfig, GPTConfig, VQVAEConfig

_SAVE_DTYPES = {"fp16": "float16", "bf16": "bfloat16", "fp32": "float32"}


def _np(leaf) -> np.ndarray:
    """Pytree leaf (jax array / numpy) → fp32 numpy on host."""
    try:
        import jax

        leaf = jax.device_get(leaf)
    except Exception:
        pass
    return np.asarray(leaf, dtype=np.float32)


def _to_torch_sd(sd: Dict[str, np.ndarray], save_dtype: str):
    import torch

    if save_dtype not in _SAVE_DTYPES:
        raise ValueError(f"save_dtype must be one of {sorted(_SAVE_DTYPES)}, "
                         f"got {save_dtype!r}")
    dt = getattr(torch, _SAVE_DTYPES[save_dtype])
    out = {}
    for k, v in sd.items():
        t = torch.from_numpy(np.ascontiguousarray(v))
        out[k] = t.to(dt) if t.is_floating_point() else t
    return out


# ---------------------------------------------------------------------------
# UnifiedVoice (gpt.pth)
# ---------------------------------------------------------------------------

def export_gpt_state_dict(params: Dict[str, Any], cfg: GPTConfig) -> Dict[str, np.ndarray]:
    """Inverse of checkpoint.convert_gpt_state_dict: param pytree →
    reference-named flat dict (fp32 numpy).  Key families per
    gpt/model.py:312-392; HF Conv1D trunk weights keep their [in, out]
    layout, nn.Linear heads are transposed back to [out, in]."""
    sd: Dict[str, np.ndarray] = {}
    blocks = params["gpt"]["blocks"]
    L = cfg.layers

    def unstack(dst_fmt: str, leaf) -> None:
        arr = _np(leaf)
        if arr.shape[0] != L:
            raise ValueError(f"{dst_fmt}: expected leading layer axis {L}, "
                             f"got shape {arr.shape}")
        for i in range(L):
            sd[dst_fmt.format(i)] = arr[i]

    unstack("gpt.h.{}.ln_1.weight", blocks["ln_1"]["scale"])
    unstack("gpt.h.{}.ln_1.bias", blocks["ln_1"]["bias"])
    unstack("gpt.h.{}.attn.c_attn.weight", blocks["attn"]["qkv_w"])
    unstack("gpt.h.{}.attn.c_attn.bias", blocks["attn"]["qkv_b"])
    unstack("gpt.h.{}.attn.c_proj.weight", blocks["attn"]["proj_w"])
    unstack("gpt.h.{}.attn.c_proj.bias", blocks["attn"]["proj_b"])
    unstack("gpt.h.{}.ln_2.weight", blocks["ln_2"]["scale"])
    unstack("gpt.h.{}.ln_2.bias", blocks["ln_2"]["bias"])
    unstack("gpt.h.{}.mlp.c_fc.weight", blocks["mlp"]["fc_w"])
    unstack("gpt.h.{}.mlp.c_fc.bias", blocks["mlp"]["fc_b"])
    unstack("gpt.h.{}.mlp.c_proj.weight", blocks["mlp"]["proj_w"])
    unstack("gpt.h.{}.mlp.c_proj.bias", blocks["mlp"]["proj_b"])
    sd["gpt.ln_f.weight"] = _np(params["gpt"]["ln_f"]["scale"])
    sd["gpt.ln_f.bias"] = _np(params["gpt"]["ln_f"]["bias"])

    # embeddings, position tables, final norm, heads (gpt/model.py:367-385)
    sd["text_embedding.weight"] = _np(params["text_embedding"]["weight"])
    sd["mel_embedding.weight"] = _np(params["mel_embedding"]["weight"])
    sd["mel_pos_embedding.emb.weight"] = _np(params["mel_pos_embedding"]["weight"])
    sd["text_pos_embedding.emb.weight"] = _np(params["text_pos_embedding"]["weight"])
    sd["final_norm.weight"] = _np(params["final_norm"]["scale"])
    sd["final_norm.bias"] = _np(params["final_norm"]["bias"])
    sd["text_head.weight"] = _np(params["text_head"]["kernel"]).T
    sd["text_head.bias"] = _np(params["text_head"]["bias"])
    sd["mel_head.weight"] = _np(params["mel_head"]["kernel"]).T
    sd["mel_head.bias"] = _np(params["mel_head"]["bias"])

    ce = "conditioning_encoder."
    cond = params["conditioning_encoder"]
    if cfg.condition_type in ("conformer_perceiver", "conformer_encoder"):
        _export_conformer(sd, ce, cond, cfg)
        _export_perceiver(sd, params["perceiver_encoder"])
    else:
        # legacy AttentionBlock encoder (arch_util.py:84-126); conv1d
        # kernels regain their trailing length-1 axis
        sd[ce + "init.weight"] = _np(cond["init"]["w"])[:, :, None]
        sd[ce + "init.bias"] = _np(cond["init"]["b"])
        for i, blk in enumerate(cond["attn"]):
            sd[ce + f"attn.{i}.norm.weight"] = _np(blk["norm"]["scale"])
            sd[ce + f"attn.{i}.norm.bias"] = _np(blk["norm"]["bias"])
            sd[ce + f"attn.{i}.qkv.weight"] = _np(blk["qkv"]["w"])[:, :, None]
            sd[ce + f"attn.{i}.qkv.bias"] = _np(blk["qkv"]["b"])
            sd[ce + f"attn.{i}.proj_out.weight"] = _np(blk["proj"]["w"])[:, :, None]
            sd[ce + f"attn.{i}.proj_out.bias"] = _np(blk["proj"]["b"])
        if params.get("perceiver_encoder"):
            _export_perceiver(sd, params["perceiver_encoder"])
    return sd


def _export_conformer(sd: Dict[str, np.ndarray], ce: str,
                      cond: Dict[str, Any], cfg: GPTConfig) -> None:
    CL = cfg.condition_module.num_blocks
    sd[ce + "embed.conv.0.weight"] = _np(cond["embed"]["conv"]["w"])
    sd[ce + "embed.conv.0.bias"] = _np(cond["embed"]["conv"]["b"])
    sd[ce + "embed.out.0.weight"] = _np(cond["embed"]["out"]["kernel"]).T
    sd[ce + "embed.out.0.bias"] = _np(cond["embed"]["out"]["bias"])
    b = cond["blocks"]

    def unstack(dst_fmt: str, leaf, transpose: bool = False) -> None:
        arr = _np(leaf)
        for i in range(CL):
            sd[ce + dst_fmt.format(i)] = arr[i].T if transpose else arr[i]

    unstack("encoders.{}.norm_mha.weight", b["norm_mha"]["scale"])
    unstack("encoders.{}.norm_mha.bias", b["norm_mha"]["bias"])
    for name in ("q", "k", "v", "out"):
        unstack(f"encoders.{{}}.self_attn.linear_{name}.weight",
                b["attn"][name]["kernel"], transpose=True)
        unstack(f"encoders.{{}}.self_attn.linear_{name}.bias",
                b["attn"][name]["bias"])
    unstack("encoders.{}.self_attn.linear_pos.weight",
            b["attn"]["pos"]["kernel"], transpose=True)
    unstack("encoders.{}.self_attn.pos_bias_u", b["attn"]["pos_bias_u"])
    unstack("encoders.{}.self_attn.pos_bias_v", b["attn"]["pos_bias_v"])
    unstack("encoders.{}.norm_conv.weight", b["norm_conv"]["scale"])
    unstack("encoders.{}.norm_conv.bias", b["norm_conv"]["bias"])
    pw1 = _np(b["conv"]["pw1"]["kernel"])
    pw2 = _np(b["conv"]["pw2"]["kernel"])
    for i in range(CL):
        sd[ce + f"encoders.{i}.conv_module.pointwise_conv1.weight"] = pw1[i].T[:, :, None]
        sd[ce + f"encoders.{i}.conv_module.pointwise_conv2.weight"] = pw2[i].T[:, :, None]
    unstack("encoders.{}.conv_module.pointwise_conv1.bias", b["conv"]["pw1"]["bias"])
    unstack("encoders.{}.conv_module.pointwise_conv2.bias", b["conv"]["pw2"]["bias"])
    unstack("encoders.{}.conv_module.depthwise_conv.weight", b["conv"]["dw"]["w"])
    unstack("encoders.{}.conv_module.depthwise_conv.bias", b["conv"]["dw"]["b"])
    unstack("encoders.{}.conv_module.norm.weight", b["conv"]["norm"]["scale"])
    unstack("encoders.{}.conv_module.norm.bias", b["conv"]["norm"]["bias"])
    unstack("encoders.{}.norm_ff.weight", b["norm_ff"]["scale"])
    unstack("encoders.{}.norm_ff.bias", b["norm_ff"]["bias"])
    unstack("encoders.{}.feed_forward.w_1.weight", b["ff"]["w1"]["kernel"], transpose=True)
    unstack("encoders.{}.feed_forward.w_1.bias", b["ff"]["w1"]["bias"])
    unstack("encoders.{}.feed_forward.w_2.weight", b["ff"]["w2"]["kernel"], transpose=True)
    unstack("encoders.{}.feed_forward.w_2.bias", b["ff"]["w2"]["bias"])
    unstack("encoders.{}.norm_final.weight", b["norm_final"]["scale"])
    unstack("encoders.{}.norm_final.bias", b["norm_final"]["bias"])
    sd[ce + "after_norm.weight"] = _np(cond["after_norm"]["scale"])
    sd[ce + "after_norm.bias"] = _np(cond["after_norm"]["bias"])


def _export_perceiver(sd: Dict[str, np.ndarray], p: Dict[str, Any]) -> None:
    pe = "perceiver_encoder."
    kernel = _np(p["proj_context"]["kernel"])
    bias = _np(p["proj_context"]["bias"])
    # the converter synthesises an eye kernel when the reference used
    # nn.Identity (dim_context == dim, perceiver.py:234) — omit those keys
    # so the exported dict matches the reference module's state_dict
    is_identity = (kernel.shape[0] == kernel.shape[1]
                   and np.array_equal(kernel, np.eye(kernel.shape[0],
                                                     dtype=kernel.dtype))
                   and not bias.any())
    if not is_identity:
        sd[pe + "proj_context.weight"] = kernel.T
        sd[pe + "proj_context.bias"] = bias
    sd[pe + "latents"] = _np(p["latents"])
    layers = p["layers"]
    PD = _np(layers["attn"]["to_q"]).shape[0]
    for i in range(PD):
        sd[pe + f"layers.{i}.0.to_q.weight"] = _np(layers["attn"]["to_q"])[i].T
        sd[pe + f"layers.{i}.0.to_kv.weight"] = _np(layers["attn"]["to_kv"])[i].T
        sd[pe + f"layers.{i}.0.to_out.weight"] = _np(layers["attn"]["to_out"])[i].T
        sd[pe + f"layers.{i}.1.0.weight"] = _np(layers["ff"]["w1"]["kernel"])[i].T
        sd[pe + f"layers.{i}.1.0.bias"] = _np(layers["ff"]["w1"]["bias"])[i]
        sd[pe + f"layers.{i}.1.2.weight"] = _np(layers["ff"]["w2"]["kernel"])[i].T
        sd[pe + f"layers.{i}.1.2.bias"] = _np(layers["ff"]["w2"]["bias"])[i]
    sd[pe + "norm.gamma"] = _np(p["norm"]["gamma"])


def save_gpt_pth(path: str, params: Dict[str, Any], cfg: GPTConfig,
                 extras: Optional[Dict[str, Any]] = None,
                 save_dtype: str = "fp16") -> str:
    """Write the reference trainer's inference artifact: ``{'model': sd}``
    (+ top-level speaker extras), loadable by the reference's
    load_checkpoint/strict load AND by our own load_gpt_checkpoint.

    save_dtype defaults to fp16 like the reference (train.py:817)."""
    import torch

    sd = _to_torch_sd(export_gpt_state_dict(params, cfg), save_dtype)
    ckpt: Dict[str, Any] = {"model": sd}
    extras = extras or {}
    if extras.get("mean_condition") is not None:
        # stored inside the model state_dict (utils/checkpoint.py:70-77)
        sd["mean_condition"] = torch.from_numpy(
            np.asarray(extras["mean_condition"], dtype=np.float32))
    if extras.get("speaker_conditions"):
        # the reference loader calls torch.from_numpy on these — they must
        # stay numpy (utils/checkpoint.py:53)
        ckpt["speaker_conditions"] = {
            str(k): np.asarray(v, dtype=np.float32).reshape(
                1, *np.asarray(v).shape[-2:])
            for k, v in extras["speaker_conditions"].items()}
        ckpt["speakers"] = list(extras.get(
            "speakers", sorted(ckpt["speaker_conditions"])))
    elif extras.get("speakers"):
        ckpt["speakers"] = list(extras["speakers"])
    if extras.get("speaker_mels"):
        # our extension (engine speaker_id-only vocoding); harmless extra
        # top-level key for the reference loader
        ckpt["speaker_mels"] = {
            str(k): np.asarray(v, dtype=np.float32)
            for k, v in extras["speaker_mels"].items()}
    torch.save(ckpt, path)
    return path


# ---------------------------------------------------------------------------
# DVAE (dvae.pth)
# ---------------------------------------------------------------------------

def export_dvae_state_dict(params: Dict[str, Any], cfg: VQVAEConfig) -> Dict[str, np.ndarray]:
    """Inverse of checkpoint.convert_dvae_state_dict (layer indices per
    xtts_dvae.py:258-298 at the shipped config)."""
    sd: Dict[str, np.ndarray] = {}
    n_res = cfg.num_resnet_blocks

    def res(prefix: str, indices: List[int], blk: Dict[str, Any]) -> None:
        for name, net_idx in zip(("c1", "c2", "c3"), (0, 2, 4)):
            w, b = _np(blk[name]["w"]), _np(blk[name]["b"])
            for j, i in enumerate(indices):
                sd[f"{prefix}.{i}.net.{net_idx}.weight"] = w[j]
                sd[f"{prefix}.{i}.net.{net_idx}.bias"] = b[j]

    sd["encoder.0.0.weight"] = _np(params["enc_conv0"]["w"])
    sd["encoder.0.0.bias"] = _np(params["enc_conv0"]["b"])
    sd["encoder.1.0.weight"] = _np(params["enc_conv1"]["w"])
    sd["encoder.1.0.bias"] = _np(params["enc_conv1"]["b"])
    res("encoder", list(range(2, 2 + n_res)), params["enc_res"])
    sd[f"encoder.{2 + n_res}.weight"] = _np(params["enc_out"]["w"])
    sd[f"encoder.{2 + n_res}.bias"] = _np(params["enc_out"]["b"])
    sd["codebook.embed"] = _np(params["codebook"]["embed"])
    sd["codebook.cluster_size"] = _np(params["codebook"]["cluster_size"])
    sd["codebook.embed_avg"] = _np(params["codebook"]["embed_avg"])
    sd["decoder.0.weight"] = _np(params["dec_in"]["w"])
    sd["decoder.0.bias"] = _np(params["dec_in"]["b"])
    res("decoder", list(range(1, 1 + n_res)), params["dec_res"])
    sd[f"decoder.{1 + n_res}.0.conv.weight"] = _np(params["dec_up0"]["w"])
    sd[f"decoder.{1 + n_res}.0.conv.bias"] = _np(params["dec_up0"]["b"])
    sd[f"decoder.{2 + n_res}.0.conv.weight"] = _np(params["dec_up1"]["w"])
    sd[f"decoder.{2 + n_res}.0.conv.bias"] = _np(params["dec_up1"]["b"])
    sd[f"decoder.{3 + n_res}.weight"] = _np(params["dec_out"]["w"])
    sd[f"decoder.{3 + n_res}.bias"] = _np(params["dec_out"]["b"])
    return sd


def save_dvae_pth(path: str, params: Dict[str, Any],
                  cfg: Optional[VQVAEConfig] = None,
                  save_dtype: str = "fp32") -> str:
    cfg = cfg or VQVAEConfig()
    import torch

    torch.save(_to_torch_sd(export_dvae_state_dict(params, cfg), save_dtype),
               path)
    return path


# ---------------------------------------------------------------------------
# BigVGAN generator (bigvgan_generator.pth)
# ---------------------------------------------------------------------------

def _wn(sd: Dict[str, np.ndarray], base: str, p: Dict[str, Any]) -> None:
    """Plain folded weight → torch weight_norm(dim=0) parametrisation with
    ``weight_v = w`` and ``weight_g = ||w||`` (over dims 1..), whose fold
    reproduces ``w`` exactly."""
    w, b = _np(p["w"]), _np(p["b"])
    axes = tuple(range(1, w.ndim))
    g = np.sqrt(np.sum(w * w, axis=axes, keepdims=True))
    sd[base + ".weight_g"] = g.astype(np.float32)
    sd[base + ".weight_v"] = w
    sd[base + ".bias"] = b


def _plain(sd: Dict[str, np.ndarray], base: str, p: Dict[str, Any]) -> None:
    sd[base + ".weight"] = _np(p["w"])
    sd[base + ".bias"] = _np(p["b"])


def _export_ecapa(sd: Dict[str, np.ndarray], prefix: str,
                  p: Dict[str, Any]) -> None:
    def conv(base: str, c: Dict[str, Any]) -> None:
        sd[base + ".conv.weight"] = _np(c["w"])
        sd[base + ".conv.bias"] = _np(c["b"])

    def bn(base: str, n: Dict[str, Any]) -> None:
        sd[base + ".norm.weight"] = _np(n["scale"])
        sd[base + ".norm.bias"] = _np(n["bias"])
        sd[base + ".norm.running_mean"] = _np(n["mean"])
        sd[base + ".norm.running_var"] = _np(n["var"])
        # strict BigVGAN load (infer.py:393) needs the BN step counter too
        sd[base + ".norm.num_batches_tracked"] = np.zeros((), np.int64)

    def tdnn(base: str, t: Dict[str, Any]) -> None:
        conv(base + ".conv", t["conv"])
        bn(base + ".norm", t["bn"])

    blocks = p["blocks"]
    tdnn(prefix + "blocks.0", blocks[0])
    for i, blk in enumerate(blocks[1:], start=1):
        tdnn(prefix + f"blocks.{i}.tdnn1", blk["tdnn1"])
        for j, r in enumerate(blk["res2net"]):
            tdnn(prefix + f"blocks.{i}.res2net_block.blocks.{j}", r)
        tdnn(prefix + f"blocks.{i}.tdnn2", blk["tdnn2"])
        conv(prefix + f"blocks.{i}.se_block.conv1", blk["se"]["conv1"])
        conv(prefix + f"blocks.{i}.se_block.conv2", blk["se"]["conv2"])
    tdnn(prefix + "mfa", p["mfa"])
    tdnn(prefix + "asp.tdnn", p["asp"]["tdnn"])
    conv(prefix + "asp.conv", p["asp"]["conv"])
    bn(prefix + "asp_bn", p["asp_bn"])
    conv(prefix + "fc", p["fc"])


def export_bigvgan_state_dict(params: Dict[str, Any],
                              cfg: BigVGANConfig) -> Dict[str, np.ndarray]:
    """Inverse of checkpoint.convert_bigvgan_state_dict.  Folded weights
    regain their weight_g/weight_v split on the modules the reference wraps
    in weight_norm (conv_pre, ups, resblock convs, conv_post —
    models.py:151-186); cond layers and ECAPA stay plain."""
    sd: Dict[str, np.ndarray] = {}
    n_up = len(cfg.upsample_rates)
    n_kernels = len(cfg.resblock_kernel_sizes)

    _wn(sd, "conv_pre", params["conv_pre"])
    _plain(sd, "cond_layer", params["cond_layer"])
    _export_ecapa(sd, "speaker_encoder.", params["speaker_encoder"])
    for i in range(n_up):
        _wn(sd, f"ups.{i}.0", params["ups"][i])
        _plain(sd, f"conds.{i}", params["conds"][i])
    for idx in range(n_up * n_kernels):
        blk = params["resblocks"][idx]
        p = f"resblocks.{idx}."
        n_d = len(cfg.resblock_dilation_sizes[idx % n_kernels])
        for j in range(n_d):
            _wn(sd, p + f"convs1.{j}", blk["convs1"][j])
            _wn(sd, p + f"convs2.{j}", blk["convs2"][j])
        for j in range(2 * n_d):
            sd[p + f"activations.{j}.act.alpha"] = _np(blk["acts"][j]["alpha"])
            sd[p + f"activations.{j}.act.beta"] = _np(blk["acts"][j]["beta"])
    sd["activation_post.act.alpha"] = _np(params["activation_post"]["alpha"])
    sd["activation_post.act.beta"] = _np(params["activation_post"]["beta"])
    _wn(sd, "conv_post", params["conv_post"])
    return sd


def save_bigvgan_pth(path: str, params: Dict[str, Any],
                     cfg: Optional[BigVGANConfig] = None,
                     save_dtype: str = "fp32") -> str:
    """Write ``{'generator': state_dict}`` as the reference's
    bigvgan_generator.pth (infer.py:392-393)."""
    cfg = cfg or BigVGANConfig()
    import torch

    sd = _to_torch_sd(export_bigvgan_state_dict(params, cfg), save_dtype)
    torch.save({"generator": sd}, path)
    return path
