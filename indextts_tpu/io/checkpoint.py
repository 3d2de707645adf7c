"""Checkpoint I/O: reference ``.pth`` conversion + native pytree checkpoints.

Three reference formats are supported (utils/checkpoint.py:23-89,
infer.py:392-393, train.py:67-75):

  * ``gpt.pth`` — UnifiedVoice state_dict (optionally nested under "model",
    optionally with "speaker_conditions"/"mean_condition"/"speakers");
  * ``dvae.pth`` — DiscreteVAE state_dict;
  * ``bigvgan_generator.pth`` — {"generator": state_dict} with weight-norm
    ``weight_g``/``weight_v`` pairs, folded here into plain weights (the
    reference calls remove_weight_norm() at load, models.py:254-262).

torch is used purely as a host-side deserialiser; everything is converted to
numpy immediately.  Native checkpoints (training state, converted params)
are stored via orbax.
"""

from __future__ import annotations

import os
import re
import warnings
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from indextts_tpu.config import BigVGANConfig, GPTConfig, VQVAEConfig


def _load_torch_state(path: str) -> Dict[str, Any]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


class _SDView:
    """State-dict view that (a) raises ACTIONABLE KeyErrors naming the
    checkpoint format and nearby keys instead of a bare key, and (b) records
    which keys a converter consumed so genuinely unexpected leftovers can be
    reported instead of silently ignored (real checkpoints carry surprises:
    fp16 saves, `module.` prefixes, optimizer/buffer leftovers — reference
    handles the analogous variance at utils/checkpoint.py:23-89, train.py:40).
    """

    def __init__(self, sd: Dict[str, Any], what: str):
        self._sd = sd
        self._what = what
        self.consumed: set = set()

    def __getitem__(self, k: str):
        try:
            v = self._sd[k]
        except KeyError:
            close = [s for s in self._sd if s.split(".")[0] == k.split(".")[0]]
            raise KeyError(
                f"checkpoint is missing key '{k}' (expected a {self._what} "
                f"state_dict with {len(self._sd)} keys; nearby keys: "
                f"{sorted(close)[:4] or sorted(self._sd)[:4]} …). "
                "If this is a raw training checkpoint, pass the file that "
                "nests the weights under 'model'/'generator'.") from None
        self.consumed.add(k)
        return v

    def __contains__(self, k: str) -> bool:
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def keys(self):
        return self._sd.keys()

    def items(self):
        return self._sd.items()

    def warn_leftovers(self, ignore_patterns: Tuple[str, ...]) -> None:
        left = [k for k in self._sd if k not in self.consumed
                and not any(re.search(p, k) for p in ignore_patterns)]
        if left:
            warnings.warn(
                f"{self._what} checkpoint carries {len(left)} unexpected "
                f"key(s) not mapped into the model (first few: "
                f"{sorted(left)[:6]}); they were ignored — check the "
                "checkpoint matches the configured architecture",
                RuntimeWarning)


def _to_np(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t)


def _strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """reference normalize_state_dict_keys (train.py:40-52)."""
    if not any(k.startswith("module.") for k in sd):
        return sd
    return {k.removeprefix("module."): v for k, v in sd.items()}


def fold_weight_norm(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Fold weight_g/weight_v pairs into plain `weight` tensors.

    torch weight_norm(dim=0): w = g * v / ||v|| with the norm over all dims
    except 0."""
    out: Dict[str, Any] = {}
    for k, v in sd.items():
        if k.endswith("weight_g"):
            continue
        if k.endswith("weight_v"):
            base = k[: -len("weight_v")]
            g = _to_np(sd[base + "weight_g"])
            vv = _to_np(v)
            axes = tuple(range(1, vv.ndim))
            norm = np.sqrt(np.sum(vv * vv, axis=axes, keepdims=True))
            out[base + "weight"] = g * vv / np.maximum(norm, 1e-12)
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# UnifiedVoice (gpt.pth)
# ---------------------------------------------------------------------------

def convert_gpt_state_dict(sd: Dict[str, Any], cfg: GPTConfig) -> Dict[str, Any]:
    """Reference UnifiedVoice state_dict → our param pytree (numpy leaves).

    Key families (gpt/model.py:312-392): conditioning_encoder (conformer),
    perceiver_encoder, text/mel embeddings, per-stream position embeddings,
    gpt.h.* trunk (HF Conv1D [in, out] layout — no transpose), final_norm,
    text/mel heads (nn.Linear [out, in] — transposed here).
    """
    sd = _SDView({k: v for k, v in _strip_module_prefix(sd).items()
                  if not k.startswith("inference_model.")},
                 "UnifiedVoice (gpt.pth)")
    g = lambda k: _to_np(sd[k])
    L = cfg.layers
    # keys a real reference checkpoint carries that are correct to ignore:
    # HF GPT2's unused wte/wpe tables (nulled/external, gpt/model.py:263-286),
    # its causal-mask buffers, and speaker extras extracted by the loader
    _IGNORE = (r"^gpt\.wte\.", r"^gpt\.wpe\.",
               r"\.attn\.(bias|masked_bias)$", r"^mean_condition")

    def stack(fmt: str) -> np.ndarray:
        return np.stack([_to_np(sd[fmt.format(i)]) for i in range(L)])

    gpt_params = {
        "blocks": {
            "ln_1": {"scale": stack("gpt.h.{}.ln_1.weight"), "bias": stack("gpt.h.{}.ln_1.bias")},
            "attn": {
                "qkv_w": stack("gpt.h.{}.attn.c_attn.weight"),
                "qkv_b": stack("gpt.h.{}.attn.c_attn.bias"),
                "proj_w": stack("gpt.h.{}.attn.c_proj.weight"),
                "proj_b": stack("gpt.h.{}.attn.c_proj.bias"),
            },
            "ln_2": {"scale": stack("gpt.h.{}.ln_2.weight"), "bias": stack("gpt.h.{}.ln_2.bias")},
            "mlp": {
                "fc_w": stack("gpt.h.{}.mlp.c_fc.weight"),
                "fc_b": stack("gpt.h.{}.mlp.c_fc.bias"),
                "proj_w": stack("gpt.h.{}.mlp.c_proj.weight"),
                "proj_b": stack("gpt.h.{}.mlp.c_proj.bias"),
            },
        },
        "ln_f": {"scale": g("gpt.ln_f.weight"), "bias": g("gpt.ln_f.bias")},
    }

    # --- conditioning encoder (three reference variants,
    #     gpt/model.py:349-365) ------------------------------------------
    ce = "conditioning_encoder."
    if cfg.condition_type not in ("conformer_perceiver", "conformer_encoder"):
        # legacy AttentionBlock encoder ("perceiver" and the mean-pooled
        # default) — arch_util.py:84-126; conv1d kernels are [out, in, 1]
        n_attn = len({k.split(".")[2] for k in sd
                      if k.startswith(ce + "attn.")})
        cond_params = {
            "init": {"w": g(ce + "init.weight")[:, :, 0],
                     "b": g(ce + "init.bias")},
            "attn": [
                {"norm": {"scale": g(ce + f"attn.{i}.norm.weight"),
                          "bias": g(ce + f"attn.{i}.norm.bias")},
                 "qkv": {"w": g(ce + f"attn.{i}.qkv.weight")[:, :, 0],
                         "b": g(ce + f"attn.{i}.qkv.bias")},
                 "proj": {"w": g(ce + f"attn.{i}.proj_out.weight")[:, :, 0],
                          "b": g(ce + f"attn.{i}.proj_out.bias")}}
                for i in range(n_attn)
            ],
        }
        perceiver_params = (_convert_perceiver(sd) if
                            cfg.condition_type == "perceiver" else {})
        out = {
            "conditioning_encoder": cond_params,
            "perceiver_encoder": perceiver_params,
            **_embed_and_heads(g),
            "gpt": gpt_params,
        }
        sd.warn_leftovers(_IGNORE)
        return out
    CL = cfg.condition_module.num_blocks

    def cstack(fmt: str, transpose: bool = False) -> np.ndarray:
        arrs = [_to_np(sd[ce + fmt.format(i)]) for i in range(CL)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs)

    conformer_params = {
        "embed": {
            "conv": {"w": g(ce + "embed.conv.0.weight"), "b": g(ce + "embed.conv.0.bias")},
            "out": {"kernel": g(ce + "embed.out.0.weight").T, "bias": g(ce + "embed.out.0.bias")},
        },
        "blocks": {
            "norm_mha": {"scale": cstack("encoders.{}.norm_mha.weight"),
                          "bias": cstack("encoders.{}.norm_mha.bias")},
            "attn": {
                "q": {"kernel": cstack("encoders.{}.self_attn.linear_q.weight", True),
                       "bias": cstack("encoders.{}.self_attn.linear_q.bias")},
                "k": {"kernel": cstack("encoders.{}.self_attn.linear_k.weight", True),
                       "bias": cstack("encoders.{}.self_attn.linear_k.bias")},
                "v": {"kernel": cstack("encoders.{}.self_attn.linear_v.weight", True),
                       "bias": cstack("encoders.{}.self_attn.linear_v.bias")},
                "out": {"kernel": cstack("encoders.{}.self_attn.linear_out.weight", True),
                         "bias": cstack("encoders.{}.self_attn.linear_out.bias")},
                "pos": {"kernel": cstack("encoders.{}.self_attn.linear_pos.weight", True)},
                "pos_bias_u": cstack("encoders.{}.self_attn.pos_bias_u"),
                "pos_bias_v": cstack("encoders.{}.self_attn.pos_bias_v"),
            },
            "norm_conv": {"scale": cstack("encoders.{}.norm_conv.weight"),
                           "bias": cstack("encoders.{}.norm_conv.bias")},
            "conv": {
                "pw1": {"kernel": np.stack([
                            _to_np(sd[ce + f"encoders.{i}.conv_module.pointwise_conv1.weight"])[:, :, 0].T
                            for i in range(CL)]),
                         "bias": cstack("encoders.{}.conv_module.pointwise_conv1.bias")},
                "dw": {"w": cstack("encoders.{}.conv_module.depthwise_conv.weight"),
                        "b": cstack("encoders.{}.conv_module.depthwise_conv.bias")},
                "norm": {"scale": cstack("encoders.{}.conv_module.norm.weight"),
                          "bias": cstack("encoders.{}.conv_module.norm.bias")},
                "pw2": {"kernel": np.stack([
                            _to_np(sd[ce + f"encoders.{i}.conv_module.pointwise_conv2.weight"])[:, :, 0].T
                            for i in range(CL)]),
                         "bias": cstack("encoders.{}.conv_module.pointwise_conv2.bias")},
            },
            "norm_ff": {"scale": cstack("encoders.{}.norm_ff.weight"),
                         "bias": cstack("encoders.{}.norm_ff.bias")},
            "ff": {
                "w1": {"kernel": cstack("encoders.{}.feed_forward.w_1.weight", True),
                        "bias": cstack("encoders.{}.feed_forward.w_1.bias")},
                "w2": {"kernel": cstack("encoders.{}.feed_forward.w_2.weight", True),
                        "bias": cstack("encoders.{}.feed_forward.w_2.bias")},
            },
            "norm_final": {"scale": cstack("encoders.{}.norm_final.weight"),
                            "bias": cstack("encoders.{}.norm_final.bias")},
        },
        "after_norm": {"scale": g(ce + "after_norm.weight"), "bias": g(ce + "after_norm.bias")},
    }

    out = {
        "conditioning_encoder": conformer_params,
        "perceiver_encoder": _convert_perceiver(sd),
        **_embed_and_heads(g),
        "gpt": gpt_params,
    }
    sd.warn_leftovers(_IGNORE)
    return out


def _convert_perceiver(sd) -> Dict[str, Any]:
    """perceiver_encoder.* keys → param pytree — shared by the conformer
    and legacy "perceiver" condition types (the reference instantiates the
    same PerceiverResampler class for both, gpt/model.py:350-362)."""
    g = lambda k: _to_np(sd[k])
    pe = "perceiver_encoder."
    PD = 2  # depth (perceiver.py:219-256)

    def pstack(fmt: str, transpose: bool = False) -> np.ndarray:
        arrs = [_to_np(sd[pe + fmt.format(i)]) for i in range(PD)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs)

    if pe + "proj_context.weight" in sd:
        proj = {"kernel": g(pe + "proj_context.weight").T,
                "bias": g(pe + "proj_context.bias")}
    else:
        # dim_context == dim → reference uses nn.Identity (perceiver.py:234);
        # an eye kernel reproduces it through the always-projecting forward
        D = _to_np(sd[pe + "latents"]).shape[1]
        proj = {"kernel": np.eye(D, dtype=np.float32),
                "bias": np.zeros((D,), np.float32)}
    return {
        "proj_context": proj,
        "latents": g(pe + "latents"),
        "layers": {
            "attn": {
                "to_q": pstack("layers.{}.0.to_q.weight", True),
                "to_kv": pstack("layers.{}.0.to_kv.weight", True),
                "to_out": pstack("layers.{}.0.to_out.weight", True),
            },
            "ff": {
                "w1": {"kernel": pstack("layers.{}.1.0.weight", True),
                        "bias": pstack("layers.{}.1.0.bias")},
                "w2": {"kernel": pstack("layers.{}.1.2.weight", True),
                        "bias": pstack("layers.{}.1.2.bias")},
            },
        },
        "norm": {"gamma": g(pe + "norm.gamma")},
    }


def _embed_and_heads(g) -> Dict[str, Any]:
    """Embeddings, position tables, final_norm and heads — identical across
    condition types (gpt/model.py:367-385)."""
    return {
        "text_embedding": {"weight": g("text_embedding.weight")},
        "mel_embedding": {"weight": g("mel_embedding.weight")},
        "mel_pos_embedding": {"weight": g("mel_pos_embedding.emb.weight")},
        "text_pos_embedding": {"weight": g("text_pos_embedding.emb.weight")},
        "final_norm": {"scale": g("final_norm.weight"), "bias": g("final_norm.bias")},
        "text_head": {"kernel": g("text_head.weight").T, "bias": g("text_head.bias")},
        "mel_head": {"kernel": g("mel_head.weight").T, "bias": g("mel_head.bias")},
    }


def load_gpt_checkpoint(path: str, cfg: GPTConfig) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference gpt checkpoint.  Returns (params, extras) where
    extras may contain 'speaker_conditions' {id: (1,32,D) np}, 'speakers',
    'mean_condition' (utils/checkpoint.py:42-89)."""
    ckpt = _load_torch_state(path)
    if not isinstance(ckpt, dict):
        raise ValueError(
            f"{path}: expected a dict checkpoint (state_dict or "
            f"{{'model': state_dict}}), got {type(ckpt).__name__}")
    extras: Dict[str, Any] = {}
    if "speaker_conditions" in ckpt:
        # _to_np, not np.asarray: the tensors may be saved fp16/bf16
        # (numpy cannot view torch bf16 directly)
        extras["speaker_conditions"] = {
            k: _to_np(v).astype(np.float32).reshape(1, *_to_np(v).shape[-2:])
            for k, v in ckpt["speaker_conditions"].items()
        }
    if "speakers" in ckpt:
        extras["speakers"] = list(ckpt["speakers"])
    if "speaker_mels" in ckpt:
        # per-speaker vocoder reference mels [n_mels, T] (our extension: the
        # vocoder's ECAPA conditioning for speaker_id-only synthesis)
        extras["speaker_mels"] = {
            k: _to_np(v).astype(np.float32)
            for k, v in ckpt["speaker_mels"].items()
        }
    sd = next((ckpt[n] for n in ("model", "state_dict") if n in ckpt), ckpt)
    sd = _strip_module_prefix(dict(sd))
    if "mean_condition" in sd:
        extras["mean_condition"] = _to_np(sd.pop("mean_condition"))
    # learnable per-speaker conditions stored flat in the state dict
    for k in list(sd):
        m = re.match(r"mean_condition_(.+)$", k)
        if m:
            extras.setdefault("speaker_conditions", {})[m.group(1)] = _to_np(sd.pop(k))
    return convert_gpt_state_dict(sd, cfg), extras


# ---------------------------------------------------------------------------
# DVAE (dvae.pth)
# ---------------------------------------------------------------------------

def convert_dvae_state_dict(sd: Dict[str, Any], cfg: VQVAEConfig) -> Dict[str, Any]:
    """DiscreteVAE state_dict → our pytree (layer indices per
    xtts_dvae.py:258-298 at the shipped config)."""
    sd = _SDView(_strip_module_prefix(dict(sd)), "DiscreteVAE (dvae.pth)")
    g = lambda k: _to_np(sd[k])
    n_res = cfg.num_resnet_blocks

    def res(prefix: str, indices: List[int]) -> Dict[str, Any]:
        return {
            "c1": {"w": np.stack([g(f"{prefix}.{i}.net.0.weight") for i in indices]),
                    "b": np.stack([g(f"{prefix}.{i}.net.0.bias") for i in indices])},
            "c2": {"w": np.stack([g(f"{prefix}.{i}.net.2.weight") for i in indices]),
                    "b": np.stack([g(f"{prefix}.{i}.net.2.bias") for i in indices])},
            "c3": {"w": np.stack([g(f"{prefix}.{i}.net.4.weight") for i in indices]),
                    "b": np.stack([g(f"{prefix}.{i}.net.4.bias") for i in indices])},
        }

    out = {
        "enc_conv0": {"w": g("encoder.0.0.weight"), "b": g("encoder.0.0.bias")},
        "enc_conv1": {"w": g("encoder.1.0.weight"), "b": g("encoder.1.0.bias")},
        "enc_res": res("encoder", list(range(2, 2 + n_res))),
        "enc_out": {"w": g(f"encoder.{2 + n_res}.weight"), "b": g(f"encoder.{2 + n_res}.bias")},
        "codebook": {
            "embed": g("codebook.embed"),
            "cluster_size": g("codebook.cluster_size"),
            "embed_avg": g("codebook.embed_avg"),
        },
        "dec_in": {"w": g("decoder.0.weight"), "b": g("decoder.0.bias")},
        "dec_res": res("decoder", list(range(1, 1 + n_res))),
        "dec_up0": {"w": g(f"decoder.{1 + n_res}.0.conv.weight"),
                     "b": g(f"decoder.{1 + n_res}.0.conv.bias")},
        "dec_up1": {"w": g(f"decoder.{2 + n_res}.0.conv.weight"),
                     "b": g(f"decoder.{2 + n_res}.0.conv.bias")},
        "dec_out": {"w": g(f"decoder.{3 + n_res}.weight"), "b": g(f"decoder.{3 + n_res}.bias")},
    }
    sd.warn_leftovers((r"\.initted$", r"^codebook\.initted",))
    return out


def load_dvae_checkpoint(path: str, cfg: Optional[VQVAEConfig] = None) -> Dict[str, Any]:
    cfg = cfg or VQVAEConfig()
    ckpt = _load_torch_state(path)
    if not isinstance(ckpt, dict):
        raise ValueError(
            f"{path}: expected a dict checkpoint, got {type(ckpt).__name__}")
    sd = next((ckpt[n] for n in ("model", "state_dict") if n in ckpt), ckpt)
    return convert_dvae_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# BigVGAN generator (bigvgan_generator.pth)
# ---------------------------------------------------------------------------

def _ecapa_convert(sd: Dict[str, Any], prefix: str, n_blocks: int = 4) -> Dict[str, Any]:
    g = lambda k: _to_np(sd[prefix + k])

    def conv(k):
        return {"w": g(k + ".conv.weight"), "b": g(k + ".conv.bias")}

    def bn(k):
        return {"scale": g(k + ".norm.weight"), "bias": g(k + ".norm.bias"),
                "mean": g(k + ".norm.running_mean"), "var": g(k + ".norm.running_var")}

    def tdnn(k):
        return {"conv": conv(k + ".conv"), "bn": bn(k + ".norm")}

    blocks: List[Dict[str, Any]] = [tdnn("blocks.0")]
    scale = 8
    for i in range(1, n_blocks):
        blocks.append({
            "tdnn1": tdnn(f"blocks.{i}.tdnn1"),
            "res2net": [tdnn(f"blocks.{i}.res2net_block.blocks.{j}")
                         for j in range(scale - 1)],
            "tdnn2": tdnn(f"blocks.{i}.tdnn2"),
            "se": {"conv1": conv(f"blocks.{i}.se_block.conv1"),
                    "conv2": conv(f"blocks.{i}.se_block.conv2")},
        })
    return {
        "blocks": blocks,
        "mfa": tdnn("mfa"),
        "asp": {"tdnn": tdnn("asp.tdnn"), "conv": conv("asp.conv")},
        "asp_bn": bn("asp_bn"),
        "fc": conv("fc"),
    }


def convert_bigvgan_state_dict(sd: Dict[str, Any], cfg: BigVGANConfig) -> Dict[str, Any]:
    sd = _SDView(fold_weight_norm(_strip_module_prefix(dict(sd))),
                 "BigVGAN generator (bigvgan_generator.pth)")
    g = lambda k: _to_np(sd[k])
    n_up = len(cfg.upsample_rates)
    n_kernels = len(cfg.resblock_kernel_sizes)

    params: Dict[str, Any] = {
        "conv_pre": {"w": g("conv_pre.weight"), "b": g("conv_pre.bias")},
        "cond_layer": {"w": g("cond_layer.weight"), "b": g("cond_layer.bias")},
        "speaker_encoder": _ecapa_convert(sd, "speaker_encoder."),
        "ups": [{"w": g(f"ups.{i}.0.weight"), "b": g(f"ups.{i}.0.bias")}
                 for i in range(n_up)],
        "conds": [{"w": g(f"conds.{i}.weight"), "b": g(f"conds.{i}.bias")}
                   for i in range(n_up)],
        "resblocks": [],
    }
    for idx in range(n_up * n_kernels):
        p = f"resblocks.{idx}."
        n_d = len(cfg.resblock_dilation_sizes[idx % n_kernels])
        params["resblocks"].append({
            "convs1": [{"w": g(p + f"convs1.{j}.weight"), "b": g(p + f"convs1.{j}.bias")}
                        for j in range(n_d)],
            "convs2": [{"w": g(p + f"convs2.{j}.weight"), "b": g(p + f"convs2.{j}.bias")}
                        for j in range(n_d)],
            "acts": [{"alpha": g(p + f"activations.{j}.act.alpha"),
                       "beta": g(p + f"activations.{j}.act.beta")}
                      for j in range(2 * n_d)],
        })
    params["activation_post"] = {"alpha": g("activation_post.act.alpha"),
                                  "beta": g("activation_post.act.beta")}
    params["conv_post"] = {"w": g("conv_post.weight"), "b": g("conv_post.bias")}
    # BatchNorm bookkeeping buffers in the ECAPA encoder are expected noise
    sd.warn_leftovers((r"num_batches_tracked$",))
    return params


def load_bigvgan_checkpoint(path: str, cfg: Optional[BigVGANConfig] = None) -> Dict[str, Any]:
    cfg = cfg or BigVGANConfig()
    ckpt = _load_torch_state(path)
    if not isinstance(ckpt, dict):
        raise ValueError(
            f"{path}: expected a dict checkpoint, got {type(ckpt).__name__}")
    sd = next((ckpt[n] for n in ("generator", "model", "state_dict")
               if n in ckpt), ckpt)
    return convert_bigvgan_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# native pytree checkpoints (orbax)
# ---------------------------------------------------------------------------

def save_pytree(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)
