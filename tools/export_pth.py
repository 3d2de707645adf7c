"""Export a trained orbax pytree checkpoint to a reference-format .pth.

The inverse of the import converters (io/checkpoint.py): the resulting file
is deployable on the reference CUDA stack unchanged — `gpt` exports the
trainer's merged model as ``{'model': state_dict}`` (+ speaker extras,
reference train.py:795-844), `vocoder` exports ``{'generator': sd}`` with
weight-norm splits restored (infer.py:392-393), `dvae` a flat DiscreteVAE
state_dict.

Usage:
  python tools/export_pth.py gpt     --ckpt out/run/model_epoch_3 \
      --config finetune_models/config.yaml --out gpt_finetuned.pth \
      [--dtype fp16] [--data-path finetune_data/processed_data]
  python tools/export_pth.py dvae    --ckpt out/dvae_step_1000   --out dvae.pth
  python tools/export_pth.py vocoder --ckpt out/vocoder_step_1000 \
      --out bigvgan_generator.pth
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from indextts_tpu.config import Config  # noqa: E402
from indextts_tpu.io import checkpoint as ckpt_io  # noqa: E402
from indextts_tpu.io import export as export_io  # noqa: E402


def _load(ckpt_path: str, like):
    return ckpt_io.load_pytree(ckpt_path, like)


def _speaker_extras(data_path: str):
    import json

    extras = {}
    info = os.path.join(data_path, "speaker_info.json")
    if os.path.exists(info):
        with open(info, "r", encoding="utf-8") as f:
            speakers = [it["speaker"] for it in json.load(f) if "speaker" in it]
    else:
        speakers = [d for d in sorted(os.listdir(data_path))
                    if os.path.isdir(os.path.join(data_path, d))]
    conds, mels = {}, {}
    for sp in speakers:
        c = os.path.join(data_path, sp, "medoid_condition.npy")
        m = os.path.join(data_path, sp, "medoid_mel.npy")
        if os.path.exists(c):
            conds[sp] = np.load(c)
        if os.path.exists(m):
            mels[sp] = np.load(m)
    if conds:
        extras["speaker_conditions"] = conds
        extras["speakers"] = sorted(conds)
    if mels:
        extras["speaker_mels"] = mels
    return extras


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("kind", choices=["gpt", "dvae", "vocoder"])
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint dir (model_epoch_N / dvae_step_N / "
                        "vocoder_step_N)")
    p.add_argument("--config", default="finetune_models/config.yaml")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--dtype", default=None,
                   choices=["fp16", "bf16", "fp32"],
                   help="save dtype (default: fp16 for gpt, fp32 otherwise)")
    p.add_argument("--data-path", default=None,
                   help="extraction output dir — embeds per-speaker medoid "
                        "conditions/mels into the gpt checkpoint")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    cfg = Config.load(args.config) if os.path.exists(args.config) else Config()

    if args.kind == "gpt":
        from indextts_tpu.models import unified_voice as uv

        like = jax.jit(lambda k: uv.init_params(k, cfg.gpt))(jax.random.PRNGKey(0))
        params = _load(args.ckpt, jax.device_get(like))
        extras = _speaker_extras(args.data_path) if args.data_path else None
        export_io.save_gpt_pth(args.out, params, cfg.gpt, extras=extras,
                               save_dtype=args.dtype or "fp16")
    elif args.kind == "dvae":
        from indextts_tpu.models import dvae as dvae_m

        like = {"params": jax.device_get(
            jax.jit(lambda k: dvae_m.init_params(k, cfg.vqvae))(
                jax.random.PRNGKey(0))), "step": 0}
        tree = _load(args.ckpt, like)
        export_io.save_dvae_pth(args.out, tree["params"], cfg.vqvae,
                                save_dtype=args.dtype or "fp32")
    else:
        from indextts_tpu.models import bigvgan as bv
        from indextts_tpu.models import discriminators as disc_lib

        gen_like = jax.device_get(
            jax.jit(lambda k: bv.init_params(k, cfg.bigvgan))(
                jax.random.PRNGKey(0)))
        disc_like = jax.device_get(
            disc_lib.init_discriminators(jax.random.PRNGKey(1)))
        like = {"gen_params": gen_like, "disc_params": disc_like, "step": 0}
        tree = _load(args.ckpt, like)
        export_io.save_bigvgan_pth(args.out, tree["gen_params"], cfg.bigvgan,
                                   save_dtype=args.dtype or "fp32")
    print(f"[export] wrote {args.out}")


if __name__ == "__main__":
    main()
