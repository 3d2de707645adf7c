"""Codec extraction pipeline — audio → DVAE mel-codes + mels + conditioning.

Reconstruction of the reference's missing ``tools/extract_codec.py`` from
its data contract (SURVEY.md §2.12; call sites run_extract_code.sh:3,
scripts/run_extract.sh:17-37, consumers data_utils.py:300-353,863-885):

  input   audio_list file, lines ``audio_path<TAB>transcript``
  output  per clip:    {speaker}/codes/{stem}.npy   (DVAE indices, int)
                       {speaker}/mels/{stem}.npy    (100-mel log spectrogram)
          per speaker: metadata_train.jsonl / metadata_valid.jsonl with
                       {audio, text, duration, codes, mels}
                       medoid_condition.npy  (1, 32, 1280)
          global:      speaker_info.json

On TPU the batch work (mel → DVAE encode → conditioning) runs as jitted
programs over length-bucketed batches; the medoid search is a chunked
pairwise-distance argmin (config.yaml:31-36 semantics).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from indextts_tpu.config import Config
from indextts_tpu.ops.mel import mel_spectrogram
from indextts_tpu.utils import audio as audio_io


def parse_audio_list(path: str) -> List[Tuple[str, str]]:
    """Lines of ``audio_path<TAB>transcript`` (reference README.md:16)."""
    entries = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or "\t" not in line:
                continue
            audio_path, text = line.split("\t", 1)
            entries.append((audio_path, text))
    return entries


def speaker_of(audio_path: str, list_path: Optional[str] = None) -> str:
    """Speaker id = parent directory of the clip (prepare_audio_list.py
    groups one speaker per directory)."""
    return os.path.basename(os.path.dirname(os.path.abspath(audio_path))) or "speaker"


def medoid_index(latents: np.ndarray, chunk_size: int = 2048) -> int:
    """Index of the latent minimising the summed distance to all others —
    the per-speaker representative conditioning (config.yaml:31-36).
    latents: [N, 32, D] flattened per clip."""
    flat = latents.reshape(latents.shape[0], -1).astype(np.float32)
    n = flat.shape[0]
    sq = np.sum(flat * flat, axis=1)
    totals = np.zeros(n, dtype=np.float64)
    for i in range(0, n, chunk_size):
        block = flat[i : i + chunk_size]
        d2 = sq[i : i + chunk_size, None] - 2.0 * block @ flat.T + sq[None, :]
        totals[i : i + chunk_size] = np.sqrt(np.maximum(d2, 0.0)).sum(axis=1)
    return int(np.argmin(totals))


class CodecExtractor:
    """Batched mel + DVAE-code + conditioning extraction."""

    def __init__(self, cfg: Config, model_dir: str, batch_size: int = 16):
        from indextts_tpu.io import checkpoint as ckpt_io
        from indextts_tpu.models import dvae as dvae_model
        from indextts_tpu.models import unified_voice as uv

        self.cfg = cfg
        self.batch_size = batch_size
        self._uv = uv
        self._dvae = dvae_model

        dvae_path = os.path.join(model_dir, cfg.dvae_checkpoint)
        if os.path.exists(dvae_path):
            self.dvae_params = jax.tree.map(
                jnp.asarray, ckpt_io.load_dvae_checkpoint(dvae_path, cfg.vqvae))
        else:
            self.dvae_params = jax.jit(
                lambda k: dvae_model.init_params(k, cfg.vqvae))(jax.random.PRNGKey(0))
        gpt_path = os.path.join(model_dir, cfg.gpt_checkpoint)
        if os.path.exists(gpt_path):
            self.gpt_params, _ = ckpt_io.load_gpt_checkpoint(gpt_path, cfg.gpt)
            self.gpt_params = jax.tree.map(jnp.asarray, self.gpt_params)
        else:
            self.gpt_params = jax.jit(
                lambda k: uv.init_params(k, cfg.gpt))(jax.random.PRNGKey(1))

        self._codes_fn = jax.jit(
            lambda mel: dvae_model.quantize_indices(
                self.dvae_params["codebook"],
                dvae_model.encode(self.dvae_params, mel, cfg.vqvae)))
        self._cond_fn = lambda mel, lens: uv.get_conditioning(
            self.gpt_params, cfg.gpt, mel, lens)

    def extract_clip_features(self, wav: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """wav [1, T] → (mel [100, F], codes [F//4])."""
        mel = mel_spectrogram(jnp.asarray(wav))  # [1, 100, F]
        # DVAE reduces time 4x; trim so codes align with whole frames
        F = mel.shape[-1] - (mel.shape[-1] % 4)
        codes = self._codes_fn(mel[..., :F])
        return np.asarray(mel[0]), np.asarray(codes[0])

    def conditioning_latent(self, mel: np.ndarray) -> np.ndarray:
        """mel [100, F] → (1, 32, D)."""
        lat = self._cond_fn(jnp.asarray(mel[None]), jnp.asarray([mel.shape[-1]]))
        return np.asarray(lat)


def extract_audio_list(
    list_path: str,
    output_dir: str,
    cfg: Config,
    model_dir: str,
    valid_ratio: float = 0.1,
    extract_condition: bool = True,
    batch_size: int = 16,
    seed: int = 0,
) -> Dict[str, Dict]:
    """Process one audio list into the processed_data layout.  Returns
    per-speaker stats for speaker_info.json."""
    entries = parse_audio_list(list_path)
    extractor = CodecExtractor(cfg, model_dir, batch_size)
    sr = cfg.dataset.sample_rate

    per_speaker: Dict[str, List[Dict]] = {}
    latents: Dict[str, List[np.ndarray]] = {}
    for audio_path, text in entries:
        speaker = speaker_of(audio_path, list_path)
        stem = os.path.splitext(os.path.basename(audio_path))[0]
        spk_dir = os.path.join(output_dir, speaker)
        os.makedirs(os.path.join(spk_dir, "codes"), exist_ok=True)
        os.makedirs(os.path.join(spk_dir, "mels"), exist_ok=True)
        try:
            wav = audio_io.load_prompt_audio(audio_path, sr)
        except Exception as e:
            print(f"[skip] {audio_path}: {e}")
            continue
        duration = wav.shape[-1] / sr
        mel, codes = extractor.extract_clip_features(wav)
        codes_rel = os.path.join("codes", f"{stem}.npy")
        mels_rel = os.path.join("mels", f"{stem}.npy")
        np.save(os.path.join(spk_dir, codes_rel), codes)
        np.save(os.path.join(spk_dir, mels_rel), mel)
        per_speaker.setdefault(speaker, []).append({
            "audio": audio_path, "text": text, "duration": round(duration, 3),
            "codes": codes_rel, "mels": mels_rel,
        })
        if extract_condition:
            latents.setdefault(speaker, []).append(
                extractor.conditioning_latent(mel))

    rng = np.random.default_rng(seed)
    info: Dict[str, Dict] = {}
    for speaker, records in per_speaker.items():
        spk_dir = os.path.join(output_dir, speaker)
        order = rng.permutation(len(records))
        n_valid = max(1, int(round(len(records) * valid_ratio))) if len(records) > 1 else 0
        valid_idx = set(order[:n_valid].tolist())
        splits = {"train": [], "valid": []}
        for i, rec in enumerate(records):
            splits["valid" if i in valid_idx else "train"].append(rec)
        for split, recs in splits.items():
            with open(os.path.join(spk_dir, f"metadata_{split}.jsonl"), "w",
                      encoding="utf-8") as f:
                for rec in recs:
                    f.write(json.dumps(rec, ensure_ascii=False) + "\n")
        stats = {
            "speaker": speaker,
            "num_clips": len(records),
            "num_train": len(splits["train"]),
            "num_valid": len(splits["valid"]),
            "total_duration": round(sum(r["duration"] for r in records), 2),
        }
        if extract_condition and latents.get(speaker):
            lat = np.concatenate(latents[speaker], axis=0)  # [N, 32, D]
            med = medoid_index(lat)
            np.save(os.path.join(spk_dir, "medoid_condition.npy"), lat[med : med + 1])
            stats["medoid_clip"] = records[med]["audio"]
        info[speaker] = stats

    # merge into the global speaker_info.json
    info_path = os.path.join(output_dir, "speaker_info.json")
    existing: List[Dict] = []
    if os.path.exists(info_path):
        with open(info_path, "r", encoding="utf-8") as f:
            existing = json.load(f)
    merged = {it["speaker"]: it for it in existing if "speaker" in it}
    merged.update(info)
    with open(info_path, "w", encoding="utf-8") as f:
        json.dump(list(merged.values()), f, ensure_ascii=False, indent=2)
    return info


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="DVAE codec extraction (extract_codec)")
    p.add_argument("--audio_list", required=True)
    p.add_argument("--config", default="finetune_models/config.yaml")
    p.add_argument("--model_dir", default="finetune_models")
    p.add_argument("--output_dir", default=None)
    p.add_argument("--extract_condition", action="store_true")
    p.add_argument("--device", default=None, help="ignored (TPU-native)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=8, help="ignored")
    p.add_argument("--valid_ratio", type=float, default=0.1)
    args = p.parse_args(argv)

    cfg = Config.load(args.config) if os.path.exists(args.config) else Config()
    out = args.output_dir or cfg.workflow.paths.processed_data_dir
    info = extract_audio_list(args.audio_list, out, cfg, args.model_dir,
                              valid_ratio=args.valid_ratio,
                              extract_condition=args.extract_condition,
                              batch_size=args.batch_size)
    for sp, st in info.items():
        print(f"{sp}: {st['num_clips']} clips ({st['total_duration']}s), "
              f"{st['num_train']} train / {st['num_valid']} valid")


if __name__ == "__main__":
    main()
