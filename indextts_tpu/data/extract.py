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
                       medoid_mel.npy        (100, F) — the medoid clip's
                       mel, the vocoder-side speaker reference for
                       speaker_id-only synthesis (engine._mel_ref)
          global:      speaker_info.json

TPU-shaped batching (reference runs batch 16 × 8 workers per GPU,
config.yaml:23-28, run_extract.sh:40-117): clips are sorted by length and
grouped into ``batch_size`` batches padded to a small ladder of static
mel-frame widths, so the whole dataset compiles at most one program per
(batch, bucket) pair instead of one per unique clip length — on the
remote-compile tunnel the per-clip path was one compilation per clip.
Audio decoding overlaps device compute via a ``num_workers`` thread pool.

Exactness under padding:
  * mel — exact.  Each clip is reflect-padded n_fft//2 host-side and the
    batch STFT runs center=False, so zero-padded batch tails can never
    leak into a clip's true frames.
  * conditioning — exact.  The conformer masks by true length.
  * DVAE codes — exact for the longest clip of each batch; shorter clips'
    last ~(receptive field)/4 codes may differ from a per-clip run because
    the encoder sees silence frames instead of its own zero conv padding
    (the reference's batch-16 extraction has the same property).
    ``--exact`` forces the per-clip path.
"""

from __future__ import annotations

import hashlib
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from indextts_tpu.config import Config
from indextts_tpu.ops.mel import mel_filterbank, mel_spectrogram, safe_log, spectrogram
from indextts_tpu.utils import audio as audio_io

# mel-frame bucket ladder: 1-20 s @ ~93.75 frames/s → 94..1875 frames
FRAME_BUCKETS = (256, 512, 768, 1024, 1280, 1536, 2048)


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


def frames_for(n_samples: int, hop: int = 256) -> int:
    """torchaudio center=True frame count."""
    return n_samples // hop + 1


def bucket_frames(f: int) -> int:
    for b in FRAME_BUCKETS:
        if f <= b:
            return b
    return -(-f // FRAME_BUCKETS[0]) * FRAME_BUCKETS[0]


class CodecExtractor:
    """Batched mel + DVAE-code + conditioning extraction."""

    def __init__(self, cfg: Config, model_dir: str, batch_size: int = 16):
        from indextts_tpu.io import checkpoint as ckpt_io
        from indextts_tpu.models import dvae as dvae_model
        from indextts_tpu.models import unified_voice as uv

        self.cfg = cfg
        self.batch_size = max(1, batch_size)
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

        mel = cfg.dataset.mel
        self._hop = mel.hop_length
        self._n_fft = mel.n_fft

        def mel_uncentered(wav):
            spec = spectrogram(wav, mel.n_fft, mel.hop_length, mel.win_length,
                               power=1.0, center=False)
            fb = jnp.asarray(mel_filterbank(mel.sample_rate, mel.n_fft, mel.n_mels))
            return safe_log(jnp.einsum("...ft,fm->...mt", spec, fb))

        self._mel_fn = jax.jit(mel_uncentered)
        self._codes_fn = jax.jit(
            lambda m: dvae_model.quantize_indices(
                self.dvae_params["codebook"],
                dvae_model.encode(self.dvae_params, m, cfg.vqvae)))
        self._cond_fn = jax.jit(
            lambda m, lens: uv.get_conditioning(self.gpt_params, cfg.gpt, m, lens))

    # -- batched path ------------------------------------------------------

    def dispatch_batch(self, wavs: Sequence[np.ndarray], extract_condition: bool):
        """Enqueue one bucket-batch on the device; returns an opaque handle.
        Dispatch/fetch are split so the driver can overlap batch i+1's
        upload with batch i's compute + download (the axon tunnel moves
        ~3-9 MB/s, so transfers dominate there)."""
        B = len(wavs)
        Bs = self.batch_size
        pad_rows = Bs - B if B < Bs else 0
        hop, n_fft = self._hop, self._n_fft
        frames = [frames_for(w.shape[-1], hop) for w in wavs]
        Fb = bucket_frames(max(frames))
        Lw = (Fb - 1) * hop + n_fft

        buf = np.zeros((B + pad_rows, Lw), np.float32)
        for i, w in enumerate(wavs):
            w = np.asarray(w, np.float32).reshape(-1)
            # per-clip reflect pad (center=True semantics), then zero tail.
            # A bucket-saturating clip whose length is not hop-aligned pads
            # to up to hop-1 samples past Lw (frames == Fb only bounds
            # T <= Fb*hop - 1); clamp to the row — the clipped samples are
            # reflect-pad tail inside the LAST frame's window only, the
            # same tail-approximation class as bucketed-vs-exact codes
            # (PARITY "Known deviations"; --exact is bit-exact)
            padded = np.pad(w, (n_fft // 2, n_fft // 2), mode="reflect")[:Lw]
            buf[i, : padded.shape[0]] = padded

        mels = self._mel_fn(jnp.asarray(buf))                       # [Bs,100,Fb]
        codes = self._codes_fn(mels)                                # [Bs,Fb//4]
        cond = None
        if extract_condition:
            lens = jnp.asarray(frames + [frames[-1]] * pad_rows, jnp.int32)
            cond = self._cond_fn(mels, lens)                        # [Bs,32,D]
        return (frames, B, mels, codes, cond)

    @staticmethod
    def fetch_batch(handle) -> List[Dict[str, np.ndarray]]:
        """Materialise a dispatched batch → per-clip dicts
        {mel [100, F], codes [F4//4], cond (1, 32, D)?}."""
        frames, B, mels, codes, cond = handle
        mels_np = np.asarray(mels)
        codes_np = np.asarray(codes)
        cond_np = np.asarray(cond) if cond is not None else None
        out = []
        for i in range(B):
            F = frames[i]
            F4 = F - F % 4
            rec = {"mel": mels_np[i, :, :F], "codes": codes_np[i, : F4 // 4]}
            if cond_np is not None:
                rec["cond"] = cond_np[i : i + 1]
            out.append(rec)
        return out

    def extract_batch(self, wavs: Sequence[np.ndarray], extract_condition: bool
                      ) -> List[Dict[str, np.ndarray]]:
        return self.fetch_batch(self.dispatch_batch(wavs, extract_condition))

    # -- per-clip path (exact; kept for --exact and small jobs) ------------

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


def _iter_batches(entries, extractor, sr, num_workers, exact):
    """Yield (batch_entries, wavs) with audio decode prefetched on threads,
    batches grouped by length bucket."""
    pool = ThreadPoolExecutor(max_workers=max(1, num_workers))

    def load(e):
        try:
            wav = audio_io.load_prompt_audio(e[0], sr)
            return e, np.asarray(wav, np.float32).reshape(-1)
        except Exception as exc:  # noqa: BLE001 — skip undecodable clips
            print(f"[skip] {e[0]}: {exc}")
            return e, None

    loaded = [r for r in pool.map(load, entries) if r[1] is not None]
    pool.shutdown()
    if exact:
        for e, w in loaded:
            yield [e], [w]
        return
    loaded.sort(key=lambda r: r[1].shape[-1])
    bs = extractor.batch_size
    for i in range(0, len(loaded), bs):
        chunk = loaded[i : i + bs]
        yield [e for e, _ in chunk], [w for _, w in chunk]


def extract_audio_list(
    list_path: str,
    output_dir: str,
    cfg: Config,
    model_dir: str,
    valid_ratio: float = 0.1,
    extract_condition: bool = True,
    batch_size: int = 16,
    num_workers: int = 8,
    seed: int = 0,
    exact: bool = False,
) -> Dict[str, Dict]:
    """Process one audio list into the processed_data layout.  Returns
    per-speaker stats for speaker_info.json."""
    entries = parse_audio_list(list_path)
    extractor = CodecExtractor(cfg, model_dir, batch_size)
    sr = cfg.dataset.sample_rate

    per_speaker: Dict[str, List[Dict]] = {}
    latents: Dict[str, List[np.ndarray]] = {}
    mel_paths: Dict[str, List[str]] = {}
    used_stems: Dict[Tuple[str, str], str] = {}
    pending = None  # one-deep pipeline: overlap upload with compute+fetch
    batches = list(_iter_batches(entries, extractor, sr, num_workers, exact))
    for bi in range(len(batches) + 1):
        if bi < len(batches):
            batch_entries, wavs = batches[bi]
            if exact:
                feats = []
                for w in wavs:
                    mel, codes = extractor.extract_clip_features(w[None])
                    rec = {"mel": mel, "codes": codes}
                    if extract_condition:
                        rec["cond"] = extractor.conditioning_latent(mel)
                    feats.append(rec)
                cur = (batch_entries, wavs, feats)
            else:
                cur = (batch_entries, wavs,
                       extractor.dispatch_batch(wavs, extract_condition))
        else:
            cur = None
        if pending is None:
            pending = cur
            continue
        batch_entries, wavs, handle = pending
        feats = handle if exact else CodecExtractor.fetch_batch(handle)
        pending = cur
        for (audio_path, text), wav, feat in zip(batch_entries, wavs, feats):
            speaker = speaker_of(audio_path, list_path)
            stem = os.path.splitext(os.path.basename(audio_path))[0]
            # two clips of one speaker can share a basename (same filename
            # under different parents); disambiguate instead of silently
            # overwriting the first clip's arrays while the manifest keeps
            # both records (r3 review)
            key = (speaker, stem)
            if key in used_stems and used_stems[key] != audio_path:
                stem = f"{stem}-{hashlib.sha1(audio_path.encode()).hexdigest()[:8]}"
                key = (speaker, stem)
            used_stems[key] = audio_path
            spk_dir = os.path.join(output_dir, speaker)
            os.makedirs(os.path.join(spk_dir, "codes"), exist_ok=True)
            os.makedirs(os.path.join(spk_dir, "mels"), exist_ok=True)
            codes_rel = os.path.join("codes", f"{stem}.npy")
            mels_rel = os.path.join("mels", f"{stem}.npy")
            np.save(os.path.join(spk_dir, codes_rel), feat["codes"])
            np.save(os.path.join(spk_dir, mels_rel), feat["mel"])
            per_speaker.setdefault(speaker, []).append({
                "audio": audio_path, "text": text,
                "duration": round(wav.shape[-1] / sr, 3),
                "codes": codes_rel, "mels": mels_rel,
            })
            if extract_condition:
                latents.setdefault(speaker, []).append(feat["cond"])
                mel_paths.setdefault(speaker, []).append(
                    os.path.join(spk_dir, mels_rel))

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
            # the medoid clip's mel doubles as the vocoder-side speaker
            # reference (engine._mel_ref; VERDICT r1 #7)
            np.save(os.path.join(spk_dir, "medoid_mel.npy"),
                    np.load(mel_paths[speaker][med]))
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
    p.add_argument("--num_workers", type=int, default=8,
                   help="audio-decode prefetch threads")
    p.add_argument("--valid_ratio", type=float, default=0.1)
    p.add_argument("--exact", action="store_true",
                   help="per-clip (unbatched) extraction — bit-exact codes "
                        "at every clip tail, one compile per clip length")
    args = p.parse_args(argv)

    cfg = Config.load(args.config) if os.path.exists(args.config) else Config()
    out = args.output_dir or cfg.workflow.paths.processed_data_dir
    info = extract_audio_list(args.audio_list, out, cfg, args.model_dir,
                              valid_ratio=args.valid_ratio,
                              extract_condition=args.extract_condition,
                              batch_size=args.batch_size,
                              num_workers=args.num_workers,
                              exact=args.exact)
    for sp, st in info.items():
        print(f"{sp}: {st['num_clips']} clips ({st['total_duration']}s), "
              f"{st['num_train']} train / {st['num_valid']} valid")


if __name__ == "__main__":
    main()
