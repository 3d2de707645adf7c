"""Evaluation metrics for fine-tune quality (BASELINE config 3: WER /
speaker-sim over the validation clips).

Speaker similarity uses the framework's own ECAPA-TDNN speaker encoder
(the embedding BigVGAN conditions on) — cosine similarity between the
reference prompt's embedding and the synthesized audio's embedding.

WER/CER are plain text metrics; pair them with any ASR front-end to
transcribe synthesized audio (no ASR model ships in this image).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np

import jax.numpy as jnp


def speaker_embedding(bigvgan_params: Dict[str, Any], wav: np.ndarray,
                      sample_rate: int = 24000, n_mels: int = 100) -> np.ndarray:
    """wav [T] float32 (or [C, T] — mixed to mono) → ECAPA embedding [D]."""
    from indextts_tpu.models import ecapa
    from indextts_tpu.ops.mel import mel_spectrogram

    wav = np.asarray(wav, np.float32)
    if wav.ndim == 2:  # (C, T) from audio.read_wav / (1, T) prompts
        wav = wav.mean(axis=0)

    spk_params = bigvgan_params.get("speaker_encoder", bigvgan_params)
    # derive sizes from the params themselves
    n_mels = spk_params["blocks"][0]["conv"]["w"].shape[1]
    ch0 = spk_params["blocks"][0]["conv"]["w"].shape[0]
    ch_last = spk_params["mfa"]["conv"]["w"].shape[0]
    attn = spk_params["asp"]["tdnn"]["conv"]["w"].shape[0]
    se = spk_params["blocks"][1]["se"]["conv1"]["w"].shape[0]
    lin = spk_params["fc"]["w"].shape[0]
    mel = mel_spectrogram(jnp.asarray(wav[None]), sample_rate=sample_rate,
                          n_mels=n_mels)  # [1, n_mels, T']
    size = ecapa.ECAPASize(input_size=n_mels, lin_neurons=lin,
                            channels=(ch0, ch0, ch0, ch0, ch_last),
                            attention_channels=attn, se_channels=se)
    emb = ecapa.forward(spk_params, jnp.swapaxes(mel, 1, 2), size)
    return np.asarray(emb[0, 0])


def speaker_similarity(bigvgan_params: Dict[str, Any], wav_a: np.ndarray,
                       wav_b: np.ndarray, sample_rate: int = 24000) -> float:
    """Cosine similarity of speaker embeddings of two waveforms."""
    ea = speaker_embedding(bigvgan_params, wav_a, sample_rate)
    eb = speaker_embedding(bigvgan_params, wav_b, sample_rate)
    denom = np.linalg.norm(ea) * np.linalg.norm(eb)
    return float(np.dot(ea, eb) / max(denom, 1e-12))


def _edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance (dynamic programming, O(len·len))."""
    m, n = len(ref), len(hyp)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[n]


def wer(reference: str, hypothesis: str) -> float:
    """Word error rate over whitespace tokens."""
    ref = reference.split()
    hyp = hypothesis.split()
    if not ref:
        return 0.0 if not hyp else 1.0
    return _edit_distance(ref, hyp) / len(ref)


def cer(reference: str, hypothesis: str) -> float:
    """Character error rate (the CJK-appropriate metric)."""
    ref = [c for c in reference if not c.isspace()]
    hyp = [c for c in hypothesis if not c.isspace()]
    if not ref:
        return 0.0 if not hyp else 1.0
    return _edit_distance(ref, hyp) / len(ref)
