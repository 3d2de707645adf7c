"""On-device sampling ops for the autoregressive decode loop.

Replaces HF `generate`'s logits processors/warpers
(reference: indextts/gpt/model.py:703-715, infer.py:628-635) with
static-shape XLA ops.  Semantics match HF exactly:

  * RepetitionPenaltyLogitsProcessor: for every token already present in the
    sequence (including the prompt ids HF sees — see note in
    `init_penalty_presence`), score = score/p if score > 0 else score*p;
  * warper order: temperature → top-k → top-p (HF `_get_logits_warper`);
  * top-p keeps the smallest set of tokens whose cumulative probability
    exceeds `top_p`, always retaining the most probable token.

All ops are batched [B, V] and jit/vmap-safe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def init_penalty_presence(vocab_size: int, batch: int,
                          prompt_token_ids=(1,),
                          start_token: Optional[int] = None) -> jnp.ndarray:
    """Presence table [B, V] for repetition penalty.

    HF applies the penalty over `input_ids`, and the reference's decode
    prompt is `fake_inputs` — all-ones with a trailing start_mel_token
    (gpt/model.py:658-667) — so token id 1 and the start token are penalised
    from step 0.  Reproduced for parity.
    """
    presence = jnp.zeros((batch, vocab_size), dtype=bool)
    for t in prompt_token_ids:
        presence = presence.at[:, t].set(True)
    if start_token is not None:
        presence = presence.at[:, start_token].set(True)
    return presence


def apply_repetition_penalty(logits: jnp.ndarray, presence: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """logits [B, V], presence [B, V] bool.  `penalty` may be traced —
    sampling params are NOT static in the decode programs, so a WebUI
    slider change reuses the compiled program (penalty 1.0 reduces to the
    identity exactly)."""
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(presence, penalized, logits)


def _top_p_mask(sorted_logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Given descending-sorted logits [B, K], return bool keep-mask."""
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # HF: remove tokens with cumulative probability above top_p, shifted so
    # the first token above the threshold is kept.
    remove = cum - probs > top_p
    return ~remove


def apply_typical_filter(logits: jnp.ndarray, mass: float = 0.9,
                         min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """Typical sampling filter (reference utils/typical_sampling.py:4-30, HF
    TypicalLogitsWarper): keep the locally-typical set — tokens whose
    -log p is closest to the distribution entropy — covering `mass`."""
    norm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    p = jnp.exp(norm)
    ent = -jnp.sum(jnp.where(p > 0, norm * p, 0.0), axis=-1, keepdims=True)
    shifted = jnp.abs(-norm - ent)
    order = jnp.argsort(shifted, axis=-1)  # ascending: most typical first
    sorted_p = jnp.take_along_axis(p, order, axis=-1)
    cum = jnp.cumsum(sorted_p, axis=-1)
    last_ind = jnp.sum((cum < mass).astype(jnp.int32), axis=-1, keepdims=True)
    last_ind = jnp.maximum(last_ind, min_tokens_to_keep - 1)
    threshold = jnp.take_along_axis(
        jnp.take_along_axis(shifted, order, axis=-1), last_ind, axis=-1)
    remove = shifted > threshold
    return jnp.where(remove, NEG_INF, logits)


def sample_token(
    rng: jax.Array,
    logits: jnp.ndarray,
    *,
    temperature: float = 1.0,
    top_k: int = 30,
    top_p: float = 0.8,
    do_sample: bool = True,
) -> jnp.ndarray:
    """Sample next token ids [B] from logits [B, V].

    Uses a lax.top_k shortlist (top_k ≤ 64 covers the default config) so the
    per-step work is O(V) for the top-k scan plus O(K log K) — no full-vocab
    sort on the hot path.
    """
    logits = logits.astype(jnp.float32)
    if not do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    # temperature/top_p may be traced scalars (value changes don't
    # recompile); dividing by 1.0 and masking at top_p=1.0 are exact no-ops
    logits = logits / temperature
    V = logits.shape[-1]
    # top_k <= 0 disables the k-filter (HF semantics): nucleus filtering then
    # needs the full distribution, so fall back to a full sort rather than
    # silently truncating the nucleus to a shortlist.
    k = top_k if 0 < top_k < V else V
    if k < V:
        shortlist, idx = jax.lax.top_k(logits, k)  # [B, k] descending
    else:
        idx = jnp.argsort(-logits, axis=-1)  # the sort order IS the ids
        shortlist = jnp.take_along_axis(logits, idx, axis=-1)
    keep = _top_p_mask(shortlist, top_p)
    shortlist = jnp.where(keep, shortlist, NEG_INF)
    choice = jax.random.categorical(rng, shortlist, axis=-1)  # [B]
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


def sample_step(
    rng: jax.Array,
    logits: jnp.ndarray,
    presence: jnp.ndarray,
    finished: jnp.ndarray,
    *,
    stop_token: int,
    temperature: float = 1.0,
    top_k: int = 30,
    top_p: float = 0.8,
    repetition_penalty: float = 10.0,
    do_sample: bool = True,
    typical_sampling: bool = False,
    typical_mass: float = 0.9,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One full sampling step: penalty → (typical) → warp → sample → stop.

    Returns (token [B], presence', finished').  Finished sequences emit
    `stop_token` (HF pads with pad_token_id = stop_mel_token).  The typical
    filter runs as a logits *processor* before the warpers, matching the
    reference's LogitsProcessorList placement (gpt/model.py:703-708).
    """
    logits = apply_repetition_penalty(logits.astype(jnp.float32), presence,
                                      repetition_penalty)
    if typical_sampling:
        logits = apply_typical_filter(logits, typical_mass)
    token = sample_token(
        rng, logits, temperature=temperature, top_k=top_k, top_p=top_p,
        do_sample=do_sample,
    )
    token = jnp.where(finished, stop_token, token)
    presence = presence.at[jnp.arange(token.shape[0]), token].set(True)
    finished = jnp.logical_or(finished, token == stop_token)
    return token, presence, finished
