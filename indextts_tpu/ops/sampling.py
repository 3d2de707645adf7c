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


def _top_p_mask(sorted_logits: jnp.ndarray, top_p) -> jnp.ndarray:
    """Given descending-sorted logits [B, K], return bool keep-mask.
    `top_p` may be a scalar or a per-row vector [B]."""
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    top_p = jnp.asarray(top_p)
    if top_p.ndim == 1:
        top_p = top_p[:, None]
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


# --- top-k shortlist implementation switch ---------------------------------
# lax.top_k lowers to a sort-based reduction on TPU; jax.lax.approx_max_k
# (recall_target=1.0, aggregate_to_topk) is the TPU PartialReduce path that
# computes the same exact top-k with a two-phase reduction.  Identical up to
# TIE ORDER (ties broken by reduction shape, not lowest-index), so it is an
# opt-in switch.  Measured on v5e (S=64, V=8194, K=64, the 64-slot pool
# shape): top_k 1.965 ms/step vs approx_exact 2.062 — approx_max_k LOSES
# slightly at this shape, so the sort path stays the default; the switch is
# kept (with a parity test) for re-evaluation on other chips/shapes.
#
# TRACE-TIME flag: shortlist_top_k reads it when a decode program is traced,
# and the choice bakes into the compiled executable (it does not participate
# in the jit cache key).  Set it BEFORE the first decode/pool program
# compiles in the process; flipping it later silently has no effect on
# already-jitted paths — re-evaluations on another chip must set it at
# import time (or restart the process).
APPROX_TOPK = False


def shortlist_top_k(logits: jnp.ndarray, k: int):
    """Exact top-k [B, k] descending (values, indices) — implementation
    picked by APPROX_TOPK."""
    if APPROX_TOPK:
        return jax.lax.approx_max_k(logits, k, recall_target=1.0,
                                    aggregate_to_topk=True)
    return jax.lax.top_k(logits, k)


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
        shortlist, idx = shortlist_top_k(logits, k)  # [B, k] descending
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


# --- per-row sampling (continuous-batching pool) ---------------------------
#
# Every slot in the decode pool carries ITS OWN request's sampling params
# (reference API contract: temperature/top_p/top_k/repetition_penalty/
# do_sample/seed are per-request, api.py:177-299) and its own rng key, so
# the kernels below take parameter VECTORS [B] and a key array [B].  All
# params are traced — one compiled program serves every parameter mix.

SAMP_COLS = 5  # packed per-row param layout, used by the pool state


def pack_sampling(temperature, top_k, top_p, repetition_penalty,
                  do_sample) -> "np.ndarray":
    """Pack per-row sampling params into one float32 row [SAMP_COLS] (or a
    batch [B, SAMP_COLS]) — one array to scatter/copy through the pool's
    slot and staging rows instead of five.

    This is the CANONICAL layout `sample_step_rows` unpacks (columns:
    temperature, top_k, top_p, repetition_penalty, do_sample); every
    producer (ContinuousBatcher._pack_sampling) must go through it.  Packing
    is host-side numpy on purpose: it runs once per request, and an eager
    device op costs ~1 s over the tunnel backend."""
    import numpy as np

    return np.stack([
        np.asarray(temperature, np.float32),
        np.asarray(top_k, np.float32),
        np.asarray(top_p, np.float32),
        np.asarray(repetition_penalty, np.float32),
        np.asarray(do_sample, np.float32),
    ], axis=-1)


def mix_seed(base: int, n: int) -> int:
    """Deterministic 31-bit seed for stream `n` derived from `base`
    (splitmix-style finalizer).  Shared by the engine's per-sentence seeds
    and the pool's per-request default seeds so the two derivations can
    never drift apart."""
    m = 0xFFFFFFFF
    x = (int(base) + 0x9E3779B9 * (n + 1)) & m
    x ^= x >> 16
    x = (x * 0x7FEB352D) & m
    x ^= x >> 15
    return x & 0x7FFFFFFF


def row_keys(seeds: jnp.ndarray, counters: jnp.ndarray) -> jax.Array:
    """Per-row rng keys: fold_in(PRNGKey(seed_b), counter_b).  Token i of a
    request is always sampled from fold_in(PRNGKey(seed), i), so a request's
    output is a pure function of (seed, params, text) — independent of slot
    placement, tick partitioning, and concurrent pool traffic."""
    return jax.vmap(
        lambda s, c: jax.random.fold_in(jax.random.PRNGKey(s), c)
    )(seeds, counters)


def sample_step_rows(
    keys: jax.Array,
    logits: jnp.ndarray,
    presence: jnp.ndarray,
    finished: jnp.ndarray,
    samp: jnp.ndarray,
    *,
    stop_token: int,
    shortlist_k: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row `sample_step`: penalty → warp → sample, every parameter a
    per-row vector (`samp` [B, SAMP_COLS], see `pack_sampling`), per-row rng
    `keys` [B].  `shortlist_k` bounds the per-row top_k (static — the pool
    rejects requests outside [1, shortlist_k] at admission).  Greedy rows
    (do_sample=0) take the penalised argmax, exactly `sample_step`'s
    do_sample=False path."""
    temperature, top_k, top_p, rep_pen, do_sample = (
        samp[:, 0], samp[:, 1].astype(jnp.int32), samp[:, 2], samp[:, 3],
        samp[:, 4] > 0.5)
    logits = apply_repetition_penalty(logits.astype(jnp.float32), presence,
                                      rep_pen[:, None])
    B, V = logits.shape
    k = min(shortlist_k, V)
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    shortlist, idx = shortlist_top_k(scaled, k)  # [B, k] descending
    # greedy == the shortlist's top-1: positive temperature scaling is
    # order-preserving and lax.top_k breaks ties by lowest index exactly
    # like argmax, so the separate O(B·V) argmax pass is redundant (under
    # APPROX_TOPK the tie order may differ — already a documented deviation)
    greedy = idx[:, 0].astype(jnp.int32)
    keep = jnp.arange(k)[None, :] < jnp.clip(top_k, 1, k)[:, None]
    shortlist = jnp.where(keep, shortlist, NEG_INF)
    shortlist = jnp.where(_top_p_mask(shortlist, top_p), shortlist, NEG_INF)
    # categorical == Gumbel-argmax; vmap gives each row its own key
    gumbel = jax.vmap(lambda kk: jax.random.gumbel(kk, (k,)))(keys)
    choice = jnp.argmax(shortlist + gumbel, axis=-1)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    token = jnp.where(do_sample, sampled.astype(jnp.int32), greedy)
    token = jnp.where(finished, stop_token, token)
    presence = presence.at[jnp.arange(B), token].set(True)
    finished = jnp.logical_or(finished, token == stop_token)
    return token, presence, finished
