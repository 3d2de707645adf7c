"""Continuous-batching decode scheduler.

The serving runtime behind "batched serving with continuous KV-cache
decode" (BASELINE config 5).  The reference's only batching is per-request
length bucketing inside one call (infer.py:595-777); here the decode loop
itself runs over a fixed pool of S slots: every slot holds an independent
request at its own sequence offset, one fused step advances all of them,
and finished slots are refilled from the queue without stopping the pool —
the chip's weight bandwidth is amortised over whatever traffic exists.

Static shapes throughout: cache [L, S, H, cache_len, hd], per-slot
positions/masks; prefills are bucketed by text width.  Slot bookkeeping
(admission, emission) is host-side numpy; each decode step is one jitted
program built on gpt2.decode_step_rows (per-row cache positions).

Host↔device discipline (the round-1 weakness was host work serialising
the pool on the link's dispatch latency):
  * per tick the host issues exactly ONE jitted call (`_step_kernel`) and
    ONE packed fetch — and the fetch is a tick LATE, so the device never
    waits on the host;
  * everything else lives on device: generated tokens accumulate in a
    codes buffer [S, max_new] fetched once per finished request; `active`
    self-deactivates on device (stop token or per-slot token budget); each
    slot samples with its request's OWN params and rng (samp/seed rows —
    the reference API's per-request temperature/top_p/top_k/penalty/seed
    contract, api.py:177-299; token i folds the request seed with i, so
    outputs are reproducible under any traffic);
  * admissions are batched — all free slots prefill + first-sample in ONE
    jitted call at a common bucketed width.

Staged refill (zero-dead-step continuous batching): with `staging_rows`
K > 0 the pool additionally carries K staging rows — prefilled, first-
sampled requests parked NEXT TO the live slots.  The step kernel itself
swaps the oldest staged request into a slot on the very step the slot
deactivates, evacuating the finished request's codes to an outbox row in
that tick's report.  Without staging, a finished slot sits dead for the
rest of its tick plus a full report-lag tick (~1.5 ticks ≈ 24 steps at
steps_per_tick=16) before the host can refill it; with staging the dead
time is zero steps.  Refills use drop-mode scatters (index = S when no
refill fires), never `lax.cond`, so the untaken path costs only the
staged row's ~10 MB gather (~1-2% of a step) and no conditional buffer
copies.  The host reconciles entirely through per-request sequence
numbers carried in the report (slot occupancy) and the outbox
(evacuations), so admission↔refill races are impossible by construction:
direct slot admission happens only while the staged FIFO is empty, which
proves no in-flight refill can touch a slot the host believes free.
"""

from __future__ import annotations

import dataclasses
import functools
import threading
from typing import (Any, Callable, Dict, List, NamedTuple, Optional,
                    Sequence, Tuple)

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import GPTConfig
from indextts_tpu.models import gpt2
from indextts_tpu.models import unified_voice as uv
from indextts_tpu.models.gpt2 import KVCache
from indextts_tpu.ops import quantization, sampling

# report/outbox row tags: seq >= 0 is a live request id; _EMPTY_SEQ marks a
# never-occupied slot; _PAD_SEQ marks an unused outbox row
_EMPTY_SEQ = -1
_PAD_SEQ = -2

# measured default for the fused Pallas pool-trunk step (see
# ContinuousBatcher `fused_trunk`): the whole-trunk kernel LOSES 2.9× to
# the head-split XLA step at the 64-slot flagship shape (54.3 vs 18.9
# ms/step, tools/bench_pool_trunk.py r5) — the XLA step is already within
# ~25% of the cache's true 9.05 ms DMA floor; full writeup in
# ops/pallas/pool_trunk.py
FUSED_TRUNK_DEFAULT = False


class PoolState(NamedTuple):
    cache: KVCache              # [L, S, H, cache_len, hd]
    prev_tok: jnp.ndarray       # [S] last sampled token per slot
    n_gen: jnp.ndarray          # [S] tokens generated so far (incl. prev)
    base: jnp.ndarray           # [S] prefill length (first decode write slot)
    full_mask: jnp.ndarray      # [S, cache_len]
    presence: jnp.ndarray       # [S, V] repetition-penalty table
    codes: jnp.ndarray          # [S, max_new] generated tokens (device-side)
    active: jnp.ndarray         # [S] bool, self-deactivating
    budget: jnp.ndarray         # [S] per-slot max_new
    slot_seq: jnp.ndarray       # [S] request seq occupying each slot (-1 none)
    samp: jnp.ndarray           # [S, SAMP_COLS] per-request sampling params
    seed: jnp.ndarray           # [S] per-request rng seed
    # --- staging rows (K may be 0: staged refill disabled) ----------------
    stage_cache: KVCache        # [L, K, H, stage_len, hd] prefilled prefixes
    stage_ready: jnp.ndarray    # [K] bool, consumable by the step kernel
    stage_seq: jnp.ndarray      # [K] request seq (kernel consumes min first)
    stage_prev_tok: jnp.ndarray  # [K] first sampled token
    stage_base: jnp.ndarray     # [K] prefill length
    stage_mask: jnp.ndarray     # [K, stage_len]
    stage_presence: jnp.ndarray  # [K, V]
    stage_budget: jnp.ndarray   # [K]
    stage_active: jnp.ndarray   # [K] bool (first token not stop, budget > 1)
    stage_samp: jnp.ndarray     # [K, SAMP_COLS]
    stage_seed: jnp.ndarray     # [K]


# --- jitted kernels (module level: params passed explicitly so weights are
# traced arguments, not compile-time constants) -----------------------------


def _prefill_first_sample(params, cfg: GPTConfig, cond, text_tokens,
                          text_mask, samp, seeds, cache_dtype, shortlist_k,
                          flat: bool = False):
    """Shared prefill + first-token sample for admissions and staging:
    [cond | text | start_mel] prefix → (burst KV cache, prefix mask, first
    token, presence table).  P (the prefill length) is static.  `samp`
    [B, SAMP_COLS] / `seeds` [B] carry each request's OWN sampling params
    and rng seed (reference API contract, api.py:177-299); token i of a
    request samples from fold_in(PRNGKey(seed), i), so outputs are pure in
    (seed, params, text) regardless of pool traffic."""
    size = uv.trunk_size(cfg)
    B = text_tokens.shape[0]
    if cond.shape[0] == 1 and B > 1:
        cond = jnp.broadcast_to(cond, (B,) + cond.shape[1:])
    tpos = jnp.clip(jnp.cumsum(text_mask, axis=1) - 1, 0, cfg.max_text_seq_len - 1)
    text_emb = (params["text_embedding"]["weight"][text_tokens]
                + params["text_pos_embedding"]["weight"][tpos])
    text_emb = text_emb * text_mask[..., None]
    start_emb = (params["mel_embedding"]["weight"][cfg.start_mel_token]
                 + params["mel_pos_embedding"]["weight"][0])
    emb = jnp.concatenate(
        [cond.astype(text_emb.dtype), text_emb,
         jnp.broadcast_to(start_emb, (B, 1, cfg.model_dim))], axis=1)
    pmask = jnp.concatenate(
        [jnp.ones((B, cfg.condition_num_latent), jnp.int32),
         text_mask.astype(jnp.int32), jnp.ones((B, 1), jnp.int32)], axis=1)
    hidden, cache = gpt2.prefill(params["gpt"], emb.astype(cache_dtype),
                                 pmask, size, emb.shape[1])
    if flat:  # [L, B, H, P, hd] → [L, B, P, D] (the fused pool-trunk layout)
        cache = KVCache(*gpt2.flatten_rows_cache(cache))
    logits = uv._lm_head(params, hidden[:, -1])
    presence0 = sampling.init_penalty_presence(
        cfg.number_mel_codes, B, prompt_token_ids=(1,),
        start_token=cfg.start_mel_token)
    keys = sampling.row_keys(seeds, jnp.zeros((B,), jnp.int32))
    tok, presence, _ = sampling.sample_step_rows(
        keys, logits, presence0, jnp.zeros((B,), bool), samp,
        stop_token=cfg.stop_mel_token, shortlist_k=shortlist_k)
    return cache, pmask, tok, presence


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "cache_dtype", "shortlist_k"),
    donate_argnames=("state",))
def _admit_insert_kernel(params, cfg: GPTConfig, state: PoolState, cond,
                         text_tokens, text_mask, slots, budgets, seqs, samp,
                         seeds, cache_dtype, shortlist_k) -> PoolState:
    """Batched prefill of B requests + first-token sampling + scatter-insert
    into the pool — ONE dispatch per admission burst (the former
    _admit_kernel + per-slot _insert_kernel split cost 1+B dispatches at
    ~5 ms each on the tunnel, stalling every live slot).

    `slots` [B] are destination rows; padded rows carry slot == S and are
    dropped by the scatter (mode="drop").  A first-token stop deactivates
    the slot ON DEVICE (active=False), so admission needs no host fetch at
    all — the empty result surfaces through the normal lagged report.
    Sampling params/seed are per-request arrays — traced, not static, so
    every parameter mix shares ONE compiled program."""
    flat = state.cache.k.ndim == 4  # [L,S,T,D] fused-trunk layout
    cache, pmask, tok, presence = _prefill_first_sample(
        params, cfg, cond, text_tokens, text_mask, samp, seeds,
        cache_dtype, shortlist_k, flat=flat)
    P = pmask.shape[1]
    cache_len = state.full_mask.shape[1]
    drop = dict(mode="drop")
    if flat:
        new_cache = KVCache(
            state.cache.k.at[:, slots, :P, :].set(
                cache.k.astype(state.cache.k.dtype), **drop),
            state.cache.v.at[:, slots, :P, :].set(
                cache.v.astype(state.cache.v.dtype), **drop),
        )
    else:
        new_cache = KVCache(
            state.cache.k.at[:, slots, :, :P, :].set(
                cache.k.astype(state.cache.k.dtype), **drop),
            state.cache.v.at[:, slots, :, :P, :].set(
                cache.v.astype(state.cache.v.dtype), **drop),
        )
    row_mask = jnp.pad(pmask, ((0, 0), (0, cache_len - P)))
    codes_rows = jnp.zeros((pmask.shape[0], state.codes.shape[1]),
                           jnp.int32).at[:, 0].set(tok)
    return state._replace(
        cache=new_cache,
        prev_tok=state.prev_tok.at[slots].set(tok, **drop),
        n_gen=state.n_gen.at[slots].set(1, **drop),
        base=state.base.at[slots].set(P, **drop),
        full_mask=state.full_mask.at[slots].set(row_mask, **drop),
        presence=state.presence.at[slots].set(presence, **drop),
        codes=state.codes.at[slots].set(codes_rows, **drop),
        # a first-token stop OR a <=1 budget deactivates on device (the
        # sampled token is still recorded; _finish truncates to max_new)
        active=state.active.at[slots].set(
            jnp.logical_and(tok != cfg.stop_mel_token, budgets > 1), **drop),
        budget=state.budget.at[slots].set(budgets, **drop),
        slot_seq=state.slot_seq.at[slots].set(seqs, **drop),
        samp=state.samp.at[slots].set(samp, **drop),
        seed=state.seed.at[slots].set(seeds, **drop),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "cache_dtype", "shortlist_k"),
    donate_argnames=("state",))
def _stage_kernel(params, cfg: GPTConfig, state: PoolState, cond,
                  text_tokens, text_mask, rows, budgets, seqs, samp, seeds,
                  cache_dtype, shortlist_k) -> PoolState:
    """Prefill + first-sample a burst into STAGING rows (`rows` [B]; padded
    rows carry K and are dropped).  The step kernel swaps staged requests
    into slots as they free — the host never touches live slots while
    staging is in flight."""
    flat = state.cache.k.ndim == 4
    cache, pmask, tok, presence = _prefill_first_sample(
        params, cfg, cond, text_tokens, text_mask, samp, seeds,
        cache_dtype, shortlist_k, flat=flat)
    P = pmask.shape[1]
    stage_len = state.stage_mask.shape[1]
    drop = dict(mode="drop")
    if flat:
        new_stage_cache = KVCache(
            state.stage_cache.k.at[:, rows, :P, :].set(
                cache.k.astype(state.stage_cache.k.dtype), **drop),
            state.stage_cache.v.at[:, rows, :P, :].set(
                cache.v.astype(state.stage_cache.v.dtype), **drop),
        )
    else:
        new_stage_cache = KVCache(
            state.stage_cache.k.at[:, rows, :, :P, :].set(
                cache.k.astype(state.stage_cache.k.dtype), **drop),
            state.stage_cache.v.at[:, rows, :, :P, :].set(
                cache.v.astype(state.stage_cache.v.dtype), **drop),
        )
    row_mask = jnp.pad(pmask, ((0, 0), (0, stage_len - P)))
    return state._replace(
        stage_cache=new_stage_cache,
        stage_ready=state.stage_ready.at[rows].set(True, **drop),
        stage_seq=state.stage_seq.at[rows].set(seqs, **drop),
        stage_prev_tok=state.stage_prev_tok.at[rows].set(tok, **drop),
        stage_base=state.stage_base.at[rows].set(P, **drop),
        stage_mask=state.stage_mask.at[rows].set(row_mask, **drop),
        stage_presence=state.stage_presence.at[rows].set(presence, **drop),
        stage_budget=state.stage_budget.at[rows].set(budgets, **drop),
        stage_active=state.stage_active.at[rows].set(
            jnp.logical_and(tok != cfg.stop_mel_token, budgets > 1), **drop),
        stage_samp=state.stage_samp.at[rows].set(samp, **drop),
        stage_seed=state.stage_seed.at[rows].set(seeds, **drop),
    )


def _step_core(params, cfg: GPTConfig, state: PoolState, cache_dtype,
               shortlist_k, fused: bool = False) -> PoolState:
    """Advance every active slot one token (self-deactivating).  Each slot
    samples with ITS OWN request's params (state.samp) and rng key — token n
    of a request always comes from fold_in(PRNGKey(seed), n), so per-request
    outputs are reproducible regardless of traffic or tick partitioning.

    With a FLAT cache ([L, S, T, D]) the trunk runs either the fused
    Pallas pool-step kernel (`fused=True`, ops/pallas/pool_trunk.py — one
    pallas_call for all layers) or its XLA parity oracle
    (gpt2.decode_step_rows_flat)."""
    size = uv.trunk_size(cfg)
    S = state.prev_tok.shape[0]
    cache_len = state.full_mask.shape[1]
    max_new = state.codes.shape[1]
    active = state.active
    # reference position numbering: generated token n → mel position n+1
    mel_pos = jnp.clip(state.n_gen + 1, 0, cfg.max_mel_seq_len - 1)
    emb = (params["mel_embedding"]["weight"][state.prev_tok]
           + params["mel_pos_embedding"]["weight"][mel_pos])[:, None, :]
    write_pos = jnp.clip(state.base + state.n_gen - 1, 0, cache_len - 1)
    rows = jnp.arange(S)
    full_mask = state.full_mask.at[rows, write_pos].set(
        jnp.maximum(active.astype(jnp.int32), state.full_mask[rows, write_pos]))
    if state.cache.k.ndim == 4:  # flat [L, S, T, D]
        if fused:
            from indextts_tpu.ops.pallas import pool_trunk

            x, k_rows, v_rows = pool_trunk.fused_pool_step(
                params["gpt"], emb[:, 0].astype(cache_dtype),
                state.cache.k, state.cache.v, write_pos, full_mask,
                size.heads, interpret=jax.default_backend() != "tpu")
            cache = KVCache(
                state.cache.k.at[:, rows, write_pos, :].set(k_rows),
                state.cache.v.at[:, rows, write_pos, :].set(v_rows))
            hidden = gpt2.layer_norm(x[:, None, :],
                                     params["gpt"]["ln_f"]["scale"],
                                     params["gpt"]["ln_f"]["bias"])
        else:
            hidden, k_new, v_new = gpt2.decode_step_rows_flat(
                params["gpt"], emb.astype(cache_dtype), state.cache.k,
                state.cache.v, write_pos, full_mask, size)
            cache = KVCache(k_new, v_new)
    else:
        hidden, cache = gpt2.decode_step_rows(
            params["gpt"], emb.astype(cache_dtype), state.cache,
            write_pos, full_mask, size)
    logits = uv._lm_head(params, hidden[:, 0])
    keys = sampling.row_keys(state.seed, state.n_gen)
    tok, presence, _ = sampling.sample_step_rows(
        keys, logits, state.presence, ~active, state.samp,
        stop_token=cfg.stop_mel_token, shortlist_k=shortlist_k)
    slot_idx = jnp.clip(state.n_gen, 0, max_new - 1)
    codes = state.codes.at[rows, slot_idx].set(
        jnp.where(active, tok, state.codes[rows, slot_idx]))
    n_gen = state.n_gen + active.astype(jnp.int32)
    # self-deactivate: stop token sampled, or per-slot budget exhausted
    done = jnp.logical_and(active,
                           jnp.logical_or(tok == cfg.stop_mel_token,
                                          n_gen >= state.budget))
    return state._replace(
        cache=cache, prev_tok=tok, n_gen=n_gen, full_mask=full_mask,
        presence=presence, codes=codes,
        active=jnp.logical_and(active, ~done),
    )


def _refill_one(state: PoolState, outbox: jnp.ndarray,
                out_n: jnp.ndarray) -> Tuple[PoolState, jnp.ndarray, jnp.ndarray]:
    """Swap the oldest READY staged request into the first free slot (at
    most one per step — slots finish far less than once per step, and any
    backlog clears on the following steps).  The evicted occupant's
    (seq, n_gen, codes) goes to the outbox so the host can finish it even
    though its slot row is overwritten.

    No lax.cond: every update is a drop-mode scatter whose index goes out
    of bounds when no refill fires, so the untaken path writes nothing and
    costs only the staged row's gather (~1-2% of a decode step)."""
    S = state.prev_tok.shape[0]
    K = state.stage_ready.shape[0]
    free = ~state.active
    ready = state.stage_ready
    do = jnp.logical_and(jnp.any(free), jnp.any(ready))
    big = jnp.iinfo(jnp.int32).max
    slot = jnp.argmax(free)                     # first free slot
    srow = jnp.argmin(jnp.where(ready, state.stage_seq, big))  # FIFO order
    slot_w = jnp.where(do, slot, S)             # S → scatter drops
    srow_r = jnp.where(do, srow, 0)             # any valid row for gathers
    drop = dict(mode="drop")

    # evacuate the slot's current occupant (finished request, or _EMPTY_SEQ
    # for a never-used slot — the host skips those)
    out_row = jnp.concatenate([
        jnp.stack([jnp.int32(0), state.n_gen[slot_w % S],
                   jnp.where(do, state.slot_seq[slot_w % S], _PAD_SEQ)]),
        state.codes[slot_w % S]])
    out_idx = jnp.where(do, out_n, outbox.shape[0])
    outbox = outbox.at[out_idx].set(out_row, **drop)
    out_n = out_n + do.astype(jnp.int32)

    stage_len = state.stage_mask.shape[1]
    if state.cache.k.ndim == 4:  # flat fused-trunk layout
        cache = KVCache(
            state.cache.k.at[:, slot_w, :stage_len, :].set(
                state.stage_cache.k[:, srow_r], **drop),
            state.cache.v.at[:, slot_w, :stage_len, :].set(
                state.stage_cache.v[:, srow_r], **drop),
        )
    else:
        cache = KVCache(
            state.cache.k.at[:, slot_w, :, :stage_len, :].set(
                state.stage_cache.k[:, srow_r], **drop),
            state.cache.v.at[:, slot_w, :, :stage_len, :].set(
                state.stage_cache.v[:, srow_r], **drop),
        )
    fm = jnp.zeros((state.full_mask.shape[1],),
                   jnp.int32).at[:stage_len].set(state.stage_mask[srow_r])
    first = state.stage_prev_tok[srow_r]
    srow_w = jnp.where(do, srow, K)
    return state._replace(
        cache=cache,
        prev_tok=state.prev_tok.at[slot_w].set(first, **drop),
        n_gen=state.n_gen.at[slot_w].set(1, **drop),
        base=state.base.at[slot_w].set(state.stage_base[srow_r], **drop),
        full_mask=state.full_mask.at[slot_w].set(fm, **drop),
        presence=state.presence.at[slot_w].set(
            state.stage_presence[srow_r], **drop),
        codes=state.codes.at[slot_w].set(
            jnp.zeros((state.codes.shape[1],), jnp.int32).at[0].set(first),
            **drop),
        active=state.active.at[slot_w].set(state.stage_active[srow_r], **drop),
        budget=state.budget.at[slot_w].set(state.stage_budget[srow_r], **drop),
        slot_seq=state.slot_seq.at[slot_w].set(state.stage_seq[srow_r], **drop),
        samp=state.samp.at[slot_w].set(state.stage_samp[srow_r], **drop),
        seed=state.seed.at[slot_w].set(state.stage_seed[srow_r], **drop),
        stage_ready=state.stage_ready.at[srow_w].set(False, **drop),
    ), outbox, out_n


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "cache_dtype", "shortlist_k", "steps", "fused"),
    donate_argnames=("state",))
def _step_kernel(params, cfg: GPTConfig, state: PoolState, cache_dtype,
                 shortlist_k, steps: int = 1,
                 fused: bool = False) -> Tuple[PoolState, jnp.ndarray]:
    """`steps` decode steps in ONE dispatch (lax.scan), each followed by an
    in-kernel staged refill, then ONE packed int32 report:

        rows [0, S)        : (active, n_gen, slot_seq, codes-row) per slot
        rows [S, S+steps)  : outbox — (0, n_gen, seq, codes-row) per refill
                             evacuation this tick, padding rows seq=_PAD_SEQ

    Multi-step ticks amortise the per-call dispatch + fetch latency of
    high-latency links (the axon tunnel costs ~5 ms/dispatch and
    ~30 ms/fetch); the single packed array keeps the tick at one fetch."""
    # shared-scale int4 weights nativize once per tick, outside the scan
    # (ops/quantization.nativize_int4) — each step then reads native int4
    params = quantization.nativize_int4(params)
    K = state.stage_ready.shape[0]
    max_new = state.codes.shape[1]
    n_out = steps if K else 0
    outbox0 = jnp.full((n_out, 3 + max_new), _PAD_SEQ, jnp.int32)

    def body(carry, _):
        st, ob, on = carry
        st = _step_core(params, cfg, st, cache_dtype, shortlist_k,
                        fused=fused)
        if K:
            st, ob, on = _refill_one(st, ob, on)
        return (st, ob, on), None

    (state, outbox, _), _ = jax.lax.scan(
        body, (state, outbox0, jnp.int32(0)), None, length=steps)
    report = jnp.concatenate(
        [state.active.astype(jnp.int32)[:, None], state.n_gen[:, None],
         state.slot_seq[:, None], state.codes], axis=1)
    return state, jnp.concatenate([report, outbox], axis=0)


@functools.partial(jax.jit, donate_argnames=("state",))
def _cancel_kernel(state: PoolState, seqs: jnp.ndarray) -> PoolState:
    """Deactivate every slot / staging row occupied by one of `seqs` (a
    fixed-width int32 vector; pad with _PAD_SEQ, which matches nothing).
    A cancelled slot stops consuming decode steps immediately and surfaces
    as inactive in the next report, freeing it for refill; a cancelled
    staged request keeps its FIFO position (stage_ready untouched — the
    kernel's seq-ordered consumption and the host's FIFO-head recycling
    must stay aligned) but swaps in inactive, so it occupies a slot for at
    most the remainder of one tick."""
    hit_slot = (state.slot_seq[:, None] == seqs[None, :]).any(axis=1)
    hit_stage = (state.stage_seq[:, None] == seqs[None, :]).any(axis=1)
    return state._replace(
        active=jnp.logical_and(state.active, ~hit_slot),
        stage_active=jnp.logical_and(state.stage_active, ~hit_stage),
    )


@dataclasses.dataclass
class _Request:
    req_id: int
    text_ids: np.ndarray
    max_new: int
    done_cb: Optional[Callable[[int, np.ndarray], None]] = None
    cond: Optional[np.ndarray] = None   # per-request [1, 32, D] conditioning
    samp: Optional[np.ndarray] = None   # packed [SAMP_COLS] sampling params
    seed: int = 0                       # per-request rng seed


class ContinuousBatcher:
    """Fixed-slot continuous decode pool over one UnifiedVoice model."""

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: GPTConfig,
        cond_latent: jnp.ndarray,       # [1, 32, D] shared conditioning
        num_slots: int = 8,
        max_text_width: int = 128,
        max_new: int = 600,
        temperature: float = 1.0,
        top_k: int = 30,
        top_p: float = 0.8,
        repetition_penalty: float = 10.0,
        do_sample: bool = True,
        max_top_k: int = 64,
        cache_dtype=jnp.bfloat16,
        kv_dtype=None,            # e.g. jnp.float8_e4m3fn: half-traffic KV
        seed: int = 0,
        steps_per_tick: int = 1,
        adaptive_ticks: bool = False,
        staging_rows: Optional[int] = None,
        fused_trunk: Optional[bool] = None,
        device=None,
    ):
        # `device` pins this pool to one chip (weights, state, and every
        # kernel dispatch): committed operands make every jitted call place
        # on that chip, so N pools on N chips run concurrently from one
        # host thread (see PoolGroup).  None = the process default device.
        self.device = device
        if device is not None:
            params = jax.device_put(params, device)
            cond_latent = jax.device_put(cond_latent, device)
        self.params = params
        self.cfg = cfg
        self.cond = cond_latent
        self.S = num_slots
        self.max_new = max_new
        self.max_text_width = max_text_width
        self.cache_len = cfg.condition_num_latent + max_text_width + 2 + 1 + max_new
        self.size = uv.trunk_size(cfg)
        # fused Pallas pool-trunk (ops/pallas/pool_trunk.py): one
        # pallas_call per decode step over the FLAT [L, S, T, D] cache.
        # None = measured default per backend (tools/bench_pool_trunk.py);
        # supported weight tiers are plain/int8 (int4-shared stays on the
        # head-split XLA step)
        if fused_trunk is None:
            from indextts_tpu.ops.pallas import pool_trunk

            fused_trunk = (FUSED_TRUNK_DEFAULT
                           and jax.default_backend() == "tpu"
                           and pool_trunk.supported(
                               num_slots, -(-self.cache_len // 8) * 8,
                               cfg.model_dim, cfg.heads, params["gpt"]))
        self.fused = bool(fused_trunk)
        if self.fused:  # the kernel chunks the cache in multiples of 8
            self.cache_len = -(-self.cache_len // 8) * 8
        self.stage_len = self.cache_len - max_new
        # pool-level sampling DEFAULTS — every request may override them
        # (submit(sampling=..., seed=...)); per-slot params are traced, so
        # one compiled program serves every parameter mix.  max_top_k is the
        # STATIC per-step shortlist bound (lax.top_k width): requests must
        # keep top_k within [1, max_top_k].
        self.max_top_k = int(max_top_k)
        self.default_sampling = dict(
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty, do_sample=do_sample)
        self.default_samp = self._pack_sampling(self.default_sampling)
        self.cache_dtype = cache_dtype
        self.kv_dtype = kv_dtype
        # staged refill default: on for multi-step ticks, where the report
        # lag costs ~1.5 ticks of dead slot-steps per finish; off for
        # single-step ticks (lag ≈ 2 steps, not worth the staging
        # dispatches).  K must SCALE with the pool: a staged row's
        # turnaround is two ticks (consumed during tick i-1, freed to the
        # host after tick i's dispatch, restocked before tick i+1), so the
        # sustainable refill rate is K/2 per tick while slots finish at
        # S·steps_per_tick/mean_len per tick.  The old fixed K=8 starved a
        # 64-slot pool into a ~33-active-slot equilibrium (measured 2755
        # tok/s on the mixed-traffic bench); K = max(8, 3S/8) restores full
        # occupancy (4508 tok/s at S=64, above the 32-slot 4393; plateau
        # ~4517 at K=32) at ~10 MB of fp8 staging cache per row on the
        # flagship config.
        if staging_rows is None:
            # adaptive_ticks solves the same dead-slot problem host-side
            # and is mutually exclusive with staging — an unset default
            # must not invalidate a previously valid configuration
            staging_rows = (0 if adaptive_ticks else
                            min(num_slots, max(8, (3 * num_slots) // 8))
                            if steps_per_tick > 1 else 0)
        if adaptive_ticks and staging_rows:
            raise ValueError(
                "adaptive_ticks and staged refill are mutually exclusive "
                "(adaptive tick sizing needs host-side slot occupancy, "
                "which in-kernel refill makes stale); pass staging_rows=0")
        self.K = int(staging_rows)
        # `seed` seeds DEFAULT per-request seeds only (requests that pass
        # their own seed ignore it): request req_id gets a splitmix-style
        # hash of (pool seed, req_id), so default-seeded runs are
        # deterministic given submission order while explicit seeds are
        # fully caller-controlled
        self.seed_base = int(seed)
        self.step_count = 0
        self.steps_per_tick = max(1, steps_per_tick)
        self.adaptive_ticks = adaptive_ticks

        kv = kv_dtype or cache_dtype

        def _kv_zeros(n: int, ln: int) -> KVCache:
            if self.fused:  # flat [L, n, ln, D]
                shape = (self.size.layers, n, ln, cfg.model_dim)
                return KVCache(jnp.zeros(shape, kv), jnp.zeros(shape, kv))
            return KVCache.zeros(self.size, n, ln, kv)

        self.state = PoolState(
            cache=_kv_zeros(self.S, self.cache_len),
            prev_tok=jnp.full((self.S,), cfg.stop_mel_token, jnp.int32),
            n_gen=jnp.zeros((self.S,), jnp.int32),
            base=jnp.zeros((self.S,), jnp.int32),
            full_mask=jnp.zeros((self.S, self.cache_len), jnp.int32),
            presence=jnp.zeros((self.S, cfg.number_mel_codes), bool),
            codes=jnp.zeros((self.S, max_new), jnp.int32),
            active=jnp.zeros((self.S,), bool),
            budget=jnp.zeros((self.S,), jnp.int32),
            slot_seq=jnp.full((self.S,), _EMPTY_SEQ, jnp.int32),
            samp=jnp.broadcast_to(jnp.asarray(self.default_samp),
                                  (self.S, sampling.SAMP_COLS)),
            seed=jnp.zeros((self.S,), jnp.int32),
            stage_cache=_kv_zeros(self.K, self.stage_len),
            stage_ready=jnp.zeros((self.K,), bool),
            stage_seq=jnp.full((self.K,), _EMPTY_SEQ, jnp.int32),
            stage_prev_tok=jnp.zeros((self.K,), jnp.int32),
            stage_base=jnp.zeros((self.K,), jnp.int32),
            stage_mask=jnp.zeros((self.K, self.stage_len), jnp.int32),
            stage_presence=jnp.zeros((self.K, cfg.number_mel_codes), bool),
            stage_budget=jnp.zeros((self.K,), jnp.int32),
            stage_active=jnp.zeros((self.K,), bool),
            stage_samp=jnp.broadcast_to(jnp.asarray(self.default_samp),
                                        (self.K, sampling.SAMP_COLS)),
            stage_seed=jnp.zeros((self.K,), jnp.int32),
        )
        if device is not None:
            self.state = jax.device_put(self.state, device)
        # host bookkeeping is keyed by per-request seq (assigned at
        # admission/staging); slots are reconciled from report rows
        self._live: Dict[int, _Request] = {}      # admitted or staged, unfinished
        self._next_seq = 0
        self._slot_req: List[Optional[_Request]] = [None] * self.S  # direct admits
        self._slot_busy = [False] * self.S
        self._slot_admit_step = [0] * self.S   # step_count at direct admission
        self._staged_fifo: List[Tuple[int, int]] = []   # (seq, staging row)
        self._stage_free_rows: List[int] = list(range(self.K))
        self._queue: List[_Request] = []
        self._next_id = 0
        self._submit_lock = threading.Lock()
        # req_ids cancelled by callers (HTTP handler threads); the drive
        # thread applies them at its next tick — ONLY the drive thread
        # touches device state, so cancellation cannot race the donated
        # state tree (guarded by _submit_lock)
        self._cancelled: set = set()
        # one-tick-lagged report handle: (step_count_at_dispatch_end, handle)
        self._pending_report: Optional[Tuple[int, Any]] = None

    # -- host-side scheduling --------------------------------------------

    def _pack_sampling(self, s: Dict[str, Any]) -> np.ndarray:
        """Validate + pack one request's sampling params (defaults filled
        from the pool's).  Raises ValueError on params the pool cannot
        honor — callers surface that as a 4xx, never silently ignore."""
        temperature = float(s.get("temperature",
                                  self.default_sampling["temperature"]))
        top_k = int(s.get("top_k", self.default_sampling["top_k"]))
        top_p = float(s.get("top_p", self.default_sampling["top_p"]))
        rep = float(s.get("repetition_penalty",
                          self.default_sampling["repetition_penalty"]))
        do_sample = bool(s.get("do_sample", self.default_sampling["do_sample"]))
        if do_sample:
            if temperature <= 0:
                raise ValueError(f"temperature must be > 0, got {temperature}")
            if not 1 <= top_k <= self.max_top_k:
                raise ValueError(
                    f"pool top_k must be in [1, {self.max_top_k}] (the "
                    f"pool's static shortlist bound, max_top_k), got {top_k}")
            if not 0 < top_p <= 1:
                raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        if rep <= 0:
            raise ValueError(f"repetition_penalty must be > 0, got {rep}")
        return sampling.pack_sampling(temperature, top_k, top_p, rep,
                                      1.0 if do_sample else 0.0)

    def _default_seed(self, req_id: int) -> int:
        """Deterministic per-request default seed (mix of the pool seed and
        the request id; shared derivation with the engine's per-sentence
        seeds — ops/sampling.mix_seed)."""
        return sampling.mix_seed(self.seed_base, req_id)

    def submit(self, text_ids: np.ndarray, max_new: Optional[int] = None,
               done_cb=None, cond=None, sampling: Optional[Dict[str, Any]] = None,
               seed: Optional[int] = None) -> int:
        """Queue a request.  `cond` optionally overrides the pool's shared
        conditioning for this request ([1, 32, D] — e.g. a different
        speaker's latents), so one pool can serve mixed speakers.

        `sampling` optionally overrides the pool defaults for THIS request:
        keys temperature / top_k / top_p / repetition_penalty / do_sample
        (the reference API's per-request knobs, api.py:177-299).  `seed`
        pins the request's rng: token i samples from
        fold_in(PRNGKey(seed), i), so (seed, sampling, text) fully determine
        the output regardless of concurrent traffic.  Raises ValueError for
        prompts wider than the pool's max_text_width or sampling params the
        pool cannot honor (top_k outside [1, max_top_k]) — synchronously,
        before the request enters the queue."""
        text_ids = np.asarray(text_ids, np.int32)
        if text_ids.shape[-1] > self.max_text_width:
            raise ValueError(
                f"prompt of {text_ids.shape[-1]} text tokens exceeds the "
                f"pool's max_text_width={self.max_text_width}")
        samp = (self.default_samp if sampling is None
                else self._pack_sampling(sampling))
        # max_new=0 is a real budget (finish after the admission sample),
        # not a request for the pool default — only None means default
        budget = self.max_new if max_new is None else max(0, min(max_new,
                                                                 self.max_new))
        # id allocation + enqueue are atomic: submit is called concurrently
        # by HTTP handler threads (ThreadingHTTPServer / FastAPI workers);
        # an unsynchronized read-then-increment can hand two callers the
        # same id, crossing their audio
        with self._submit_lock:
            rid = self._next_id
            req = _Request(rid, text_ids, budget, done_cb=done_cb,
                           cond=None if cond is None else np.asarray(cond),
                           samp=samp,
                           seed=(self._default_seed(rid) if seed is None
                                 else int(seed) & 0x7FFFFFFF))
            self._next_id += 1
            self._queue.append(req)
        return req.req_id

    def cancel(self, req_id: int) -> None:
        """Request best-effort cancellation of `req_id` (e.g. the streaming
        client disconnected): queued requests are dropped, admitted/staged
        ones are deactivated on device at the drive loop's next tick so
        their remaining token budget is reclaimed for other traffic.  The
        request's done_cb never fires after cancel().  Safe from any
        thread; idempotent; unknown/finished ids are ignored."""
        with self._submit_lock:
            self._cancelled.add(req_id)

    def _apply_cancellations(self) -> None:
        """Drive-thread half of cancel(): drop queued requests, detach live
        ones from host bookkeeping (their done_cb must never fire), and
        deactivate their device rows in one fixed-width jitted scatter."""
        with self._submit_lock:
            if not self._cancelled:
                return
            cancelled, self._cancelled = self._cancelled, set()
            # in-place filter: submit() appends to this same list object
            self._queue[:] = [r for r in self._queue
                              if r.req_id not in cancelled]
        seqs = [seq for seq, r in self._live.items()
                if r.req_id in cancelled]
        for seq in seqs:
            self._live.pop(seq, None)
        if not seqs:
            return
        # fixed-width buckets (powers of two) keep the compile set small;
        # pad rows carry _PAD_SEQ, which no slot_seq/stage_seq ever holds
        width = 1
        while width < len(seqs):
            width *= 2
        vec = np.full((width,), _PAD_SEQ, np.int32)
        vec[: len(seqs)] = seqs
        self.state = _cancel_kernel(self.state, jnp.asarray(vec))

    def _prep_burst(self, reqs: List[_Request]):
        """Pad/bucket a burst's text + conditioning.  Batch is bucketed to a
        power of two and width to 32-multiples so admission shapes (and thus
        compiles) stay a small fixed set."""
        prep = uv.prepare_text_prompt(
            [r.text_ids for r in reqs],
            self.cfg.start_text_token, self.cfg.stop_text_token)
        take = len(reqs)
        Bb = 1
        while Bb < take:
            Bb *= 2
        prep_w = prep.text_tokens.shape[1]
        # submit() validates width, so this cannot fire; raise BEFORE the
        # queue is mutated so a violation never drops co-admitted requests
        if prep_w > self.max_text_width + 2:
            raise ValueError(
                f"prompt of {prep_w - 2} text tokens exceeds the pool's "
                f"max_text_width={self.max_text_width}")
        width = min(max(32, -(-prep_w // 32) * 32), self.max_text_width + 2)
        pad = width - prep_w
        tokens = np.pad(prep.text_tokens, ((0, 0), (pad, 0)))
        mask = np.pad(prep.attn_text, ((0, 0), (pad, 0)))
        if Bb > take:  # pad rows; extras are never inserted
            tokens = np.concatenate(
                [tokens, np.repeat(tokens[-1:], Bb - take, axis=0)], axis=0)
            mask = np.concatenate(
                [mask, np.repeat(mask[-1:], Bb - take, axis=0)], axis=0)
        if any(r.cond is not None for r in reqs):
            base = np.asarray(self.cond)
            conds = np.concatenate(
                [np.asarray(r.cond, base.dtype) if r.cond is not None else base
                 for r in reqs], axis=0)
            if Bb > take:
                conds = np.concatenate(
                    [conds, np.repeat(conds[-1:], Bb - take, axis=0)], axis=0)
            cond_arg = jnp.asarray(conds, self.cond.dtype)
        else:
            cond_arg = self.cond
        budgets = np.zeros((Bb,), np.int32)
        budgets[:take] = [r.max_new for r in reqs]
        samp = np.broadcast_to(self.default_samp,
                               (Bb, sampling.SAMP_COLS)).copy()
        seeds = np.zeros((Bb,), np.int32)
        for i, r in enumerate(reqs):
            if r.samp is not None:
                samp[i] = r.samp
            seeds[i] = r.seed
        return tokens, mask, cond_arg, budgets, samp, seeds, Bb

    def _assign_seqs(self, n: int) -> List[int]:
        seqs = list(range(self._next_seq, self._next_seq + n))
        self._next_seq += n
        return seqs

    def _admit(self) -> None:
        """Move queued requests onto the device: directly into slots the
        host knows are free (safe only while the staged FIFO is empty — see
        module docstring), then into free staging rows."""
        if not self._queue:
            return
        if not self._staged_fifo:
            free = [s for s in range(self.S) if not self._slot_busy[s]]
            take = min(len(free), len(self._queue))
            if take:
                slots = free[:take]
                reqs = self._queue[:take]
                (tokens, mask, cond_arg, budgets, samp, seeds,
                 Bb) = self._prep_burst(reqs)
                del self._queue[:take]
                seqs = self._assign_seqs(take)
                # padded rows carry slot index S → dropped by the scatter
                slots_arr = np.full((Bb,), self.S, np.int32)
                slots_arr[:take] = slots
                seqs_arr = np.full((Bb,), _EMPTY_SEQ, np.int32)
                seqs_arr[:take] = seqs
                # NO host fetch here: a first-token stop deactivates the
                # slot on device inside the kernel and the empty result
                # surfaces through the lagged report (a sync fetch per
                # admission burst cost ~30 ms on the tunnel and stalled
                # every live slot)
                self.state = _admit_insert_kernel(
                    self.params, self.cfg, self.state, cond_arg,
                    jnp.asarray(tokens), jnp.asarray(mask),
                    jnp.asarray(slots_arr), jnp.asarray(budgets),
                    jnp.asarray(seqs_arr), jnp.asarray(samp),
                    jnp.asarray(seeds), self.cache_dtype, self.max_top_k)
                for slot, req, seq in zip(slots, reqs, seqs):
                    self._slot_req[slot] = req
                    self._slot_busy[slot] = True
                    self._slot_admit_step[slot] = self.step_count
                    self._live[seq] = req
        if self.K and self._queue and self._stage_free_rows:
            take = min(len(self._stage_free_rows), len(self._queue))
            rows = self._stage_free_rows[:take]
            reqs = self._queue[:take]
            # _prep_burst may raise — consume rows/queue only after it
            # succeeds, or staging rows leak permanently (same
            # raise-before-mutate invariant as the direct path above)
            (tokens, mask, cond_arg, budgets, samp, seeds,
             Bb) = self._prep_burst(reqs)
            del self._stage_free_rows[:take]
            del self._queue[:take]
            seqs = self._assign_seqs(take)
            rows_arr = np.full((Bb,), self.K, np.int32)
            rows_arr[:take] = rows
            seqs_arr = np.full((Bb,), _EMPTY_SEQ, np.int32)
            seqs_arr[:take] = seqs
            self.state = _stage_kernel(
                self.params, self.cfg, self.state, cond_arg,
                jnp.asarray(tokens), jnp.asarray(mask),
                jnp.asarray(rows_arr), jnp.asarray(budgets),
                jnp.asarray(seqs_arr), jnp.asarray(samp),
                jnp.asarray(seeds), self.cache_dtype, self.max_top_k)
            for row, req, seq in zip(rows, reqs, seqs):
                self._staged_fifo.append((seq, row))
                self._live[seq] = req

    def _finish_seq(self, seq: int, n_gen: int, codes_row: np.ndarray) -> None:
        """Complete a request (idempotent: later report rows mentioning an
        already-finished seq are skipped)."""
        req = self._live.pop(seq, None)
        if req is None:
            return
        codes = codes_row[: min(n_gen, req.max_new)]
        if len(codes) and codes[-1] == self.cfg.stop_mel_token:
            codes = codes[:-1]
        if req.done_cb:
            try:
                req.done_cb(req.req_id, codes)
            except Exception:  # noqa: BLE001 — a poisoned callback (client
                # gone, broken pipe, handler bug) must not abort report
                # processing: the remaining rows of THIS report carry other
                # requests' one-shot outbox evacuations and the staging-row
                # recycle count, so letting the exception propagate would
                # hang those callers and leak staging rows
                import traceback
                traceback.print_exc()

    def _process_report(self, report: np.ndarray, at_step: int) -> None:
        """Reconcile host state from a packed report (see _step_kernel).
        Outbox evacuations first (strictly older than the end-of-tick slot
        snapshot), then slot rows; a slot row for a request already finished
        via the outbox is skipped by seq.  One staging row is recycled per
        outbox evacuation — the kernel consumes staged requests strictly in
        seq (FIFO) order, so popping the FIFO head matches."""
        slot_rows, out_rows = report[: self.S], report[self.S:]
        for row in out_rows:
            seq = int(row[2])
            if seq >= 0:
                self._finish_seq(seq, int(row[1]), row[3:])
        consumed = int((out_rows[:, 2] != _PAD_SEQ).sum()) if len(out_rows) else 0
        for _ in range(consumed):
            if self._staged_fifo:
                _, srow = self._staged_fifo.pop(0)
                self._stage_free_rows.append(srow)
        active = slot_rows[:, 0].astype(bool)
        for s in range(self.S):
            if self._slot_admit_step[s] >= at_step:
                continue  # host direct-admitted after this snapshot
            if not active[s]:
                seq = int(slot_rows[s, 2])
                if seq >= 0:
                    self._finish_seq(seq, int(slot_rows[s, 1]), slot_rows[s, 3:])
                self._slot_busy[s] = False
                self._slot_req[s] = None
            else:
                self._slot_busy[s] = True
                # refresh from the report: after an in-kernel refill the
                # slot's occupant is a staged request, not the direct
                # admit recorded at admission — a stale entry would pin
                # the finished request (and its cond array) and mislead
                # any future _slot_req reader under staging
                self._slot_req[s] = self._live.get(int(slot_rows[s, 2]))

    def _tick_steps(self) -> int:
        """Steps for this tick.  Full `steps_per_tick` normally; with
        `adaptive_ticks` and requests QUEUED, shrink the tick (powers of
        two, so the compile set stays log-sized) to the smallest remaining
        per-slot budget — otherwise a slot that finishes early in a long
        tick sits dead for the rest of it while work waits.  The rng folds
        each request's seed with its own token index, so results are
        invariant to how the step stream is partitioned into ticks.

        Default OFF (and unavailable with staged refill, which solves the
        same dead-slot problem on device): worth it only when per-dispatch
        latency ≪ a tick's compute.  On the axon tunnel (~5 ms dispatch +
        ~30 ms fetch) the extra dispatches cost far more than the reclaimed
        slot-steps (measured: 358 tok/s adaptive vs ~1230 fixed on the
        mixed-traffic bench); on a directly-attached chip the trade-off
        flips."""
        if not self.adaptive_ticks or not self._queue:
            return self.steps_per_tick
        live = [(s, r) for s, r in enumerate(self._slot_req) if r is not None]
        if not live:
            return 1
        # host-side estimate: slots generate one token per step while active
        rem = min(max(1, r.max_new - (self.step_count - self._slot_admit_step[s]) - 1)
                  for s, r in live)
        steps = 1
        while steps * 2 <= min(rem, self.steps_per_tick):
            steps *= 2
        return steps

    def step(self) -> int:
        """One scheduler tick (up to `steps_per_tick` decode steps in one
        dispatch): admit/stage, advance (with in-kernel refills), emit (one
        tick late).  Returns the number of unfinished requests on device."""
        # opportunistic early report processing: if the lagged report is
        # ALREADY on the host-visible side (is_ready — no stall) and work is
        # queued, process it before admitting so slots it freed refill THIS
        # tick instead of next (saves a tick of dead slot-steps per finish)
        early = self._pending_report
        if (early is not None and self._queue
                and getattr(early[1], "is_ready", lambda: False)()):
            self._pending_report = None
            self._process_report(np.asarray(early[1]), early[0])
        self._apply_cancellations()
        self._admit()
        if not self._live:
            self.flush()
            return 0
        steps = self._tick_steps()
        self.state, report = _step_kernel(
            self.params, self.cfg, self.state, self.cache_dtype,
            self.max_top_k, steps=steps, fused=self.fused)
        self.step_count += steps
        prev = self._pending_report
        self._pending_report = (self.step_count, report)
        if prev is not None:
            self._process_report(np.asarray(prev[1]), prev[0])
        return len(self._live)

    def flush(self) -> None:
        """Process the lagged report of the final tick."""
        if self._pending_report is not None:
            at_step, handle = self._pending_report
            self._pending_report = None
            self._process_report(np.asarray(handle), at_step)

    def run(self) -> Dict[int, np.ndarray]:
        """Drain the queue; returns {req_id: codes}."""
        results: Dict[int, np.ndarray] = {}
        out_cb = lambda rid, codes: results.__setitem__(rid, codes)
        for req in list(self._live.values()) + self._queue:
            if req.done_cb is None:
                req.done_cb = out_cb
        while self._queue or self._live:
            self.step()
        self.flush()
        return results

    def warmup(self, widths: Optional[Sequence[int]] = None) -> None:
        """Precompile the pool's programs before real traffic, by draining
        throwaway requests through the normal path: the decode step (cold
        ~5 min on a remote-compile link), the fused admission at the
        full-burst AND single-request batch buckets, and — with staged
        refill — the staging prefill at its full-burst and B=1 buckets
        (B=1 staging is the steady-state shape: one new request arriving
        while every slot is busy).  Default widths cover EVERY 32-wide
        admission bucket up to max_text_width; pass an explicit list to
        warm fewer.  INTERMEDIATE batch buckets (2, 4, …) are warmed too:
        they only occur under concurrent admission bursts, which is
        exactly when a 5-min remote cold compile hurts most (r5: an
        8-client bench measured TTFA p50 of 23.7 s on a "warmed" pool —
        every burst of 2-7 requests hit a lazy admit/stage compile).
        Compiles land in the persistent cache, so this is a first-deploy
        cost only.  Call BEFORE starting an external drive loop (run()
        drains inline)."""
        if widths is None:
            # max_text_width + 32 so the CAPPED top bucket (width
            # max_text_width + 2 after the start/stop tokens) is included —
            # range(30, mtw+1, 32) missed it and a near-max-width request
            # ate the full cold compile on a "warmed" deploy
            widths = range(30, self.max_text_width + 32, 32)
        for w in widths:
            text = np.ones((max(1, min(w, self.max_text_width)),), np.int32)
            # S short-lived busy slots, then K+1 zero-budget: K stage in
            # one burst, the straggler stages ALONE once rows recycle
            # (compiling the B=1 staging bucket)
            for _ in range(self.S):
                self.submit(text, max_new=2)
            for _ in range(self.K + 1):
                self.submit(text, max_new=0)
            self.run()
            # all slots free again: a lone request compiles the B=1
            # direct-admission bucket
            self.submit(text, max_new=0)
            self.run()
            # intermediate power-of-two batch buckets (concurrent-burst
            # shapes): direct admission at bucket b, then staging at
            # bucket b behind a full pool
            b = 2
            while b < self.S:
                for _ in range(b):
                    self.submit(text, max_new=2)
                self.run()
                if self.K > 1 and b != self.K:
                    for _ in range(self.S):
                        self.submit(text, max_new=2)
                    for _ in range(min(b, self.K)):
                        self.submit(text, max_new=0)
                    self.run()
                b *= 2


class PoolGroup:
    """Data-parallel serving: one `ContinuousBatcher` per chip.

    The single-pool scheduler is deliberately single-chip (donated
    device-resident state); scale-out is data parallelism over pools —
    the reference's analogue is one engine process per GPU behind an
    external balancer (README.md deployment section), here it is one
    object.  Each pool's weights/state are committed to its own device,
    so one host thread driving `step()` round-robin keeps every chip busy
    concurrently: dispatches are async, and each pool's report fetch is a
    tick late, so by the time the host reads it the device has moved on.

    Requests route to the pool with the fewest outstanding requests
    (queued + live), ties to the lowest index.  Request ids are global:
    `submit` returns ids unique across the group and completion callbacks
    receive them (per-pool ids never escape).
    """

    def __init__(self, batchers: List["ContinuousBatcher"]):
        if not batchers:
            raise ValueError("PoolGroup needs at least one batcher")
        self.batchers = list(batchers)
        self._next_id = 0
        self._submit_lock = threading.Lock()
        # finished codes for requests submitted WITHOUT a callback, keyed
        # by group id until run() hands them out
        self._unclaimed: Dict[int, np.ndarray] = {}
        # group id → (batcher, pool-local id), so cancel() can route;
        # entries are dropped when the request finishes
        self._routes: Dict[int, Tuple["ContinuousBatcher", int]] = {}

    @classmethod
    def create(cls, params, cfg: GPTConfig, cond_latent, devices,
               **kwargs) -> "PoolGroup":
        """One pool per device, identical configuration."""
        return cls([ContinuousBatcher(params, cfg, cond_latent,
                                      device=d, **kwargs)
                    for d in devices])

    def _load(self, b: "ContinuousBatcher") -> int:
        return len(b._queue) + len(b._live)

    @property
    def max_top_k(self) -> int:
        """The pools' static shortlist bound (identical across the group)."""
        return self.batchers[0].max_top_k

    def submit(self, text_ids, max_new: Optional[int] = None, done_cb=None,
               cond=None, sampling=None, seed: Optional[int] = None) -> int:
        # id allocation + routing + enqueue are one atomic section:
        # concurrent handler threads must neither share a gid (crossed
        # audio) nor pick the same "least-loaded" pool from a stale load
        with self._submit_lock:
            gid = self._next_id
            self._next_id += 1
            b = min(self.batchers, key=self._load)

            # rebind the pool-local id to the group-global one before the
            # caller's callback sees it; pool-local ids collide across
            # pools and never escape.  Callback-less requests park in
            # _unclaimed for run().
            def cb(_lrid, codes, _g=gid, _cb=done_cb):
                self._routes.pop(_g, None)
                if _cb is not None:
                    _cb(_g, codes)
                else:
                    self._unclaimed[_g] = codes

            lrid = b.submit(text_ids, max_new=max_new, done_cb=cb, cond=cond,
                            sampling=sampling, seed=seed)
            self._routes[gid] = (b, lrid)
        return gid

    def cancel(self, req_id: int) -> None:
        """Best-effort cancellation by group id (see ContinuousBatcher
        .cancel); unknown/finished ids are ignored."""
        route = self._routes.pop(req_id, None)
        if route is not None:
            route[0].cancel(route[1])

    def step(self) -> int:
        """One tick on every pool; returns total unfinished requests."""
        return sum(b.step() for b in self.batchers)

    def flush(self) -> None:
        for b in self.batchers:
            b.flush()

    @property
    def _queue(self) -> List["_Request"]:
        """Combined backlog (drive loops test truthiness — httpd.py)."""
        return [r for b in self.batchers for r in b._queue]

    def run(self) -> Dict[int, np.ndarray]:
        """Drain all pools; returns {group request id: codes} for requests
        submitted without a callback (callback requests already fired)."""
        while any(b._queue or b._live for b in self.batchers):
            self.step()
        self.flush()
        out = self._unclaimed
        self._unclaimed = {}
        return out

    def warmup(self, widths: Optional[Sequence[int]] = None) -> None:
        """Precompile every pool's programs (identical HLO — the compile
        cache pays once, each device loads its own executable)."""
        for b in self.batchers:
            b.warmup(widths)
