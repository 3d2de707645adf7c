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
    ONE tiny flags fetch — and the fetch is a tick LATE, so the device
    never waits on the host;
  * everything else lives on device: generated tokens accumulate in a
    codes buffer [S, max_new] fetched once per finished request; `active`
    self-deactivates on device (stop token or per-slot token budget); the
    RNG folds inside the kernel from a host step counter;
  * admissions are batched — all free slots prefill + first-sample in ONE
    jitted call at a common bucketed width.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import GPTConfig
from indextts_tpu.models import gpt2
from indextts_tpu.models import unified_voice as uv
from indextts_tpu.models.gpt2 import KVCache
from indextts_tpu.ops import quantization, sampling


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


# --- jitted kernels (module level: params passed explicitly so weights are
# traced arguments, not compile-time constants) -----------------------------

@functools.partial(
    jax.jit,
    static_argnames=("cfg", "cache_dtype", "temperature", "top_k", "top_p",
                     "repetition_penalty", "do_sample"),
    donate_argnames=("state",))
def _admit_insert_kernel(params, cfg: GPTConfig, state: PoolState, cond,
                         text_tokens, text_mask, rng_base, admit_idx, slots,
                         budgets, cache_dtype, temperature, top_k, top_p,
                         repetition_penalty, do_sample) -> PoolState:
    """Batched prefill of B requests + first-token sampling + scatter-insert
    into the pool — ONE dispatch per admission burst (the former
    _admit_kernel + per-slot _insert_kernel split cost 1+B dispatches at
    ~5 ms each on the tunnel, stalling every live slot).

    `slots` [B] are destination rows; padded rows carry slot == S and are
    dropped by the scatter (mode="drop").  A first-token stop deactivates
    the slot ON DEVICE (active=False), so admission needs no host fetch at
    all — the empty result surfaces through the normal lagged report."""
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
    logits = uv._lm_head(params, hidden[:, -1])
    presence0 = sampling.init_penalty_presence(
        cfg.number_mel_codes, B, prompt_token_ids=(1,),
        start_token=cfg.start_mel_token)
    tok, presence, _ = sampling.sample_step(
        jax.random.fold_in(rng_base, admit_idx), logits, presence0,
        jnp.zeros((B,), bool), stop_token=cfg.stop_mel_token,
        temperature=temperature, top_k=top_k, top_p=top_p,
        repetition_penalty=repetition_penalty, do_sample=do_sample)

    P = emb.shape[1]
    cache_len = state.full_mask.shape[1]
    drop = dict(mode="drop")
    new_cache = KVCache(
        state.cache.k.at[:, slots, :, :P, :].set(
            cache.k.astype(state.cache.k.dtype), **drop),
        state.cache.v.at[:, slots, :, :P, :].set(
            cache.v.astype(state.cache.v.dtype), **drop),
    )
    row_mask = jnp.pad(pmask, ((0, 0), (0, cache_len - P)))
    codes_rows = jnp.zeros((B, state.codes.shape[1]), jnp.int32).at[:, 0].set(tok)
    return PoolState(
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
    )


def _step_core(params, cfg: GPTConfig, state: PoolState, rng, cache_dtype,
               temperature, top_k, top_p, repetition_penalty,
               do_sample) -> PoolState:
    """Advance every active slot one token (self-deactivating)."""
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
    hidden, cache = gpt2.decode_step_rows(
        params["gpt"], emb.astype(cache_dtype), state.cache,
        write_pos, full_mask, size)
    logits = uv._lm_head(params, hidden[:, 0])
    tok, presence, _ = sampling.sample_step(
        rng, logits, state.presence, ~active,
        stop_token=cfg.stop_mel_token, temperature=temperature,
        top_k=top_k, top_p=top_p, repetition_penalty=repetition_penalty,
        do_sample=do_sample)
    slot_idx = jnp.clip(state.n_gen, 0, max_new - 1)
    codes = state.codes.at[rows, slot_idx].set(
        jnp.where(active, tok, state.codes[rows, slot_idx]))
    n_gen = state.n_gen + active.astype(jnp.int32)
    # self-deactivate: stop token sampled, or per-slot budget exhausted
    done = jnp.logical_and(active,
                           jnp.logical_or(tok == cfg.stop_mel_token,
                                          n_gen >= state.budget))
    return PoolState(
        cache=cache, prev_tok=tok, n_gen=n_gen, base=state.base,
        full_mask=full_mask, presence=presence, codes=codes,
        active=jnp.logical_and(active, ~done), budget=state.budget,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "cache_dtype", "temperature", "top_k", "top_p",
                     "repetition_penalty", "do_sample", "steps"),
    donate_argnames=("state",))
def _step_kernel(params, cfg: GPTConfig, state: PoolState, rng_base, step_idx,
                 cache_dtype, temperature, top_k, top_p, repetition_penalty,
                 do_sample, steps: int = 1) -> Tuple[PoolState, jnp.ndarray]:
    """`steps` decode steps in ONE dispatch (lax.scan), then a packed report
    [S, max_new + 2] = (active, n_gen, codes-row) per slot.  Multi-step
    ticks amortise the per-call dispatch + fetch latency of high-latency
    links (the axon tunnel costs ~5 ms/dispatch and ~30 ms/fetch)."""
    # shared-scale int4 weights nativize once per tick, outside the scan
    # (ops/quantization.nativize_int4) — each step then reads native int4
    params = quantization.nativize_int4(params)

    def body(st, i):
        return _step_core(params, cfg, st, jax.random.fold_in(rng_base, i),
                          cache_dtype, temperature, top_k, top_p,
                          repetition_penalty, do_sample), None

    state, _ = jax.lax.scan(body, state, step_idx + jnp.arange(steps))
    report = jnp.concatenate(
        [state.active.astype(jnp.int32)[:, None], state.n_gen[:, None],
         state.codes], axis=1)
    return state, report


@dataclasses.dataclass
class _Request:
    req_id: int
    text_ids: np.ndarray
    max_new: int
    done_cb: Optional[Callable[[int, np.ndarray], None]] = None
    cond: Optional[np.ndarray] = None   # per-request [1, 32, D] conditioning


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
        cache_dtype=jnp.bfloat16,
        kv_dtype=None,            # e.g. jnp.float8_e4m3fn: half-traffic KV
        seed: int = 0,
        steps_per_tick: int = 1,
        adaptive_ticks: bool = False,
    ):
        self.params = params
        self.cfg = cfg
        self.cond = cond_latent
        self.S = num_slots
        self.max_new = max_new
        self.max_text_width = max_text_width
        self.cache_len = cfg.condition_num_latent + max_text_width + 2 + 1 + max_new
        self.size = uv.trunk_size(cfg)
        self.sampling_kwargs = dict(
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty, do_sample=do_sample)
        self.cache_dtype = cache_dtype
        self.kv_dtype = kv_dtype
        # independent fold domains: decode steps fold an unbounded absolute
        # step index, admissions fold a burst counter — a fixed offset
        # (the old admit_count + 2^20) collides once step_count crosses 2^20
        # (hours into a long-lived pool), so each site gets its own key
        self.rng_step, self.rng_admit = jax.random.split(
            jax.random.PRNGKey(seed))
        self.step_count = 0
        self.steps_per_tick = max(1, steps_per_tick)
        self.adaptive_ticks = adaptive_ticks
        self._admit_count = 0

        self.state = PoolState(
            cache=KVCache.zeros(self.size, self.S, self.cache_len,
                                kv_dtype or cache_dtype),
            prev_tok=jnp.full((self.S,), cfg.stop_mel_token, jnp.int32),
            n_gen=jnp.zeros((self.S,), jnp.int32),
            base=jnp.zeros((self.S,), jnp.int32),
            full_mask=jnp.zeros((self.S, self.cache_len), jnp.int32),
            presence=jnp.zeros((self.S, cfg.number_mel_codes), bool),
            codes=jnp.zeros((self.S, max_new), jnp.int32),
            active=jnp.zeros((self.S,), bool),
            budget=jnp.zeros((self.S,), jnp.int32),
        )
        self._slot_req: List[Optional[_Request]] = [None] * self.S
        self._slot_admit_step = [0] * self.S   # step_count at admission
        self._queue: List[_Request] = []
        self._next_id = 0
        # one-tick-lagged report handle: (step_count_at_dispatch_end, handle)
        self._pending_report: Optional[Tuple[int, Any]] = None

    # -- host-side scheduling --------------------------------------------

    def submit(self, text_ids: np.ndarray, max_new: Optional[int] = None,
               done_cb=None, cond=None) -> int:
        """Queue a request.  `cond` optionally overrides the pool's shared
        conditioning for this request ([1, 32, D] — e.g. a different
        speaker's latents), so one pool can serve mixed speakers.

        Raises ValueError for prompts wider than the pool's max_text_width
        (synchronously, before the request enters the queue)."""
        text_ids = np.asarray(text_ids, np.int32)
        if text_ids.shape[-1] > self.max_text_width:
            raise ValueError(
                f"prompt of {text_ids.shape[-1]} text tokens exceeds the "
                f"pool's max_text_width={self.max_text_width}")
        # max_new=0 is a real budget (finish after the admission sample),
        # not a request for the pool default — only None means default
        budget = self.max_new if max_new is None else max(0, min(max_new,
                                                                 self.max_new))
        req = _Request(self._next_id, text_ids, budget, done_cb=done_cb,
                       cond=None if cond is None else np.asarray(cond))
        self._next_id += 1
        self._queue.append(req)
        return req.req_id

    def _admit(self) -> None:
        """Fill every free slot from the queue with ONE batched prefill."""
        free = [s for s in range(self.S) if self._slot_req[s] is None]
        take = min(len(free), len(self._queue))
        if take == 0:
            return
        slots = free[:take]
        reqs = self._queue[:take]
        prep = uv.prepare_text_prompt(
            [r.text_ids for r in reqs],
            self.cfg.start_text_token, self.cfg.stop_text_token)
        # bucket batch AND width so admission shapes (and thus compiles)
        # stay a small fixed set: B ∈ {1,2,4,8,...}, width in 32-multiples
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
        del self._queue[:take]
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
        # padded rows carry slot index S → dropped by the kernel's scatter
        slots_arr = np.full((Bb,), self.S, np.int32)
        slots_arr[:take] = slots
        budgets = np.zeros((Bb,), np.int32)
        budgets[:take] = [r.max_new for r in reqs]
        # NO host fetch here: a first-token stop deactivates the slot on
        # device inside the kernel and the empty result surfaces through
        # the lagged report (a sync fetch per admission burst cost ~30 ms on
        # the tunnel and stalled every live slot)
        self.state = _admit_insert_kernel(
            self.params, self.cfg, self.state, cond_arg, jnp.asarray(tokens),
            jnp.asarray(mask), self.rng_admit, self._admit_count,
            jnp.asarray(slots_arr), jnp.asarray(budgets),
            self.cache_dtype, **self.sampling_kwargs)
        self._admit_count += 1
        for slot, req in zip(slots, reqs):
            self._slot_req[slot] = req
            self._slot_admit_step[slot] = self.step_count

    def _finish(self, slot: int, n_gen: int, codes_row: np.ndarray) -> None:
        req = self._slot_req[slot]
        assert req is not None
        codes = codes_row[: min(n_gen, req.max_new)]
        if len(codes) and codes[-1] == self.cfg.stop_mel_token:
            codes = codes[:-1]
        if req.done_cb:
            req.done_cb(req.req_id, codes)
        self._slot_req[slot] = None

    def _process_report(self, report: np.ndarray, at_step: int) -> None:
        """Finish slots the report shows inactive.  The report is a
        device-state snapshot at `at_step`; slots admitted at or after that
        step are newer than the snapshot and must be skipped."""
        active, n_gen = report[:, 0].astype(bool), report[:, 1]
        for slot, req in enumerate(self._slot_req):
            if req is None or self._slot_admit_step[slot] >= at_step:
                continue
            if not active[slot]:
                self._finish(slot, int(n_gen[slot]), report[slot, 2:])

    def _tick_steps(self) -> int:
        """Steps for this tick.  Full `steps_per_tick` normally; with
        `adaptive_ticks` and requests QUEUED, shrink the tick (powers of
        two, so the compile set stays log-sized) to the smallest remaining
        per-slot budget — otherwise a slot that finishes early in a long
        tick sits dead for the rest of it while work waits.  The rng folds
        on absolute step index, so results are invariant to how the step
        stream is partitioned into ticks.

        Default OFF: worth it only when per-dispatch latency ≪ a tick's
        compute.  On the axon tunnel (~5 ms dispatch + ~30 ms fetch) the
        extra dispatches cost far more than the reclaimed slot-steps
        (measured: 358 tok/s adaptive vs ~1230 fixed on the mixed-traffic
        bench); on a directly-attached chip the trade-off flips."""
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
        dispatch): admit, advance, emit (one tick late).  Returns number of
        live slots after the tick."""
        # opportunistic early report processing: if the lagged report is
        # ALREADY on the host-visible side (is_ready — no stall) and work is
        # queued, process it before admitting so slots it freed refill THIS
        # tick instead of next (saves a tick of dead slot-steps per finish)
        early = self._pending_report
        if (early is not None and self._queue
                and getattr(early[1], "is_ready", lambda: False)()):
            self._pending_report = None
            self._process_report(np.asarray(early[1]), early[0])
        self._admit()
        if not any(r is not None for r in self._slot_req):
            self.flush()
            return 0
        steps = self._tick_steps()
        self.state, report = _step_kernel(
            self.params, self.cfg, self.state, self.rng_step, self.step_count,
            self.cache_dtype, steps=steps,
            **self.sampling_kwargs)
        self.step_count += steps
        prev = self._pending_report
        self._pending_report = (self.step_count, report)
        if prev is not None:
            self._process_report(np.asarray(prev[1]), prev[0])
        return sum(r is not None for r in self._slot_req)

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
        for slot in range(self.S):
            req = self._slot_req[slot]
            if req is not None and req.done_cb is None:
                req.done_cb = out_cb
        for req in self._queue:
            if req.done_cb is None:
                req.done_cb = out_cb
        while self._queue or any(r is not None for r in self._slot_req):
            self.step()
        self.flush()
        return results
