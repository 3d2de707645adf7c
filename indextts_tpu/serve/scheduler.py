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
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import GPTConfig
from indextts_tpu.models import gpt2
from indextts_tpu.models import unified_voice as uv
from indextts_tpu.models.gpt2 import KVCache
from indextts_tpu.ops import sampling


class PoolState(NamedTuple):
    cache: KVCache              # [L, S, H, cache_len, hd]
    prev_tok: jnp.ndarray       # [S] last sampled token per slot
    n_gen: jnp.ndarray          # [S] tokens generated so far (incl. prev)
    base: jnp.ndarray           # [S] prefill length (first decode write slot)
    full_mask: jnp.ndarray      # [S, cache_len]
    presence: jnp.ndarray       # [S, V] repetition-penalty table
    active: jnp.ndarray         # [S] slot holds a live request



# --- jitted kernels (module level: params passed explicitly so weights are
# traced arguments, not compile-time constants) -----------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "cache_dtype"))
def _prefill_kernel(params, cfg: GPTConfig, cond, text_tokens, text_mask,
                    cache_dtype):
    """One request's prefill → (k, v, pmask, first_logits)."""
    size = uv.trunk_size(cfg)
    tpos = jnp.clip(jnp.cumsum(text_mask, axis=1) - 1, 0, cfg.max_text_seq_len - 1)
    text_emb = (params["text_embedding"]["weight"][text_tokens]
                + params["text_pos_embedding"]["weight"][tpos])
    text_emb = text_emb * text_mask[..., None]
    start_emb = (params["mel_embedding"]["weight"][cfg.start_mel_token]
                 + params["mel_pos_embedding"]["weight"][0])
    emb = jnp.concatenate(
        [cond.astype(text_emb.dtype), text_emb,
         jnp.broadcast_to(start_emb, (1, 1, cfg.model_dim))], axis=1)
    P = emb.shape[1]
    pmask = jnp.concatenate(
        [jnp.ones((1, cfg.condition_num_latent), jnp.int32),
         text_mask.astype(jnp.int32), jnp.ones((1, 1), jnp.int32)], axis=1)
    hidden, cache = gpt2.prefill(params["gpt"], emb.astype(cache_dtype),
                                 pmask, size, P)
    logits = uv._lm_head(params, hidden[:, -1])
    return cache.k, cache.v, pmask, logits


@functools.partial(jax.jit, static_argnames=("cache_dtype",),
                   donate_argnames=("state",))
def _insert_kernel(state: PoolState, slot, kv_k, kv_v, pmask, token,
                   presence_row, cache_dtype):
    """Install a prefilled request into `slot`."""
    P = kv_k.shape[3]
    cache = KVCache(
        jax.lax.dynamic_update_slice(state.cache.k, kv_k.astype(cache_dtype),
                                      (0, slot, 0, 0, 0)),
        jax.lax.dynamic_update_slice(state.cache.v, kv_v.astype(cache_dtype),
                                      (0, slot, 0, 0, 0)),
    )
    cache_len = state.full_mask.shape[1]
    row_mask = jnp.zeros((1, cache_len), jnp.int32)
    row_mask = jax.lax.dynamic_update_slice(row_mask, pmask, (0, 0))
    full_mask = jax.lax.dynamic_update_slice(state.full_mask, row_mask, (slot, 0))
    return PoolState(
        cache=cache,
        prev_tok=state.prev_tok.at[slot].set(token),
        n_gen=state.n_gen.at[slot].set(1),
        base=state.base.at[slot].set(P),
        full_mask=full_mask,
        presence=state.presence.at[slot].set(presence_row),
        active=state.active.at[slot].set(True),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "cache_dtype", "temperature", "top_k", "top_p",
                     "repetition_penalty", "do_sample"),
    donate_argnames=("state",))
def _step_kernel(params, cfg: GPTConfig, state: PoolState, rng, cache_dtype,
                 temperature, top_k, top_p, repetition_penalty, do_sample):
    """Advance every active slot one token → (state', tokens, stopped)."""
    size = uv.trunk_size(cfg)
    S = state.prev_tok.shape[0]
    cache_len = state.full_mask.shape[1]
    # reference position numbering: generated token n → mel position n+1
    mel_pos = jnp.clip(state.n_gen + 1, 0, cfg.max_mel_seq_len - 1)
    emb = (params["mel_embedding"]["weight"][state.prev_tok]
           + params["mel_pos_embedding"]["weight"][mel_pos])[:, None, :]
    write_pos = jnp.clip(state.base + state.n_gen - 1, 0, cache_len - 1)
    full_mask = state.full_mask.at[jnp.arange(S), write_pos].set(
        jnp.maximum(state.active.astype(jnp.int32),
                    state.full_mask[jnp.arange(S), write_pos]))
    hidden, cache = gpt2.decode_step_rows(
        params["gpt"], emb.astype(cache_dtype), state.cache,
        write_pos, full_mask, size)
    logits = uv._lm_head(params, hidden[:, 0])
    tok, presence, stopped = sampling.sample_step(
        rng, logits, state.presence, ~state.active,
        stop_token=cfg.stop_mel_token, temperature=temperature, top_k=top_k,
        top_p=top_p, repetition_penalty=repetition_penalty, do_sample=do_sample)
    new_state = PoolState(
        cache=cache, prev_tok=tok,
        n_gen=state.n_gen + state.active.astype(jnp.int32),
        base=state.base, full_mask=full_mask, presence=presence,
        active=state.active,
    )
    return new_state, tok, stopped


@dataclasses.dataclass
class _Request:
    req_id: int
    text_ids: np.ndarray
    max_new: int
    codes: List[int] = dataclasses.field(default_factory=list)
    done_cb: Optional[Callable[[int, np.ndarray], None]] = None


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
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.cond = cond_latent
        self.S = num_slots
        self.max_new = max_new
        self.cache_len = cfg.condition_num_latent + max_text_width + 2 + 1 + max_new
        self.size = uv.trunk_size(cfg)
        self.sampling_kwargs = dict(
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty, do_sample=do_sample)
        self.cache_dtype = cache_dtype
        self.rng = jax.random.PRNGKey(seed)
        self.step_count = 0

        self.state = PoolState(
            cache=KVCache.zeros(self.size, self.S, self.cache_len, cache_dtype),
            prev_tok=jnp.full((self.S,), cfg.stop_mel_token, jnp.int32),
            n_gen=jnp.zeros((self.S,), jnp.int32),
            base=jnp.zeros((self.S,), jnp.int32),
            full_mask=jnp.zeros((self.S, self.cache_len), jnp.int32),
            presence=jnp.zeros((self.S, cfg.number_mel_codes), bool),
            active=jnp.zeros((self.S,), bool),
        )
        self._slot_req: List[Optional[_Request]] = [None] * self.S
        self._queue: List[_Request] = []
        self._next_id = 0
        self._prefill_cache: Dict[int, Any] = {}

    # -- host-side scheduling --------------------------------------------

    def submit(self, text_ids: np.ndarray, max_new: Optional[int] = None,
               done_cb=None) -> int:
        req = _Request(self._next_id, np.asarray(text_ids, np.int32),
                       max_new or self.max_new, done_cb=done_cb)
        self._next_id += 1
        self._queue.append(req)
        return req.req_id

    def _admit(self) -> None:
        for slot in range(self.S):
            if self._slot_req[slot] is not None or not self._queue:
                continue
            req = self._queue.pop(0)
            prep = uv.prepare_text_prompt(
                [req.text_ids], self.cfg.start_text_token, self.cfg.stop_text_token)
            width = max(16, -(-prep.text_tokens.shape[1] // 16) * 16)
            pad = width - prep.text_tokens.shape[1]
            tokens = np.pad(prep.text_tokens, ((0, 0), (pad, 0)))
            mask = np.pad(prep.attn_text, ((0, 0), (pad, 0)))
            kv_k, kv_v, pmask, logits = _prefill_kernel(
                self.params, self.cfg, self.cond, jnp.asarray(tokens),
                jnp.asarray(mask), self.cache_dtype)
            presence0 = sampling.init_penalty_presence(
                self.cfg.number_mel_codes, 1, prompt_token_ids=(1,),
                start_token=self.cfg.start_mel_token)
            self.rng, sub = jax.random.split(self.rng)
            tok, presence, stopped = sampling.sample_step(
                sub, logits, presence0, jnp.zeros((1,), bool),
                stop_token=self.cfg.stop_mel_token, **self.sampling_kwargs)
            self.state = _insert_kernel(
                self.state, jnp.int32(slot), kv_k, kv_v,
                jnp.asarray(pmask), tok[0], presence[0], self.cache_dtype)
            req.codes.append(int(tok[0]))
            self._slot_req[slot] = req
            if int(tok[0]) == self.cfg.stop_mel_token:
                self._finish(slot)

    def _finish(self, slot: int) -> None:
        req = self._slot_req[slot]
        assert req is not None
        codes = np.asarray(req.codes, np.int32)
        if len(codes) and codes[-1] == self.cfg.stop_mel_token:
            codes = codes[:-1]
        if req.done_cb:
            req.done_cb(req.req_id, codes)
        self._slot_req[slot] = None
        self.state = self.state._replace(
            active=self.state.active.at[slot].set(False))

    def step(self) -> int:
        """One scheduler tick: admit, advance, emit.  Returns number of
        active slots after the tick."""
        self._admit()
        if not any(r is not None for r in self._slot_req):
            return 0
        self.rng, sub = jax.random.split(self.rng)
        self.state, tok, stopped = _step_kernel(
            self.params, self.cfg, self.state, sub, self.cache_dtype,
            **self.sampling_kwargs)
        self.step_count += 1
        tok_np = np.asarray(tok)
        stopped_np = np.asarray(stopped)
        for slot, req in enumerate(self._slot_req):
            if req is None:
                continue
            req.codes.append(int(tok_np[slot]))
            if stopped_np[slot] or len(req.codes) >= req.max_new:
                self._finish(slot)
        return sum(r is not None for r in self._slot_req)

    def run(self) -> Dict[int, np.ndarray]:
        """Drain the queue; returns {req_id: codes}."""
        results: Dict[int, np.ndarray] = {}
        for slot in range(self.S):
            req = self._slot_req[slot]
            if req is not None and req.done_cb is None:
                req.done_cb = lambda rid, codes: results.__setitem__(rid, codes)
        out_cb = lambda rid, codes: results.__setitem__(rid, codes)
        for req in self._queue:
            if req.done_cb is None:
                req.done_cb = out_cb
        while self._queue or any(r is not None for r in self._slot_req):
            self.step()
        return results
