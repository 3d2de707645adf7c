"""Continuous-batching BEAM decode pool.

The reference's decode default is beam search (num_beams=3 on every API
request, reference api.py:253, infer.py:628-635).  The sampling pool
(serve/scheduler.py) cannot host it: beams need per-request multi-row
state and a cross-row candidate selection each step.  This module runs a
fixed pool of G beam GROUPS — each group is one request's nb beams — so
reference-default clients get true beam semantics on the throughput path,
interleaved with other requests' groups in the same fused step.

Design (mirrors the dedicated `inference_speech_beam` exactly, so a pool
group's output is bit-equal in fp32 to the dedicated decode for the same
seed/params/text):

  * split KV cache: the prompt prefix [cond|text|start] is prefilled once
    per request and stored once per GROUP ([L, G, H, Pc, hd]); only the
    generated suffix lives per beam ([L, G*nb, H, Sc, hd]).
  * lineage-masked attention, no physical cache reorder: each beam row
    keeps the K/V it generated in place and carries an ancestry map
    (gpt2.decode_step_lineage_rows — the per-group-position variant of the
    dedicated kernel, same op order: prefix scores | all-rows suffix
    scores → one softmax).
  * per-group traced knobs: temperature / top_p / repetition_penalty /
    length_penalty / seed / budget — one compiled program serves every
    parameter mix (ops/beam.flat_scores & beam_step accept per-batch
    vectors).  num_beams / top_k / do_sample are STATIC (they shape the
    program); requests that need other values use the sampling pool or a
    dedicated call (the HTTP layer declares the fallback).
  * per-group rng: select i of group g draws from
    fold_in(fold_in(PRNGKey(seed_g), 0xBEA3), i) — the dedicated path's
    exact fold chain, so outputs are pure in (seed, params, text)
    regardless of concurrent traffic.

Host discipline is the sampling pool's: one jitted step call per tick
(steps_per_tick decode steps under lax.scan), one packed report fetched a
tick late, direct group admission between ticks (no staging — groups turn
over ~600x slower than tokens, so a dead group-tick per finish is noise).
"""

from __future__ import annotations

import dataclasses
import functools
import threading
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import GPTConfig
from indextts_tpu.models import gpt2
from indextts_tpu.models import unified_voice as uv
from indextts_tpu.models.gpt2 import KVCache
from indextts_tpu.ops import beam as beam_lib
from indextts_tpu.ops import quantization, sampling

_EMPTY_SEQ = -1
SAMP_COLS = 4  # temperature, top_p, repetition_penalty, length_penalty


class BeamPoolState(NamedTuple):
    prefix: KVCache            # [L, G, H, Pc, hd] shared per group
    pmask: jnp.ndarray         # [G, Pc] int32 prefix attention mask
    suffix: KVCache            # [L, G*nb, H, Sc, hd] per beam
    anc: jnp.ndarray           # [G, nb, Sc] ancestry map
    seqs: jnp.ndarray          # [G, nb, max_new] running sequences
    scores: jnp.ndarray        # [G, nb] beam cumulative log-probs
    fin_scores: jnp.ndarray    # [G, nb] hypothesis bank
    fin_seqs: jnp.ndarray      # [G, nb, max_new]
    fin_lens: jnp.ndarray      # [G, nb]
    presence: jnp.ndarray      # [G*nb, V] repetition-penalty table
    prev_tok: jnp.ndarray      # [G, nb] last selected token per beam
    n_gen: jnp.ndarray         # [G] selects done (tokens in seqs)
    done: jnp.ndarray          # [G] HF done-latch
    active: jnp.ndarray        # [G] occupied and still decoding
    budget: jnp.ndarray        # [G] per-request max_new
    seed: jnp.ndarray          # [G] per-request rng seed
    samp: jnp.ndarray          # [G, SAMP_COLS] traced per-request knobs
    group_seq: jnp.ndarray     # [G] request seq (-1 = free)
    out_codes: jnp.ndarray     # [G, max_new] finalized best hypothesis
    out_len: jnp.ndarray       # [G]


def _group_keys(seeds: jnp.ndarray, counters: jnp.ndarray) -> jax.Array:
    """Per-group beam-select keys: the dedicated path's fold chain
    (unified_voice.inference_speech_beam: fold_in(rng, 0xBEA3) then
    fold_in(·, step)), vmapped over groups."""
    def one(seed, i):
        return jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(seed), 0xBEA3), i)

    return jax.vmap(one)(seeds, counters)


def _select(cfg: GPTConfig, nb: int, top_k: int, do_sample: bool,
            keys, logits, state: BeamPoolState):
    """One beam-select over all G groups (flat_scores → beam_step →
    done-latch → ancestry/presence reorder), mirroring the dedicated
    select() with per-group step = state.n_gen and per-group traced
    knobs.  Returns the updated beam fields (NOT yet masked by activity —
    the caller freezes inactive groups)."""
    G = state.n_gen.shape[0]
    temp = jnp.repeat(state.samp[:, 0], nb)
    top_p = jnp.repeat(state.samp[:, 1], nb)
    rep = jnp.repeat(state.samp[:, 2], nb)
    lp = state.samp[:, 3]
    flat = beam_lib.flat_scores(
        logits, state.presence,
        state.scores, nb, temperature=temp, top_k=top_k, top_p=top_p,
        repetition_penalty=rep, do_sample=do_sample)
    bstate = beam_lib.BeamState(state.scores, state.fin_scores,
                                state.fin_seqs, state.fin_lens)
    bstate, parent, token, seqs, best_cand = beam_lib.beam_step(
        keys, flat, nb, bstate, state.seqs, state.n_gen,
        cfg.stop_mel_token, do_sample, length_penalty=lp, done=state.done)
    done = jnp.logical_or(
        state.done,
        beam_lib.batch_done(bstate, state.n_gen, best_cand, lp))
    # reorder per-beam tensors by parent (absolute rows)
    rows = (jnp.arange(G)[:, None] * nb + parent).reshape(-1)    # [G*nb]
    anc = jnp.take_along_axis(state.anc, parent[:, :, None], axis=1)
    presence = state.presence[rows]
    tok_flat = token.reshape(-1)
    presence = presence.at[jnp.arange(G * nb), tok_flat].set(True)
    return bstate, token, seqs, presence, anc, done


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "nb", "top_k", "do_sample", "cache_dtype"),
    donate_argnames=("state",))
def _admit_beam_kernel(params, cfg: GPTConfig, state: BeamPoolState,
                       cond, text_tokens, text_mask, groups, budgets,
                       seqs_ids, samp, seeds, nb: int, top_k: int,
                       do_sample: bool, cache_dtype) -> BeamPoolState:
    """Batched prefill of B beam requests + the FIRST beam select, scattered
    into groups `groups` (padded rows carry G and drop).  The prefix KV is
    stored once per group; beams share it (dedicated-path layout)."""
    params = quantization.nativize_int4(params)
    size = uv.trunk_size(cfg)
    B = text_tokens.shape[0]
    G, Pc = state.pmask.shape
    nb_ = nb
    V = cfg.number_mel_codes
    max_new = state.seqs.shape[2]
    if cond.shape[0] == 1 and B > 1:
        cond = jnp.broadcast_to(cond, (B,) + cond.shape[1:])
    tpos = jnp.clip(jnp.cumsum(text_mask, axis=1) - 1, 0,
                    cfg.max_text_seq_len - 1)
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
                                 pmask, size, Pc,
                                 kv_dtype=state.prefix.k.dtype)
    logits0 = jnp.repeat(uv._lm_head(params, hidden[:, -1]), nb_, axis=0)

    # first select on a TEMPORARY batch-B view (admitted groups only), then
    # scatter results into the pool arrays
    presence0 = sampling.init_penalty_presence(
        V, B * nb_, prompt_token_ids=(1,), start_token=cfg.start_mel_token)
    bstate0 = beam_lib.init_beam_state(B, nb_, max_new)
    keys = _group_keys(seeds, jnp.zeros((B,), jnp.int32))
    temp = jnp.repeat(samp[:, 0], nb_)
    top_p = jnp.repeat(samp[:, 1], nb_)
    rep = jnp.repeat(samp[:, 2], nb_)
    lp = samp[:, 3]
    flat = beam_lib.flat_scores(
        logits0, presence0, bstate0.scores, nb_, temperature=temp,
        top_k=top_k, top_p=top_p, repetition_penalty=rep,
        do_sample=do_sample)
    bstate, parent, token, seqs_new, best_cand = beam_lib.beam_step(
        keys, flat, nb_, bstate0, jnp.zeros((B, nb_, max_new), jnp.int32),
        jnp.zeros((B,), jnp.int32), cfg.stop_mel_token, do_sample,
        length_penalty=lp, done=jnp.zeros((B,), bool))
    done0 = beam_lib.batch_done(bstate, jnp.zeros((B,), jnp.int32),
                                best_cand, lp)
    rows = (jnp.arange(B)[:, None] * nb_ + parent).reshape(-1)
    presence = presence0[rows]
    tok_flat = token.reshape(-1)
    presence = presence.at[jnp.arange(B * nb_), tok_flat].set(True)

    drop = dict(mode="drop")
    # beam rows of group g live at [g*nb, (g+1)*nb)
    beam_rows = (groups[:, None] * nb_
                 + jnp.arange(nb_)[None, :]).reshape(-1)      # [B*nb]
    beam_rows = jnp.where(jnp.repeat(groups, nb_) < G, beam_rows, G * nb_)
    presence_rows = presence.reshape(B * nb_, V)
    return state._replace(
        prefix=KVCache(
            state.prefix.k.at[:, groups].set(
                cache.k.astype(state.prefix.k.dtype), **drop),
            state.prefix.v.at[:, groups].set(
                cache.v.astype(state.prefix.v.dtype), **drop)),
        pmask=state.pmask.at[groups].set(
            jnp.pad(pmask, ((0, 0), (0, Pc - pmask.shape[1]))), **drop),
        suffix=KVCache(
            state.suffix.k.at[:, beam_rows].set(0, **drop),
            state.suffix.v.at[:, beam_rows].set(0, **drop)),
        anc=state.anc.at[groups].set(0, **drop),
        seqs=state.seqs.at[groups].set(seqs_new, **drop),
        scores=state.scores.at[groups].set(bstate.scores, **drop),
        fin_scores=state.fin_scores.at[groups].set(bstate.fin_scores, **drop),
        fin_seqs=state.fin_seqs.at[groups].set(bstate.fin_seqs, **drop),
        fin_lens=state.fin_lens.at[groups].set(bstate.fin_lens, **drop),
        presence=state.presence.at[beam_rows].set(presence_rows, **drop),
        prev_tok=state.prev_tok.at[groups].set(token, **drop),
        n_gen=state.n_gen.at[groups].set(1, **drop),
        done=state.done.at[groups].set(done0, **drop),
        active=state.active.at[groups].set(True, **drop),
        budget=state.budget.at[groups].set(budgets, **drop),
        seed=state.seed.at[groups].set(seeds, **drop),
        samp=state.samp.at[groups].set(samp, **drop),
        group_seq=state.group_seq.at[groups].set(seqs_ids, **drop),
        out_codes=state.out_codes.at[groups].set(0, **drop),
        out_len=state.out_len.at[groups].set(0, **drop),
    )


def _finalize_groups(cfg: GPTConfig, state: BeamPoolState,
                     finish: jnp.ndarray) -> BeamPoolState:
    """HF finalize for groups whose exit condition fired this tick
    (done-latch or budget): best hypothesis → out_codes/out_len, group
    deactivates.  `finish` [G] bool."""
    bstate = beam_lib.BeamState(state.scores, state.fin_scores,
                                state.fin_seqs, state.fin_lens)
    best_seq, best_len, finished = beam_lib.finalize(
        bstate, state.seqs, state.n_gen,
        length_penalty=state.samp[:, 3], done=state.done)
    max_new = state.seqs.shape[2]
    lengths = jnp.clip(jnp.where(finished, best_len - 1, best_len),
                       0, max_new)
    codes = jnp.where(jnp.arange(max_new)[None, :] < lengths[:, None],
                      best_seq, cfg.stop_mel_token)
    f1 = finish[:, None]
    return state._replace(
        out_codes=jnp.where(f1, codes, state.out_codes),
        out_len=jnp.where(finish, lengths, state.out_len),
        active=jnp.logical_and(state.active, ~finish),
    )


def _beam_step_core(params, cfg: GPTConfig, state: BeamPoolState,
                    nb: int, top_k: int, do_sample: bool,
                    cache_dtype) -> BeamPoolState:
    """One decode step for every RUNNING group (mirrors the dedicated
    body_fn), then finalize for groups whose exit condition fired."""
    size = uv.trunk_size(cfg)
    G = state.n_gen.shape[0]
    Sc = state.anc.shape[2]
    # exit BEFORE the trunk (dedicated cond_fn runs before body): groups
    # already done / out of budget finalize without another select
    finish = jnp.logical_and(
        state.active,
        jnp.logical_or(state.done, state.n_gen >= state.budget))
    state = _finalize_groups(cfg, state, finish)
    run = state.active  # still-decoding groups after the exit pass

    step = state.n_gen                                   # [G] (dedicated: step)
    mel_pos = jnp.clip(step + 1, 0, cfg.max_mel_seq_len - 1)
    tok_flat = state.prev_tok.reshape(-1)                # [G*nb]
    emb = (params["mel_embedding"]["weight"][tok_flat]
           + params["mel_pos_embedding"]["weight"][jnp.repeat(mel_pos, nb)]
           )[:, None, :]
    # each row owns the slot it writes this step (dedicated body_fn)
    anc = jax.vmap(
        lambda a, s: a.at[:, s].set(jnp.arange(nb, dtype=jnp.int32)))(
        state.anc, jnp.clip(step - 1, 0, Sc - 1))
    anc = jnp.where(run[:, None, None], anc, state.anc)
    valid = jnp.arange(Sc)[None, None, None, :] < step[:, None, None, None]
    owns = anc[:, :, None, :] == jnp.arange(nb)[None, None, :, None]
    suffix_bias = jnp.where(jnp.logical_and(owns, valid), 0.0,
                            gpt2.NEG_INF).astype(jnp.float32)
    prefix_bias = jnp.where(state.pmask.astype(bool), 0.0,
                            gpt2.NEG_INF).astype(jnp.float32)[:, None, None, :]
    # frozen groups park their write position out of range (drop scatter)
    pos = jnp.where(run, jnp.clip(step - 1, 0, Sc - 1), Sc)
    hidden, suffix = gpt2.decode_step_lineage_rows(
        params["gpt"], emb.astype(cache_dtype), state.prefix, prefix_bias,
        state.suffix, suffix_bias, jnp.repeat(pos, nb), size, nb)
    logits = uv._lm_head(params, hidden[:, 0])
    keys = _group_keys(state.seed, step)
    work = state._replace(anc=anc)
    bstate, token, seqs, presence, anc2, done = _select(
        cfg, nb, top_k, do_sample, keys, logits, work)

    r1 = run[:, None]
    r2 = run[:, None, None]
    rrow = jnp.repeat(run, nb)[:, None]
    return state._replace(
        suffix=suffix,  # frozen rows dropped their write already
        anc=jnp.where(r2, anc2, state.anc),
        seqs=jnp.where(r2, seqs, state.seqs),
        scores=jnp.where(r1, bstate.scores, state.scores),
        fin_scores=jnp.where(r1, bstate.fin_scores, state.fin_scores),
        fin_seqs=jnp.where(r2, bstate.fin_seqs, state.fin_seqs),
        fin_lens=jnp.where(r1, bstate.fin_lens, state.fin_lens),
        presence=jnp.where(rrow, presence, state.presence),
        prev_tok=jnp.where(r1, token, state.prev_tok),
        n_gen=state.n_gen + run.astype(jnp.int32),
        done=jnp.where(run, done, state.done),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "nb", "top_k", "do_sample", "cache_dtype",
                     "steps"),
    donate_argnames=("state",))
def _beam_step_kernel(params, cfg: GPTConfig, state: BeamPoolState,
                      nb: int, top_k: int, do_sample: bool, cache_dtype,
                      steps: int = 1) -> Tuple[BeamPoolState, jnp.ndarray]:
    """`steps` beam decode steps in ONE dispatch + one packed int32 report:
    row g = (active, out_len, group_seq, out_codes row)."""
    params = quantization.nativize_int4(params)

    def body(st, _):
        return _beam_step_core(params, cfg, st, nb, top_k, do_sample,
                               cache_dtype), None

    state, _ = jax.lax.scan(body, state, None, length=steps)
    # groups that exited on the LAST scanned step finalize here so the
    # report never shows an active=False group with stale out fields
    finish = jnp.logical_and(
        state.active,
        jnp.logical_or(state.done, state.n_gen >= state.budget))
    state = _finalize_groups(cfg, state, finish)
    report = jnp.concatenate(
        [state.active.astype(jnp.int32)[:, None], state.out_len[:, None],
         state.group_seq[:, None], state.out_codes], axis=1)
    return state, report


@functools.partial(jax.jit, donate_argnames=("state",))
def _beam_cancel_kernel(state: BeamPoolState,
                        seqs: jnp.ndarray) -> BeamPoolState:
    hit = (state.group_seq[:, None] == seqs[None, :]).any(axis=1)
    return state._replace(active=jnp.logical_and(state.active, ~hit))


@dataclasses.dataclass
class _Request:
    req_id: int
    text_ids: np.ndarray
    max_new: int
    done_cb: Optional[Callable[[int, np.ndarray], None]] = None
    cond: Optional[np.ndarray] = None
    samp: Optional[np.ndarray] = None
    seed: int = 0


class BeamPoolBatcher:
    """Fixed-pool continuous beam decoding over one UnifiedVoice model.

    Submit/step/run/cancel-compatible with `ContinuousBatcher`, so
    `engine.pool_infer`/`pool_infer_stream` and the HTTP drive loop work
    unchanged.  `sampling` overrides accepted per request: temperature /
    top_p / repetition_penalty / length_penalty (traced).  num_beams,
    top_k and do_sample are static program shape — submit() raises on a
    mismatch and the serving layer maps that to its declared-fallback
    contract."""

    def __init__(self, params, cfg: GPTConfig, cond_latent,
                 num_groups: int = 2, num_beams: int = 3,
                 max_text_width: int = 128, max_new: int = 600,
                 temperature: float = 1.0, top_k: int = 30,
                 top_p: float = 0.8, repetition_penalty: float = 10.0,
                 length_penalty: float = 0.0, do_sample: bool = True,
                 cache_dtype=jnp.bfloat16, kv_dtype=None, seed: int = 0,
                 steps_per_tick: int = 1, device=None):
        self.device = device
        if device is not None:
            params = jax.device_put(params, device)
            cond_latent = jax.device_put(cond_latent, device)
        self.params = params
        self.cfg = cfg
        self.cond = cond_latent
        self.G = int(num_groups)
        self.nb = int(num_beams)
        self.top_k = int(top_k)
        self.do_sample = bool(do_sample)
        self.max_new = int(max_new)
        self.max_text_width = int(max_text_width)
        self.prefix_len = cfg.condition_num_latent + max_text_width + 2 + 1
        self.size = uv.trunk_size(cfg)
        self.cache_dtype = cache_dtype
        self.defaults = dict(temperature=float(temperature),
                             top_p=float(top_p),
                             repetition_penalty=float(repetition_penalty),
                             length_penalty=float(length_penalty))
        self.seed_base = int(seed)
        self.steps_per_tick = max(1, int(steps_per_tick))
        kv = kv_dtype or cache_dtype
        G, nb, V = self.G, self.nb, cfg.number_mel_codes
        self.state = BeamPoolState(
            prefix=KVCache.zeros(self.size, G, self.prefix_len, kv),
            pmask=jnp.zeros((G, self.prefix_len), jnp.int32),
            suffix=KVCache.zeros(self.size, G * nb, max_new, kv),
            anc=jnp.zeros((G, nb, max_new), jnp.int32),
            seqs=jnp.zeros((G, nb, max_new), jnp.int32),
            scores=jnp.zeros((G, nb), jnp.float32),
            fin_scores=jnp.full((G, nb), beam_lib.BANK_EMPTY),
            fin_seqs=jnp.zeros((G, nb, max_new), jnp.int32),
            fin_lens=jnp.zeros((G, nb), jnp.int32),
            presence=jnp.zeros((G * nb, V), bool),
            prev_tok=jnp.full((G, nb), cfg.stop_mel_token, jnp.int32),
            n_gen=jnp.zeros((G,), jnp.int32),
            done=jnp.zeros((G,), bool),
            active=jnp.zeros((G,), bool),
            budget=jnp.zeros((G,), jnp.int32),
            seed=jnp.zeros((G,), jnp.int32),
            samp=jnp.zeros((G, SAMP_COLS), jnp.float32),
            group_seq=jnp.full((G,), _EMPTY_SEQ, jnp.int32),
            out_codes=jnp.zeros((G, max_new), jnp.int32),
            out_len=jnp.zeros((G,), jnp.int32),
        )
        if device is not None:
            self.state = jax.device_put(self.state, device)
        self._live: Dict[int, _Request] = {}
        self._group_busy = [False] * G
        self._group_admit_step = [0] * G
        self._next_seq = 0
        self._queue: List[_Request] = []
        self._next_id = 0
        self._submit_lock = threading.Lock()
        self._cancelled: set = set()
        self._pending_report: Optional[Tuple[int, Any]] = None
        self.step_count = 0
        self.max_top_k = self.top_k  # interface parity with the sampling pool

    # -- host-side scheduling ---------------------------------------------

    def _pack_sampling(self, s: Dict[str, Any]) -> np.ndarray:
        d = self.defaults
        temperature = float(s.get("temperature", d["temperature"]))
        top_p = float(s.get("top_p", d["top_p"]))
        rep = float(s.get("repetition_penalty", d["repetition_penalty"]))
        lp = float(s.get("length_penalty", d["length_penalty"]))
        if temperature <= 0:
            raise ValueError(f"temperature must be > 0, got {temperature}")
        if not 0 < top_p <= 1:
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        if rep <= 0:
            raise ValueError(f"repetition_penalty must be > 0, got {rep}")
        # static knobs: the program is shaped by them — reject mismatches
        # synchronously so the serving layer can declare its fallback
        if "top_k" in s and int(s["top_k"]) != self.top_k:
            raise ValueError(
                f"beam pool decodes with static top_k={self.top_k}; "
                f"got {s['top_k']}")
        if "do_sample" in s and bool(s["do_sample"]) != self.do_sample:
            raise ValueError(
                f"beam pool decodes with static do_sample={self.do_sample}")
        if "num_beams" in s and int(s["num_beams"]) != self.nb:
            raise ValueError(
                f"beam pool decodes with static num_beams={self.nb}; "
                f"got {s['num_beams']}")
        return np.asarray([temperature, top_p, rep, lp], np.float32)

    def submit(self, text_ids: np.ndarray, max_new: Optional[int] = None,
               done_cb=None, cond=None,
               sampling: Optional[Dict[str, Any]] = None,
               seed: Optional[int] = None) -> int:
        import indextts_tpu.ops.sampling as samp_ops

        text_ids = np.asarray(text_ids, np.int32)
        if text_ids.shape[-1] > self.max_text_width:
            raise ValueError(
                f"prompt of {text_ids.shape[-1]} text tokens exceeds the "
                f"pool's max_text_width={self.max_text_width}")
        samp = self._pack_sampling(sampling or {})
        budget = self.max_new if max_new is None else max(
            1, min(max_new, self.max_new))
        with self._submit_lock:
            rid = self._next_id
            req = _Request(rid, text_ids, budget, done_cb=done_cb,
                           cond=None if cond is None else np.asarray(cond),
                           samp=samp,
                           seed=(samp_ops.mix_seed(self.seed_base, rid)
                                 if seed is None else int(seed) & 0x7FFFFFFF))
            self._next_id += 1
            self._queue.append(req)
        return req.req_id

    def cancel(self, req_id: int) -> None:
        """Best-effort cancellation (same contract as the sampling pool)."""
        with self._submit_lock:
            self._cancelled.add(req_id)

    def _apply_cancellations(self) -> None:
        with self._submit_lock:
            if not self._cancelled:
                return
            cancelled, self._cancelled = self._cancelled, set()
            self._queue[:] = [r for r in self._queue
                              if r.req_id not in cancelled]
        seqs = [seq for seq, r in self._live.items()
                if r.req_id in cancelled]
        for seq in seqs:
            self._live.pop(seq, None)
        if not seqs:
            return
        width = 1
        while width < len(seqs):
            width *= 2
        vec = np.full((width,), -2, np.int32)
        vec[: len(seqs)] = seqs
        self.state = _beam_cancel_kernel(self.state, jnp.asarray(vec))

    def _admit(self) -> None:
        if not self._queue:
            return
        free = [g for g in range(self.G) if not self._group_busy[g]]
        take = min(len(free), len(self._queue))
        if not take:
            return
        groups = free[:take]
        reqs = self._queue[:take]
        prep = uv.prepare_text_prompt(
            [r.text_ids for r in reqs],
            self.cfg.start_text_token, self.cfg.stop_text_token)
        Bb = 1
        while Bb < take:
            Bb *= 2
        prep_w = prep.text_tokens.shape[1]
        width = min(max(32, -(-prep_w // 32) * 32), self.max_text_width + 2)
        pad = width - prep_w
        tokens = np.pad(prep.text_tokens, ((0, 0), (pad, 0)))
        mask = np.pad(prep.attn_text, ((0, 0), (pad, 0)))
        if Bb > take:
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
        del self._queue[:take]
        seqs = list(range(self._next_seq, self._next_seq + take))
        self._next_seq += take
        groups_arr = np.full((Bb,), self.G, np.int32)
        groups_arr[:take] = groups
        seqs_arr = np.full((Bb,), _EMPTY_SEQ, np.int32)
        seqs_arr[:take] = seqs
        budgets = np.zeros((Bb,), np.int32)
        budgets[:take] = [r.max_new for r in reqs]
        samp = np.zeros((Bb, SAMP_COLS), np.float32)
        seeds = np.zeros((Bb,), np.int32)
        for i, r in enumerate(reqs):
            samp[i] = r.samp
            seeds[i] = r.seed
        self.state = _admit_beam_kernel(
            self.params, self.cfg, self.state, cond_arg,
            jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(groups_arr),
            jnp.asarray(budgets), jnp.asarray(seqs_arr), jnp.asarray(samp),
            jnp.asarray(seeds), self.nb, self.top_k, self.do_sample,
            self.cache_dtype)
        for g, req, seq in zip(groups, reqs, seqs):
            self._group_busy[g] = True
            self._group_admit_step[g] = self.step_count
            self._live[seq] = req

    def _finish_seq(self, seq: int, n: int, codes_row: np.ndarray) -> None:
        req = self._live.pop(seq, None)
        if req is None:
            return
        codes = codes_row[: min(n, req.max_new)]
        if req.done_cb:
            try:
                req.done_cb(req.req_id, codes)
            except Exception:  # noqa: BLE001 — same poison guard as the
                import traceback  # sampling pool's _finish_seq
                traceback.print_exc()

    def _process_report(self, report: np.ndarray, at_step: int) -> None:
        active = report[:, 0].astype(bool)
        for g in range(self.G):
            if self._group_admit_step[g] >= at_step:
                continue  # admitted after this snapshot
            if not active[g]:
                seq = int(report[g, 2])
                if seq >= 0:
                    self._finish_seq(seq, int(report[g, 1]), report[g, 3:])
                self._group_busy[g] = False
            else:
                self._group_busy[g] = True

    def step(self) -> int:
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
        self.state, report = _beam_step_kernel(
            self.params, self.cfg, self.state, self.nb, self.top_k,
            self.do_sample, self.cache_dtype, steps=self.steps_per_tick)
        self.step_count += self.steps_per_tick
        prev = self._pending_report
        self._pending_report = (self.step_count, report)
        if prev is not None:
            self._process_report(np.asarray(prev[1]), prev[0])
        return len(self._live)

    def flush(self) -> None:
        if self._pending_report is not None:
            at_step, handle = self._pending_report
            self._pending_report = None
            self._process_report(np.asarray(handle), at_step)

    def run(self) -> Dict[int, np.ndarray]:
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
        """Precompile admit (full-burst and B=1 buckets) + step per width."""
        if widths is None:
            widths = range(30, self.max_text_width + 32, 32)
        for w in widths:
            text = np.ones((max(1, min(w, self.max_text_width)),), np.int32)
            for _ in range(self.G):
                self.submit(text, max_new=1)
            self.run()
            self.submit(text, max_new=1)
            self.run()
