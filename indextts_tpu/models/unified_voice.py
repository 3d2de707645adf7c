"""UnifiedVoice: the autoregressive text+mel-code acoustic model.

TPU-native rebuild of the reference model (indextts/gpt/model.py:312-720):
a GPT-2 trunk with learned per-stream positional embeddings (wpe nulled),
a conformer→perceiver conditioning encoder producing 32 latents, dual
text/mel heads, and an incremental KV-cache decode path.

Differences from the reference are architectural, not behavioural:
  * the decode loop is a `lax.while_loop` over a preallocated cache with
    on-device sampling (replaces HF `generate`, gpt/model.py:669-720);
  * the training forward is fully vectorised (replaces the per-sample python
    loops in train.py:168-346);
  * everything compiles to static shapes (pad-to-bucket at the call site).

Reference quirk reproduced on purpose: HF's position bookkeeping gives the
n-th *generated* mel token position n+1 (position 1 is never used) because
`attention_mask.shape[1] - mel_len` is evaluated after the mask has grown
(gpt/model.py:164-167 + prepare_gpt_inputs:643-667).  Checkpoints are
trained against this numbering, so we keep it.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import GPTConfig
from indextts_tpu.models import conformer, gpt2, perceiver
from indextts_tpu.models.gpt2 import GPT2Size, KVCache, layer_norm
from indextts_tpu.ops import quantization, sampling


def trunk_size(cfg: GPTConfig) -> GPT2Size:
    return GPT2Size(layers=cfg.layers, dim=cfg.model_dim, heads=cfg.heads)


def conformer_size(cfg: GPTConfig) -> conformer.ConformerSize:
    cm = cfg.condition_module
    return conformer.ConformerSize(
        input_size=100,
        output_size=cm.output_size,
        attention_heads=cm.attention_heads,
        linear_units=cm.linear_units,
        num_blocks=cm.num_blocks,
    )


def perceiver_size(cfg: GPTConfig) -> perceiver.PerceiverSize:
    cm = cfg.condition_module
    return perceiver.PerceiverSize(
        dim=cfg.model_dim,
        dim_context=cm.output_size,
        heads=cm.attention_heads,
        ff_mult=cm.perceiver_mult,
        num_latents=cfg.condition_num_latent,
    )


def init_params(rng: jax.Array, cfg: GPTConfig, dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(rng, 8)
    D = cfg.model_dim
    n_text = cfg.number_text_tokens * cfg.types + 1

    def nrm(k, shape, std=0.02):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    if cfg.condition_type in ("conformer_perceiver", "conformer_encoder"):
        cond_params = conformer.init_params(ks[0], conformer_size(cfg), dtype)
        perc_params = perceiver.init_params(ks[1], perceiver_size(cfg), dtype)
    elif cfg.condition_type == "perceiver":
        from indextts_tpu.models import legacy_conditioning as legacy

        cond_params = legacy.init_conditioning_encoder(ks[0], 100, D, 6, dtype)
        perc_params = perceiver.init_params(
            ks[1], dataclasses.replace(perceiver_size(cfg), dim_context=D,
                                        ff_mult=4, heads=8), dtype)
    else:  # mean-pooled legacy default (gpt/model.py:364,534-545)
        from indextts_tpu.models import legacy_conditioning as legacy

        cond_params = legacy.init_conditioning_encoder(ks[0], 100, D, 6, dtype)
        perc_params = {}
    return {
        "conditioning_encoder": cond_params,
        "perceiver_encoder": perc_params,
        "text_embedding": {"weight": nrm(ks[2], (n_text, D))},
        "mel_embedding": {"weight": nrm(ks[3], (cfg.number_mel_codes, D))},
        # reference: LearnedPositionEmbeddings(max_mel_seq_len/max_text_seq_len)
        # (gpt/model.py:372-374)
        "mel_pos_embedding": {"weight": nrm(ks[4], (cfg.max_mel_seq_len, D))},
        "text_pos_embedding": {"weight": nrm(ks[5], (cfg.max_text_seq_len, D))},
        "gpt": gpt2.init_gpt2_params(ks[6], trunk_size(cfg), dtype),
        "final_norm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        "text_head": {"kernel": nrm(ks[7], (D, n_text)), "bias": jnp.zeros((n_text,), dtype)},
        "mel_head": {"kernel": nrm(jax.random.fold_in(ks[7], 1), (D, cfg.number_mel_codes)),
                      "bias": jnp.zeros((cfg.number_mel_codes,), dtype)},
    }


# ---------------------------------------------------------------------------
# conditioning
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def get_conditioning(params: Dict[str, Any], cfg: GPTConfig,
                     cond_mel: jnp.ndarray,
                     cond_mel_lengths: jnp.ndarray) -> jnp.ndarray:
    """cond_mel: [B, n_mels, T] → conditioning latents [B, 32, D]
    (reference: gpt/model.py:487-546)."""
    B = cond_mel.shape[0]
    # run at the params' compute dtype (bf16 under mixed precision)
    wdtype = jax.tree.leaves(params["conditioning_encoder"])[0].dtype
    if jnp.issubdtype(cond_mel.dtype, jnp.floating) and cond_mel.dtype != wdtype:
        cond_mel = cond_mel.astype(wdtype)
    if cfg.condition_type in ("conformer_perceiver", "conformer_encoder"):
        enc, valid = conformer.forward(
            params["conditioning_encoder"], jnp.swapaxes(cond_mel, 1, 2),
            cond_mel_lengths, conformer_size(cfg))
        # cond_mask_pad: prepend num_latents Trues (gpt/model.py:346,528)
        mask = jnp.concatenate(
            [jnp.ones((B, cfg.condition_num_latent), bool), valid], axis=1)
        return perceiver.forward(params["perceiver_encoder"], enc, mask,
                                 perceiver_size(cfg))
    from indextts_tpu.models import legacy_conditioning as legacy

    if cfg.condition_type == "perceiver":
        enc = legacy.conditioning_encoder(
            params["conditioning_encoder"], cond_mel, cfg.heads)  # [B, D, T]
        psize = dataclasses.replace(perceiver_size(cfg), dim_context=cfg.model_dim,
                                     ff_mult=4, heads=8)
        return perceiver.forward(params["perceiver_encoder"],
                                 jnp.swapaxes(enc, 1, 2), None, psize)
    # mean-pooled default (gpt/model.py:534-545)
    pooled = legacy.conditioning_encoder(
        params["conditioning_encoder"], cond_mel, cfg.heads, mean=True)
    return pooled[:, None, :]


# head matmul: same shared quantised-matmul implementation as the trunk
# (ops/quantization.matmul_quant) — plain / int8 / int4 forms all covered.
_head_mm = quantization.matmul_quant


def _lm_head(params, hidden):
    """final_norm + mel head (reference lm_head, gpt/model.py:56)."""
    h = layer_norm(hidden, params["final_norm"]["scale"], params["final_norm"]["bias"])
    return _head_mm(h, params["mel_head"]["kernel"]) + params["mel_head"]["bias"]


# ---------------------------------------------------------------------------
# training forward (vectorised train.py:168-346)
# ---------------------------------------------------------------------------

def build_io_tokens(ids: jnp.ndarray, lengths: jnp.ndarray, start: int,
                    stop: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[B, T] right-padded ids → ([B, T+2] inputs with start/stop,
    [B, T+1] targets, [B, T+1] target mask).

    inputs[i] = [start, ids[:L], stop, 0...]; targets = inputs[:, 1:];
    mask covers the first L+1 target positions (train.py:233-255,302-312).
    """
    B, T = ids.shape
    pos = jnp.arange(T + 2)[None, :]
    L = lengths[:, None]
    shifted = jnp.pad(ids, ((0, 0), (1, 1)))  # ids at positions 1..T
    inputs = jnp.where(pos == 0, start,
                       jnp.where(pos <= L, shifted,
                                 jnp.where(pos == L + 1, stop, 0)))
    targets = inputs[:, 1:]
    tmask = jnp.arange(T + 1)[None, :] < (lengths[:, None] + 1)
    return inputs, targets, tmask


def _masked_ce(logits: jnp.ndarray, targets: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def train_forward(
    params: Dict[str, Any],
    cfg: GPTConfig,
    cond_latent: jnp.ndarray,      # [B, 32, D]
    text_ids: jnp.ndarray,         # [B, Tt] right-padded
    text_lengths: jnp.ndarray,     # [B]
    mel_codes: jnp.ndarray,        # [B, Tm] right-padded
    codes_lengths: jnp.ndarray,    # [B]
    remat: bool = False,
) -> Dict[str, Any]:
    """Teacher-forced dual-CE forward.  Returns dict with loss_text,
    loss_mel, mel_logits, mel_targets, mel_mask."""
    size = trunk_size(cfg)
    B = text_ids.shape[0]
    cond_len = cond_latent.shape[1]

    text_in, text_tgt, text_mask = build_io_tokens(
        text_ids, text_lengths, cfg.start_text_token, cfg.stop_text_token)
    mel_in, mel_tgt, mel_mask = build_io_tokens(
        mel_codes, codes_lengths, cfg.start_mel_token, cfg.stop_mel_token)

    Tt2, Tm2 = text_in.shape[1], mel_in.shape[1]
    assert Tt2 <= cfg.max_text_seq_len, (
        f"text width {Tt2 - 2} exceeds max_text_tokens {cfg.max_text_tokens}")
    assert Tm2 <= cfg.max_mel_seq_len, (
        f"mel width {Tm2 - 2} exceeds max_mel_tokens {cfg.max_mel_tokens}")
    text_emb = (params["text_embedding"]["weight"][text_in]
                + params["text_pos_embedding"]["weight"][:Tt2][None])
    mel_emb = (params["mel_embedding"]["weight"][mel_in]
               + params["mel_pos_embedding"]["weight"][:Tm2][None])

    emb = jnp.concatenate([cond_latent.astype(text_emb.dtype), text_emb, mel_emb], axis=1)
    attn = jnp.concatenate([
        jnp.ones((B, cond_len), jnp.int32),
        (jnp.arange(Tt2)[None] < (text_lengths[:, None] + 2)).astype(jnp.int32),
        (jnp.arange(Tm2)[None] < (codes_lengths[:, None] + 2)).astype(jnp.int32),
    ], axis=1)

    hidden = gpt2.forward(params["gpt"], emb, attn, size, remat=remat)
    latent = layer_norm(hidden[:, cond_len:], params["final_norm"]["scale"],
                        params["final_norm"]["bias"])
    text_latent = latent[:, :Tt2]
    mel_latent = latent[:, Tt2:]

    # drop the final position of each stream (train.py:297-298)
    text_logits = (_head_mm(text_latent, params["text_head"]["kernel"])
                   + params["text_head"]["bias"])[:, :-1]
    mel_logits = (_head_mm(mel_latent, params["mel_head"]["kernel"])
                  + params["mel_head"]["bias"])[:, :-1]

    loss_text = _masked_ce(text_logits, text_tgt, text_mask)
    loss_mel = _masked_ce(mel_logits, mel_tgt, mel_mask)
    return {
        "loss_text": loss_text,
        "loss_mel": loss_mel,
        "mel_logits": mel_logits,
        "mel_targets": mel_tgt,
        "mel_mask": mel_mask,
        "text_logits": text_logits,
        "text_targets": text_tgt,
        "text_mask": text_mask,
    }


def top_k_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                   mask: jnp.ndarray, ks=(1, 10, 20)) -> Dict[str, jnp.ndarray]:
    """Masked top-k accuracy in percent (train.py:348-371)."""
    max_k = max(ks)
    _, top = jax.lax.top_k(logits.astype(jnp.float32), max_k)  # [..., max_k]
    hit = top == targets[..., None]
    denom = jnp.maximum(mask.sum(), 1)
    out = {}
    for k in ks:
        correct = jnp.any(hit[..., :k], axis=-1) & mask
        out[f"acc_{k}"] = correct.sum() / denom * 100.0
    return out


# ---------------------------------------------------------------------------
# latent forward (reference UnifiedVoice.forward(..., return_latent=True),
# gpt/model.py:548-593) — feeds BigVGAN
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def latent_forward(
    params: Dict[str, Any],
    cfg: GPTConfig,
    cond_latent: jnp.ndarray,    # [B, 32, D]
    text_ids: jnp.ndarray,       # [B, Lt]
    text_lengths: jnp.ndarray,   # [B]
    mel_codes: jnp.ndarray,      # [B, Lc]
    codes_lengths: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Teacher-forced re-forward returning per-code latents [B, Lc, D] for
    the vocoder (infer.py:864-875).  Positions beyond codes_lengths carry
    stop-token latents, matching set_mel_padding (gpt/model.py:439-447)."""
    size = trunk_size(cfg)
    B, Lt = text_ids.shape
    Lc = mel_codes.shape[1]
    cond_len = cond_latent.shape[1]

    # set_text_padding / set_mel_padding: replace pads with stop tokens
    tpos = jnp.arange(Lt)[None]
    text_ids = jnp.where(tpos < text_lengths[:, None], text_ids, cfg.stop_text_token)
    mpos = jnp.arange(Lc)[None]
    mel_codes = jnp.where(mpos < codes_lengths[:, None], mel_codes, cfg.stop_mel_token)

    # pad one stop then prepend start (gpt/model.py:576-588)
    text_in = jnp.pad(text_ids, ((0, 0), (1, 1)),
                      constant_values=((0, 0), (cfg.start_text_token, cfg.stop_text_token)))
    mel_in = jnp.pad(mel_codes, ((0, 0), (1, 1)),
                     constant_values=((0, 0), (cfg.start_mel_token, cfg.stop_mel_token)))

    text_emb = (params["text_embedding"]["weight"][text_in]
                + params["text_pos_embedding"]["weight"][: Lt + 2][None])
    mel_emb = (params["mel_embedding"]["weight"][mel_in]
               + params["mel_pos_embedding"]["weight"][: Lc + 2][None])
    emb = jnp.concatenate([cond_latent.astype(text_emb.dtype), text_emb, mel_emb], axis=1)

    # The reference runs this forward unmasked on exact-length B=1 inputs
    # (gpt/model.py:459-474).  We mask the padded tail instead, which is
    # identical for exact-length inputs and makes *batched* re-forwards over
    # right-padded buckets equivalent to the reference's per-sentence runs.
    attn = jnp.concatenate([
        jnp.ones((B, cond_len), jnp.int32),
        (jnp.arange(Lt + 2)[None] < (text_lengths[:, None] + 2)).astype(jnp.int32),
        (jnp.arange(Lc + 2)[None] < (codes_lengths[:, None] + 2)).astype(jnp.int32),
    ], axis=1)
    hidden = gpt2.forward(params["gpt"], emb, attn, size)
    latent = layer_norm(hidden[:, cond_len:], params["final_norm"]["scale"],
                        params["final_norm"]["bias"])
    mel_latent = latent[:, Lt + 2 :]
    return mel_latent[:, :-2]  # (gpt/model.py:591-593)


# ---------------------------------------------------------------------------
# inference: prompt preparation + decode loop
# ---------------------------------------------------------------------------

class PreparedPrompt(NamedTuple):
    text_tokens: np.ndarray    # [B, L+2] left-padded, start/stop added
    valid_from: np.ndarray     # [B] index of first valid slot
    attn_text: np.ndarray      # [B, L+2] 1=valid


def prepare_text_prompt(text_ids_list, start_token: int, stop_token: int) -> PreparedPrompt:
    """Host-side equivalent of prepare_gpt_inputs (gpt/model.py:606-667):
    strip any existing start/stop tokens, re-add them, left-pad to a common
    length."""
    cleaned = []
    for ids in text_ids_list:
        ids = np.asarray(ids).reshape(-1)
        ids = ids[(ids != start_token) & (ids != stop_token)]
        cleaned.append(np.concatenate([[start_token], ids, [stop_token]]))
    L = max(len(c) for c in cleaned)
    B = len(cleaned)
    tokens = np.zeros((B, L), dtype=np.int32)
    mask = np.zeros((B, L), dtype=np.int32)
    valid_from = np.zeros((B,), dtype=np.int32)
    for i, c in enumerate(cleaned):
        pad = L - len(c)
        tokens[i, pad:] = c
        mask[i, pad:] = 1
        valid_from[i] = pad
    return PreparedPrompt(tokens, valid_from, mask)


class DecodeResult(NamedTuple):
    codes: jnp.ndarray     # [B, max_new] generated mel codes (stop-padded)
    lengths: jnp.ndarray   # [B] generated length *excluding* stop token
    finished: jnp.ndarray  # [B] whether stop was emitted


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new", "do_sample", "top_k", "cache_dtype",
                     "typical_sampling", "use_fused_trunk",
                     "kv_dtype", "guided"),
)
def _inference_speech_impl(
    params: Dict[str, Any],
    cfg: GPTConfig,
    cond_latent: jnp.ndarray,   # [B or 1, 32, D]
    text_tokens: jnp.ndarray,   # [B, L+2] from prepare_text_prompt
    text_mask: jnp.ndarray,     # [B, L+2]
    rng: jax.Array,
    max_new: int = 600,
    temperature: float = 1.0,
    top_k: int = 30,
    top_p: float = 0.8,
    repetition_penalty: float = 10.0,
    do_sample: bool = True,
    typical_sampling: bool = False,
    typical_mass: float = 0.9,
    cache_dtype=jnp.bfloat16,
    use_fused_trunk: bool = False,
    kv_dtype=None,
    cfg_scale: float = 1.0,
    guided: bool = False,
) -> DecodeResult:
    """Jitted body of `inference_speech` (the public wrapper below keeps
    float sampling knobs TRACED so slider/API changes reuse the compiled
    program; only `guided` — which doubles the row count — is static)."""
    # shared-scale int4 params nativize ONCE per program (hoisted above the
    # while_loop); every decode step then reads sub-byte native-int4 weights
    params = quantization.nativize_int4(params)
    size = trunk_size(cfg)
    B, Ltot = text_tokens.shape
    cond_len = cond_latent.shape[1]
    if cond_latent.shape[0] == 1 and B > 1:
        cond_latent = jnp.broadcast_to(cond_latent, (B,) + cond_latent.shape[1:])
    R = 2 * B if guided else B  # physical trunk rows
    if guided:
        # rows [B, 2B): same text, zeroed conditioning (the trained null)
        cond_latent = jnp.concatenate(
            [cond_latent, jnp.zeros_like(cond_latent)], axis=0)
        text_tokens = jnp.tile(text_tokens, (2, 1))
        text_mask = jnp.tile(text_mask, (2, 1))

    def mix(logits):
        """[R, V] per-row logits → [B, V] guided logits."""
        if not guided:
            return logits
        lc, lu = logits[:B], logits[B:]
        return lu + cfg_scale * (lc - lu)

    # --- prefill embeddings: [cond | text | start_mel] -------------------
    # per-sample text positions: 0.. within the valid (non-pad) region
    tpos = jnp.cumsum(text_mask, axis=1) - 1
    tpos = jnp.clip(tpos, 0, cfg.max_text_seq_len - 1)
    text_emb = (params["text_embedding"]["weight"][text_tokens]
                + params["text_pos_embedding"]["weight"][tpos])
    text_emb = text_emb * text_mask[..., None]

    start_emb = (params["mel_embedding"]["weight"][cfg.start_mel_token]
                 + params["mel_pos_embedding"]["weight"][0])
    prefill_emb = jnp.concatenate(
        [cond_latent.astype(text_emb.dtype), text_emb,
         jnp.broadcast_to(start_emb, (R, 1, cfg.model_dim))], axis=1)
    P = cond_len + Ltot + 1
    # cache length alignment: the fused Pallas trunk streams the cache in
    # 256-slot chunks (extra slots are masked and never unmasked); the XLA
    # path only needs 8-alignment
    align = 128 if (use_fused_trunk and R == 1) else 8
    cache_len = -(-(P + max_new) // align) * align

    prefill_mask = jnp.concatenate(
        [jnp.ones((R, cond_len), jnp.int32), text_mask.astype(jnp.int32),
         jnp.ones((R, 1), jnp.int32)], axis=1)

    hidden, cache = gpt2.prefill(
        params["gpt"], prefill_emb.astype(cache_dtype), prefill_mask, size,
        cache_len, kv_dtype=kv_dtype)
    first_logits = mix(_lm_head(params, hidden[:, -1]))

    full_mask = jnp.zeros((R, cache_len), jnp.int32).at[:, :P].set(prefill_mask)
    presence = sampling.init_penalty_presence(
        cfg.number_mel_codes, B, prompt_token_ids=(1,),
        start_token=cfg.start_mel_token)
    finished0 = jnp.zeros((B,), bool)

    tok0, presence, finished = sampling.sample_step(
        jax.random.fold_in(rng, 0), first_logits, presence, finished0,
        stop_token=cfg.stop_mel_token, temperature=temperature, top_k=top_k,
        top_p=top_p, repetition_penalty=repetition_penalty, do_sample=do_sample,
        typical_sampling=typical_sampling, typical_mass=typical_mass)

    codes0 = jnp.full((B, max_new), cfg.stop_mel_token, jnp.int32)
    codes0 = codes0.at[:, 0].set(tok0)

    # the fused Pallas trunk works on a flat [L, T, D] cache; flatten ONCE at
    # prefill and keep that layout across the whole while_loop (the former
    # per-step flatten/unflatten cost a full cache pass per token)
    # the fused Pallas trunk handles bf16 and fp8 caches (fp8 halves its
    # VMEM working copies, doubling the supported cache length)
    fused = use_fused_trunk and R == 1
    if fused:
        from indextts_tpu.ops.pallas.decode_layer import (
            flatten_cache, fused_decode_trunk_flat)

        cache_state = flatten_cache(cache)
    else:
        cache_state = cache

    def trunk_step(emb, cache_state, slot, full_mask):
        if fused:
            k_flat, v_flat = cache_state
            pre, k_flat, v_flat = fused_decode_trunk_flat(
                params["gpt"], emb, k_flat, v_flat, slot, full_mask,
                heads=cfg.heads, interpret=jax.default_backend() != "tpu")
            hidden = layer_norm(pre, params["gpt"]["ln_f"]["scale"],
                                params["gpt"]["ln_f"]["bias"])
            return hidden, (k_flat, v_flat)
        hidden, new_cache = gpt2.decode_step(
            params["gpt"], emb, cache_state, slot, full_mask, size)
        return hidden, new_cache

    def cond_fn(state):
        step, _, _, _, finished, _, _ = state
        return jnp.logical_and(step < max_new, ~jnp.all(finished))

    def body_fn(state):
        step, prev_tok, cache_state, presence, finished, codes, full_mask = state
        # reference position numbering: generated token n → position n + 1
        # (see module docstring); prev_tok was generated at step-1 → n=step
        mel_pos = jnp.clip(step + 1, 0, cfg.max_mel_seq_len - 1)
        # under guidance both halves follow the SAME sampled sequence
        prev_rows = jnp.tile(prev_tok, (2,)) if guided else prev_tok
        emb = (params["mel_embedding"]["weight"][prev_rows]
               + params["mel_pos_embedding"]["weight"][mel_pos])[:, None, :]
        slot = P + step - 1
        full_mask = jax.lax.dynamic_update_slice(
            full_mask, jnp.ones((R, 1), jnp.int32), (0, slot))
        hidden, cache_state = trunk_step(
            emb.astype(cache_dtype), cache_state, slot, full_mask)
        logits = mix(_lm_head(params, hidden[:, 0]))
        tok, presence, finished = sampling.sample_step(
            jax.random.fold_in(rng, step + 1), logits, presence, finished,
            stop_token=cfg.stop_mel_token, temperature=temperature,
            top_k=top_k, top_p=top_p, repetition_penalty=repetition_penalty,
            do_sample=do_sample, typical_sampling=typical_sampling,
            typical_mass=typical_mass)
        codes = jax.lax.dynamic_update_slice(codes, tok[:, None], (0, step))
        return step + 1, tok, cache_state, presence, finished, codes, full_mask

    state = (jnp.int32(1), tok0, cache_state, presence, finished, codes0, full_mask)
    _, _, _, _, finished, codes, _ = jax.lax.while_loop(cond_fn, body_fn, state)

    is_stop = codes == cfg.stop_mel_token
    any_stop = jnp.any(is_stop, axis=1)
    first_stop = jnp.argmax(is_stop, axis=1)
    lengths = jnp.where(any_stop, first_stop, max_new)
    return DecodeResult(codes, lengths, finished)


# ---------------------------------------------------------------------------
def inference_speech(
    params: Dict[str, Any],
    cfg: GPTConfig,
    cond_latent: jnp.ndarray,   # [B or 1, 32, D]
    text_tokens: jnp.ndarray,   # [B, L+2] from prepare_text_prompt
    text_mask: jnp.ndarray,     # [B, L+2]
    rng: jax.Array,
    max_new: int = 600,
    temperature: float = 1.0,
    top_k: int = 30,
    top_p: float = 0.8,
    repetition_penalty: float = 10.0,
    do_sample: bool = True,
    typical_sampling: bool = False,
    typical_mass: float = 0.9,
    cache_dtype=jnp.bfloat16,
    use_fused_trunk: bool = False,
    kv_dtype=None,
    cfg_scale: float = 1.0,
) -> DecodeResult:
    """Autoregressive mel-code generation (replaces HF generate,
    gpt/model.py:669-720) as one jitted program: prefill + while_loop decode
    with on-device sampling and early exit when every row has stopped.

    Float sampling knobs (temperature/top_p/repetition_penalty/typical_mass/
    cfg_scale) are TRACED scalars: changing a value reuses the compiled
    decode program — over the remote-compile tunnel a recompile costs ~5
    minutes, so a WebUI slider must never be a static key (r3 review).
    Only `guided` (cfg_scale != 1.0, which doubles the physical row count)
    specializes the program.

    cfg_scale > 1.0 enables classifier-free guidance: a second set of rows
    decodes with ZERO conditioning latents (exactly what `cfg_dropout_ratio`
    training drops to, train.py:228-231) and every step samples from
    `uncond + cfg_scale * (cond - uncond)`.  The reference trains for CFG
    but its inference never implements the documented `cfg_scale` knob
    (config.yaml:270 — dead upstream); here it is a first-class decode mode
    costing one extra cache row per request."""
    return _inference_speech_impl(
        params, cfg, cond_latent, text_tokens, text_mask, rng,
        max_new=max_new, temperature=jnp.float32(temperature), top_k=top_k,
        top_p=jnp.float32(top_p),
        repetition_penalty=jnp.float32(repetition_penalty),
        do_sample=do_sample, typical_sampling=typical_sampling,
        typical_mass=jnp.float32(typical_mass), cache_dtype=cache_dtype,
        use_fused_trunk=use_fused_trunk, kv_dtype=kv_dtype,
        cfg_scale=jnp.float32(cfg_scale),
        guided=float(cfg_scale) != 1.0)


# beam decode (reference default: generate(num_beams=3, do_sample=True),
# infer.py:628-635 → HF beam_sample)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new", "num_beams", "do_sample", "top_k",
                     "cache_dtype", "typical_sampling", "reorder", "kv_dtype"),
)
def inference_speech_beam(
    params: Dict[str, Any],
    cfg: GPTConfig,
    cond_latent: jnp.ndarray,
    text_tokens: jnp.ndarray,
    text_mask: jnp.ndarray,
    rng: jax.Array,
    max_new: int = 600,
    num_beams: int = 3,
    temperature: float = 1.0,
    top_k: int = 30,
    top_p: float = 0.8,
    repetition_penalty: float = 10.0,
    do_sample: bool = True,
    typical_sampling: bool = False,
    typical_mass: float = 0.9,
    cache_dtype=jnp.bfloat16,
    reorder: str = "lineage",  # see the strategy menu in `select`
    kv_dtype=None,             # e.g. jnp.float8_e4m3fn: half-traffic KV tier
    length_penalty: float = 0.0,  # HF semantics; reference default 0.0
) -> DecodeResult:
    """Beam(-sample) mel-code generation, HF 4.44 semantics (ops/beam.py
    flat_scores): log_softmax → processors (repetition penalty, typical) →
    + beam scores → per-beam warpers → draw 2·nb candidates → bank
    finished, continue best nb.

    TPU-shaped split KV cache: the prompt prefix [cond|text|start] is
    identical across a request row's nb beams, so it is prefilled and
    stored ONCE per request ([L, B, H, Pc, d]) while only the generated
    suffix lives per beam ([L, B*nb, H, Sc, d]) — see
    gpt2.decode_step_lineage.  The per-step beam-parent cache reorder
    (HF _reorder_cache, gpt/model.py:207-218) therefore touches only the
    suffix array; identity permutations skip the gather entirely."""
    from indextts_tpu.ops import beam as beam_lib

    # one-time in-program conversion of shared-scale int4 leaves to native
    # jnp.int4 (see quantization.nativize_int4)
    params = quantization.nativize_int4(params)
    size = trunk_size(cfg)
    B, Ltot = text_tokens.shape
    nb = num_beams
    V = cfg.number_mel_codes
    cond_len = cond_latent.shape[1]
    if cond_latent.shape[0] == 1 and B > 1:
        cond_latent = jnp.broadcast_to(cond_latent, (B,) + cond_latent.shape[1:])

    tpos = jnp.clip(jnp.cumsum(text_mask, axis=1) - 1, 0, cfg.max_text_seq_len - 1)
    text_emb = (params["text_embedding"]["weight"][text_tokens]
                + params["text_pos_embedding"]["weight"][tpos])
    text_emb = text_emb * text_mask[..., None]
    start_emb = (params["mel_embedding"]["weight"][cfg.start_mel_token]
                 + params["mel_pos_embedding"]["weight"][0])
    prefill_emb = jnp.concatenate(
        [cond_latent.astype(text_emb.dtype), text_emb,
         jnp.broadcast_to(start_emb, (B, 1, cfg.model_dim))], axis=1)
    P = cond_len + Ltot + 1
    # 64-aligned so the Pallas permute kernel gets clean T chunks; extra
    # slots are never unmasked
    prefix_len = -(-P // 64) * 64
    suffix_len = -(-max_new // 64) * 64
    prefill_mask = jnp.concatenate(
        [jnp.ones((B, cond_len), jnp.int32), text_mask.astype(jnp.int32),
         jnp.ones((B, 1), jnp.int32)], axis=1)

    # distinct fold domain per sampling site: beam-select draws must never
    # collide with inference_speech's per-step stream if a caller ever
    # mixes both paths under one key (VERDICT r2)
    rng = jax.random.fold_in(rng, 0xBEA3)

    # prefill runs on B rows, NOT B*nb — the beams share it
    hidden, prefix = gpt2.prefill(
        params["gpt"], prefill_emb.astype(cache_dtype),
        prefill_mask, size, prefix_len, kv_dtype=kv_dtype)
    logits0 = jnp.repeat(_lm_head(params, hidden[:, -1]), nb, axis=0)  # [B*nb, V]

    pmask = jnp.zeros((B, prefix_len), jnp.int32).at[:, :P].set(prefill_mask)
    prefix_bias = jnp.where(pmask.astype(bool), 0.0,
                            gpt2.NEG_INF).astype(jnp.float32)[:, None, None, :]
    suffix = gpt2.KVCache.zeros(
        size, B * nb, suffix_len,
        dtype=kv_dtype if kv_dtype is not None else cache_dtype)
    presence = sampling.init_penalty_presence(
        V, B * nb, prompt_token_ids=(1,), start_token=cfg.start_mel_token)
    state = beam_lib.init_beam_state(B, nb, max_new)
    seqs0 = jnp.zeros((B, nb, max_new), jnp.int32)
    # lineage strategy: anc[b, i, s] = physical suffix row owning slot s in
    # beam i's ancestry — replaces every physical cache permutation
    anc0 = jnp.zeros((B, nb, suffix_len), jnp.int32)

    def select(rng_i, logits, state, seqs, presence, cache, anc, done, step,
               has_cache=True):
        flat = beam_lib.flat_scores(
            logits, presence, state.scores, nb,
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty,
            typical_sampling=typical_sampling, typical_mass=typical_mass,
            do_sample=do_sample)
        state, parent, token, seqs, best_cand = beam_lib.beam_step(
            rng_i, flat, nb, state, seqs, step, cfg.stop_mel_token, do_sample,
            length_penalty=length_penalty, done=done)
        # latch HF's _done AFTER the step's banking (beam_search.py:300-306);
        # the heuristic keys on this step's best candidate INCLUDING banked
        # eos candidates (beam_lib.batch_done, oracle-tested vs HF is_done)
        done = jnp.logical_or(
            done, beam_lib.batch_done(state, step, best_cand, length_penalty))
        # reorder per-beam tensors by parent (absolute rows)
        rows = (jnp.arange(B)[:, None] * nb + parent).reshape(-1)   # [B*nb]
        identity = jnp.all(rows == jnp.arange(B * nb))

        # Reorder-strategy menu over the SUFFIX cache, measured in-loop on
        # v5e at the flagship beam-3 engine shape (ms/step for the FULL
        # step, T≈133+600, fp8 KV, tools/bench_beam_step.py):
        #   lineage 0     no physical reorder at all — ancestry-masked
        #                 attention over all rows' suffixes  ← default
        #   dslice  4.45  per-row dynamic_slice + concat
        #   pallas  4.30  copy kernel w/ scalar-prefetch rows
        #   full    6.08  XLA row gather under a cond
        #   none    1.75  diagnostic floor (WRONG results)
        if reorder == "lineage":
            if has_cache:
                anc = jnp.take_along_axis(anc, parent[:, :, None], axis=1)
        elif reorder == "none" or not has_cache:
            pass  # first select: suffix is all zeros, nothing to gather
        elif reorder == "dslice":
            def pick(x):
                return jnp.concatenate(
                    [jax.lax.dynamic_index_in_dim(x, rows[n], axis=1,
                                                  keepdims=True)
                     for n in range(B * nb)], axis=1)
            cache = gpt2.KVCache(pick(cache.k), pick(cache.v))
        elif reorder == "pallas":
            from indextts_tpu.ops.pallas.permute import permute_cache_rows

            k2, v2 = permute_cache_rows(
                cache.k, cache.v, rows,
                interpret=jax.default_backend() != "tpu")
            cache = gpt2.KVCache(k2, v2)
        elif reorder == "always":    # unconditional full row gather (no cond)
            cache = gpt2.KVCache(cache.k[:, rows], cache.v[:, rows])
        elif reorder == "onehot":    # permutation as tiny matmul over beams
            W = jax.nn.one_hot(rows, B * nb, dtype=cache.k.dtype)  # [N, N]
            perm = lambda x: jnp.einsum("nb,lbhtd->lnhtd", W, x)
            cache = gpt2.KVCache(perm(cache.k), perm(cache.v))
        elif reorder == "full":      # XLA row gather under a cond
            do_gather = lambda c: gpt2.KVCache(c.k[:, rows], c.v[:, rows])
            cache = jax.lax.cond(identity, lambda c: c, do_gather, cache)
        else:
            raise ValueError(f"unknown reorder strategy: {reorder!r}")
        presence = presence[rows]
        tok_flat = token.reshape(-1)
        presence = presence.at[jnp.arange(B * nb), tok_flat].set(True)
        return state, tok_flat, seqs, presence, cache, anc, done

    state, tok, seqs, presence, suffix, anc, done = select(
        jax.random.fold_in(rng, 0), logits0, state, seqs0, presence, suffix,
        anc0, jnp.zeros((B,), bool), jnp.int32(0), has_cache=False)

    def cond_fn(carry):
        step, state, tok, seqs, presence, suffix, anc, done = carry
        return jnp.logical_and(step < max_new, ~jnp.all(done))

    def body_fn(carry):
        step, state, tok, seqs, presence, suffix, anc, done = carry
        mel_pos = jnp.clip(step + 1, 0, cfg.max_mel_seq_len - 1)
        emb = (params["mel_embedding"]["weight"][tok]
               + params["mel_pos_embedding"]["weight"][mel_pos])[:, None, :]
        if reorder == "lineage":
            # each row owns the slot it writes this step
            anc = jax.lax.dynamic_update_slice(
                anc, jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32)[None, :, None],
                                      (B, nb, 1)), (0, 0, step - 1))
            owner = anc
        else:
            # physically-permuted strategies: every beam's history lives in
            # its OWN row (select() moved it there), so ownership is the
            # identity — the same attention primitive serves both
            owner = jnp.broadcast_to(
                jnp.arange(nb, dtype=jnp.int32)[None, :, None],
                (B, nb, suffix_len))
        valid = jnp.arange(suffix_len)[None, None, None, :] < step
        owns = owner[:, :, None, :] == jnp.arange(nb)[None, None, :, None]
        suffix_bias = jnp.where(jnp.logical_and(owns, valid), 0.0,
                                gpt2.NEG_INF).astype(jnp.float32)
        hidden, suffix = gpt2.decode_step_lineage(
            params["gpt"], emb.astype(cache_dtype), prefix, prefix_bias,
            suffix, suffix_bias, step, size, nb)
        logits = _lm_head(params, hidden[:, 0])
        state, tok, seqs, presence, suffix, anc, done = select(
            jax.random.fold_in(rng, step), logits, state, seqs, presence,
            suffix, anc, done, step)
        return step + 1, state, tok, seqs, presence, suffix, anc, done

    carry = (jnp.int32(1), state, tok, seqs, presence, suffix, anc, done)
    (step, state, tok, seqs, _, _, _, done) = jax.lax.while_loop(
        cond_fn, body_fn, carry)

    best_seq, best_len, finished = beam_lib.finalize(
        state, seqs, step, length_penalty=length_penalty, done=done)
    # banked sequences carry the stop token at position len-1; running beams
    # carry `step` valid tokens with no stop
    lengths = jnp.clip(jnp.where(finished, best_len - 1, best_len), 0, max_new)
    codes = jnp.where(jnp.arange(max_new)[None, :] < lengths[:, None],
                      best_seq, cfg.stop_mel_token)
    return DecodeResult(codes, lengths, finished)
