"""GPT-2 transformer trunk as a pure-functional JAX core.

Numerically equivalent to the HF ``GPT2Model`` the reference builds
(indextts/gpt/model.py:263-286: wpe nulled, wte external, gelu_new,
ln eps 1e-5) but structured TPU-first:

  * params are a pytree with all layers **stacked** on a leading axis so the
    whole trunk is one ``lax.scan`` — one compiled block instead of 24,
    much faster compile and better XLA scheduling;
  * a preallocated static-shape ring KV cache for autoregressive decode
    (replaces HF's dynamically-growing ``past_key_values``,
    gpt/model.py:125-205);
  * bf16 matmuls with fp32 accumulation (MXU-native), fp32 layernorm/softmax.

Naming of leaves mirrors the HF checkpoint layout (h.N.attn.c_attn.weight
etc. map 1:1 — see io/checkpoint.py converter).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu.ops import quantization

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class GPT2Size:
    layers: int
    dim: int
    heads: int

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """HF "gelu_new" (tanh approximation), matching GPT2's activation."""
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * jnp.power(x, 3.0))))


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm in fp32 regardless of input dtype."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def init_gpt2_params(rng: jax.Array, size: GPT2Size,
                     dtype=jnp.float32) -> Dict[str, Any]:
    """Random init matching GPT2's scheme (normal 0.02, zeros bias,
    scaled residual projections)."""
    L, D = size.layers, size.dim
    k = jax.random.split(rng, 8)
    std = 0.02
    proj_std = std / math.sqrt(2 * L)

    def nrm(key, shape, s):
        return (jax.random.normal(key, shape, jnp.float32) * s).astype(dtype)

    return {
        "blocks": {
            "ln_1": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
            "attn": {
                "qkv_w": nrm(k[0], (L, D, 3 * D), std),
                "qkv_b": jnp.zeros((L, 3 * D), dtype),
                "proj_w": nrm(k[1], (L, D, D), proj_std),
                "proj_b": jnp.zeros((L, D), dtype),
            },
            "ln_2": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
            "mlp": {
                "fc_w": nrm(k[2], (L, D, 4 * D), std),
                "fc_b": jnp.zeros((L, 4 * D), dtype),
                "proj_w": nrm(k[3], (L, 4 * D, D), proj_std),
                "proj_b": jnp.zeros((L, D), dtype),
            },
        },
        "ln_f": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }


class KVCache(NamedTuple):
    """Static-shape KV cache: k/v are [L, B, H, T_max, head_dim]."""

    k: jnp.ndarray
    v: jnp.ndarray

    @classmethod
    def zeros(cls, size: GPT2Size, batch: int, max_len: int,
              dtype=jnp.bfloat16) -> "KVCache":
        shape = (size.layers, batch, size.heads, max_len, size.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def _attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               bias: jnp.ndarray) -> jnp.ndarray:
    """q,k,v: [B, H, T, hd]; bias: additive mask broadcastable to
    [B, H, Tq, Tk].  fp32 softmax."""
    head_dim = q.shape[-1]
    # the cache may be stored narrower than the compute dtype (fp8 KV tier);
    # upcast at read — the convert fuses into the HBM read
    if k.dtype != q.dtype:
        k = k.astype(q.dtype)
    if v.dtype != q.dtype:
        v = v.astype(q.dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(head_dim) + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


# x [B,T,K] @ w [K,N] for plain / int8 / grouped-int4 / shared-scale-int4
# weights — one shared implementation so the trunk, heads and dequantize
# layouts cannot drift (ops/quantization.matmul_quant has the full story).
_mm = quantization.matmul_quant


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    B, T, D = x.shape
    return x.reshape(B, T, heads, D // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, H, T, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * hd)


def _block(hidden: jnp.ndarray, blk: Dict[str, Any], heads: int,
           attend) -> jnp.ndarray:
    """One transformer block; `attend` maps (q, k, v) -> context and closes
    over masks/caches."""
    x = layer_norm(hidden, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
    qkv = _mm(x, blk["attn"]["qkv_w"]) + blk["attn"]["qkv_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ctx = attend(_split_heads(q, heads), _split_heads(k, heads),
                 _split_heads(v, heads))
    proj = _mm(_merge_heads(ctx), blk["attn"]["proj_w"])
    hidden = hidden + proj + blk["attn"]["proj_b"].astype(x.dtype)

    x = layer_norm(hidden, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
    h = gelu_new(_mm(x, blk["mlp"]["fc_w"]) + blk["mlp"]["fc_b"].astype(x.dtype))
    h2 = _mm(h, blk["mlp"]["proj_w"])
    return hidden + h2 + blk["mlp"]["proj_b"].astype(x.dtype)


def forward(params: Dict[str, Any], hidden: jnp.ndarray,
            attention_mask: Optional[jnp.ndarray], size: GPT2Size,
            remat: bool = False) -> jnp.ndarray:
    """Full (teacher-forced) forward. hidden: [B, T, D] input embeddings;
    attention_mask: [B, T] with 1=valid, 0=pad (may be None).
    Returns ln_f(hidden_states): [B, T, D]."""
    B, T, _ = hidden.shape
    causal = jnp.tril(jnp.ones((T, T), bool))
    allow = causal[None, None, :, :]
    if attention_mask is not None:
        allow = jnp.logical_and(allow, attention_mask[:, None, None, :].astype(bool))
    bias = jnp.where(allow, 0.0, NEG_INF).astype(jnp.float32)

    def attend(q, k, v):
        return _attention(q, k, v, bias)

    def body(h, blk):
        return _block(h, blk, size.heads, attend), None

    if remat:
        body = jax.checkpoint(body)
    hidden, _ = jax.lax.scan(body, hidden, params["blocks"])
    return layer_norm(hidden, params["ln_f"]["scale"], params["ln_f"]["bias"])


def prefill(params: Dict[str, Any], hidden: jnp.ndarray,
            attention_mask: jnp.ndarray, size: GPT2Size,
            cache_len: int, kv_dtype=None) -> Tuple[jnp.ndarray, KVCache]:
    """Process the prompt and build the KV cache.

    hidden: [B, T, D]; attention_mask: [B, T].  The cache is allocated at
    `cache_len` (static) with the first T slots filled, stored as
    `kv_dtype` (default: the compute dtype; pass jnp.float8_e4m3fn for the
    half-traffic fp8 KV tier).
    Returns (ln_f output [B, T, D], cache).
    """
    B, T, _ = hidden.shape
    causal = jnp.tril(jnp.ones((T, T), bool))
    allow = jnp.logical_and(causal[None, None], attention_mask[:, None, None, :].astype(bool))
    bias = jnp.where(allow, 0.0, NEG_INF).astype(jnp.float32)

    def body(h, blk):
        kv_out = {}

        def attend(q, k, v):
            kv_out["k"], kv_out["v"] = k, v
            return _attention(q, k, v, bias)

        h = _block(h, blk, size.heads, attend)
        pad = cache_len - T
        k = jnp.pad(kv_out["k"], ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(kv_out["v"], ((0, 0), (0, 0), (0, pad), (0, 0)))
        if kv_dtype is not None:
            k, v = k.astype(kv_dtype), v.astype(kv_dtype)
        return h, (k, v)

    hidden, (ks, vs) = jax.lax.scan(body, hidden, params["blocks"])
    out = layer_norm(hidden, params["ln_f"]["scale"], params["ln_f"]["bias"])
    return out, KVCache(ks, vs)


def decode_step_rows(params: Dict[str, Any], hidden: jnp.ndarray,
                     cache: KVCache, positions: jnp.ndarray,
                     attention_mask: jnp.ndarray,
                     size: GPT2Size) -> Tuple[jnp.ndarray, KVCache]:
    """Single-token incremental forward with **per-row** cache positions —
    the primitive for continuous batching, where every slot sits at a
    different sequence offset.

    hidden: [B, 1, D]; positions: [B] int32 write slots;
    attention_mask: [B, cache_len] (must already include `positions`).
    """
    B = hidden.shape[0]
    bias = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0,
                     NEG_INF).astype(jnp.float32)
    rows = jnp.arange(B)

    def body(l, carry):
        h, k_all, v_all = carry
        blk = jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(
            x, l, axis=0, keepdims=False), params["blocks"])

        def attend(q, k, v):
            # batched scatter: row b writes its K/V at positions[b]
            kc = k_all.at[l, rows, :, positions, :].set(
                k[:, :, 0, :].astype(k_all.dtype))
            vc = v_all.at[l, rows, :, positions, :].set(
                v[:, :, 0, :].astype(v_all.dtype))
            attend.cache = (kc, vc)
            k_l = jax.lax.dynamic_index_in_dim(kc, l, axis=0, keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(vc, l, axis=0, keepdims=False)
            return _attention(q, k_l, v_l, bias)

        h = _block(h, blk, size.heads, attend)
        k_all, v_all = attend.cache
        return h, k_all, v_all

    hidden, ks, vs = jax.lax.fori_loop(
        0, size.layers, body, (hidden, cache.k, cache.v))
    out = layer_norm(hidden, params["ln_f"]["scale"], params["ln_f"]["bias"])
    return out, KVCache(ks, vs)


def decode_step_rows_flat(params: Dict[str, Any], hidden: jnp.ndarray,
                          k_all: jnp.ndarray, v_all: jnp.ndarray,
                          positions: jnp.ndarray,
                          attention_mask: jnp.ndarray,
                          size: GPT2Size,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`decode_step_rows` over the FLAT pool cache [L, S, T, D] (D = H·hd
    head-major — the natural qkv layout).  The flat layout is the fused
    pool-trunk kernel's (ops/pallas/pool_trunk.py) native layout, and this
    XLA variant is its parity oracle; the XLA per-layer path materializes
    the layer slice, the fp8 upcast AND the score contraction's K-transpose
    in HBM — measured 11.2 ms of a 12.8 ms 64-slot step, 6.4× the cache's
    DMA floor (r4 ablation).

    hidden: [S, 1, D]; positions: [S] write slots; attention_mask: [S, T]
    (must already include `positions`).  Returns (ln_f out, k_all', v_all').
    """
    S = hidden.shape[0]
    T = k_all.shape[2]
    rows = jnp.arange(S)
    bias = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0,
                     NEG_INF).astype(jnp.float32)

    def body(l, carry):
        h, k_all, v_all = carry
        blk = jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(
            x, l, axis=0, keepdims=False), params["blocks"])
        x = layer_norm(h, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
        qkv = _mm(x, blk["attn"]["qkv_w"]) + blk["attn"]["qkv_b"].astype(x.dtype)
        q, k, v = jnp.split(qkv[:, 0, :], 3, axis=-1)            # [S, D] each
        k_all = k_all.at[l, rows, positions, :].set(k.astype(k_all.dtype))
        v_all = v_all.at[l, rows, positions, :].set(v.astype(v_all.dtype))
        k_l = jax.lax.dynamic_index_in_dim(k_all, l, axis=0,
                                           keepdims=False)
        v_l = jax.lax.dynamic_index_in_dim(v_all, l, axis=0,
                                           keepdims=False)
        kr = k_l.reshape(S, T, size.heads, size.head_dim).transpose(
            0, 2, 1, 3).astype(q.dtype)
        vr = v_l.reshape(S, T, size.heads, size.head_dim).transpose(
            0, 2, 1, 3).astype(q.dtype)
        qh = q.reshape(S, size.heads, 1, size.head_dim)
        ctx = _merge_heads(_attention(qh, kr, vr, bias))[:, 0, :]
        proj = _mm(ctx[:, None, :].astype(x.dtype), blk["attn"]["proj_w"])
        h = h + proj + blk["attn"]["proj_b"].astype(x.dtype)
        x = layer_norm(h, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
        m = gelu_new(_mm(x, blk["mlp"]["fc_w"]) + blk["mlp"]["fc_b"].astype(x.dtype))
        h = h + _mm(m, blk["mlp"]["proj_w"]) + blk["mlp"]["proj_b"].astype(x.dtype)
        return h, k_all, v_all

    hidden, ks, vs = jax.lax.fori_loop(
        0, size.layers, body, (hidden, k_all, v_all))
    out = layer_norm(hidden, params["ln_f"]["scale"], params["ln_f"]["bias"])
    return out, ks, vs


def flatten_rows_cache(cache: KVCache) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[L, B, H, T, hd] → flat [L, B, T, H·hd] (head-major per position)."""
    L, B, H, T, hd = cache.k.shape
    k = cache.k.transpose(0, 1, 3, 2, 4).reshape(L, B, T, H * hd)
    v = cache.v.transpose(0, 1, 3, 2, 4).reshape(L, B, T, H * hd)
    return k, v


def decode_step_lineage(params: Dict[str, Any], hidden: jnp.ndarray,
                        prefix: KVCache, prefix_bias: jnp.ndarray,
                        suffix: KVCache, suffix_bias: jnp.ndarray,
                        step: jnp.ndarray, size: GPT2Size,
                        nb: int) -> Tuple[jnp.ndarray, KVCache]:
    """Beam decode step with NO physical cache reorder.

    The classic beam-parent cache permutation (HF _reorder_cache,
    gpt/model.py:207-218) costs a full suffix copy per step — measured
    2.7 ms/step on v5e at the flagship beam-3 shape, dominating the decode.
    Instead, every row keeps the K/V it generated IN PLACE, and each beam
    carries an ancestry map anc[b, i, s] = physical row that owns slot s in
    beam i's lineage.  Attention runs over ALL nb rows' suffixes with the
    additive `suffix_bias` [B, nb_q, nb_kv, Sc] encoding
    (anc match AND s < step) — nb× the score FLOPs (trivial: the MXU is
    idle during decode) for zero gather traffic; the suffix K/V is still
    read exactly once per step.

    hidden: [B*nb, 1, D]; this token's K/V is written at suffix slot
    step-1 of the row's OWN suffix.  Returns (ln_f out, updated suffix).
    """
    Bnb = hidden.shape[0]
    B = Bnb // nb
    Sc = suffix.max_len
    sb = suffix_bias[:, :, :, None, :]  # [B, nbq, nbk, 1, Sc] (broadcast H)

    def body(l, carry):
        h, k_all, v_all = carry
        blk = jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(
            x, l, axis=0, keepdims=False), params["blocks"])

        def attend(q, k, v):
            # q,k,v: [B*nb, H, 1, d]
            kc = jax.lax.dynamic_update_slice(
                k_all, k.astype(k_all.dtype)[None], (l, 0, 0, step - 1, 0))
            vc = jax.lax.dynamic_update_slice(
                v_all, v.astype(v_all.dtype)[None], (l, 0, 0, step - 1, 0))
            attend.cache = (kc, vc)
            kp = jax.lax.dynamic_index_in_dim(prefix.k, l, axis=0, keepdims=False)
            vp = jax.lax.dynamic_index_in_dim(prefix.v, l, axis=0, keepdims=False)
            ks = jax.lax.dynamic_index_in_dim(kc, l, axis=0, keepdims=False)
            vs = jax.lax.dynamic_index_in_dim(vc, l, axis=0, keepdims=False)
            H = q.shape[1]
            qh = q[:, :, 0, :].reshape(B, nb, H, q.shape[3])     # [B,nb,H,d]
            if kp.dtype != q.dtype:
                kp, vp = kp.astype(q.dtype), vp.astype(q.dtype)
            if ks.dtype != q.dtype:
                ks, vs = ks.astype(q.dtype), vs.astype(q.dtype)
            ksr = ks.reshape(B, nb, H, Sc, ks.shape[-1])         # [B,nbk,H,Sc,d]
            vsr = vs.reshape(B, nb, H, Sc, vs.shape[-1])
            scale = 1.0 / math.sqrt(size.head_dim)
            sp = jnp.einsum("bnhd,bhpd->bnhp", qh, kp,
                            preferred_element_type=jnp.float32) * scale
            sp = sp + prefix_bias                                 # [B,1,1,Pc]
            ss = jnp.einsum("bnhd,bmhsd->bnmhs", qh, ksr,
                            preferred_element_type=jnp.float32) * scale
            ss = ss + sb                                          # lineage mask
            Pc = sp.shape[-1]
            flat = jnp.concatenate(
                [sp, ss.transpose(0, 1, 3, 2, 4).reshape(B, nb, H, nb * Sc)],
                axis=-1)
            probs = jax.nn.softmax(flat.astype(jnp.float32), axis=-1)
            pp = probs[..., :Pc]
            ps = probs[..., Pc:].reshape(B, nb, H, nb, Sc)
            ctx = (jnp.einsum("bnhp,bhpd->bnhd", pp.astype(vp.dtype), vp,
                              preferred_element_type=jnp.float32)
                   + jnp.einsum("bnhms,bmhsd->bnhd", ps.astype(vsr.dtype), vsr,
                                preferred_element_type=jnp.float32))
            return ctx.reshape(Bnb, H, 1, size.head_dim).astype(v.dtype)

        h = _block(h, blk, size.heads, attend)
        k_all, v_all = attend.cache
        return h, k_all, v_all

    hidden, ks, vs = jax.lax.fori_loop(
        0, size.layers, body, (hidden, suffix.k, suffix.v))
    out = layer_norm(hidden, params["ln_f"]["scale"], params["ln_f"]["bias"])
    return out, KVCache(ks, vs)


def decode_step_lineage_rows(params: Dict[str, Any], hidden: jnp.ndarray,
                             prefix: KVCache, prefix_bias: jnp.ndarray,
                             suffix: KVCache, suffix_bias: jnp.ndarray,
                             positions: jnp.ndarray, size: GPT2Size,
                             nb: int) -> Tuple[jnp.ndarray, KVCache]:
    """`decode_step_lineage` with PER-ROW suffix write positions — the beam
    primitive for the continuous pool, where every beam GROUP sits at its
    own sequence offset (serve/beam_pool.py).  The attention math (prefix
    scores + lineage-masked all-rows suffix scores, concatenated in that
    order before one softmax) is identical op-for-op to
    `decode_step_lineage`, so a pool group's step is bit-equal to the
    dedicated `inference_speech_beam` step in fp32.

    hidden: [B*nb, 1, D]; positions: [B*nb] int32 — each row's K/V is
    scattered at its own suffix slot (out-of-range rows, e.g. frozen
    groups parked at Sc, are dropped).  Returns (ln_f out, suffix')."""
    Bnb = hidden.shape[0]
    B = Bnb // nb
    Sc = suffix.max_len
    rows = jnp.arange(Bnb)
    sb = suffix_bias[:, :, :, None, :]  # [B, nbq, nbk, 1, Sc] (broadcast H)

    def body(l, carry):
        h, k_all, v_all = carry
        blk = jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(
            x, l, axis=0, keepdims=False), params["blocks"])

        def attend(q, k, v):
            # q,k,v: [B*nb, H, 1, d]; row b writes at positions[b]
            kc = k_all.at[l, rows, :, positions, :].set(
                k[:, :, 0, :].astype(k_all.dtype), mode="drop")
            vc = v_all.at[l, rows, :, positions, :].set(
                v[:, :, 0, :].astype(v_all.dtype), mode="drop")
            attend.cache = (kc, vc)
            kp = jax.lax.dynamic_index_in_dim(prefix.k, l, axis=0, keepdims=False)
            vp = jax.lax.dynamic_index_in_dim(prefix.v, l, axis=0, keepdims=False)
            ks = jax.lax.dynamic_index_in_dim(kc, l, axis=0, keepdims=False)
            vs = jax.lax.dynamic_index_in_dim(vc, l, axis=0, keepdims=False)
            H = q.shape[1]
            qh = q[:, :, 0, :].reshape(B, nb, H, q.shape[3])     # [B,nb,H,d]
            if kp.dtype != q.dtype:
                kp, vp = kp.astype(q.dtype), vp.astype(q.dtype)
            if ks.dtype != q.dtype:
                ks, vs = ks.astype(q.dtype), vs.astype(q.dtype)
            ksr = ks.reshape(B, nb, H, Sc, ks.shape[-1])         # [B,nbk,H,Sc,d]
            vsr = vs.reshape(B, nb, H, Sc, vs.shape[-1])
            scale = 1.0 / math.sqrt(size.head_dim)
            sp = jnp.einsum("bnhd,bhpd->bnhp", qh, kp,
                            preferred_element_type=jnp.float32) * scale
            sp = sp + prefix_bias                                 # [B,1,1,Pc]
            ss = jnp.einsum("bnhd,bmhsd->bnmhs", qh, ksr,
                            preferred_element_type=jnp.float32) * scale
            ss = ss + sb                                          # lineage mask
            Pc = sp.shape[-1]
            flat = jnp.concatenate(
                [sp, ss.transpose(0, 1, 3, 2, 4).reshape(B, nb, H, nb * Sc)],
                axis=-1)
            probs = jax.nn.softmax(flat.astype(jnp.float32), axis=-1)
            pp = probs[..., :Pc]
            ps = probs[..., Pc:].reshape(B, nb, H, nb, Sc)
            ctx = (jnp.einsum("bnhp,bhpd->bnhd", pp.astype(vp.dtype), vp,
                              preferred_element_type=jnp.float32)
                   + jnp.einsum("bnhms,bmhsd->bnhd", ps.astype(vsr.dtype), vsr,
                                preferred_element_type=jnp.float32))
            return ctx.reshape(Bnb, H, 1, size.head_dim).astype(v.dtype)

        h = _block(h, blk, size.heads, attend)
        k_all, v_all = attend.cache
        return h, k_all, v_all

    hidden, ks, vs = jax.lax.fori_loop(
        0, size.layers, body, (hidden, suffix.k, suffix.v))
    out = layer_norm(hidden, params["ln_f"]["scale"], params["ln_f"]["bias"])
    return out, KVCache(ks, vs)


def decode_step(params: Dict[str, Any], hidden: jnp.ndarray, cache: KVCache,
                position: jnp.ndarray, attention_mask: jnp.ndarray,
                size: GPT2Size) -> Tuple[jnp.ndarray, KVCache]:
    """Single-token incremental forward.

    hidden: [B, 1, D] embedding of the current token;
    position: scalar int32 — the slot this token's K/V occupies;
    attention_mask: [B, cache_len] with 1 for every valid slot **including**
    `position` itself.
    Returns (ln_f output [B, 1, D], updated cache).

    Implementation note: a fori_loop with dynamic_update_slice into the full
    [L, ...] cache (instead of a scan stacking new per-layer caches) lets
    XLA keep the cache buffers in place across the loop — the decode step is
    bandwidth-bound and the cache is its second-largest traffic source after
    the weights.
    """
    bias = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0,
                     NEG_INF).astype(jnp.float32)

    def body(l, carry):
        h, k_all, v_all = carry
        blk = jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(
            x, l, axis=0, keepdims=False), params["blocks"])

        def attend(q, k, v):
            kc = jax.lax.dynamic_update_slice(
                k_all, k.astype(k_all.dtype)[None], (l, 0, 0, position, 0))
            vc = jax.lax.dynamic_update_slice(
                v_all, v.astype(v_all.dtype)[None], (l, 0, 0, position, 0))
            attend.cache = (kc, vc)
            k_l = jax.lax.dynamic_index_in_dim(kc, l, axis=0, keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(vc, l, axis=0, keepdims=False)
            return _attention(q, k_l, v_l, bias)

        h = _block(h, blk, size.heads, attend)
        k_all, v_all = attend.cache
        return h, k_all, v_all

    hidden, ks, vs = jax.lax.fori_loop(
        0, size.layers, body, (hidden, cache.k, cache.v))
    out = layer_norm(hidden, params["ln_f"]["scale"], params["ln_f"]["bias"])
    return out, KVCache(ks, vs)
