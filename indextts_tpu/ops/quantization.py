"""Weight-only quantization tiers (int8 / packed int4).

Capability rebuild of the reference's bitsandbytes path
(indextts/infer.py:50-182,317-353): the GPT trunk + text/mel head weights
are quantised per-output-channel to an int grid.

int8 is stored as ``{"q": int8 [.., K, N], "s": fp32 [.., 1, N]}``.  The
matmul helpers (models/gpt2._mm, models/unified_voice._head_mm) dequantise
inside the einsum, so XLA fuses the convert into the operand load and HBM
traffic on the bandwidth-bound decode path drops ~2× vs bf16.

int4 is **nibble-packed**: two int4 values per int8 byte, halving the
weight bytes again.  Packing pairs row ``k`` with row ``k + K/2`` within
each contraction group (low nibble = first half), so consumers unpack with
two sign-extending shifts and contract each half with the matching half of
the activation — no interleave/reshape anywhere, which keeps the layout
legal for the Pallas decode kernel (lane↔sublane reshapes crash Mosaic).
Format: ``{"q4": int8 [.., K/2, N], "s": fp32 [.., 2·G, N]}`` where G is
the number of contraction groups (1 for plain matrices; the fused decode
kernel streams the MLP down-projection in K-chunks, so its G equals the
chunk count and each chunk packs/scales independently — finer groups also
mean better int4 accuracy).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

# K-chunk count of the fused decode kernel's MLP down-projection stream
# (ops/pallas/decode_layer.py `n_chunks`); the int4 packing of `mlp.proj_w`
# must group by the same chunking.
MLP_PROJ_GROUPS = 4


def quantize_int(w: jnp.ndarray, bits: int = 8,
                 reduce_axes: Sequence[int] = (-2,)) -> Dict[str, jnp.ndarray]:
    """Symmetric quantisation with per-channel scales; `reduce_axes` are the
    contraction dims (absorbed into the scale)."""
    qmax = 2 ** (bits - 1) - 1
    reduce_axes = tuple(a % w.ndim for a in reduce_axes)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / qmax
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -qmax - 1, qmax)
    return {"q": q.astype(jnp.int8), "s": scale.astype(jnp.float32)}


def quantize_int4_packed(w: jnp.ndarray, k_axis: int = -2,
                         groups: int = 1) -> Dict[str, jnp.ndarray]:
    """Pack `w` [.., K, N] to {"q4": [.., K/2, N], "s": [.., 2·groups, N]}.

    K is split into `groups` contiguous chunks; within each chunk the first
    half is quantised into low nibbles and the second half into high
    nibbles of the same byte.  Each (chunk, half) gets its own per-output-
    channel scale — scale row ``2·g + half``.
    """
    k_axis = k_axis % w.ndim
    # move K to axis -2 canonical position for the packing math
    assert k_axis == w.ndim - 2, "pack along the contraction (second-minor) axis"
    K, N = w.shape[-2], w.shape[-1]
    assert K % (2 * groups) == 0, (K, groups)
    chunk = K // groups
    half = chunk // 2
    lead = w.shape[:-2]
    wg = w.reshape(lead + (groups, 2, half, N))  # (g, half, j) row order
    qmax = 7.0
    amax = jnp.max(jnp.abs(wg.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / qmax               # [.., G, 2, 1, N]
    q = jnp.clip(jnp.round(wg.astype(jnp.float32) / scale), -8, 7).astype(jnp.int8)
    lo = q[..., :, 0, :, :]                                # [.., G, half, N]
    hi = q[..., :, 1, :, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0x0F),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    q4 = packed.reshape(lead + (K // 2, N))
    s = scale[..., 0, :].reshape(lead + (2 * groups, N))   # row 2g+half
    return {"q4": q4, "s": s.astype(jnp.float32)}


def quantize_int4_shared(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Pack `w` [.., K, N] to {"q4s": int8 [.., K/2, N], "s": [.., 1, N]}.

    ONE per-output-channel scale over the full K (vs `quantize_int4_packed`'s
    per-(group, half) scales): rows [0, K/2) go to low nibbles, [K/2, K) to
    high, both sharing the scale — so the in-program nativization
    (`nativize_int4`) reassembles a single [K, N] native-int4 operand and
    the matmul is ONE dot.  This is the batched-decode layout: measured on
    v5e at B=8/T=288, native-int4 steps run 1.93 ms vs 2.23 int8 vs 2.44 for
    the manual per-step shift-unpack (which cancels int4's bandwidth win);
    splitting the dot per scale row (per-half scales) measured 2.68 ms, so
    the batched tier trades the finer grid for the single-dot form.  The
    fused B=1 Pallas kernel keeps the finer `quantize_int4_packed` layout."""
    K = w.shape[-2]
    assert K % 2 == 0, K
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -8, 7).astype(jnp.int8)
    lo = q[..., : K // 2, :]
    hi = q[..., K // 2 :, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0x0F),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return {"q4s": packed, "s": scale.astype(jnp.float32)}


def nativize_int4(tree):
    """Convert every {"q4s", "s"} leaf-dict to {"q4n": jnp.int4 [.., K, N],
    "s"} — call at the TOP of a jitted decode program, so the conversion
    happens once (hoisted out of the decode loop) and every step reads the
    sub-byte native layout with XLA's cheap int4→bf16 convert instead of
    re-running the shift-unpack.  Native int4 arrays cannot cross the host
    boundary on the axon backend (device_put layout recursion), which is why
    params are SHIPPED as int8-packed bytes and nativized in-program."""
    if isinstance(tree, dict):
        if "q4s" in tree:
            lo, hi = unpack_int4(tree["q4s"])
            return {"q4n": jnp.concatenate([lo, hi], axis=-2).astype(jnp.int4),
                    "s": tree["s"]}
        return {k: nativize_int4(v) for k, v in tree.items()}
    return tree


def matmul_quant(x: jnp.ndarray, w) -> jnp.ndarray:
    """x [..., K] @ w [K, N] for every weight form this framework ships.

    `w` may be a plain array, an int8 weight-only dict {"q": int8 [K,N],
    "s": fp32 [1,N]}, a grouped nibble-packed int4 dict {"q4": int8 [K/2,N],
    "s": fp32 [2G,N]} (quantize_int4_packed), or a shared-scale int4 dict —
    {"q4n": jnp.int4 [K,N]} in-program native, {"q4s": int8 [K/2,N]} its
    transfer-safe shipped form, unpacked here once per program
    (quantize_int4_shared; decode loops nativize at the top instead, see
    nativize_int4).

    With per-output-channel scales, (x @ q)·s ≡ x @ (q·s) — scaling the
    [..., N] *output* instead of the [K,N] weights keeps HBM traffic at the
    quantised width and avoids a full-weight-matrix multiply (the decode
    loop is weight-bandwidth-bound).  The grouped int4 path contracts each
    (group, nibble-half) slice of x against the matching unpacked half —
    2G small dots, still reading K/2 bytes.  This is THE quantised-matmul
    implementation: gpt2._mm and unified_voice._head_mm alias it so the
    trunk, head, and dequantize layouts cannot drift apart."""
    if not isinstance(w, dict):
        return jnp.einsum("...k,kn->...n", x, w,
                          preferred_element_type=jnp.float32).astype(x.dtype)
    if "q4n" in w:
        y = jnp.einsum("...k,kn->...n", x, w["q4n"].astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return (y * w["s"].astype(jnp.float32)).astype(x.dtype)
    if "q4s" in w:
        lo, hi = unpack_int4(w["q4s"])
        wn = jnp.concatenate([lo, hi], axis=-2)
        y = jnp.einsum("...k,kn->...n", x, wn.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return (y * w["s"].astype(jnp.float32)).astype(x.dtype)
    if "q4" in w:
        Kh, N = w["q4"].shape
        G = w["s"].shape[0] // 2
        half = Kh // G
        lo, hi = unpack_int4(w["q4"])           # [Kh, N] halves, row (g, j)
        lo = lo.reshape(G, half, N)
        hi = hi.reshape(G, half, N)
        xg = x.reshape(x.shape[:-1] + (G, 2, half))  # row order (g, half, j)
        s = w["s"].reshape(G, 2, N).astype(jnp.float32)
        y = 0.0
        for g in range(G):
            y = y + jnp.einsum("...k,kn->...n", xg[..., g, 0, :],
                               lo[g].astype(x.dtype),
                               preferred_element_type=jnp.float32) * s[g, 0]
            y = y + jnp.einsum("...k,kn->...n", xg[..., g, 1, :],
                               hi[g].astype(x.dtype),
                               preferred_element_type=jnp.float32) * s[g, 1]
        return y.astype(x.dtype)
    y = jnp.einsum("...k,kn->...n", x, w["q"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y * w["s"].astype(jnp.float32)).astype(x.dtype)


def unpack_int4(q4: jnp.ndarray) -> jnp.ndarray:
    """[.., K/2, N] packed → (lo, hi) int8 halves in [-8, 7] (no reorder)."""
    q32 = q4.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(q32, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(q32, 24), 28)
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def dequantize(qw: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    if "q4n" in qw:
        return (qw["q4n"].astype(jnp.float32) * qw["s"]).astype(dtype)
    if "q4s" in qw:
        lo, hi = unpack_int4(qw["q4s"])
        w = jnp.concatenate([lo, hi], axis=-2)
        return (w.astype(jnp.float32) * qw["s"]).astype(dtype)
    if "q4" in qw:
        lo, hi = unpack_int4(qw["q4"])
        Kh, N = qw["q4"].shape[-2], qw["q4"].shape[-1]
        lead = qw["q4"].shape[:-2]
        G = qw["s"].shape[-2] // 2
        half = Kh // G
        s = qw["s"].reshape(lead + (G, 2, 1, N)).astype(jnp.float32)
        w = jnp.stack([lo.reshape(lead + (G, half, N)),
                       hi.reshape(lead + (G, half, N))], axis=-3)
        return (w.astype(jnp.float32) * s).reshape(lead + (2 * Kh, N)).astype(dtype)
    return (qw["q"].astype(jnp.float32) * qw["s"]).astype(dtype)


def quantize_gpt_params(params: Dict[str, Any], bits: int = 8,
                        dtype=jnp.bfloat16,
                        int4_layout: str = "fused") -> Dict[str, Any]:
    """Quantise the trunk + head matrices (the reference quantises `gpt`,
    `text_head`, `mel_head` Linears, infer.py:324-330).  Trunk weights are
    stacked [L, K, N] → int8 scale [L, 1, N] / int4 scale [L, 2G, N];
    heads [K, N] → [1, N] / [2, N].

    ``int4_layout`` (bits=4 only): "fused" = per-(group, half) scales +
    MLP-chunk grouping, the layout the B=1 Pallas decode kernel streams;
    "shared" = one scale per output channel (`quantize_int4_shared`), the
    layout batched XLA decode nativizes to jnp.int4 in-program."""
    out = jax.tree.map(lambda x: x, params)
    blocks = out["gpt"]["blocks"]
    attn = dict(blocks["attn"])
    mlp = dict(blocks["mlp"])
    for group, leaf in (("attn", "qkv_w"), ("attn", "proj_w"),
                        ("mlp", "fc_w"), ("mlp", "proj_w")):
        tgt = attn if group == "attn" else mlp
        if bits == 4 and int4_layout == "shared":
            tgt[leaf] = quantize_int4_shared(tgt[leaf])
        elif bits == 4:
            g = MLP_PROJ_GROUPS if (group, leaf) == ("mlp", "proj_w") else 1
            tgt[leaf] = quantize_int4_packed(tgt[leaf], k_axis=1, groups=g)
        else:
            tgt[leaf] = quantize_int(tgt[leaf], bits, reduce_axes=(1,))
    out["gpt"] = {**out["gpt"],
                  "blocks": {**blocks, "attn": attn, "mlp": mlp}}
    for head in ("text_head", "mel_head"):
        if head in out:
            k = out[head]["kernel"]
            if bits == 4 and int4_layout == "shared":
                qk = quantize_int4_shared(k)
            elif bits == 4:
                qk = quantize_int4_packed(k, k_axis=0, groups=1)
            else:
                qk = quantize_int(k, bits, reduce_axes=(0,))
            out[head] = {**out[head], "kernel": qk}
    return out
