"""Pallas row-permutation for the beam KV cache.

Beam search reorders the per-beam KV cache by parent every step (HF
_reorder_cache, reference gpt/model.py:207-218).  XLA lowers the axis-1
gather `cache.k[:, rows]` on a [L, N, H, T, hd] array ~12x off the
bandwidth roofline on v5e (measured: 3.2 ms vs 0.27 ms for the beam-3
flagship cache), and a one-hot einsum reads the cache nb times.  This
kernel is the roofline version: a straight double-buffered copy whose
*input* block index comes from a scalar-prefetched row vector —
out[l, n] = in[l, rows[n]].

Block = [1, 1, H, Tc, hd]: the last two dims are (Tc, hd) with Tc a
multiple of 8 (the caller pads T) and hd the full minor dim, satisfying
Mosaic's (8, 128)-divisible-or-full rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(rows_ref, k_ref, v_ref, ko_ref, vo_ref):
    del rows_ref
    ko_ref[...] = k_ref[...]
    vo_ref[...] = v_ref[...]


def permute_cache_rows(k: jnp.ndarray, v: jnp.ndarray, rows: jnp.ndarray,
                       t_chunk: int = 128, interpret: bool = False):
    """(k[:, rows], v[:, rows]) for k, v: [L, N, H, T, hd], rows: [N] int32.

    T must be a multiple of 8 (callers pad the cache length); the chunk
    size adapts down to T when T < t_chunk."""
    L, N, H, T, hd = k.shape
    while T % t_chunk:
        t_chunk //= 2
    assert t_chunk >= 1 and T % t_chunk == 0

    block = (1, 1, H, t_chunk, hd)
    in_map = lambda l, n, tc, rows_ref: (l, rows_ref[n], 0, tc, 0)
    out_map = lambda l, n, tc, rows_ref: (l, n, 0, tc, 0)

    return pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, N, T // t_chunk),
            in_specs=[
                pl.BlockSpec(block, in_map, memory_space=pltpu.VMEM),
                pl.BlockSpec(block, in_map, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(block, out_map, memory_space=pltpu.VMEM),
                pl.BlockSpec(block, out_map, memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
    )(rows.astype(jnp.int32), k, v)
