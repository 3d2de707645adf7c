"""Quantization quality gates at the FLAGSHIP config (24L / 1280d / 20h).

The serving tiers (int8, int4-packed, int4-shared — the bench headline runs
int4-shared + fp8 KV) each get a measured quality row vs the bf16 baseline
on one fixed batch: max |Δlogit| on the mel head, top-1 agreement, and mean
KL of the mel-head distribution.  Unit-level dequant parity lives in
test_quantization.py; THIS file is the scale gate — error propagated
through all 24 real-size layers.

Caveat (PARITY.md): weights are random init, which makes top-1 agreement
pessimistic — random logits have near-zero margins, so any perturbation
flips the argmax.  The thresholds are regression bounds calibrated to the
measured values (a scale/packing bug shifts them by orders of magnitude),
not statements about trained-weight quality.  Measured (seed 0):

  bf16 vs fp32 (noise floor): max|Δ| 0.052  top-1 0.959
  int8:        max|Δ| 0.106  top-1 0.949
  int4-packed: max|Δ| 1.44   top-1 0.286
  int4-shared: max|Δ| 1.67   top-1 0.306
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.config import GPTConfig
from indextts_tpu.models import unified_voice as uv
from indextts_tpu.ops import quantization as q

CFG = GPTConfig()  # flagship defaults

B, TT, TM = 2, 24, 48


def _mean_kl(base_logits: np.ndarray, tier_logits: np.ndarray) -> float:
    """Mean KL(base ‖ tier) of the mel-head distribution over positions."""
    a = base_logits.astype(np.float64)
    b = tier_logits.astype(np.float64)
    la = a - np.log(np.exp(a - a.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
        - a.max(-1, keepdims=True)
    lb = b - np.log(np.exp(b - b.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
        - b.max(-1, keepdims=True)
    return float((np.exp(la) * (la - lb)).sum(-1).mean())


@pytest.fixture(scope="module")
def flagship_logits():
    """bf16 baseline + per-tier mel logits on one fixed flagship batch."""
    params = jax.jit(lambda k: uv.init_params(k, CFG))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((B, 32, CFG.model_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(2, 11000, (B, TT)), jnp.int32)
    mel = jnp.asarray(rng.integers(0, 8192, (B, TM)), jnp.int32)
    tl = jnp.asarray([TT, TT - 3])
    ml = jnp.asarray([TM, TM - 5])

    fwd = jax.jit(lambda p: uv.train_forward(p, CFG, cond, text, tl, mel, ml))

    def logits(p):
        return np.asarray(fwd(p)["mel_logits"], np.float32)

    p_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    out = {"fp32": logits(params), "bf16": logits(p_bf16)}
    for name, kw in [("int8", dict(bits=8)),
                     ("int4-packed", dict(bits=4)),
                     ("int4-shared", dict(bits=4, int4_layout="shared"))]:
        qp = q.quantize_gpt_params(params, dtype=jnp.bfloat16, **kw)
        out[name] = logits(qp)
    del params, p_bf16
    return out


def _metrics(out, tier):
    base = out["bf16"]
    lg = out[tier]
    return (float(np.abs(lg - base).max()),
            float((lg.argmax(-1) == base.argmax(-1)).mean()),
            _mean_kl(base, lg))


def test_noise_floor_bf16_vs_fp32(flagship_logits):
    maxd = float(np.abs(flagship_logits["bf16"] - flagship_logits["fp32"]).max())
    top1 = float((flagship_logits["bf16"].argmax(-1)
                  == flagship_logits["fp32"].argmax(-1)).mean())
    print(f"\n[flagship] bf16-vs-fp32 floor: maxd={maxd:.4f} top1={top1:.4f}")
    assert maxd < 0.2
    assert top1 > 0.9


def test_int8_gate(flagship_logits):
    maxd, top1, kl = _metrics(flagship_logits, "int8")
    print(f"[flagship] int8: maxd={maxd:.4f} top1={top1:.4f} kl={kl:.5f}")
    # measured 0.106 / 0.949; a broken scale shows up as maxd >> 1
    assert maxd < 0.4
    assert top1 > 0.88
    assert kl < 5e-3


def test_int4_packed_gate(flagship_logits):
    maxd, top1, kl = _metrics(flagship_logits, "int4-packed")
    print(f"[flagship] int4-packed: maxd={maxd:.4f} top1={top1:.4f} kl={kl:.5f}")
    # measured 1.44 / 0.286 (see module docstring for the random-weight caveat)
    assert maxd < 4.0
    assert top1 > 0.15
    assert kl < 0.5


def test_int4_shared_gate(flagship_logits):
    maxd, top1, kl = _metrics(flagship_logits, "int4-shared")
    print(f"[flagship] int4-shared: maxd={maxd:.4f} top1={top1:.4f} kl={kl:.5f}")
    assert maxd < 4.0
    assert top1 > 0.15
    assert kl < 0.5


def test_tier_ordering(flagship_logits):
    """Coarser grids must not beat finer ones — a layout bug usually breaks
    this ordering before it breaks the absolute bounds."""
    _, t8, k8 = _metrics(flagship_logits, "int8")
    _, t4p, k4p = _metrics(flagship_logits, "int4-packed")
    _, t4s, k4s = _metrics(flagship_logits, "int4-shared")
    assert t8 > max(t4p, t4s)
    assert k8 < min(k4p, k4s)
    # grouped scales (packed) track the weights at least as well as one
    # shared scale per channel
    assert k4p <= k4s * 1.5
