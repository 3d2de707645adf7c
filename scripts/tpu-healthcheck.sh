#!/usr/bin/env bash
# TPU availability probe (replaces scripts/gpu-healthcheck.sh's nvidia-smi +
# torch.cuda probe with a jax.devices check).  Exit 0 = healthy.
set -euo pipefail
python - <<'EOF'
import sys
try:
    import jax
    devs = jax.devices()
    ok = len(devs) > 0
    # tiny compute probe — a registered-but-dead backend fails here
    import jax.numpy as jnp
    x = jnp.ones((8, 8))
    val = float((x @ x).sum())
    assert val == 512.0, val
    print(f"healthy: {len(devs)} device(s): {[str(d) for d in devs]}")
    sys.exit(0)
except Exception as e:
    print(f"unhealthy: {type(e).__name__}: {e}", file=sys.stderr)
    sys.exit(1)
EOF
