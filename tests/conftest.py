"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4).

The deployment image registers the TPU backend from sitecustomize at
interpreter start (jax is already imported before pytest collects), so the
platform must be switched via jax.config — env vars alone are too late.

Memory-map hygiene (the r4 "suite segfaults at 244/259" root cause): one
pytest process compiles every module's XLA-CPU programs, and each loaded
executable maps MANY small JIT code pages (measured ~250 maps/test,
64,262 maps in the last sample before the crash — vm.max_map_count
defaults to 65,530).  When the next executable load's mmap() fails, XLA's
loader segfaults (observed in both backend_compile_and_load and the
compilation-cache deserialize path; the same test passes in isolation
because a fresh process starts at ~450 maps).  Two independent fixes:

  * raise vm.max_map_count when privileged (best-effort);
  * drop each module's compiled executables once its tests finish —
    jax.clear_caches() releases the JIT code maps (measured 881 → 463
    maps after clearing 10 scan programs).  Cross-module recompiles are
    cheap (tiny CPU test models) next to a dead suite.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compile cache for the suite: the beam-pool and vocoder-GAN
# programs cold-compile for minutes on this 1-core box; a warm cache makes
# reruns start fast AND routinely exercises the executable-deserialize path
# (one of the two crash sites of the map-exhaustion bug below)
_cache = os.path.expanduser("~/.cache/jax_tests")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

try:  # privileged images only; the per-module clear below works everywhere
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 262144:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("1048576")
except OSError:
    pass


def pytest_runtest_teardown(item, nextitem):
    mod = getattr(item, "module", None)
    next_mod = getattr(nextitem, "module", None) if nextitem is not None else None
    if mod is not None and mod is not next_mod:
        # last test of this module: drop its compiled executables so the
        # process's JIT code maps don't accumulate across 30+ modules
        jax.clear_caches()
