"""Tracing / profiling utilities.

Rebuild of the reference's observability layer (SURVEY.md §5): wall-clock
phase timers + RTF accounting (infer.py:639-641,764-766) plus what the
reference lacks — jax.profiler device traces viewable in TensorBoard/
Perfetto (`INDEXTTS_TRACE_DIR=... python ...` or the context manager).
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@dataclass
class PhaseTimer:
    """Accumulating named phase timer; RTF = total / audio seconds."""

    phases: Dict[str, float] = field(default_factory=dict)
    _start: Dict[str, float] = field(default_factory=dict)
    wall_start: float = field(default_factory=time.perf_counter)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def total(self) -> float:
        return time.perf_counter() - self.wall_start

    def rtf(self, audio_seconds: float) -> float:
        return self.total() / max(audio_seconds, 1e-9)

    def report(self, audio_seconds: Optional[float] = None) -> str:
        parts = [f"total {self.total():.2f}s"]
        if audio_seconds:
            parts.append(f"RTF {self.rtf(audio_seconds):.4f}")
        parts += [f"{k} {v:.2f}s" for k, v in self.phases.items()]
        return "  ".join(parts)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard profile plugin or
    Perfetto).  Enabled when log_dir is given or INDEXTTS_TRACE_DIR is set."""
    log_dir = log_dir or os.environ.get("INDEXTTS_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
