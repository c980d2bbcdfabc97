"""Profiling helpers (SURVEY.md §5.1).

The reference logs four wall-clock buckets per 500 steps
(`model/nerf_training.py:229-235, 472-477`); the trainer here keeps the
same structured buckets (ray_sample / render_opt / log).  For deep
dives this module wraps ``jax.profiler`` trace capture:

    with trace_steps("/tmp/tb"):
        ... run steps ...

and exposes a tiny wall-clock bucket accumulator for host-side phases.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict


@contextlib.contextmanager
def trace_steps(logdir: str):
    """Capture an XLA/TPU trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Buckets:
    """Accumulating wall-clock buckets (the reference's time_log dict)."""

    def __init__(self, *names: str):
        self.t: Dict[str, float] = {n: 0.0 for n in names}
        self._last = time.perf_counter()

    def tick(self, name: str) -> None:
        now = time.perf_counter()
        self.t[name] = self.t.get(name, 0.0) + (now - self._last)
        self._last = now

    def reset_clock(self) -> None:
        self._last = time.perf_counter()

    def summary(self) -> str:
        return " ".join(f"{k}:{v:.1f}s" for k, v in self.t.items())
