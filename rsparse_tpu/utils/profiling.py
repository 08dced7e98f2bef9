"""Tracing / profiling / metrics (SURVEY.md §5: absent in the reference).

Two layers:
  - `phase_timer(name, nnz=...)`: lightweight wall-clock phase counters
    (symbolic / factor / solve), aggregated into a process-global metrics
    registry with nnz/s throughput where a work size is provided. Timed
    regions that end in device work should pass `barrier=` a callable that
    forces a value readback — on the tunneled TPU runtime,
    `block_until_ready` alone does not guarantee execution completed.
  - `profile_trace(logdir)`: context manager around `jax.profiler.trace`
    for full XLA/TPU traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Callable, Dict, Optional

__all__ = ["phase_timer", "profile_trace", "get_metrics", "reset_metrics"]


class _Phase:
    __slots__ = ("calls", "seconds", "work")

    def __init__(self):
        self.calls = 0
        self.seconds = 0.0
        self.work = 0  # nnz or flops attributed to the phase


_registry: Dict[str, _Phase] = collections.defaultdict(_Phase)


@contextlib.contextmanager
def phase_timer(name: str, nnz: int = 0, barrier: Optional[Callable] = None):
    """Time a phase; `barrier()` (if given) runs inside the timed region to
    force completion of async device work before the clock stops."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if barrier is not None:
            barrier()
        p = _registry[name]
        p.calls += 1
        p.seconds += time.perf_counter() - t0
        p.work += nnz


def get_metrics() -> Dict[str, dict]:
    """Snapshot: {phase: {calls, seconds, work, work_per_s}}."""
    out = {}
    for name, p in _registry.items():
        out[name] = {
            "calls": p.calls,
            "seconds": p.seconds,
            "work": p.work,
            "work_per_s": (p.work / p.seconds) if p.seconds > 0 and p.work else None,
        }
    return out


def reset_metrics() -> None:
    _registry.clear()


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler device trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def sanitize():
    """Run enclosed Pallas kernels in interpreter mode (SURVEY.md §5 "race
    detection / sanitizers"): the interpreter executes kernel logic
    sequentially with python-level checking — the debugging analog of a
    sanitizer for hand-written device kernels."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield
