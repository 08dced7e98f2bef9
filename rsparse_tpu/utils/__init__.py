"""Aux subsystems: tracing/profiling, metrics, checkpointing (SURVEY.md §5).

The reference has none of these (no timers, no logging, no factor caching —
verified in SURVEY.md §5); they are new, first-class subsystems here.
"""

from .profiling import phase_timer, profile_trace, sanitize, get_metrics, reset_metrics
from .checkpoint import save_symbolic, load_symbolic, save_factor, load_factor

__all__ = [
    "phase_timer",
    "profile_trace",
    "sanitize",
    "get_metrics",
    "reset_metrics",
    "save_symbolic",
    "load_symbolic",
    "save_factor",
    "load_factor",
]
