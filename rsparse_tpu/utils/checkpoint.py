"""Checkpoint / resume for symbolic analysis (SURVEY.md §5).

The reference's nearest analog is `.sprs` matrix save/load
(src/data.rs:414-517, kept byte-compatible in data.Sprs). The natural
checkpoint for this domain is the *symbolic analysis* — orderings, counts
and level schedules are pure functions of the sparsity pattern and dominate
setup cost for repeated solves — so `Symb` round-trips through a compact
.npz bundle. Device plans (Symb.plan) are rebuilt lazily on first use.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..data import Symb

__all__ = ["save_symbolic", "load_symbolic"]

_FIELDS = ("pinv", "q", "parent", "cp")


def save_symbolic(s: Symb, path: str) -> None:
    """Serialize a Symb (without device plans) to `path` (.npz)."""
    payload = {"m2": np.int64(s.m2), "lnz": np.int64(s.lnz), "unz": np.int64(s.unz)}
    for f in _FIELDS:
        v = getattr(s, f)
        if v is not None:
            payload[f] = np.asarray(v, dtype=np.int64)
    np.savez(path, **payload)


def load_symbolic(path: str) -> Symb:
    with np.load(path) as z:
        s = Symb(
            m2=int(z["m2"]),
            lnz=int(z["lnz"]),
            unz=int(z["unz"]),
        )
        for f in _FIELDS:
            if f in z:
                setattr(s, f, z[f])
    return s
