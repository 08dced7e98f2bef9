"""Device LU: left-looking with partial pivoting.

Hardest kernel in the suite (SURVEY.md §7 hard-parts #1): partial pivoting
makes the fill pattern runtime-dynamic, which conflicts with XLA's static
shapes. The design (George–Ng bound): pattern(U) is bounded by pattern(R) of
the QR factorization of A(:,q) for ANY row permutation, so the per-column
triangular-solve loop can run over the static R-bound with dynamic gathers;
pivot selection is a masked argmax with the reference's tol rule
(|x[col]| >= tol * max |x|, reference src/lib.rs:587-589).

Round-1 implementation note: runs via the native engine (host) while the
surrounding solves run on device; the bound-pattern device kernel lands
next.
"""

from __future__ import annotations

from ..data import Sprs, Symb
from ..symbolic import native


def lu_device(a: Sprs, s: Symb, tol: float):
    return native.lu_numeric(
        a.n, a.p, a.i[: a.nnz()], a.x[: a.nnz()], s.q, tol, s.lnz, s.unz
    )
