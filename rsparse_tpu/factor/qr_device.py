"""Device QR: level-scheduled Householder factorization.

The QR factor patterns (V and R) are FULLY static — `vcount` plus an
integer-only replay of the numeric pattern logic determines them before any
value is computed (native rt_qr_pattern). The numeric phase is a sweep over
etree levels: column k applies the reflections of its R-pattern ancestors
(happly = masked sparse dot + axpy over static padded V columns), forms a
new reflector (house = norm + select), and scatters V(:,k)/R(:,k)/beta[k]
into static storage.

Round-1 implementation note: the device sweep currently runs per *column
chain* via the native engine (host) while the surrounding solves run on
device; the level-batched device kernel lands with the LU device kernel.
"""

from __future__ import annotations

from ..data import Sprs, Symb
from ..symbolic import native


def qr_device(a: Sprs, s: Symb):
    return native.qr_numeric(
        a.m,
        a.n,
        a.p,
        a.i[: a.nnz()],
        a.x[: a.nnz()],
        s.q,
        s.parent,
        s.pinv,
        s.m2,
        s.lnz + 8,
        s.unz + 8,
    )
