"""Trailing-dense supernode Cholesky (factor/chol_device.DenseTail)."""

import numpy as np

import rsparse_tpu as rs
from rsparse_tpu.data import Sprs
from rsparse_tpu.factor.chol_device import CholPlan


def _laplacian(g):
    from bench import laplacian_5pt

    n, p, i, x = laplacian_5pt(g)
    return Sprs(len(x), n, n, p, i, x)


def test_tail_engages_and_factors_exactly():
    a = _laplacian(48)  # n=2304: enough levels to trigger the dense tail
    s = rs.schol(a, 0)
    # force the plain level+tail path (the multifrontal path has its own test)
    old = rs.config.mf_min_n
    rs.config.mf_min_n = 10**9
    try:
        nm = rs.chol(a, s)
    finally:
        rs.config.mf_min_n = old
    plan = s.plan
    assert isinstance(plan, CholPlan) and plan.tail is not None
    assert plan.tail.cut + plan.tail.d == a.n
    L = nm.l.to_dense_np()
    pinv = np.asarray(s.pinv)
    perm = np.empty(a.n, dtype=int)
    perm[pinv] = np.arange(a.n)
    want = a.to_dense_np()[np.ix_(perm, perm)]
    assert np.abs(L @ L.T - want).max() < 1e-10


def test_tail_spd_failure_detected():
    a = _laplacian(32)
    # make it indefinite while keeping the pattern
    a.x = a.x.copy()
    d = a.to_dense_np()
    diag_positions = [int(a.p[j]) + int(np.where(a.i[a.p[j]:a.p[j+1]] == j)[0][0])
                      for j in range(a.n)]
    a.x[diag_positions[-1]] = -100.0  # poison a late (tail-region) pivot
    s = rs.schol(a, 0)
    import pytest
    with pytest.raises(rs.NotPositiveDefiniteError):
        rs.chol(a, s)


def test_cholsol_end_to_end_with_tail():
    a = _laplacian(40)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.n)
    x = rs.cholsol(a, list(b), 0)
    r = np.abs(np.asarray(rs.gaxpy(a, x, [0.0] * a.n)) - b).max()
    assert r < 1e-9
