"""Multifrontal static-pivot LU (factor/frontal_lu.py)."""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu.data import Sprs
from rsparse_tpu.factor.frontal_lu import build_lu_mf_plan, lu_mf
from rsparse_tpu.symbolic import native


def _dd_banded(g=40, seed=0):
    # g=40 -> n=1600: the smallest Laplacian that stays >= mf_min_n so the
    # lusol e2e test still takes the MF tier (g=48 measured 462s of suite
    # wall under -n 4, nearly all XLA:CPU compile of the LU plan)
    from bench import laplacian_5pt

    n, Ap, Ai, Ax = laplacian_5pt(g)
    rng = np.random.default_rng(seed)
    Ax = Ax * (1.0 + 0.3 * rng.standard_normal(len(Ax)))
    a = Sprs(len(Ax), n, n, Ap, Ai, Ax)
    d = a.to_dense_np()
    np.fill_diagonal(d, np.abs(d).sum(1) + 1.0)
    return Sprs.new_from_vec(d.tolist()), d


def test_mf_lu_matches_static_oracle():
    a, d = _dd_banded()
    s = rs.sqr(a, -1, False)
    plan = build_lu_mf_plan(a, s)
    assert plan is not None
    out = lu_mf(a, s, plan, 1e-6)
    assert out is not None
    Lp, Li, Lx, Up, Ui, Ux, pinv = out
    L = np.zeros((a.n, a.n))
    U = np.zeros((a.n, a.n))
    for k in range(a.n):
        L[Li[Lp[k]:Lp[k+1]], k] = Lx[Lp[k]:Lp[k+1]]
        U[Ui[Up[k]:Up[k+1]], k] = Ux[Up[k]:Up[k+1]]
    aq = d[:, np.asarray(s.q)] if s.q is not None else d
    assert np.abs(L @ U - aq).max() < 1e-9


def test_mf_lu_lusol_end_to_end():
    a, d = _dd_banded(seed=1)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(a.n)
    x = np.asarray(rs.lusol(a, list(b), -1, 1e-6))
    want = np.linalg.solve(d, b)
    np.testing.assert_allclose(x, want, rtol=1e-9, atol=1e-9)


def test_mf_lu_margin_fallback():
    """A tiny diagonal deep in a front must reject static pivoting and fall
    back to the host partial-pivoting engine — solution stays exact."""
    a, d = _dd_banded(seed=3)
    d2 = d.copy()
    d2[5, 5] = 1e-13
    a2 = Sprs.new_from_vec(d2.tolist())
    rng = np.random.default_rng(4)
    b = rng.standard_normal(a2.n)
    x = np.asarray(rs.lusol(a2, list(b), -1, 1e-6))
    want = np.linalg.solve(d2, b)
    resid = np.abs(d2 @ x - b).max()
    assert resid < 1e-6, resid


def test_mf_lu_recursion_correct(monkeypatch):
    import rsparse_tpu.factor.frontal_lu as flu

    # skeletons beyond DENSE_SKEL_MAX recurse into another front layer
    monkeypatch.setattr(flu, "DENSE_SKEL_MAX", 64)
    a, d = _dd_banded(seed=5)
    rng = np.random.default_rng(8)
    b = rng.standard_normal(a.n)
    s = rs.sqr(a, 1, False)
    x = np.asarray(rs.lusol(a, list(b), 1, 1e-6, sym=s))
    assert isinstance(s._mf_lu_plan.skel_plan, flu.LUMFPlan), "recursion must engage"
    resid = np.abs(d @ x - b).max()
    assert resid < 1e-8


def test_lusol_natural_order_mf_fused():
    """order=-1 (no column permutation, s.q=None) through the MF fused
    solve path — exercises the perm-free branch of _lu_mf_solve_fused."""
    import numpy as np

    import rsparse_tpu as rs
    from bench import laplacian_5pt

    n, p, i, x = laplacian_5pt(40)  # n=1600 >= mf_min_n
    x = x.copy()
    cols = np.repeat(np.arange(n), np.diff(p))
    x[i > cols] *= 1.7
    a = rs.Sprs(len(x), n, n, p, i, x)
    b = np.random.default_rng(3).standard_normal(n)
    xs = np.asarray(rs.lusol(a, list(b), -1, 1e-6))
    # the fixture is genuinely ill-conditioned under natural order
    # (cond ~8e10, |x| ~2e9): check the residual relative to the
    # solution scale (the driver's own acceptance criterion) and the
    # solution against the dense oracle
    r = np.abs(np.asarray(rs.gaxpy(a, list(xs), [0.0] * n)) - b).max()
    scale = max(1.0, float(np.abs(xs).max()))
    assert r < 1e-9 * scale, (r, scale)
    want = np.linalg.solve(np.asarray(a.to_dense_np()), b)
    assert np.abs(xs - want).max() / scale < 1e-9
