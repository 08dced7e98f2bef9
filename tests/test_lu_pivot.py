"""Device partial-pivoting LU (VERDICT round-2 item #1).

The device path must factor pivot-REQUIRING matrices without the host
engine: static-pivoting row matching (native rt_match) + threshold
pivoting inside multifrontal fronts + full partial pivoting in the dense
skeleton + iterative refinement in the driver. Reference pivot semantics:
/root/reference/src/lib.rs:565-589.
"""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu.data import Sprs
from rsparse_tpu.symbolic import native, sqr
from rsparse_tpu.factor.frontal_lu import build_lu_mf_plan, lu_mf, solve_lu_mf


def _adversarial(n=2000, extra=6000, zeros=(17, 555, 1300), seed=5):
    rng = np.random.default_rng(seed)
    d = np.zeros((n, n))
    for i in range(n):
        d[i, i] = 10.0
    ii = rng.integers(0, n, extra)
    jj = rng.integers(0, n, extra)
    for i_, j_ in zip(ii, jj):
        d[i_, j_] += rng.standard_normal()
    for z in zeros:
        # zero the diagonal but guarantee the column/row stay exchangeable
        # (a zeroed diag with an otherwise-empty column would be singular)
        d[z, z] = 0.0
        d[(z + 1) % n, z] += 3.0
        d[z, (z + 2) % n] += 3.0
    return d


def test_match_recovers_row_permutation():
    rng = np.random.default_rng(0)
    n = 200
    d = np.zeros((n, n))
    for i in range(n):
        d[i, i] = 10.0
    for _ in range(600):
        i, j = rng.integers(0, n, 2)
        d[i, j] += rng.standard_normal()
    perm = rng.permutation(n)
    a = Sprs.new_from_vec([list(r) for r in d[perm]])
    pinv = native.match(n, a.p, a.i[: a.nnz()], a.x[: a.nnz()])
    assert pinv is not None
    rec = d[perm][np.argsort(pinv)]
    assert np.abs(np.diag(rec)).min() > 5.0  # dominant diagonal recovered


def test_match_detects_structural_singularity():
    n = 50
    d = np.eye(n) * 3.0
    d[:, 7] = 0.0
    a = Sprs.new_from_vec([list(r) for r in d])
    assert native.match(n, a.p, a.i[: a.nnz()], a.x[: a.nnz()]) is None


def test_zeroed_diagonal_factors_on_device():
    """The VERDICT done-criterion: pivot-requiring matrix, pinv != identity,
    1e-6 accuracy, and NO rt_lu_numeric call in the path."""
    d = _adversarial()
    n = d.shape[0]
    a = Sprs.new_from_vec([list(r) for r in d])
    rng = np.random.default_rng(1)
    xt = rng.standard_normal(n)
    b = list(d @ xt)

    calls = {"n": 0}
    orig = native.lu_numeric

    def spy(*args, **kw):
        calls["n"] += 1
        return orig(*args, **kw)

    native.lu_numeric = spy
    try:
        x = rs.lusol(a, b, 1)
    finally:
        native.lu_numeric = orig
    assert calls["n"] == 0, "host engine was called for a device-able matrix"
    assert np.abs(np.asarray(x) - xt).max() < 1e-6


def test_pivoted_factor_reconstructs():
    """P A Q = L U for the device factors (elimination-labeled CSC)."""
    d = _adversarial(n=600, extra=1800, zeros=(3, 77, 400), seed=9)
    n = d.shape[0]
    a = Sprs.new_from_vec([list(r) for r in d])
    s = sqr(a, 1, False)
    plan = build_lu_mf_plan(a, s, smax=32)
    assert plan is not None
    out = lu_mf(a, s, plan, 1e-6)
    assert out is not None
    Lp, Li, Lx, Up, Ui, Ux, pinv = out
    assert not np.array_equal(pinv, np.arange(n))
    L = np.zeros((n, n))
    U = np.zeros((n, n))
    L[Li, np.repeat(np.arange(n), np.diff(Lp))] = Lx
    U[Ui, np.repeat(np.arange(n), np.diff(Up))] = Ux
    q = np.asarray(s.q)
    PA = np.zeros((n, n))
    PA[pinv, :] = d[:, q]
    scale = max(1.0, np.abs(d).max())
    assert np.abs(PA - L @ U).max() < 1e-5 * scale
    # L unit-lower / U upper in elimination labels
    lc = np.repeat(np.arange(n), np.diff(Lp))
    assert (Li >= lc).all()
    assert np.allclose(L[np.arange(n), np.arange(n)], 1.0)
    uc = np.repeat(np.arange(n), np.diff(Up))
    assert (Ui <= uc).all()


def test_mf_solve_cache_matches_csc_path():
    d = _adversarial(n=800, extra=2400, zeros=(11,), seed=2)
    n = d.shape[0]
    a = Sprs.new_from_vec([list(r) for r in d])
    s = sqr(a, 1, False)
    plan = build_lu_mf_plan(a, s)
    assert plan is not None
    out = lu_mf(a, s, plan, 1e-6)
    assert out is not None
    Lp, Li, Lx, Up, Ui, Ux, pinv = out
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n)
    X = np.zeros((n, 2))
    X[pinv, 0] = b
    X[pinv, 1] = 2 * b
    Z = solve_lu_mf(plan, X)
    q = np.asarray(s.q)
    x1 = np.zeros(n)
    x1[q] = Z[:, 0]
    # CSC reference solve
    import scipy.linalg as sla

    L = np.zeros((n, n))
    U = np.zeros((n, n))
    L[Li, np.repeat(np.arange(n), np.diff(Lp))] = Lx
    U[Ui, np.repeat(np.arange(n), np.diff(Up))] = Ux
    y = np.zeros(n)
    y[pinv] = b
    z1 = sla.solve_triangular(L, y, lower=True, unit_diagonal=True)
    z2 = sla.solve_triangular(U, z1, lower=False)
    x2 = np.zeros(n)
    x2[q] = z2
    assert np.abs(x1 - x2).max() < 1e-8 * max(1, np.abs(x2).max())


def test_batched_lusol_multi_pivoting():
    d = _adversarial(n=1600, extra=5000, zeros=(100, 900), seed=7)
    n = d.shape[0]
    a = Sprs.new_from_vec([list(r) for r in d])
    rng = np.random.default_rng(4)
    Xt = rng.standard_normal((n, 3))
    B = d @ Xt
    X = rs.lusol_multi(a, B, 1)
    assert np.abs(X - Xt).max() < 1e-6


def test_mixed_precision_f32_factor_refines_to_f64():
    """TPU mixed precision (config.lu_factor_dtype): the driver factors in
    f32 and iterative refinement recovers an f64-level residual — exercised
    here on CPU by forcing the dtype (on CPU "auto" keeps f64)."""
    from rsparse_tpu.config import config

    d = _adversarial(n=2000, extra=6000, zeros=(17, 555), seed=11)
    n = d.shape[0]
    a = Sprs.new_from_vec([list(r) for r in d])
    rng = np.random.default_rng(6)
    xt = rng.standard_normal(n)
    b = d @ xt
    old = config.lu_factor_dtype
    config.lu_factor_dtype = "float32"
    try:
        s = sqr(a, 1, False)
        x = rs.lusol(a, list(b), 1, 1e-6, sym=s)
        # the cached factor tree really is f32 (the mixed path ran)
        mfp = s._mf_lu_plan
        tree = mfp.__dict__.get("_cache_tree")
        assert tree is not None and tree[1].dtype == np.float32
    finally:
        config.lu_factor_dtype = old
    r = np.abs(d @ np.asarray(x) - b).max()
    scale = max(1.0, np.abs(b).max())
    assert r < 1e-10 * scale, f"refined residual {r}"


def test_mf_factor_labels_sweepable():
    """MF-LU elimination labels may cross front ranges after skeleton
    pivoting; the level schedule (rt_tri_levels) must topologically order
    the general DAG so label-order sweeps still solve correctly
    (regression: the old index-ordered level pass silently mis-scheduled
    crossing entries — residual 3.57 on this exact case)."""
    import numpy as np

    import rsparse_tpu as rs
    from rsparse_tpu.factor.frontal_lu import build_lu_mf_plan, lu_mf
    from rsparse_tpu.solve import lsolve_multi, usolve_multi
    from rsparse_tpu.symbolic import sqr

    rng = np.random.default_rng(0)
    m = 150
    d = (rng.random((m, m)) < 0.06) * rng.standard_normal((m, m))
    np.fill_diagonal(d, d.diagonal() + 0.01 * rng.random(m))
    a = rs.Sprs.new_from_vec(d.tolist())
    s = sqr(a, 1, False)
    plan = build_lu_mf_plan(a, s, smax=8)
    out = lu_mf(a, s, plan, 1e-6)
    assert out is not None
    Lp, Li, Lx, Up, Ui, Ux, pinv = out
    L = rs.Sprs(len(np.asarray(Lx)), m, m, Lp, Li, np.asarray(Lx))
    U = rs.Sprs(len(np.asarray(Ux)), m, m, Up, Ui, np.asarray(Ux))
    # the case must actually exercise crossing labels
    from rsparse_tpu.ops.plan import col_ids

    cross = np.sum((Li[: int(Lp[m])] < col_ids(Lp, m))
                   & (np.abs(np.asarray(Lx)[: int(Lp[m])]) > 1e-14))
    assert cross > 0, "fixture no longer produces crossing labels"
    b = rng.standard_normal((m, 4))
    z = np.zeros_like(b)
    z[np.asarray(pinv, np.int64)] = b
    z = np.asarray(lsolve_multi(L, z))
    z = np.asarray(usolve_multi(U, z))
    x = np.zeros_like(z)
    x[np.asarray(s.q, np.int64)] = z
    resid = np.abs(d @ x - b).max()
    assert resid < 1e-9, resid
