"""Multifrontal device Cholesky (factor/frontal.py) vs the host oracle."""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu.data import Sprs
from rsparse_tpu.factor.frontal import build_mf_plan, chol_mf
from rsparse_tpu.symbolic import _symperm_host, native


def _laplacian(g):
    from bench import laplacian_5pt

    n, p, i, x = laplacian_5pt(g)
    return Sprs(len(x), n, n, p, i, x)


def test_mf_matches_host_oracle():
    a = _laplacian(48)
    s = rs.schol(a, 0)
    c = _symperm_host(a, s.pinv)
    plan = build_mf_plan(c, s)
    assert plan is not None and len(plan.skel) < a.n // 2
    Lp, Li, Lx = chol_mf(c, s, plan)
    Lp2, Li2, Lx2 = native.chol_numeric(
        a.n, c.p, c.i[: c.nnz()], c.x[: c.nnz()], s.parent, s.cp)
    np.testing.assert_array_equal(Lp, Lp2)
    np.testing.assert_array_equal(Li, Li2)
    np.testing.assert_allclose(Lx, Lx2, atol=1e-10)


def test_mf_dispatched_in_cholsol():
    a = _laplacian(44)  # n=1936 >= mf_min_n
    s = rs.schol(a, 0)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.n)
    x = rs.cholsol(a, list(b), 0, sym=s)
    assert getattr(s, "_mf_plan", None) is not None, "MF path must engage"
    r = np.abs(np.asarray(rs.gaxpy(a, x, [0.0] * a.n)) - b).max()
    assert r < 1e-9


def test_mf_not_applicable_natural_order():
    """Natural order has no postorder composition; build must decline."""
    a = _laplacian(44)
    s = rs.schol(a, -1)
    c = a  # pinv None
    plan = build_mf_plan(c, s)
    # the natural-order Laplacian etree IS postordered (chain structure), so
    # a plan may legally exist; the invariant that matters is correctness:
    if plan is not None:
        Lp, Li, Lx = chol_mf(c, s, plan)
        Lp2, Li2, Lx2 = native.chol_numeric(
            a.n, c.p, c.i[: c.nnz()], c.x[: c.nnz()], s.parent, s.cp)
        np.testing.assert_allclose(Lx, Lx2, atol=1e-9)


def test_mf_spd_failure():
    a = _laplacian(44)
    a.x = a.x.copy()
    # poison a diagonal entry deep in a leaf front
    j = 3
    pos = int(a.p[j]) + int(np.where(a.i[a.p[j]:a.p[j+1]] == j)[0][0])
    a.x[pos] = -50.0
    s = rs.schol(a, 0)
    with pytest.raises(rs.NotPositiveDefiniteError):
        rs.chol(a, s)


def test_mf_recursion_correct(monkeypatch):
    import rsparse_tpu.factor.frontal as fr

    monkeypatch.setattr(fr, "RECURSE_MIN", 300)
    a = _laplacian(64)  # n=4096 -> nested plans
    s = rs.schol(a, 0)
    nm = rs.chol(a, s)
    plan = s._mf_plan
    assert isinstance(plan.skel_plan, fr.MFPlan), "recursion must engage"
    rng = np.random.default_rng(7)
    B = rng.standard_normal((a.n, 3))
    X = rs.cholsol_multi(a, B, 0, sym=s)
    R = np.abs(a.to_dense_np() @ X - B).max()
    assert R < 1e-9


def test_mixed_precision_f32_chol_refines_to_f64():
    """Mixed-precision cholsol (config.chol_factor_dtype): f32 MF factor +
    f64 iterative refinement in the driver — forced on CPU here (on CPU
    "auto" keeps f64)."""
    from rsparse_tpu.config import config

    a = _laplacian(48)
    n = a.n
    rng = np.random.default_rng(5)
    xt = rng.standard_normal(n)
    d_b = np.asarray(rs.gaxpy(a, list(xt), [0.0] * n))
    old = config.chol_factor_dtype
    config.chol_factor_dtype = "float32"
    try:
        s = rs.schol(a, 0)
        x = rs.cholsol(a, list(d_b), 0, sym=s)
        tree = s._mf_plan.__dict__.get("_cache_tree")
        assert tree is not None and tree[1].dtype == np.float32
    finally:
        config.chol_factor_dtype = old
    r = np.abs(np.asarray(rs.gaxpy(a, list(x), [0.0] * n)) - d_b).max()
    assert r < 1e-10 * max(1.0, np.abs(d_b).max()), f"refined residual {r}"


def test_mixed_f32_spurious_notpd_retries_f64(monkeypatch):
    """A PD matrix that fails in f32 must still succeed via the f64 retry
    (never a spurious NotPositiveDefiniteError from mixed precision).
    Pins the LEGACY chol()+solve path (the fallback for non-fusable plans)
    by disabling the one-shot driver; the one-shot's own retry is covered
    in test_round3_fixes."""
    from rsparse_tpu.config import config
    import rsparse_tpu.factor.frontal as fr
    import rsparse_tpu.solve as sv

    monkeypatch.setattr(sv, "_chol_one_shot", lambda *a, **k: None)
    a = _laplacian(48)
    n = a.n
    rng = np.random.default_rng(7)
    b = rng.standard_normal(n)
    calls = {"n": 0}
    orig = fr.chol_mf

    def spy(c, s, plan, mixed=False):
        calls["n"] += 1
        if mixed and calls["n"] == 1:
            from rsparse_tpu.errors import NotPositiveDefiniteError

            plan.__dict__.pop("_cache_tree", None)
            raise NotPositiveDefiniteError()
        return orig(c, s, plan, mixed=mixed)

    monkeypatch.setattr(fr, "chol_mf", spy)
    monkeypatch.setattr("rsparse_tpu.factor.chol_mf", spy, raising=False)
    old = config.chol_factor_dtype
    config.chol_factor_dtype = "float32"
    try:
        x = rs.cholsol(a, list(b), 0)
    finally:
        config.chol_factor_dtype = old
    assert calls["n"] >= 2  # f32 attempt + f64 retry
    r = np.abs(np.asarray(rs.gaxpy(a, x, [0.0] * n)) - b).max()
    assert r < 1e-9


def test_mixed_cholsol_nonsymmetric_semantics():
    """cholsol semantics: only triu(PAP') matters. The mixed-precision
    (f32 tree + refinement) path must refine against the SYMMETRIZED
    matrix — a strictly-lower perturbation of the stored input must not
    change the answer vs the exact f64 path (regression: refinement
    previously targeted full A)."""
    import numpy as np

    import rsparse_tpu as rs
    from rsparse_tpu.config import config
    from bench import laplacian_5pt

    n, p, i, x = laplacian_5pt(45)  # n=2025 >= mf_min_n
    a = rs.Sprs(len(x), n, n, p, i, x)
    ad = np.asarray(a.to_dense_np())
    pert = ad.copy()
    ij = np.tril_indices(n, -1)
    rng = np.random.default_rng(31)
    mask = rng.random(len(ij[0])) < 0.01
    pert[ij[0][mask], ij[1][mask]] += 0.5
    ap = rs.Sprs.new_from_vec([[float(v) for v in row] for row in pert])
    b = rng.standard_normal(n)
    want = rs.cholsol(ap, list(b.copy()), -1)  # f64 exact, triu semantics
    old = config.chol_factor_dtype
    config.chol_factor_dtype = "float32"
    try:
        got = rs.cholsol(ap, list(b.copy()), -1)
    finally:
        config.chol_factor_dtype = old
    err = np.abs(np.asarray(got) - np.asarray(want)).max() / max(
        1.0, np.abs(want).max())
    assert err < 1e-9, err
