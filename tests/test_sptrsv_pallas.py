"""Pallas SpTRSV sweep vs the XLA level sweep (interpret mode on CPU).

The kernel is the TPU serving path for batched triangular solves
(ops/sptrsv_pallas.py); on the CPU test backend it runs through the Pallas
interpreter, checking the same schedule/index logic Mosaic compiles on
TPU. Reference semantics: lsolve/ltsolve/usolve/utsolve,
/root/reference/src/lib.rs:464-471, 505-512, 1230-1237, 1271-1278.
"""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu.solve import (lsolve_multi, ltsolve_multi, tri_plan,
                               usolve_multi, utsolve_multi)
from rsparse_tpu.ops.sptrsv_pallas import (pallas_sweep_available,
                                           sptrsv_pallas_multi)

ASSETS = "/root/reference/tests/assets"


def _chol_factor(asset):
    a = rs.Sprs.new_from_file(f"{ASSETS}/{asset}.sprs")
    s = rs.schol(a, 0)
    return rs.chol(a, s).l


def _lu_factors_laplacian(g=12):
    """LU of a 5-point Laplacian: well-conditioned, so the f32 sweep's
    accumulation-order differences stay at rounding level (lusol_3-class
    assets are deliberately ill-conditioned — the reference checks them at
    tol 0.5 — and amplify any f32 reorder into ~1e-4)."""
    from bench import laplacian_5pt

    n, p, i, x = laplacian_5pt(g)
    a = rs.Sprs(len(x), n, n, p, i, x)
    s = rs.sqr(a, 1, False)
    nm = rs.lu(a, s, 1e-6)
    return nm.l, nm.u


@pytest.mark.parametrize("asset", ["cholsol_1", "cholsol_2", "cholsol_5"])
@pytest.mark.parametrize("kind", [0, 2])
def test_lower_sweeps_match_xla(asset, kind):
    L = _chol_factor(asset)
    rng = np.random.default_rng(3)
    X = rng.standard_normal((L.n, 128))
    p = tri_plan(L, kind)
    ref = (lsolve_multi if kind == 0 else ltsolve_multi)(L, X, p)
    got = np.asarray(sptrsv_pallas_multi(L.x[: L.nnz()], X, p, kind),
                     np.float64)
    err = np.abs(got - np.asarray(ref)).max() / max(
        1.0, np.abs(ref).max())
    assert err < 5e-5, (asset, kind, err)


@pytest.mark.parametrize("kind", [1, 3])
def test_upper_sweeps_match_xla(kind):
    _, U = _lu_factors_laplacian()
    rng = np.random.default_rng(4)
    X = rng.standard_normal((U.n, 128))
    p = tri_plan(U, kind)
    ref = (usolve_multi if kind == 1 else utsolve_multi)(U, X, p)
    got = np.asarray(sptrsv_pallas_multi(U.x[: U.nnz()], X, p, kind),
                     np.float64)
    err = np.abs(got - np.asarray(ref)).max() / max(
        1.0, np.abs(ref).max())
    assert err < 5e-5, (kind, err)


def test_narrow_batch_and_reuse():
    """B=8 batches work, and the schedule streams cache on the plan."""
    L = _chol_factor("cholsol_1")
    rng = np.random.default_rng(5)
    X = rng.standard_normal((L.n, 8))
    p = tri_plan(L, 0)
    got1 = np.asarray(sptrsv_pallas_multi(L.x[: L.nnz()], X, p, 0))
    assert "_pallas_streams" in p.__dict__
    got2 = np.asarray(sptrsv_pallas_multi(L.x[: L.nnz()], X, p, 0))
    np.testing.assert_array_equal(got1, got2)
    ref = np.asarray(lsolve_multi(L, X, p))
    err = np.abs(got1 - ref).max() / max(1.0, np.abs(ref).max())
    assert err < 5e-5


def test_availability_gate():
    assert pallas_sweep_available(4000, 128, np.float32)
    assert not pallas_sweep_available(4000, 128, np.float64)
    assert not pallas_sweep_available(40_000_000, 128, np.float32)


def test_cholsol_multi_serve_mixed():
    """cholsol_multi's mixed serving path (f32 Pallas sweeps + f64
    refinement) reaches f64 accuracy; forced on the CPU backend via
    config.serve_mixed so the interpreter covers the full driver."""
    from rsparse_tpu.config import config

    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_5.sprs")
    rng = np.random.default_rng(9)
    B = rng.standard_normal((a.n, 32))
    want = rs.cholsol_multi(a, B, 0)  # exact f64 path on CPU
    old = config.serve_mixed
    config.serve_mixed = "force"
    try:
        s = rs.schol(a, 0)
        got = rs.cholsol_multi(a, B, 0, sym=s)
        # a second call reuses the cached plans + streams
        got2 = rs.cholsol_multi(a, B, 0, sym=s)
    finally:
        config.serve_mixed = old
    err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-9, err
    np.testing.assert_array_equal(got, got2)
    # the refinement really happened against the f64 matrix
    Ad = np.asarray(a.to_dense_np())
    resid = np.abs(Ad @ got - B).max()
    assert resid < 1e-9 * max(1.0, np.abs(B).max()), resid


def test_serve_mixed_nonsymmetric_semantics():
    """chol semantics: only triu(PAP') matters. The serving path's
    refinement must target the SYMMETRIZED matrix — perturbing the strictly
    lower triangle (which the reference's cholsol ignores, src/lib.rs:
    2369-2408 symperm keeps triu) must not change the answer."""
    from rsparse_tpu.config import config

    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_2.sprs")
    ad = np.asarray(a.to_dense_np())
    # natural order (order=-1): triu(A) is what chol consumes, so a
    # strictly-lower perturbation is invisible to the factorization
    pert = ad.copy()
    ij = np.tril_indices(a.n, -1)
    rng = np.random.default_rng(11)
    pert[ij] += rng.standard_normal(len(ij[0])) * np.abs(ad[ij]).max()
    ap = rs.Sprs.new_from_vec([[float(v) for v in row] for row in pert])

    B = rng.standard_normal((a.n, 16))
    want = rs.cholsol_multi(ap, B, -1)  # exact path, symmetrized semantics
    old = config.serve_mixed
    config.serve_mixed = "force"
    try:
        got = rs.cholsol_multi(ap, B, -1)
    finally:
        config.serve_mixed = old
    err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-9, err


def _tall_sparse(m_extra=40, g=10, seed=7):
    """Well-conditioned tall sparse matrix: Laplacian + random sparse rows."""
    from bench import laplacian_5pt

    n, p, i, x = laplacian_5pt(g)
    t = rs.Trpl()
    cols = np.repeat(np.arange(n), np.diff(p))
    for r, c, v in zip(i, cols, x):
        t.append(int(r), int(c), float(v))
    rng = np.random.default_rng(seed)
    for r in range(m_extra):
        for c in rng.choice(n, 3, replace=False):
            t.append(n + r, int(c), float(rng.standard_normal()))
    return t.to_sprs()


@pytest.mark.parametrize("wide", [False, True])
def test_qrsol_serve(wide):
    """qrsol_serve (device-resident CSNE handle) matches the dense
    least-squares / minimum-norm oracle on both branches."""
    a = _tall_sparse()
    if wide:
        a = rs.transpose(a)
    m, n = a.m, a.n
    rng = np.random.default_rng(17)
    B = rng.standard_normal((m, 16))
    h = rs.qrsol_serve(a, 0)
    assert h.available
    got = np.asarray(h(B), np.float64)
    assert got.shape == (n, 16)
    ad = np.asarray(a.to_dense_np())
    want = np.linalg.lstsq(ad, B, rcond=None)[0]
    err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-8, err
    # second call reuses the compiled program
    np.testing.assert_array_equal(np.asarray(h(B)), got)
    # single-column agreement with the exact-Householder qrsol
    x1 = np.asarray(rs.qrsol(a, list(B[:, 0].copy()), 0))
    err1 = np.abs(got[:, 0] - x1[:n]).max() / max(1.0, np.abs(x1).max())
    assert err1 < 1e-8, err1


@pytest.mark.parametrize("wide", [False, True])
def test_qrsol_multi(wide):
    """qrsol_multi (batched CSNE) matches the dense oracle; the serving
    branch (forced) agrees with the exact XLA branch."""
    from rsparse_tpu.config import config

    a = _tall_sparse(seed=8)
    if wide:
        a = rs.transpose(a)
    m, n = a.m, a.n
    rng = np.random.default_rng(19)
    B = rng.standard_normal((m, 12))
    want = np.linalg.lstsq(np.asarray(a.to_dense_np()), B, rcond=None)[0]
    got = rs.qrsol_multi(a, B, 0)
    err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-8, err
    old = config.serve_mixed
    config.serve_mixed = "force"
    try:
        got2 = rs.qrsol_multi(a, B, 0)
    finally:
        config.serve_mixed = old
    err2 = np.abs(got2 - want).max() / max(1.0, np.abs(want).max())
    assert err2 < 1e-8, err2


def test_lusol_serve():
    """lusol_serve handle (L+U Pallas sweeps + f64 refinement vs A) matches
    the exact lusol on a well-conditioned system (interpret on CPU)."""
    from bench import laplacian_5pt

    n, p, i, x = laplacian_5pt(10)
    # unsymmetrize: scale the strictly-lower entries so L/U really differ
    x = x.copy()
    cols = np.repeat(np.arange(n), np.diff(p))
    x[i > cols] *= 1.7
    a = rs.Sprs(len(x), n, n, p, i, x)
    rng = np.random.default_rng(13)
    B = rng.standard_normal((n, 16))
    want = np.stack([np.asarray(rs.lusol(a, list(B[:, j]), 1, 1e-12))
                     for j in range(4)], axis=1)
    h = rs.lusol_serve(a, 1, 1e-12)
    got = np.asarray(h(B), np.float64)
    err = np.abs(got[:, :4] - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-9, err
    # full-batch residual oracle
    ad = np.asarray(a.to_dense_np())
    resid = np.abs(ad @ got - B).max()
    assert resid < 1e-9 * max(1.0, np.abs(B).max()), resid


def test_serve_handle_budget_error():
    """Over-budget calls fail with a clear message, not a Mosaic crash."""
    from rsparse_tpu.config import config

    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_1.sprs")
    old = config.serve_mixed
    config.serve_mixed = "force"
    try:
        h = rs.cholsol_serve(a, 0)
        # tiny problem: available at sane widths, rejected at absurd ones
        assert h.available
        with pytest.raises(ValueError, match="VMEM budget"):
            h(np.ones((a.n, 3_000_000)))
    finally:
        config.serve_mixed = old


def test_qrsol_serve_wrong_gram_sym():
    """Passing an analysis of the wrong Gram (A'A vs AA') raises clearly."""
    a = _tall_sparse()  # m > n: Gram is A'A [n x n]
    at = rs.transpose(a)
    wrong = rs.schol(rs.multiply(a, at), 0)  # AA' [m x m]
    with pytest.raises(ValueError, match="Gram"):
        rs.qrsol_serve(a, 0, sym=wrong)
