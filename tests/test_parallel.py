"""Distributed (L6') layer tests on the virtual 8-device CPU mesh.

The reference has no parallelism (SURVEY.md §2.5); correctness oracles here
are the single-chip kernels and numpy dense math.
"""

import numpy as np
import pytest

import jax

import rsparse_tpu as rs
from rsparse_tpu import parallel as par

from conftest import ASSETS


def _load(name):
    return rs.Sprs.new_from_file(f"{ASSETS}/{name}.sprs")


@pytest.fixture(scope="module")
def mesh():
    return par.make_mesh(data=1)


@pytest.fixture(scope="module")
def mesh2d():
    nd = len(jax.devices())
    if nd % 2:
        pytest.skip("needs an even device count")
    return par.make_mesh(data=2)


def test_dist_gaxpy_matches_dense(mesh):
    a = _load("cholsol_1")
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.n)
    y = rng.standard_normal(a.m)
    ep = par.partition_entries(a, mesh.shape["model"])
    r = np.asarray(par.dist_gaxpy(ep, x, y, mesh))
    want = a.to_dense_np() @ x + y
    np.testing.assert_allclose(r, want, rtol=1e-12, atol=1e-12)


def test_dist_gaxpy_matches_single_chip_op(mesh):
    a = _load("allsol_1")
    rng = np.random.default_rng(1)
    x = rng.standard_normal(a.n)
    y = np.zeros(a.m)
    ep = par.partition_entries(a, mesh.shape["model"])
    r = np.asarray(par.dist_gaxpy(ep, x, y, mesh))
    want = np.asarray(rs.gaxpy(a, list(x), list(y)))
    np.testing.assert_allclose(r, want, rtol=1e-12, atol=1e-12)


def test_dist_norm(mesh):
    a = _load("allsol_1")
    ep = par.partition_entries(a, mesh.shape["model"])
    assert par.dist_norm(ep, mesh) == pytest.approx(rs.norm(a), rel=1e-13)


@pytest.mark.parametrize("kind", [0, 1, 2, 3])
def test_dist_tri_solve(mesh, kind):
    # Factor an SPD asset to get genuinely sparse L/U test triangles.
    a = _load("cholsol_2")
    s = rs.schol(a, 0)
    nm = rs.chol(a, s)
    l = nm.l
    if kind in (1, 3):  # usolve/utsolve want diag LAST per column: use L' as U
        t = rs.transpose(l)
    else:
        t = l
    rng = np.random.default_rng(2)
    b = rng.standard_normal(t.n)
    got = np.asarray(par.dist_tri_solve(t, b.copy(), kind, mesh))
    dense = t.to_dense_np()
    if kind == 0:
        want = np.linalg.solve(dense, b)
    elif kind == 1:
        want = np.linalg.solve(dense, b)
    elif kind == 2:
        want = np.linalg.solve(dense.T, b)
    else:
        want = np.linalg.solve(dense.T, b)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_refine_step_converges(mesh2d):
    """One refinement step from X=0 must produce the exact solve (L exact)."""
    a = _load("cholsol_1")
    s = rs.schol(a, -1)  # natural order: L factors A itself
    nm = rs.chol(a, s)
    rng = np.random.default_rng(3)
    B = rng.standard_normal((4, a.n))
    X = np.zeros_like(B)
    X1 = np.asarray(par.refine_step(a, nm.l, X, B, mesh2d))
    dense = a.to_dense_np()
    want = np.linalg.solve(dense, B.T).T
    np.testing.assert_allclose(X1, want, rtol=1e-9, atol=1e-9)


def test_refine_step_improves_perturbed(mesh2d):
    a = _load("cholsol_2")
    s = rs.schol(a, -1)
    nm = rs.chol(a, s)
    rng = np.random.default_rng(4)
    B = rng.standard_normal((2, a.n))
    dense = a.to_dense_np()
    want = np.linalg.solve(dense, B.T).T
    X0 = want + 1e-3 * rng.standard_normal(want.shape)
    X1 = np.asarray(par.refine_step(a, nm.l, X0, B, mesh2d))
    err0 = np.abs(X0 - want).max()
    err1 = np.abs(X1 - want).max()
    assert err1 < err0 * 1e-6


def test_dist_spgemm_matches_single_chip(mesh):
    a = _load("allsol_1")
    at = rs.transpose(a)
    want = rs.multiply(a, at)
    got = par.dist_spgemm(a, at, mesh)
    assert np.array_equal(want.p, got.p)
    assert np.array_equal(want.i, got.i)
    np.testing.assert_allclose(got.x, want.x, rtol=1e-12, atol=1e-12)


def test_dist_spgemm_rectangular(mesh):
    a = _load("qrsol_8")  # 200x201 rectangular
    at = rs.transpose(a)
    want = rs.multiply(at, a)
    got = par.dist_spgemm(at, a, mesh)
    assert np.array_equal(want.p, got.p)
    np.testing.assert_allclose(got.x, want.x, rtol=1e-12, atol=1e-12)


def test_dist_cholsol_matches_single_chip(mesh):
    a = _load("cholsol_2")
    rng = np.random.default_rng(5)
    b = rng.standard_normal(a.n)
    want = np.asarray(rs.cholsol(a, list(b), 0))
    got = np.asarray(par.dist_cholsol(a, b, mesh, 0))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_dist_cholsol_vals_matches_single_chip():
    # instances sharded over a pure data mesh; K not divisible by D
    nd = len(jax.devices())
    mesh = par.make_mesh(data=nd)
    from conftest import laplacian_sprs

    a = laplacian_sprs(40)  # n=1600 >= mf_min_n: exercises the vmapped MF (smallest MF-tier size, suite-wall discipline)
    n = a.n
    nz = a.nnz()
    diag = a.i[:nz] == np.repeat(np.arange(n), np.diff(a.p))
    K = nd + 3  # force batch padding
    AxK = np.tile(a.x[:nz], (K, 1))
    AxK[:, diag] *= (1.0 + 0.2 * np.arange(K))[:, None]
    rng = np.random.default_rng(6)
    B = rng.standard_normal((K, n))
    s = rs.schol(a, 0)
    got = par.dist_cholsol_vals(a, AxK, B, mesh, 0, sym=s)
    want = rs.cholsol_vals(a, AxK, B, 0)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)
    # per-instance NPD detection survives the shard round-trip
    bad = AxK.copy()
    bad[2][diag] = -3.0
    with pytest.raises(rs.NotPositiveDefiniteError, match=r"\[2\]"):
        par.dist_cholsol_vals(a, bad, B, mesh, 0, sym=s)


def test_dist_lusol_vals_matches_single_chip():
    from conftest import laplacian_sprs

    nd = len(jax.devices())
    mesh = par.make_mesh(data=nd)
    a0 = laplacian_sprs(40)
    n, nz = a0.n, a0.nnz()
    rng = np.random.default_rng(8)
    ax = a0.x[:nz] + 0.3 * rng.standard_normal(nz)  # nonsymmetric
    a = rs.Sprs(nz, n, n, a0.p, a0.i[:nz], ax)
    diag = a.i[:nz] == np.repeat(np.arange(n), np.diff(a.p))
    K = nd + 3  # forces batch padding
    AxK = np.tile(ax, (K, 1))
    for k in range(K):
        AxK[k][diag] += 2.0 + 0.5 * k
    # one pivot-requiring instance rides the sharded batch
    dpos = np.nonzero(diag)[0]
    AxK[4][dpos[3]] = 0.0
    B = rng.standard_normal((K, n))
    s = rs.sqr(a, 1, False)
    got = par.dist_lusol_vals(a, AxK, B, mesh, 1, 1e-6, sym=s)
    want = rs.lusol_vals(a, AxK, B, 1, 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_dist_qrsol_vals_both_branches(monkeypatch):
    # small problem + lowered MF threshold — this test compiles FOUR
    # vmapped whole-tree programs (dist + oracle, both branches); at
    # 2000x1600 it measured 3285s of the suite wall
    monkeypatch.setattr(rs.config, "mf_min_n", 600)
    nd = len(jax.devices())
    mesh = par.make_mesh(data=nd)
    rng = np.random.default_rng(9)
    # smallest MF-tier shape with a modest fill plan: this test compiles
    # FOUR vmapped whole-tree programs, and compile time scales with the
    # plan size (900x700/nnz 9000 measured 458s of suite wall)
    m, n = 720, 620
    d = np.zeros((m, n))
    for i in range(n):
        d[i, i] = 5.0 + rng.random()
    nz_extra = 4000
    ii = rng.integers(0, m, nz_extra)
    jj = rng.integers(0, n, nz_extra)
    d[ii, jj] += rng.standard_normal(nz_extra)
    a = rs.Sprs.new_from_vec([list(r) for r in d])
    assert a.n >= rs.config.mf_min_n
    K = nd + 1
    nz = a.nnz()
    AxK = np.tile(a.x[:nz], (K, 1)) * (1.0 + 0.3 * np.arange(K))[:, None]
    B = rng.standard_normal((K, m))
    s = rs.sqr(a, 2, True)
    got = par.dist_qrsol_vals(a, AxK, B, mesh, 2, sym=s)
    want = rs.qrsol_vals(a, AxK, B, 2)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)
    # minimum-norm branch (wide)
    at = rs.transpose(a)
    nzt = at.nnz()
    AxtK = np.tile(at.x[:nzt], (K, 1)) * (1.0 + 0.3 * np.arange(K))[:, None]
    Bt = rng.standard_normal((K, at.m))
    got_t = par.dist_qrsol_vals(at, AxtK, Bt, mesh, 2)
    want_t = rs.qrsol_vals(at, AxtK, Bt, 2)
    np.testing.assert_allclose(got_t, want_t, rtol=1e-10, atol=1e-10)
