"""Property-based randomized cross-checks against dense numpy oracles.

The reference's suite is example-based (SURVEY.md §4); this module sweeps
randomized matrices through every solver and checks against
numpy.linalg on the densified operand — catching pattern-dependent bugs
the fixed assets can't. Seeds are fixed for reproducibility.
"""

import numpy as np
import pytest

import rsparse_tpu as rs


def _rand_square(rng, n, dens):
    d = (rng.random((n, n)) < dens) * rng.standard_normal((n, n))
    np.fill_diagonal(d, d.diagonal() + 3.0 + rng.random(n))  # nonsingular
    return d


@pytest.mark.parametrize("seed,n,dens", [
    (0, 25, 0.15), (1, 60, 0.08), (2, 90, 0.05), (3, 40, 0.3), (4, 8, 0.6),
])
@pytest.mark.parametrize("order", [-1, 1])
def test_lusol_random(seed, n, dens, order):
    rng = np.random.default_rng(seed)
    d = _rand_square(rng, n, dens)
    a = rs.Sprs.new_from_vec(d.tolist())
    b = rng.standard_normal(n)
    x = rs.lusol(a, list(b), order, 1e-12)
    want = np.linalg.solve(d, b)
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("seed,n,dens", [(0, 30, 0.1), (1, 70, 0.06),
                                         (2, 50, 0.15)])
@pytest.mark.parametrize("order", [-1, 0])
def test_cholsol_random_spd(seed, n, dens, order):
    rng = np.random.default_rng(100 + seed)
    m_ = (rng.random((n, n)) < dens) * rng.standard_normal((n, n))
    d = m_ @ m_.T + np.eye(n) * (n * 0.5)  # SPD
    a = rs.Sprs.new_from_vec(d.tolist())
    b = rng.standard_normal(n)
    x = rs.cholsol(a, list(b), order)
    want = np.linalg.solve(d, b)
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize("seed,m,n", [(0, 40, 25), (1, 80, 30), (2, 33, 32)])
def test_qrsol_random_least_squares(seed, m, n):
    """Overdetermined branch (reference src/lib.rs:931-942): the solution
    minimizes ||Ax - b||, so it must match numpy lstsq."""
    rng = np.random.default_rng(200 + seed)
    d = (rng.random((m, n)) < 0.3) * rng.standard_normal((m, n))
    d[np.arange(n), np.arange(n)] += 2.0  # full column rank
    a = rs.Sprs.new_from_vec(d.tolist())
    b = rng.standard_normal(m)
    x = rs.qrsol(a, list(b) + [0.0] * 0, 2)
    want = np.linalg.lstsq(d, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x)[:n], want, rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize("seed,m,n", [(0, 20, 35), (1, 25, 60)])
def test_qrsol_random_minimum_norm(seed, m, n):
    """Underdetermined branch (src/lib.rs:943-955): A x = b exactly with x
    the minimum-norm solution (= pinv(A) b for full row rank)."""
    rng = np.random.default_rng(300 + seed)
    d = (rng.random((m, n)) < 0.4) * rng.standard_normal((m, n))
    d[np.arange(m), np.arange(m)] += 2.0  # full row rank
    a = rs.Sprs.new_from_vec(d.tolist())
    b = rng.standard_normal(m)
    x = rs.qrsol(a, list(b) + [0.0] * (n - m), 2)
    want = np.linalg.pinv(d) @ b
    np.testing.assert_allclose(np.asarray(x)[:n], want, rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ops_random_algebra(seed):
    """(alpha A + beta B), A@B, A', 1-norm vs dense numpy on one seed."""
    rng = np.random.default_rng(400 + seed)
    m, k, n = 30, 45, 20
    da = (rng.random((m, k)) < 0.2) * rng.standard_normal((m, k))
    db = (rng.random((k, n)) < 0.2) * rng.standard_normal((k, n))
    dc = (rng.random((m, k)) < 0.2) * rng.standard_normal((m, k))
    a = rs.Sprs.new_from_vec(da.tolist())
    b = rs.Sprs.new_from_vec(db.tolist())
    c = rs.Sprs.new_from_vec(dc.tolist())
    np.testing.assert_allclose(np.asarray(rs.multiply(a, b).to_dense()),
                               da @ db, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rs.add(a, c, 2.0, -0.5).to_dense()),
                               2.0 * da - 0.5 * dc, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rs.transpose(a).to_dense()),
                               da.T, rtol=0, atol=0)
    assert abs(rs.norm(a) - np.abs(da).sum(axis=0).max()) < 1e-12
    x = rng.standard_normal(k)
    y = rng.standard_normal(m)
    np.testing.assert_allclose(np.asarray(rs.gaxpy(a, list(x), list(y))),
                               da @ x + y, rtol=1e-12, atol=1e-12)


def test_lusol_singular_raises():
    n = 12
    rng = np.random.default_rng(7)
    d = rng.standard_normal((n, n))
    d[:, 4] = 0.0  # structurally singular column
    a = rs.Sprs.new_from_vec(d.tolist())
    with pytest.raises(rs.NoPivotError):
        rs.lusol(a, [1.0] * n, 1, 1e-12)


def test_cholsol_indefinite_raises():
    n = 10
    rng = np.random.default_rng(8)
    m_ = rng.standard_normal((n, n))
    d = m_ @ m_.T - np.eye(n) * 50.0  # indefinite
    a = rs.Sprs.new_from_vec(d.tolist())
    with pytest.raises(rs.NotPositiveDefiniteError):
        rs.cholsol(a, [1.0] * n, 0)


@pytest.mark.parametrize("seed,m,n,nrhs", [
    (0, 40, 25, 9), (1, 25, 40, 12), (2, 60, 60, 16),
])
def test_qrsol_multi_random(seed, m, n, nrhs):
    """Batched CSNE least-squares/minimum-norm vs numpy lstsq."""
    rng = np.random.default_rng(300 + seed)
    d = (rng.random((m, n)) < 0.3) * rng.standard_normal((m, n))
    d += np.eye(m, n) * 3.0  # well-conditioned
    a = rs.Sprs.new_from_vec(d.tolist())
    B = rng.standard_normal((m, nrhs))
    X = rs.qrsol_multi(a, B, 0)
    want = np.linalg.lstsq(d, B, rcond=None)[0]
    np.testing.assert_allclose(X, want, rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize("seed,m,n,nrhs", [(0, 35, 50, 7), (1, 80, 20, 3)])
def test_gaxpy_multi_random(seed, m, n, nrhs):
    """Batched SpMV vs dense matmul, with and without the Y addend."""
    rng = np.random.default_rng(400 + seed)
    d = (rng.random((m, n)) < 0.2) * rng.standard_normal((m, n))
    a = rs.Sprs.new_from_vec(d.tolist())
    X = rng.standard_normal((n, nrhs))
    Y = rng.standard_normal((m, nrhs))
    np.testing.assert_allclose(rs.gaxpy_multi(a, X), d @ X,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(rs.gaxpy_multi(a, X, Y), d @ X + Y,
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("seed,n,nrhs", [(0, 40, 10), (1, 90, 24)])
def test_serve_handles_random_spd(seed, n, nrhs):
    """cholsol_serve on random SPD systems (forced interpreter path)."""
    from rsparse_tpu.config import config

    rng = np.random.default_rng(500 + seed)
    m_ = (rng.random((n, n)) < 0.12) * rng.standard_normal((n, n))
    d = m_ @ m_.T + np.eye(n) * (3.0 + n * 0.05)
    a = rs.Sprs.new_from_vec(d.tolist())
    B = rng.standard_normal((n, nrhs))
    old = config.serve_mixed
    config.serve_mixed = "force"
    try:
        h = rs.cholsol_serve(a, 0)
        X = np.asarray(h(B), np.float64)
    finally:
        config.serve_mixed = old
    want = np.linalg.solve(d, B)
    np.testing.assert_allclose(X, want, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("seed,n,dens,K", [(0, 40, 0.12, 5), (1, 80, 0.06, 3)])
def test_cholsol_vals_random_spd(seed, n, dens, K):
    """Batched-values driver agrees with per-instance dense solves on
    random SPD batches sharing one pattern (small tier: host loop)."""
    rng = np.random.default_rng(300 + seed)
    m_ = (rng.random((n, n)) < dens) * rng.standard_normal((n, n))
    d0 = m_ @ m_.T + n * np.eye(n)
    a = rs.Sprs.new_from_vec(d0.tolist())
    nz = a.nnz()
    scale = 1.0 + rng.random((K, 1))
    AxK = np.tile(a.x[:nz], (K, 1)) * scale  # SPD scaling per instance
    B = rng.standard_normal((K, n))
    X = rs.cholsol_vals(a, AxK, B, 0)
    for k in range(K):
        want = np.linalg.solve(d0 * scale[k, 0], B[k])
        np.testing.assert_allclose(X[k], want, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("seed,m,n,K", [(0, 60, 35, 4), (1, 30, 55, 3)])
def test_qrsol_vals_random(seed, m, n, K):
    """Batched-values QR agrees with dense lstsq on random rectangular
    batches, both orientations (small tier: host loop)."""
    rng = np.random.default_rng(400 + seed)
    d0 = (rng.random((m, n)) < 0.25) * rng.standard_normal((m, n))
    for j in range(min(m, n)):  # full rank
        d0[j % m, j] += 4.0
    a = rs.Sprs.new_from_vec(d0.tolist())
    nz = a.nnz()
    scale = 1.0 + rng.random((K, 1))
    AxK = np.tile(a.x[:nz], (K, 1)) * scale
    B = rng.standard_normal((K, m))
    X = rs.qrsol_vals(a, AxK, B, 2)
    for k in range(K):
        want, *_ = np.linalg.lstsq(d0 * scale[k, 0], B[k], rcond=None)
        np.testing.assert_allclose(X[k], want, rtol=1e-7, atol=1e-7)
