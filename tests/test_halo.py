"""Halo-exchange distributed layer (parallel/halo.py) — VERDICT item #4.

Runs on the virtual 8-device CPU mesh (conftest). x/b/r are SHARDED
(per-device memory n/D); communication is nearest-neighbor ppermute halos.
"""

import numpy as np
import pytest

import jax

import rsparse_tpu as rs
from rsparse_tpu import parallel as par
from rsparse_tpu.parallel.halo import (
    partition_rows, dist_gaxpy_halo, make_gaxpy_halo,
    halo_tri_plan, dist_tri_solve_halo, dist_lusol)


def _lap(g):
    from bench import laplacian_5pt

    n, Ap, Ai, Ax = laplacian_5pt(g)
    return rs.Sprs(len(Ax), n, n, Ap, Ai, Ax), n, Ap, Ai, Ax


@pytest.fixture(scope="module")
def mesh():
    return par.make_mesh(8, data=1)


def test_partition_memory_sharded(mesh):
    a, n, *_ = _lap(64)
    rp = partition_rows(a, 8)
    assert rp is not None
    assert rp.hops == 1  # banded: one-hop halos only
    assert rp.nb == -(-n // 8)  # per-device x length is n/D — the HBM
    # scaling SURVEY §5 asks for (no device holds the full vector)
    fn = make_gaxpy_halo(rp, mesh)
    import jax.numpy as jnp

    x = np.random.default_rng(0).standard_normal(n)
    xs = jnp.asarray(x.reshape(8, rp.nb))
    # the sharded input's per-device shape is [1, nb]
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(xs, NamedSharding(mesh, P("model")))
    assert xs.addressable_shards[0].data.shape == (1, rp.nb)


def test_gaxpy_halo_exact(mesh):
    a, n, Ap, Ai, Ax = _lap(64)
    x = np.random.default_rng(0).standard_normal(n)
    r = dist_gaxpy_halo(partition_rows(a, 8), x, np.zeros(n), mesh)
    want = np.zeros(n)
    cols = np.repeat(np.arange(n), np.diff(Ap))
    np.add.at(want, Ai, Ax * x[cols])
    assert np.abs(r - want).max() < 1e-12


def test_tri_solve_halo_both_kinds(mesh):
    import scipy.linalg as sla

    a, n, *_ = _lap(48)
    s = rs.schol(a, 0)
    nm = rs.chol(a, s)
    L = nm.l
    L.x = np.asarray(L.x)
    Ld = np.zeros((n, n))
    Ld[L.i[: L.nnz()], np.repeat(np.arange(n), np.diff(L.p))] = L.x
    b = np.random.default_rng(1).standard_normal(n)
    hp = halo_tri_plan(L, 0, 8)
    assert hp is not None
    xs = dist_tri_solve_halo(L, b.copy(), 0, mesh, plan=hp)
    assert np.abs(xs - sla.solve_triangular(Ld, b, lower=True)).max() < 1e-10
    xs2 = dist_tri_solve_halo(L, b.copy(), 2, mesh)
    assert np.abs(
        xs2 - sla.solve_triangular(Ld.T, b, lower=False)).max() < 1e-10


def test_dist_lusol_halo(mesh):
    rng = np.random.default_rng(2)
    a, n, Ap, Ai, Ax = _lap(40)
    cols = np.repeat(np.arange(n), np.diff(Ap))
    dd = np.zeros((n, n))
    dd[Ai, cols] = Ax
    dd += np.eye(n)
    for _ in range(1500):
        i, j = rng.integers(0, n, 2)
        if abs(i - j) < n // 8:
            dd[i, j] += 0.1 * rng.standard_normal()
    a2 = rs.Sprs.new_from_vec([list(r_) for r_ in dd])
    xt = rng.standard_normal(n)
    x = dist_lusol(a2, dd @ xt, mesh, 1)
    assert np.abs(x - xt).max() < 1e-8


def test_dist_qrsol_halo(mesh):
    from rsparse_tpu.parallel.halo import dist_qrsol

    rng = np.random.default_rng(5)
    m, n = 220, 150
    d = np.zeros((m, n))
    for i in range(n):
        d[i, i] = 5.0 + rng.random()
    for _ in range(700):
        i, j = rng.integers(0, m), rng.integers(0, n)
        d[i, j] += rng.standard_normal()
    a = rs.Sprs.new_from_vec([list(r_) for r_ in d])
    b = rng.standard_normal(m)
    x = dist_qrsol(a, b, mesh, 0)
    want, *_ = np.linalg.lstsq(d, b, rcond=None)
    assert np.abs(x - want).max() < 1e-8
    # minimum-norm branch
    dt = d.T
    a2 = rs.Sprs.new_from_vec([list(r_) for r_ in dt])
    b2 = rng.standard_normal(n)
    x2 = dist_qrsol(a2, b2, mesh, 0)
    want2 = np.linalg.pinv(dt) @ b2
    assert np.abs(x2 - want2).max() < 1e-7


def test_dist_lusol_halo_crossing_labels(mesh):
    """dist_lusol must stay correct when the MF-LU export carries
    elimination labels that cross front ranges (skeleton pivoting) —
    the halo sweeps ride the topological level schedule."""
    rng = np.random.default_rng(0)
    m = 150
    d = (rng.random((m, m)) < 0.06) * rng.standard_normal((m, m))
    np.fill_diagonal(d, d.diagonal() + 0.01 * rng.random(m))
    a = rs.Sprs.new_from_vec(d.tolist())
    # force the MF path (the fixture is below mf_min_n by default)
    from rsparse_tpu.config import config

    old = config.mf_min_n
    config.mf_min_n = 100
    try:
        b = rng.standard_normal(m)
        x = dist_lusol(a, b.copy(), mesh, 1)
    finally:
        config.mf_min_n = old
    assert np.abs(d @ np.asarray(x) - b).max() < 1e-8


def test_tri_solve_prefetch_matches_blocking():
    """The comm/compute-overlap path (full halo prefetched a block early
    + F-wide fresh patch on the critical path) must be bit-identical to
    the blocking exchange-per-block path: both present the same snapshot
    to every block (DESIGN.md 'Halo prefetch overlap')."""
    import jax

    from rsparse_tpu import parallel as par
    from rsparse_tpu.parallel import halo as H

    D = jax.local_device_count()
    mesh = par.make_mesh(D, data=1)
    rng = np.random.default_rng(3)
    n = 96
    # banded lower-triangular with cross-shard reach
    dense = np.eye(n) * 4.0
    for off in (1, 2, 7, 13):
        idx = np.arange(n - off)
        dense[idx + off, idx] = rng.standard_normal(n - off)
    t = rs.Sprs.new_from_vec(dense.tolist())
    b = rng.standard_normal(n)
    for kind in (0, 2):
        x_pf = np.asarray(H.dist_tri_solve_halo(t, b.copy(), kind, mesh,
                                                prefetch=True))
        x_bl = np.asarray(H.dist_tri_solve_halo(t, b.copy(), kind, mesh,
                                                prefetch=False))
        np.testing.assert_array_equal(x_pf, x_bl)
        # oracle: dense triangular solve
        mat = dense if kind == 0 else dense.T
        want = np.linalg.solve(mat, b)
        np.testing.assert_allclose(x_pf[:n], want, rtol=0, atol=1e-9)
