"""One-hot-MXU general SpGEMM (ops/spgemm_general.py).

Oracle: ops.multiply (reference Gustavson semantics, src/lib.rs:713-748),
itself pinned against the reference's multiply_* tests in test_ops.py /
test_ref_port_ops.py. f64 kernels are exact (every matmul has a one-hot
operand + Precision.HIGHEST), so comparisons are at 1e-12.
"""

import numpy as np
import pytest

from rsparse_tpu import ops
from rsparse_tpu.data import Sprs, Trpl
from rsparse_tpu.ops.spgemm_general import (
    mxu_spgemm_plan, spgemm_general, spgemm_general_fn)


def _rand_sprs(rng, m, n, dens):
    d = (rng.random((m, n)) < dens) * rng.standard_normal((m, n))
    return Sprs.new_from_vec(d.tolist())


@pytest.mark.parametrize("m,k,n,da,db", [
    (40, 30, 50, 0.2, 0.15),   # rectangular, moderate fill
    (7, 9, 5, 0.5, 0.4),       # small dense-ish
    (64, 64, 64, 0.05, 0.05),  # square sparse
    (3, 4, 2, 1.0, 1.0),       # fully dense
])
def test_matches_multiply(m, k, n, da, db):
    rng = np.random.default_rng(m * 1000 + n)
    a = _rand_sprs(rng, m, k, da)
    b = _rand_sprs(rng, k, n, db)
    c_ref = ops.multiply(a, b)
    c = spgemm_general(a, b, dtype="float64")
    assert np.array_equal(c.p, c_ref.p)
    assert np.array_equal(c.i[: c.nnz()], c_ref.i[: c_ref.nnz()])
    np.testing.assert_allclose(np.asarray(c.x[: c.nnz()]),
                               np.asarray(c_ref.x[: c_ref.nnz()]),
                               rtol=0, atol=1e-12)


def test_empty_product():
    a = Sprs.zeros(5, 6, 1)
    b = Sprs.zeros(6, 4, 1)
    c = spgemm_general(a, b, dtype="float64")
    assert c.nnz() == 0
    assert c.m == 5 and c.n == 4


def test_multi_subtable_crossing():
    """nnz > 16384 forces multiple [128,128] subtables on every stream."""
    rng = np.random.default_rng(7)
    n = 40_000
    ta, tb = Trpl(), Trpl()
    perm = rng.permutation(n)
    va = rng.standard_normal(n)
    vb = rng.standard_normal(n)
    for i in range(n):
        ta.append(i, int(perm[i]), float(va[i]))
        tb.append(int(perm[i]), i, float(vb[i]))
    A, B = ta.to_sprs(), tb.to_sprs()
    c_ref = ops.multiply(A, B)
    c = spgemm_general(A, B, dtype="float64")
    assert np.array_equal(c.p, c_ref.p)
    np.testing.assert_allclose(np.asarray(c.x[: c.nnz()]),
                               np.asarray(c_ref.x[: c_ref.nnz()]),
                               rtol=0, atol=1e-12)


def test_value_refresh_through_fn():
    """Device-resident reuse: one plan, new value arrays, no replanning."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    a = _rand_sprs(rng, 48, 48, 0.1)
    b = _rand_sprs(rng, 48, 48, 0.1)
    p = mxu_spgemm_plan(a, b)
    f = spgemm_general_fn(p, "float64")
    for _ in range(2):
        ax = rng.standard_normal(a.nnz())
        bx = rng.standard_normal(b.nnz())
        a2 = Sprs(a.nnz(), a.m, a.n, a.p, a.i, ax)
        b2 = Sprs(b.nnz(), b.m, b.n, b.p, b.i, bx)
        want = ops.multiply(a2, b2)
        got = np.asarray(f(jnp.asarray(ax), jnp.asarray(bx)))
        np.testing.assert_allclose(got, np.asarray(want.x[: want.nnz()]),
                                   rtol=0, atol=1e-12)


def test_f32_tolerance():
    """The TPU-default f32 path is placement-exact, values to f32 accuracy."""
    rng = np.random.default_rng(11)
    a = _rand_sprs(rng, 60, 60, 0.1)
    b = _rand_sprs(rng, 60, 60, 0.1)
    c_ref = ops.multiply(a, b)
    c = spgemm_general(a, b)  # float32 default
    assert np.array_equal(c.p, c_ref.p)
    np.testing.assert_allclose(np.asarray(c.x[: c.nnz()]),
                               np.asarray(c_ref.x[: c_ref.nnz()]),
                               rtol=1e-5, atol=1e-5)


def test_spgemm_general_dist():
    """Sharded chunk-stream SpGEMM over the virtual mesh matches multiply."""
    from rsparse_tpu import parallel as par
    from rsparse_tpu.ops.spgemm_general import spgemm_general_dist

    import jax

    D = jax.local_device_count()
    mesh = par.make_mesh(D, data=1)
    rng = np.random.default_rng(21)
    a = _rand_sprs(rng, 70, 55, 0.12)
    b = _rand_sprs(rng, 55, 64, 0.12)
    c_ref = ops.multiply(a, b)
    c = spgemm_general_dist(a, b, mesh, dtype="float64")
    assert np.array_equal(c.p, c_ref.p)
    np.testing.assert_allclose(np.asarray(c.x[: c.nnz()]),
                               np.asarray(c_ref.x[: c_ref.nnz()]),
                               rtol=0, atol=1e-12)
