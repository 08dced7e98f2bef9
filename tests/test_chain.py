"""Device-resident op chaining (ops/chain.py): one program per pipeline.

Oracle: the eager L2 ops composed step by step (themselves pinned against
the reference's tests in test_ops.py / test_ref_port_ops.py). f64 chains
are exact, so comparisons are at 1e-12.
"""

import numpy as np
import pytest

from rsparse_tpu import ops
from rsparse_tpu.data import Sprs
from rsparse_tpu.ops import chain


def _rand(rng, m, n, dens):
    d = (rng.random((m, n)) < dens) * rng.standard_normal((m, n))
    return Sprs.new_from_vec(d.tolist())


def _assert_same(c, want):
    assert np.array_equal(np.asarray(c.p), np.asarray(want.p))
    assert np.array_equal(c.i[: c.nnz()], want.i[: want.nnz()])
    np.testing.assert_allclose(np.asarray(c.x[: c.nnz()]),
                               np.asarray(want.x[: want.nnz()]),
                               rtol=0, atol=1e-12)


def test_gram_chain():
    """(AᵀA)*2 + I·mu — the qrsol/CSNE Gram pipeline, one program."""
    rng = np.random.default_rng(0)
    a = _rand(rng, 30, 22, 0.25)
    eye = Sprs.eye(22)
    e = chain(a).transpose().multiply(a).scale(2.0).add(eye, beta=0.5)
    got = e.run()
    want = ops.add(ops.scxmat(2.0, ops.multiply(ops.transpose(a), a)),
                   eye, 1.0, 0.5)
    _assert_same(got, want)


def test_chain_reuse_fresh_values():
    """values_fn is a serving handle: same pattern, fresh values, no
    rebuild; distinct leaf matrices get one arg slot each."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    a = _rand(rng, 20, 20, 0.3)
    b = _rand(rng, 20, 20, 0.3)
    e = chain(a).multiply(b).add(a, alpha=1.0, beta=-3.0)
    f = e.values_fn()
    assert len(e.leaves()) == 2
    for seed in (2, 3):
        r2 = np.random.default_rng(seed)
        ax = r2.standard_normal(a.nnz())
        bx = r2.standard_normal(b.nnz())
        got = np.asarray(f(jnp.asarray(ax), jnp.asarray(bx)))
        a2 = Sprs(a.nnz(), a.m, a.n, a.p, a.i, ax)
        b2 = Sprs(b.nnz(), b.m, b.n, b.p, b.i, bx)
        want = ops.add(ops.multiply(a2, b2), a2, 1.0, -3.0)
        np.testing.assert_allclose(got, np.asarray(want.x[: want.nnz()]),
                                   rtol=0, atol=1e-12)


def test_chain_leaf_dedup():
    """chain(A)ᵀ·A uses ONE slot for A."""
    rng = np.random.default_rng(4)
    a = _rand(rng, 15, 15, 0.3)
    e = chain(a).transpose().multiply(a)
    assert len(e.leaves()) == 1
    _assert_same(e.run(), ops.multiply(ops.transpose(a), a))


def test_chain_scalar_ops_and_transpose():
    rng = np.random.default_rng(5)
    a = _rand(rng, 12, 18, 0.4)
    e = chain(a).add_scalar(1.25).transpose().scale(-2.0)
    want = ops.scxmat(-2.0, ops.transpose(ops.scpmat(1.25, a)))
    _assert_same(e.run(), want)


def test_chain_mxu_multiply_kernel():
    """The MXU multiply kernel inside a chain is exact in f64."""
    rng = np.random.default_rng(6)
    a = _rand(rng, 40, 30, 0.2)
    b = _rand(rng, 30, 25, 0.2)
    e = chain(a).multiply(b)
    got = e.run(multiply_kernel="mxu")
    _assert_same(got, ops.multiply(a, b))
