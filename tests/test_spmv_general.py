"""One-hot-MXU general-sparsity SpMV (ops/spmv_general.py).

Routing data through MXU matmuls must be bit-identical to real gathers
(one-hot operands are exact; Precision.HIGHEST makes the value operand
exact). Placement is validated with integer-valued probes across subtable
boundaries; float results compare against an f64 reference.
"""

import numpy as np
import pytest

from rsparse_tpu.data import Sprs
from rsparse_tpu.ops.spmv_general import (
    mxu_spmv_plan, spmv_general, spmv_general_fn)


def _rand_csc(m, n, nnz, seed=0, ones=False):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    k = np.unique(c * np.int64(m) + r)
    c2 = k // m
    r2 = (k % m).astype(np.int64)
    v = np.ones(len(k)) if ones else rng.standard_normal(len(k))
    p = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(c2, minlength=n), out=p[1:])
    return Sprs(len(k), m, n, p, r2, v)


def _dense_ref(a, x):
    cols = np.repeat(np.arange(a.n), np.diff(a.p))
    want = np.zeros(a.m)
    np.add.at(want, a.i[: a.nnz()], a.x[: a.nnz()] * np.asarray(x)[cols])
    return want


def test_placement_exact_multi_subtable():
    # n spans 4 subtables; x = subtable-id sentinel catches wrong-block reads
    n = 50000
    a = _rand_csc(n, n, 120000, ones=True)
    plan = mxu_spmv_plan(a)
    f = spmv_general_fn(plan)
    import jax.numpy as jnp

    x = (np.arange(n) // 16384 + 1).astype(np.float32)
    r = np.asarray(f(jnp.asarray(plan.vals), jnp.asarray(x)))
    assert np.array_equal(r, _dense_ref(a, x.astype(np.float64)))


def test_float_accuracy_random_pattern():
    a = _rand_csc(9000, 9000, 60000, seed=3)
    x = np.random.default_rng(1).standard_normal(9000)
    r = np.asarray(spmv_general(a, x), np.float64)
    want = _dense_ref(a, x)
    scale = max(1.0, np.abs(want).max())
    assert np.abs(r - want).max() < 1e-5 * scale


def test_rectangular():
    a = _rand_csc(500, 20000, 8000, seed=4)
    x = np.random.default_rng(2).standard_normal(20000)
    r = np.asarray(spmv_general(a, x), np.float64)
    want = _dense_ref(a, x)
    assert np.abs(r - want).max() < 1e-5 * max(1.0, np.abs(want).max())


def test_value_refresh_via_perm():
    a = _rand_csc(3000, 3000, 15000, seed=6)
    plan = mxu_spmv_plan(a)
    f = spmv_general_fn(plan)
    import jax.numpy as jnp

    x = np.random.default_rng(3).standard_normal(3000)
    # refresh values without replanning: scatter new a.x through plan.perm
    a.x = a.x * 2.0
    vals = np.zeros(plan.vals.shape, plan.vals.dtype).reshape(-1)
    vals[plan.perm] = a.x[: a.nnz()].astype(plan.vals.dtype)
    r = np.asarray(f(jnp.asarray(vals.reshape(plan.vals.shape)),
                     jnp.asarray(x, np.float32)), np.float64)
    want = _dense_ref(a, x)
    assert np.abs(r - want).max() < 1e-5 * max(1.0, np.abs(want).max())
