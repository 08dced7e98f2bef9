"""Pallas streaming SpMM kernel (ops/spmm_pallas.py) + ops.gaxpy_multi.

On the CPU test backend the kernel runs through the Pallas interpreter,
exercising the same chunk-DMA/index logic Mosaic compiles on TPU. Batched
extension of the reference's single-RHS gaxpy (src/lib.rs:411-421).
"""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu.config import config
from rsparse_tpu.ops.spmm_pallas import (spmm_pallas, spmm_pallas_available,
                                         spmm_plan_cached)

ASSETS = "/root/reference/tests/assets"


def _rand_sprs(m, n, nnz, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    k = np.unique(c * np.int64(m) + r)
    c2, r2 = k // m, (k % m).astype(np.int64)
    v = rng.standard_normal(len(k)).astype(dtype)
    p = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(c2, minlength=n), out=p[1:])
    return rs.Sprs(len(v), m, n, p, r2, v)


@pytest.mark.parametrize("shape", [(300, 211), (64, 64), (17, 500)])
def test_spmm_kernel_random(shape):
    m, n = shape
    a = _rand_sprs(m, n, 4 * max(m, n), seed=m + n)
    rng = np.random.default_rng(2)
    X = rng.standard_normal((n, 16))
    got = np.asarray(spmm_pallas(a, X), np.float64)
    want = np.asarray(a.to_dense_np()) @ X
    err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-5, err


def test_spmm_kernel_reference_asset():
    """Multi-chunk streaming: cholsol_7's 25k entries span 25 SMEM chunks."""
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_7.sprs")
    rng = np.random.default_rng(3)
    X = rng.standard_normal((a.n, 8))
    got = np.asarray(spmm_pallas(a, X), np.float64)
    want = np.stack(
        [np.asarray(rs.gaxpy(a, list(X[:, j]), [0.0] * a.m))
         for j in range(X.shape[1])], axis=1)
    err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-4, err
    # plan caches per pattern
    assert spmm_plan_cached(a) is spmm_plan_cached(a)


def test_spmm_empty_and_availability():
    e = rs.Sprs.zeros(4, 5, 1)
    out = np.asarray(spmm_pallas(e, np.ones((5, 8))))
    assert out.shape == (4, 8) and np.all(out == 0)
    assert spmm_pallas_available(8000, 8000, 128, np.float32)
    assert not spmm_pallas_available(8000, 8000, 128, np.float64)
    assert not spmm_pallas_available(80_000, 80_000, 128, np.float32)


def test_gaxpy_multi_matches_gaxpy():
    a = _rand_sprs(120, 90, 600, seed=5)
    rng = np.random.default_rng(6)
    X = rng.standard_normal((90, 5))
    Y = rng.standard_normal((120, 5))
    got = rs.gaxpy_multi(a, X, Y)
    want = np.stack(
        [np.asarray(rs.gaxpy(a, list(X[:, j]), list(Y[:, j])))
         for j in range(5)], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    with pytest.raises(ValueError):
        rs.gaxpy_multi(a, np.ones(90))  # 1-D rejected


def test_gaxpy_multi_pallas_dispatch():
    """f32 matrix + forced serving config routes through the kernel."""
    a = _rand_sprs(200, 200, 1200, seed=7, dtype=np.float32)
    rng = np.random.default_rng(8)
    X = rng.standard_normal((200, 16)).astype(np.float32)
    want = rs.gaxpy_multi(a, X.astype(np.float64))  # host f64 oracle...
    old = config.serve_mixed
    config.serve_mixed = "force"
    try:
        got = rs.gaxpy_multi(a, X)
    finally:
        config.serve_mixed = old
    err = np.abs(np.asarray(got, np.float64) - want).max() / max(
        1.0, np.abs(want).max())
    assert err < 1e-5, err


def test_gaxpy_multi_y_shapes():
    """Y semantics: [m, B] exact, [m] broadcasts per-row (gaxpy-style
    down columns, NOT across); wrong shapes raise."""
    d = np.array([[1.0, 0.0], [2.0, 3.0], [0.0, 4.0]])
    a = rs.Sprs.new_from_vec(d.tolist())
    X = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    y1 = np.array([10.0, 20.0, 30.0])  # per-row addend
    got = rs.gaxpy_multi(a, X, y1)
    want = d @ X + y1[:, None]
    np.testing.assert_allclose(got, want, rtol=1e-14)
    with pytest.raises(ValueError):
        rs.gaxpy_multi(a, X, np.ones((2, 3)))  # wrong m
    with pytest.raises(ValueError):
        rs.gaxpy_multi(a, X, np.ones((3, 2)))  # wrong B
    with pytest.raises(ValueError):
        rs.gaxpy_multi(a, X, np.ones(2))  # wrong 1-D length


def test_serve_handle_value_invalidation():
    """sym reuse with refreshed values must rebuild the cached serve
    handle, not silently lose the serving path (or return stale x)."""
    from rsparse_tpu.config import config
    from bench import laplacian_5pt

    n, p, i, x = laplacian_5pt(8)
    a1 = rs.Sprs(len(x), n, n, p, i, x)
    a2 = rs.Sprs(len(x), n, n, p.copy(), i.copy(), x * 2.0)  # same pattern
    rng = np.random.default_rng(23)
    B = rng.standard_normal((n, 16))
    old = config.serve_mixed
    config.serve_mixed = "force"
    try:
        s = rs.schol(a1, 0)
        X1 = rs.cholsol_multi(a1, B, 0, sym=s)
        X2 = rs.cholsol_multi(a2, B, 0, sym=s)  # values changed, same sym
    finally:
        config.serve_mixed = old
    d1 = np.asarray(a1.to_dense_np())
    assert np.abs(d1 @ X1 - B).max() < 1e-9 * max(1.0, np.abs(B).max())
    assert np.abs(2 * d1 @ X2 - B).max() < 1e-9 * max(1.0, np.abs(B).max())
