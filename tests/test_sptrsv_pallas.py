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
