"""Device LU kernel tests: static-pivot acceptance, stability fallback,
golden-solution parity (reference lu semantics src/lib.rs:519-622)."""

import json

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu.factor.lu_device import LUPlan, build_lu_plan, lu_device

from conftest import ASSETS, GOLDEN


def _dd_matrix(n, seed=0, density=0.3):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, n)) * (rng.random((n, n)) < density)
    d += np.diag(np.abs(d).sum(1) + 1.0)  # diagonally dominant
    return d


def _reconstruct(n, Lp, Li, Lx, Up, Ui, Ux):
    L = np.zeros((n, n))
    U = np.zeros((n, n))
    for k in range(n):
        L[Li[Lp[k] : Lp[k + 1]], k] = Lx[Lp[k] : Lp[k + 1]]
        U[Ui[Up[k] : Up[k + 1]], k] = Ux[Up[k] : Up[k + 1]]
    return L, U


def test_static_pivot_accepted_and_exact():
    n = 40
    d = _dd_matrix(n)
    a = rs.Sprs.new_from_vec(d.tolist())
    s = rs.sqr(a, -1, False)
    Lp, Li, Lx, Up, Ui, Ux, pinv = lu_device(a, s, 1e-6)
    assert np.array_equal(pinv, np.arange(n)), "diag-dominant must stay on device"
    L, U = _reconstruct(n, Lp, Li, Lx, Up, Ui, Ux)
    assert np.abs(L @ U - d).max() < 1e-10


def test_fallback_on_pivoting_matrix():
    """A matrix with a tiny diagonal forces the tol rule to reject the
    static pivot; the result must still be reference-exact (host fallback)."""
    d = np.array([[1e-14, 1.0, 0.0],
                  [1.0, 2.0, 1.0],
                  [0.0, 1.0, 3.0]])
    a = rs.Sprs.new_from_vec(d.tolist())
    s = rs.sqr(a, -1, False)
    Lp, Li, Lx, Up, Ui, Ux, pinv = lu_device(a, s, 1e-6)
    assert not np.array_equal(pinv, np.arange(3)), "must have pivoted"
    # P L U == A: rows of L are in pinv numbering
    x = rs.lusol(a, [1.0, 2.0, 3.0], -1, 1e-6)
    want = np.linalg.solve(d, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.array(x), want, rtol=1e-9)


def test_lu_plan_levels_cover_all_columns():
    # natural order keeps the (structurally full) diagonal of this SPD-
    # patterned asset in place; AMD's column permutation may legitimately
    # zero a diagonal, which raises NoPivotError -> host fallback instead
    a = rs.Sprs.new_from_file(f"{ASSETS}/allsol_1.sprs")
    s = rs.sqr(a, -1, False)
    plan = build_lu_plan(a, s)
    assert isinstance(plan, LUPlan)
    cols = 0
    for tensors in plan.levels:
        vmask = tensors[-1]
        cols += int(vmask.sum())
    assert cols == a.n


def test_device_lu_matches_host_on_asset():
    a = rs.Sprs.new_from_file(f"{ASSETS}/lusol_3.sprs")
    b = list(np.linspace(0.5, 1.5, a.n))
    rs.config.backend = "host"
    xh = np.array(rs.lusol(a, list(b), 1, 1e-6))
    rs.config.backend = "device"
    xd = np.array(rs.lusol(a, list(b), 1, 1e-6))
    resid_h = np.abs(np.asarray(rs.gaxpy(a, list(xh), [0.0] * a.m)) - b).max()
    resid_d = np.abs(np.asarray(rs.gaxpy(a, list(xd), [0.0] * a.m)) - b).max()
    assert resid_d < max(1e-8, 10 * resid_h + 1e-12)


@pytest.mark.parametrize("name", ["lusol_1", "lusol_2", "lusol_5"])
def test_device_lusol_goldens(name):
    g = json.load(open(f"{GOLDEN}/{name}.json"))
    if g.get("asset"):
        a = rs.Sprs.new_from_file(f"{ASSETS}/{g['asset']}.sprs")
    else:
        a = rs.Sprs.new_from_vec(g["dense"])
    rs.config.backend = "device"
    x = rs.lusol(a, list(g["b"]), g["order"], g.get("tol") or 1e-6)
    tol = g.get("tol") or 1e-6
    err = max(abs(u - v) for u, v in zip(x, g["x"]))
    assert err < tol, f"{name}: {err} >= {tol}"
