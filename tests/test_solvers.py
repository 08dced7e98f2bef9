"""Solver tests — ports of the reference's solver_tests.rs, driven by the
extracted goldens (tests/golden/*.json) and the original .sprs assets
(loaded verbatim from the reference's tests/assets — the compatibility
contract of SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu import Sprs, NotPositiveDefiniteError

from conftest import ASSETS, GOLDEN
from utils import assert_eq_f_vec


def load_golden(name):
    with open(os.path.join(GOLDEN, f"{name}.json")) as f:
        return json.load(f)


def get_matrix(g):
    if "asset" in g:
        return Sprs.new_from_file(os.path.join(ASSETS, g["asset"]))
    return Sprs.new_from_vec(g["dense"])


def run_solver(g, b):
    if g["solver"] == "cholsol":
        return rs.cholsol(get_matrix(g), b, g.get("order", 0))
    if g["solver"] == "lusol":
        return rs.lusol(get_matrix(g), b, g.get("order", 1), g.get("lu_tol", 1e-12))
    if g["solver"] == "qrsol":
        return rs.qrsol(get_matrix(g), b, g.get("order", 2))
    raise ValueError(g["solver"])


# --- dense triangular solves (lsolve_1, ltsolve_1, usolve_1, utsolve_1) ----


@pytest.mark.parametrize("name,fn", [
    ("lsolve_1", rs.lsolve),
    ("ltsolve_1", rs.ltsolve),
    ("usolve_1", rs.usolve),
    ("utsolve_1", rs.utsolve),
])
def test_trisolve(name, fn):
    g = load_golden(name)
    t = Sprs.new_from_vec(g["dense"])
    b = list(g["b"])
    fn(t, b)
    assert_eq_f_vec(b, g["x"], g["tol"])


# --- golden-x solver tests ---------------------------------------------------


GOLDEN_X = [
    "lusol_1", "lusol_2", "lusol_3", "lusol_4", "lusol_5", "lusol_6",
    "cholsol_1", "cholsol_2", "cholsol_3", "cholsol_4", "cholsol_5",
    "qrsol_1", "qrsol_2", "qrsol_3", "qrsol_4", "qrsol_5", "qrsol_6", "qrsol_7",
]


@pytest.mark.parametrize("name", GOLDEN_X)
def test_solver_golden(name):
    g = load_golden(name)
    b = list(g["b"])
    if "x" in g and g.get("tol"):
        assert b != g["x"][: len(b)]
    out = run_solver(g, b)
    assert_eq_f_vec(out[: len(g["x"])] if len(out) >= len(g["x"]) else out, g["x"], g["tol"])
    # reference overwrites b in place; verify our in-place parity for lists
    assert_eq_f_vec(b[: len(out)], out, 0.0)


# --- should-panic: non-SPD input -> NotPositiveDefinite ------------------------


def test_cholsol_6_not_positive_definite():
    g = load_golden("cholsol_6")
    with pytest.raises(NotPositiveDefiniteError):
        rs.cholsol(get_matrix(g), list(g["b"]), g.get("order", 0))


# --- residual-oracle tests (qrsol_8, qrsol_9, cholsol_7) ----------------------


def test_qrsol_8_least_squares_residual():
    g = load_golden("qrsol_8")
    a = get_matrix(g)  # 200x201? (rectangular)
    b = list(g["b"])
    b_static = list(g["b"])
    x = rs.qrsol(a, b, 2)
    r = rs.gaxpy(a, x, [0.0] * a.m)
    assert_eq_f_vec(r, b_static, 1e-6)


def test_qrsol_9_underdetermined_residual():
    g = load_golden("qrsol_9")
    a = rs.transpose(get_matrix(g))  # reference transposes to 201x200... -> m<n
    b = list(g["b"])
    b_static = list(g["b"])
    x = rs.qrsol(a, b, 2)
    r = rs.gaxpy(a, x, [0.0] * a.m)
    assert_eq_f_vec(r[: a.m], b_static[: a.m], 1e-1)


def test_cholsol_7_residual():
    g = load_golden("cholsol_7")
    a = get_matrix(g)
    b = list(g["b"])
    b_static = list(g["b"])
    x = rs.cholsol(a, b, 0)
    r = rs.gaxpy(a, x, [0.0] * a.m)
    assert_eq_f_vec(r, b_static, 1e-1)


# --- cross-solver agreement ----------------------------------------------------


def test_allsol_1_cross_agreement():
    g = load_golden("allsol_1")
    a = get_matrix(g)
    b = g["b"]
    x_chol = rs.cholsol(a, list(b), 0)
    x_qr = rs.qrsol(a, list(b), 2)
    x_lu = rs.lusol(a, list(b), 1, 1e-12)
    assert_eq_f_vec(x_chol, x_qr, 1e-12)
    assert_eq_f_vec(x_chol, x_lu, 1e-12)


def test_allsol_2_large_cross_agreement():
    g = load_golden("allsol_2")
    a = get_matrix(g)
    b = g["b"]
    x_qr = rs.qrsol(a, list(b), 2)
    x_lu = rs.lusol(a, list(b), 1, 1e-12)
    assert_eq_f_vec(x_lu, x_qr, 1e-1)
    assert_eq_f_vec(rs.gaxpy(a, x_qr, [0.0] * a.m), b, 1e-12)
    assert_eq_f_vec(rs.gaxpy(a, x_lu, [0.0] * a.m), b, 1e-12)


def test_qrsol_sym_reuse():
    """qrsol(sym=) matches the fresh-analysis result for both branches."""
    import rsparse_tpu as rs
    from rsparse_tpu.symbolic import sqr

    a = rs.Sprs.new_from_file(f"{ASSETS}/qrsol_5.sprs")
    b = list(np.linspace(0.3, 1.7, a.m))
    want = np.asarray(rs.qrsol(a, list(b), 2))
    s = sqr(a, 2, True)
    for _ in range(2):  # second call reuses the cached device plans
        got = np.asarray(rs.qrsol(a, list(b), 2, sym=s))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)

    # underdetermined: analysis of A'
    rng = np.random.default_rng(5)
    d = (rng.random((12, 20)) < 0.4) * rng.standard_normal((12, 20))
    d[np.arange(12), np.arange(12)] += 2.0
    aw = rs.Sprs.new_from_vec(d.tolist())
    bw = list(rng.standard_normal(12))
    want_w = np.asarray(rs.qrsol(aw, list(bw) + [0.0] * 8, 2))
    sw = sqr(rs.transpose(aw), 2, True)
    got_w = np.asarray(rs.qrsol(aw, list(bw) + [0.0] * 8, 2, sym=sw))
    np.testing.assert_allclose(got_w, want_w, rtol=0, atol=1e-10)


def test_qrsol_underdetermined_numpy_b_writeback():
    """Underdetermined qrsol with a NUMPY b (fixed-size, cannot grow like
    the reference's Vec): the solution arrives via the return value and
    the writeback must not raise (regression: broadcast error)."""
    a = rs.Sprs.new_from_file(f"{ASSETS}/qrsol_8.sprs")  # 200x201, m < n
    rng = np.random.default_rng(11)
    b = rng.standard_normal(a.m)
    keep = b.copy()
    x = np.asarray(rs.qrsol(a, b, 2))
    assert x.shape == (a.n,)
    resid = np.abs(np.asarray(rs.gaxpy(a, list(x), [0.0] * a.m)) - keep).max()
    assert resid < 1e-8
    # b untouched (no partial garbage writeback)
    assert np.array_equal(b, keep)
