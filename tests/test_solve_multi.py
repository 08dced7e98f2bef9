"""Batched-RHS triangular solves and cholsol_multi (TPU serving shape)."""

import numpy as np
import pytest

import rsparse_tpu as rs

from conftest import ASSETS


def _factor(name, order):
    a = rs.Sprs.new_from_file(f"{ASSETS}/{name}.sprs")
    s = rs.schol(a, order)
    return a, rs.chol(a, s).l, s


@pytest.mark.parametrize("kind", ["l", "lt", "u", "ut"])
def test_multi_matches_single(kind):
    a, l, _ = _factor("cholsol_2", 0)
    t = rs.transpose(l) if kind in ("u", "ut") else l
    fn_multi = {
        "l": rs.lsolve_multi, "lt": rs.ltsolve_multi,
        "u": rs.usolve_multi, "ut": rs.utsolve_multi,
    }[kind]
    fn_one = {"l": rs.lsolve, "lt": rs.ltsolve, "u": rs.usolve, "ut": rs.utsolve}[kind]
    rng = np.random.default_rng(0)
    X = rng.standard_normal((t.n, 5))
    got = fn_multi(t, X)
    for c in range(5):
        want = fn_one(t, list(X[:, c]))
        np.testing.assert_allclose(got[:, c], np.asarray(want), rtol=1e-12, atol=1e-12)


def test_cholsol_multi_matches_cholsol():
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_2.sprs")
    rng = np.random.default_rng(1)
    B = rng.standard_normal((a.n, 4))
    X = rs.cholsol_multi(a, B, 0)
    for c in range(4):
        want = rs.cholsol(a, list(B[:, c]), 0)
        np.testing.assert_allclose(X[:, c], np.asarray(want), rtol=1e-10, atol=1e-10)


def test_cholsol_multi_residual_large():
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_7.sprs")  # 4000x4000
    rng = np.random.default_rng(2)
    B = rng.standard_normal((a.n, 3))
    X = rs.cholsol_multi(a, B, 0)
    # cholsol reads only triu(A) (reference symperm semantics,
    # src/lib.rs:2369-2408) and this asset is NOT exactly symmetric — the
    # correct residual operator is the symmetrized triu-based matrix.
    d = a.to_dense_np()
    sym = np.triu(d) + np.triu(d, 1).T
    R = sym @ X - B
    assert np.abs(R).max() < 1e-9


def test_cholsol_ir_recovers_f64_accuracy():
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_2.sprs")
    rng = np.random.default_rng(3)
    b = rng.standard_normal(a.n)
    x64 = np.asarray(rs.cholsol(a, list(b), 0))
    x_ir = np.asarray(rs.cholsol_ir(a, list(b), 0, "float32", refine=3))
    # f32 factor alone is ~1e-6; refinement must reach f64-class accuracy
    assert np.abs(x_ir - x64).max() < 1e-10


def test_sym_reuse_across_solves():
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_2.sprs")
    s = rs.schol(a, 0)
    rng = np.random.default_rng(4)
    b1 = rng.standard_normal(a.n)
    b2 = rng.standard_normal(a.n)
    x1 = np.asarray(rs.cholsol(a, list(b1), 0, sym=s))
    x2 = np.asarray(rs.cholsol(a, list(b2), 0, sym=s))
    assert s.plan is not None  # device plan cached on the Symb
    np.testing.assert_allclose(x1, np.asarray(rs.cholsol(a, list(b1), 0)),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(x2, np.asarray(rs.cholsol(a, list(b2), 0)),
                               rtol=1e-12, atol=1e-12)


def test_lusol_multi_matches_lusol():
    a = rs.Sprs.new_from_file(f"{ASSETS}/lusol_3.sprs")
    rng = np.random.default_rng(6)
    B = rng.standard_normal((a.n, 3))
    s = rs.sqr(a, 1, False)
    X = rs.lusol_multi(a, B, 1, 1e-6, sym=s)
    for c in range(3):
        want = rs.lusol(a, list(B[:, c]), 1, 1e-6)
        np.testing.assert_allclose(X[:, c], np.asarray(want), rtol=1e-9, atol=1e-9)


def test_qrsol_ls_matches_qrsol_overdetermined():
    a = rs.Sprs.new_from_file(f"{ASSETS}/qrsol_8.sprs")  # 200x201? -> use transpose
    at = rs.transpose(a)  # tall 201x200
    t = at if at.m >= at.n else a
    rng = np.random.default_rng(9)
    b = rng.standard_normal(t.m)
    want = np.asarray(rs.qrsol(t, list(b), 2))[: t.n]
    got = np.asarray(rs.qrsol_ls(t, b, 0, refine=3))
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)


def test_qrsol_ls_minimum_norm():
    a = rs.Sprs.new_from_vec([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    b = [1.0, 2.0]
    want = np.asarray(rs.qrsol(a, list(b), 2))
    got = np.asarray(rs.qrsol_ls(a, b, 0, refine=3))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)
