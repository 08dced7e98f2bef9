"""L2 op tests — ports of basic_tests.rs (transpose_*, gaxpy_*, multiply_*,
add_*, scpmat/scxmat, operator overloads, ops_order precedence, norm_1).
Reference-extracted dense inputs live in tests/golden/basic_*.json; ground
truth is recomputed with numpy (same oracle the reference hardcodes)."""

import json
import os

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu import Sprs

from conftest import GOLDEN
from utils import assert_eq_f2d_vec


def load_basic(name):
    with open(os.path.join(GOLDEN, f"basic_{name}.json")) as f:
        return json.load(f)


def dense(s):
    return s.to_dense_np()


def test_transpose_1():
    d = np.asarray(load_basic("multiply_4")["dense_a"])
    a = Sprs.new_from_vec(d)
    assert np.array_equal(dense(rs.transpose(a)), d.T)


def test_transpose_2_involution():
    rng = np.random.RandomState(1)
    d = rng.rand(10, 10)
    a = Sprs.new_from_vec(d)
    assert np.allclose(dense(rs.transpose(rs.transpose(a))), d)


def test_transpose_3_identity():
    a = Sprs.new_from_vec(np.eye(3))
    assert np.array_equal(dense(rs.transpose(a)), np.eye(3))


def test_transpose_4_column():
    d = np.arange(1.0, 11.0).reshape(10, 1)
    a = Sprs.new_from_vec(d)
    assert np.array_equal(dense(rs.transpose(a)), d.T)


def test_gaxpy_1():
    a = Sprs.new_from_vec([[0.0, 0.0, 2.0], [1.0, 0.0, 0.0], [9.0, 9.0, 9.0]])
    assert rs.gaxpy(a, [1.0, 2.0, 3.0], [3.0, 2.0, 1.0]) == [9.0, 3.0, 55.0]


def test_gaxpy_2():
    d = load_basic("gaxpy_2")["dense_a"]
    a = Sprs.new_from_vec(d)
    x = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 0.0]
    y = [0.0, 9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 3.0, 2.0, 1.0]
    expect = (np.asarray(d) @ np.asarray(x) + np.asarray(y)).tolist()
    assert rs.gaxpy(a, x, y) == pytest.approx(expect)


def test_multiply_1():
    a = Sprs.new_from_vec([[0.0, 0.0, 2.0], [1.0, 0.0, 0.0], [9.0, 9.0, 9.0]])
    b = Sprs.new_from_vec([[0.0, 0.0, 2.0], [1.0, 0.0, 0.0], [9.0, 1.0, 9.0]])
    c = rs.multiply(a, b)
    assert dense(c).tolist() == [[18.0, 2.0, 18.0], [0.0, 0.0, 2.0], [90.0, 9.0, 99.0]]


def test_multiply_2_exact_structure():
    a = Sprs.new_from_vec([[1.0, 1.0, 3.0], [5.0, 0.0, 0.0], [2.0, 2.0, 0.0]])
    b = Sprs.new_from_vec(np.eye(3))
    c = rs.multiply(a, b)
    assert list(c.x) == [1.0, 5.0, 2.0, 1.0, 2.0, 3.0]
    assert list(c.i) == [0, 1, 2, 0, 2, 0]
    assert list(c.p) == [0, 3, 5, 6]


def test_multiply_3_identity_both_sides():
    a = Sprs.new_from_vec([[1.0, 1.0, 3.0], [5.0, 0.0, 0.0], [2.0, 2.0, 0.0]])
    b = Sprs.new_from_vec(np.eye(3))
    assert dense(rs.multiply(a, b)).tolist() == dense(a).tolist()
    assert dense(rs.multiply(b, a)).tolist() == dense(a).tolist()


@pytest.mark.parametrize("name", ["multiply_4", "multiply_5"])
def test_multiply_dense_oracle(name):
    g = load_basic(name)
    da = np.asarray(g["dense_a"])
    db = np.asarray(g["dense_b"])
    c = rs.multiply(Sprs.new_from_vec(da), Sprs.new_from_vec(db))
    assert_eq_f2d_vec(dense(c), da @ db, 1e-10)


def test_multiply_6_rank1():
    d = np.zeros((5, 5))
    d[2, 3] = -1.0
    a = Sprs.new_from_vec(d)
    b = rs.transpose(a)
    c = rs.multiply(a, b)
    assert_eq_f2d_vec(dense(c), d @ d.T, 1e-12)


def test_multiply_7_ata():
    g = load_basic("multiply_7")
    da = np.asarray(g["dense_a"])
    a = Sprs.new_from_vec(da)
    at = rs.transpose(a)
    c = rs.multiply(at, a)
    assert_eq_f2d_vec(dense(c), da.T @ da, 1e-8)


def test_add_1():
    g = load_basic("add_1")
    da, db = np.asarray(g["dense_a"]), np.asarray(g["dense_b"])
    a, b = Sprs.new_from_vec(da), Sprs.new_from_vec(db)
    r = Sprs.new_from_vec(da + db)
    c = rs.add(a, b, 1.0, 1.0)
    assert list(c.x) == list(r.x)
    assert list(c.i) == list(r.i)
    assert list(c.p) == list(r.p)
    # commutes, and 2A - A = A
    assert dense(rs.add(b, a, 1.0, 1.0)).tolist() == dense(r).tolist()
    assert dense(rs.add(a, a, 2.0, -1.0)).tolist() == dense(a).tolist()


def test_add_2_with_cancellation():
    g = load_basic("add_2")
    da, db = np.asarray(g["dense_a"]), np.asarray(g["dense_b"])
    a, b = Sprs.new_from_vec(da), Sprs.new_from_vec(db)
    c = rs.add(a, b, 1.0, 1.0)
    assert dense(c).tolist() == (da + db).tolist()
    assert dense(rs.add(b, b, 2.0, -1.0)).tolist() == dense(b).tolist()


def test_scpmat_scxmat():
    g = load_basic("scpmat_1")
    da = np.asarray(g["dense_a"])
    a = Sprs.new_from_vec(da)
    assert dense(rs.scpmat(2.0, a)).tolist() == (da + 2.0).tolist()
    assert dense(rs.scxmat(2.0, a)).tolist() == (da * 2.0).tolist()


def test_operator_overloads():
    g = load_basic("add_1")
    da, db = np.asarray(g["dense_a"]), np.asarray(g["dense_b"])
    a, b = Sprs.new_from_vec(da), Sprs.new_from_vec(db)
    radd = rs.add(a, b, 1.0, 1.0)
    rsub = rs.add(a, b, 1.0, -1.0)
    rmul = rs.multiply(a, b)
    assert (a + b) == radd
    assert (a - b) == rsub
    assert (a * b) == rmul
    assert dense(a + b).tolist() == (da + db).tolist()
    assert dense(a - b).tolist() == (da - db).tolist()
    assert_eq_f2d_vec(dense(a * b), da @ db, 1e-12)


def test_ops_order_2_random_dense():
    g = load_basic("ops_order_2")
    da, db = np.asarray(g["dense_a"]), np.asarray(g["dense_b"])
    a, b = Sprs.new_from_vec(da), Sprs.new_from_vec(db)
    assert_eq_f2d_vec(dense(a + b), da + db, 1e-12)
    assert_eq_f2d_vec(dense(a - b), da - db, 1e-12)
    assert_eq_f2d_vec(dense(a * b), da @ db, 1e-12)


def test_scal_ops_1():
    g = load_basic("scal_ops_1")
    da = np.asarray(g["dense_a"])
    a = Sprs.new_from_vec(da)
    assert dense(a + 65.0).tolist() == dense(rs.scpmat(65.0, a)).tolist()
    assert dense(65.0 + a).tolist() == dense(rs.scpmat(65.0, a)).tolist()
    assert dense(a - 65.0).tolist() == dense(rs.scpmat(-65.0, a)).tolist()
    assert dense(65.0 - a).tolist() == dense(rs.scpmat(65.0, rs.scxmat(-1.0, a))).tolist()
    assert dense(a * 65.0).tolist() == dense(rs.scxmat(65.0, a)).tolist()
    assert dense(65.0 * a).tolist() == dense(rs.scxmat(65.0, a)).tolist()
    assert dense(a / 65.0).tolist() == dense(rs.scxmat(1.0 / 65.0, a)).tolist()
    assert dense(-a).tolist() == dense(rs.scxmat(-1.0, a)).tolist()


def test_norm_1():
    g = load_basic("norm_1")
    da = np.asarray(g["dense_a"])
    a = Sprs.new_from_vec(da)
    assert abs(rs.norm(a) - 4.4199) < 1e-3


def test_fkeep_drop_diag():
    d = np.arange(1.0, 10.0).reshape(3, 3)
    a = Sprs.new_from_vec(d)
    rs.fkeep(a, lambda i, j, x: i != j)
    expect = d.copy()
    np.fill_diagonal(expect, 0.0)
    assert dense(a).tolist() == expect.tolist()


def test_permute_symperm():
    rng = np.random.RandomState(2)
    d = rng.rand(6, 6)
    a = Sprs.new_from_vec(d)
    p = np.array([2, 0, 1, 5, 4, 3])
    pinv = rs.pinvert(p, 6)
    q = np.array([1, 0, 3, 2, 5, 4])
    c = rs.permute(a, pinv, q)
    assert_eq_f2d_vec(dense(c), d[np.ix_(p, q)], 1e-14)
    # symperm on a symmetric matrix reproduces triu(A(p,p))
    s = d + d.T
    asym = Sprs.new_from_vec(np.triu(s))
    cs = rs.symperm(asym, pinv)
    expect = np.triu(s[np.ix_(p, p)])
    assert_eq_f2d_vec(dense(cs), expect, 1e-14)


def test_ipvec_pvec_inverse():
    n = 7
    rng = np.random.RandomState(3)
    p = rng.permutation(n)
    b = rng.rand(n)
    x = np.zeros(n)
    rs.ipvec(n, p, b, x)  # x[p[k]] = b[k]
    y = np.zeros(n)
    rs.pvec(n, p, x, y)  # y[k] = x[p[k]] = b[k]
    assert np.allclose(y, b)
