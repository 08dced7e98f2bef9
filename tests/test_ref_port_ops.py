"""Completion of the reference basic_tests.rs port (VERDICT round-2 #6).

Replays every remaining reference test variant against its exact semantics:
operator-overload consistency (add_op_1, sub_op_1, mul_op_1..3, ops_order_1,
ops_order_3 — reference tests/basic_tests.rs), scalar ops (scal_ops_2,
scxmat_1), to_dense_1..3, eye_2, multiply_5. Inputs come from the extracted
goldens (tests/golden/basic_*.json) where large, inline otherwise.
"""

import json
import os

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu import Sprs

from conftest import GOLDEN


def load_basic(name):
    with open(os.path.join(GOLDEN, f"basic_{name}.json")) as f:
        return json.load(f)


A5 = [
    [2.0, 2.0, 4.0, 4.0, 1.0],
    [3.0, 4.0, 5.0, 8.0, 3.0],
    [2.0, 6.0, 3.0, 9.0, 3.0],
    [5.0, 7.0, 6.0, 7.0, 1.0],
    [7.0, 1.0, 8.0, 9.0, 2.0],
]
B5 = [
    [8.0, 8.0, 6.0, 6.0, 2.0],
    [4.0, 9.0, 7.0, 5.0, 9.0],
    [2.0, 3.0, 8.0, 4.0, 1.0],
    [4.0, 7.0, 6.0, 8.0, 9.0],
    [9.0, 1.0, 8.0, 7.0, 1.0],
]


def _same_sprs(c, r):
    assert list(c.x[: c.nnz()]) == list(r.x[: r.nnz()])
    assert list(c.i[: c.nnz()]) == list(r.i[: r.nnz()])
    assert list(c.p[: c.n + 1]) == list(r.p[: r.n + 1])


def test_add_op_1():
    a = Sprs.new_from_vec(A5)
    b = Sprs.new_from_vec(B5)
    r = Sprs.new_from_vec((np.asarray(A5) + np.asarray(B5)).tolist())
    _same_sprs(a + b, r)
    assert (a + b).to_dense() == r.to_dense()
    assert (a + b).to_dense() == (np.asarray(A5) + np.asarray(B5)).tolist()


def test_sub_op_1():
    a = Sprs.new_from_vec(A5)
    b = Sprs.new_from_vec(B5)
    r = rs.add(a, b, 1.0, -1.0)
    _same_sprs(a - b, r)
    assert (a - b).to_dense() == r.to_dense()


def test_mul_op_1():
    a = Sprs.new_from_vec(A5)
    b = Sprs.new_from_vec(B5)
    r = rs.multiply(a, b)
    _same_sprs(a * b, r)
    assert (a * b).to_dense() == r.to_dense()


@pytest.mark.parametrize("name", ["mul_op_2", "mul_op_3"])
def test_mul_op_ata(name):
    # reference: c = A' * A on the 100x100 near-identity matrix; expected
    # values asserted at 1e-6 (utils::assert_eq_f2d_vec)
    d = np.asarray(load_basic(name)["dense_a"])
    a = Sprs.new_from_vec(d.tolist())
    at = rs.transpose(a)
    c = np.asarray((at * a).to_dense())
    want = d.T @ d
    assert np.abs(c - want).max() < 1e-6


@pytest.mark.parametrize("name", ["ops_order_1", "ops_order_3"])
def test_ops_order(name):
    g = load_basic(name) if name == "ops_order_1" else None
    a = Sprs.new_from_vec(A5)
    b = Sprs.new_from_vec(B5)
    r_add = rs.add(a, b, 1.0, 1.0)
    r_sub = rs.add(a, b, 1.0, -1.0)
    r_mul = rs.multiply(a, b)
    _same_sprs(a + b, r_add)
    _same_sprs(a - b, r_sub)
    _same_sprs(a * b, r_mul)
    assert (a + b).to_dense() == r_add.to_dense()
    assert (a - b).to_dense() == r_sub.to_dense()
    assert (a * b).to_dense() == r_mul.to_dense()


def test_scal_ops_2():
    a = Sprs.new_from_vec(A5)
    assert rs.scpmat(65.0, a).to_dense() == (a + 65.0).to_dense()
    assert rs.scpmat(-65.0, a).to_dense() == (a - 65.0).to_dense()
    assert rs.scxmat(65.0, a).to_dense() == (a * 65.0).to_dense()
    assert rs.scxmat(1.0 / 65.0, a).to_dense() == (a / 65.0).to_dense()
    # the scal_ops_1 commuted forms (65 + a, 65 * a, 65 - a)
    assert rs.scpmat(65.0, a).to_dense() == (65.0 + a).to_dense()
    assert rs.scxmat(65.0, a).to_dense() == (65.0 * a).to_dense()
    assert rs.scpmat(65.0, rs.scxmat(-1.0, a)).to_dense() == (65.0 - a).to_dense()


def test_scxmat_1():
    a = Sprs.new_from_vec(B5)
    r = Sprs.new_from_vec((2.0 * np.asarray(B5)).tolist())
    c = rs.scxmat(2.0, a)
    _same_sprs(c, r)
    assert c.to_dense() == r.to_dense()


def test_eye_2():
    a = Sprs.eye(11)
    assert a.to_dense() == np.eye(11).tolist()


@pytest.mark.parametrize("name", ["to_dense_1", "to_dense_2", "to_dense_3"])
def test_to_dense(name):
    d = load_basic(name)["dense_a"]
    assert Sprs.new_from_vec(d).to_dense() == d


def test_multiply_5():
    g = load_basic("multiply_5")
    a = Sprs.new_from_vec(g["dense_a"])
    b = Sprs.new_from_vec(g["dense_b"])
    c = np.asarray(rs.multiply(a, b).to_dense())
    want = np.asarray(g["dense_a"]) @ np.asarray(g["dense_b"])
    assert np.abs(c - want).max() < 1e-6


def test_multiply_4():
    g = load_basic("multiply_4")
    a = Sprs.new_from_vec(g["dense_a"])
    b = Sprs.new_from_vec(g["dense_b"]) if "dense_b" in g else a
    c = np.asarray(rs.multiply(a, b).to_dense())
    want = np.asarray(g["dense_a"]) @ np.asarray(
        g["dense_b"] if "dense_b" in g else g["dense_a"])
    assert np.abs(c - want).max() < 1e-6
