"""Storage-layer tests — ports of the reference's basic_tests.rs structural
battery (eye_*, from_vec_*, from_trpl_*, to_sprs_*, triplet_append_*, get_1,
to_dense_*)."""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu import Sprs, Trpl


def dense(s):
    return s.to_dense_np().tolist()


def test_eye_1():
    a = Sprs.eye(3)
    assert dense(a) == [[1, 0, 0], [0, 1, 0], [0, 0, 1]]


def test_eye_2():
    a = Sprs.eye(11)
    assert dense(a) == np.eye(11).tolist()


def test_from_vec_1():
    a = Sprs.new_from_vec([[0.0, 0.0, 2.0], [1.0, 0.0, 0.0], [9.0, 9.0, 9.0]])
    assert list(a.x) == [1.0, 9.0, 9.0, 2.0, 9.0]
    assert list(a.i) == [1, 2, 2, 0, 2]
    assert list(a.p) == [0, 2, 3, 5]


def test_from_trpl_1():
    a = Trpl(3, 3, [0, 1, 2], [0, 1, 2], [2.0, 3.0, 4.0])
    b = Sprs.new_from_trpl(a)
    assert dense(b) == [[2, 0, 0], [0, 3, 0], [0, 0, 4]]


def test_from_trpl_2():
    a = Trpl(3, 4, [0, 1, 2, 0], [0, 1, 2, 1], [2.0, 3.0, 4.0, 5.0])
    b = Sprs.new_from_trpl(a)
    assert dense(b) == [[2, 0, 0, 0], [5, 3, 0, 0], [0, 0, 4, 0]]


def test_from_trpl_3():
    a = Trpl(3, 4, [0, 1, 2, 0, 3, 3], [0, 1, 2, 1, 2, 2], [2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    b = Sprs.new_from_trpl(a)
    # duplicates kept; last wins when rendered dense (src/data.rs:319-320)
    assert dense(b) == [[2, 0, 0, 0], [5, 3, 0, 0], [0, 0, 4, 7]]


def test_from_trpl_4_sum_dupl():
    a = Trpl(3, 4, [0, 1, 2, 0, 3, 3], [0, 1, 2, 1, 2, 2], [2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    a.sum_dupl()
    b = Sprs.new_from_trpl(a)
    assert dense(b) == [[2, 0, 0, 0], [5, 3, 0, 0], [0, 0, 4, 13]]


def test_from_trpl_5_sum_dupl_idempotent():
    a = Trpl(3, 4, [0, 1, 2, 0, 3, 3], [0, 1, 2, 1, 2, 2], [2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    for _ in range(10):
        a.sum_dupl()
    b = Sprs.new_from_trpl(a)
    assert dense(b) == [[2, 0, 0, 0], [5, 3, 0, 0], [0, 0, 4, 13]]


@pytest.mark.parametrize("ncalls", [0, 1, 10])
def test_to_sprs_matches_from_trpl(ncalls):
    a = Trpl(3, 4, [0, 1, 2, 0, 3, 3], [0, 1, 2, 1, 2, 2], [2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    for _ in range(ncalls):
        a.sum_dupl()
    b = Sprs.new_from_trpl(a)
    c = a.to_sprs()
    assert b.nzmax == c.nzmax and b.m == c.m and b.n == c.n
    assert list(b.p) == list(c.p)
    assert list(b.i) == list(c.i)
    assert list(b.x) == list(c.x)


def test_triplet_append_1():
    a = Trpl(3, 4, [0, 1, 2, 0, 3, 3], [0, 1, 2, 1, 2, 2], [2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    a.append(2, 0, 8.0)
    a.sum_dupl()
    b = Sprs.new_from_trpl(a)
    assert dense(b) == [[2, 0, 0, 0], [5, 3, 0, 0], [8, 0, 4, 13]]
    assert b.m == 3 and b.n == 4


def test_triplet_append_2_grows():
    a = Trpl(3, 4, [0, 1, 2, 0, 3, 3], [0, 1, 2, 1, 2, 2], [2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    a.append(3, 0, 8.0)
    a.sum_dupl()
    b = Sprs.new_from_trpl(a)
    assert dense(b) == [[2, 0, 0, 0], [5, 3, 0, 0], [0, 0, 4, 13], [8, 0, 0, 0]]
    assert b.m == 4 and b.n == 4


def test_triplet_append_3_from_empty():
    a = Trpl.new()
    for (r, c, v) in [(0, 0, 2.0), (1, 1, 3.0), (2, 2, 4.0), (1, 0, 5.0), (2, 3, 6.0), (2, 3, 7.0), (3, 0, 8.0)]:
        a.append(r, c, v)
    a.sum_dupl()
    b = Sprs.new_from_trpl(a)
    assert dense(b) == [[2, 0, 0, 0], [5, 3, 0, 0], [0, 0, 4, 13], [8, 0, 0, 0]]


def test_triplet_append_4_sparse_grow():
    a = Trpl.new()
    for (r, c, v) in [(0, 0, 2.0), (1, 1, 3.0), (2, 2, 4.0), (1, 0, 5.0), (2, 3, 6.0), (2, 3, 7.0), (3, 0, 8.0), (8, 9, 9.0)]:
        a.append(r, c, v)
    a.sum_dupl()
    b = Sprs.new_from_trpl(a)
    d = np.zeros((9, 10))
    d[0, 0] = 2; d[1, 0] = 5; d[1, 1] = 3; d[2, 2] = 4; d[2, 3] = 13; d[3, 0] = 8; d[8, 9] = 9
    assert dense(b) == d.tolist()
    assert b.m == 9 and b.n == 10


def test_get_1():
    rng = np.random.RandomState(0)
    d = rng.rand(10, 10) + 1.0
    a = Sprs.new_from_vec(d)
    assert a.get(2, 2) == pytest.approx(d[2, 2])
    assert a.get(9, 9) == pytest.approx(d[9, 9])
    assert a.get(10, 10) is None


def test_to_dense_roundtrip():
    for d in (
        [[0.0, 0.0, 2.0], [1.0, 0.0, 0.0], [9.0, 9.0, 9.0]],
        [[1.0, 1.0, 3.0], [5.0, 0.0, 0.0], [2.0, 2.0, 0.0]],
    ):
        a = Sprs.new_from_vec(d)
        assert dense(a) == d


def test_trim():
    a = Sprs.new_from_vec([[1.0, 0.0], [0.0, 2.0]])
    a.x[0] = 0.0  # introduce an explicit zero
    a.trim()
    assert a.nzmax == 1
    assert list(a.p) == [0, 0, 1]
    assert dense(a) == [[0.0, 0.0], [0.0, 2.0]]


def test_get_trpl():
    a = Trpl(3, 3, [0, 1, 1], [0, 1, 1], [1.0, 2.0, 3.0])
    assert a.get(0, 0) == 1.0
    assert a.get(1, 1) == 2.0  # first found
    assert a.get(2, 2) is None
    pos, vals = a.get_all(1, 1)
    assert pos == [1, 2] and vals == [2.0, 3.0]


def _to_sprs_pair(trpl):
    b = rs.Sprs.new_from_trpl(trpl)
    c = trpl.to_sprs()
    assert b.nzmax == c.nzmax and b.m == c.m and b.n == c.n
    assert np.array_equal(b.p, c.p) and np.array_equal(b.i, c.i)
    assert np.array_equal(b.x, c.x)
    return b


def test_to_sprs_1():
    # reference tests/basic_tests.rs to_sprs_1
    a = rs.Trpl(3, 3, [0, 1, 2], [0, 1, 2], [2.0, 3.0, 4.0])
    b = _to_sprs_pair(a)
    assert b.to_dense() == [[2.0, 0.0, 0.0], [0.0, 3.0, 0.0], [0.0, 0.0, 4.0]]


def test_to_sprs_2():
    a = rs.Trpl(3, 4, [0, 1, 2, 0], [0, 1, 2, 1], [2.0, 3.0, 4.0, 5.0])
    b = _to_sprs_pair(a)
    assert b.to_dense() == [[2.0, 0.0, 0.0, 0.0], [5.0, 3.0, 0.0, 0.0],
                            [0.0, 0.0, 4.0, 0.0]]


def test_to_sprs_3():
    a = rs.Trpl(3, 4, [0, 1, 2, 0, 3, 3], [0, 1, 2, 1, 2, 2],
                [2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    b = _to_sprs_pair(a)
    assert b.to_dense() == [[2.0, 0.0, 0.0, 0.0], [5.0, 3.0, 0.0, 0.0],
                            [0.0, 0.0, 4.0, 7.0]]  # duplicates: last wins


def test_to_sprs_4():
    a = rs.Trpl(3, 4, [0, 1, 2, 0, 3, 3], [0, 1, 2, 1, 2, 2],
                [2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    a.sum_dupl()
    b = _to_sprs_pair(a)
    assert b.to_dense() == [[2.0, 0.0, 0.0, 0.0], [5.0, 3.0, 0.0, 0.0],
                            [0.0, 0.0, 4.0, 13.0]]


def test_to_sprs_5():
    a = rs.Trpl(3, 4, [0, 1, 2, 0, 3, 3], [0, 1, 2, 1, 2, 2],
                [2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    for _ in range(10):
        a.sum_dupl()  # idempotent (reference to_sprs_5)
    b = _to_sprs_pair(a)
    assert b.to_dense() == [[2.0, 0.0, 0.0, 0.0], [5.0, 3.0, 0.0, 0.0],
                            [0.0, 0.0, 4.0, 13.0]]
