"""Runnable doc examples (parity with the reference's doctests, SURVEY.md §4
item 6: every public reference function carries an executable example)."""

import doctest

import rsparse_tpu.data
import rsparse_tpu.factor
import rsparse_tpu.ops
import rsparse_tpu.solve


def test_ops_doctests():
    res = doctest.testmod(rsparse_tpu.ops, verbose=False)
    assert res.failed == 0 and res.attempted >= 5


def test_data_doctests():
    res = doctest.testmod(rsparse_tpu.data, verbose=False)
    assert res.failed == 0 and res.attempted >= 1


def test_solve_doctests():
    """The most-used public surface (cholsol/lusol/qrsol + the four
    triangular solves) carries runnable examples — literal parity with the
    reference's per-function doctests (e.g. lusol src/lib.rs:634-669)."""
    res = doctest.testmod(rsparse_tpu.solve, verbose=False)
    assert res.failed == 0 and res.attempted >= 14


def test_factor_doctests():
    res = doctest.testmod(rsparse_tpu.factor, verbose=False)
    assert res.failed == 0 and res.attempted >= 6
