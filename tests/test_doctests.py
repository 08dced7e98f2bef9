"""Runnable doc examples (parity with the reference's doctests, SURVEY.md §4
item 6: every public reference function carries an executable example)."""

import doctest

import rsparse_tpu.data
import rsparse_tpu.ops


def test_ops_doctests():
    res = doctest.testmod(rsparse_tpu.ops, verbose=False)
    assert res.failed == 0 and res.attempted >= 5


def test_data_doctests():
    res = doctest.testmod(rsparse_tpu.data, verbose=False)
    assert res.failed == 0 and res.attempted >= 1
