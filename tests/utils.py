"""Tolerance assert helpers, mirroring the reference's tests/utils.rs:1-138."""

from __future__ import annotations

import numpy as np


def assert_eq_f_vec(a, b, tol):
    """Elementwise |a-b| <= tol over len(a) entries (reference utils.rs:2-12:
    iterates a's length, so b may be longer)."""
    a = list(a)
    for i in range(len(a)):
        diff = abs(float(a[i]) - float(b[i]))
        if diff > tol:
            raise AssertionError(
                f"Vec not equal at {i}: {a[i]} != {b[i]} -- check failed by {diff}"
            )


def assert_eq_f2d_vec(a, b, tol):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    diff = np.abs(a - b).max()
    if diff > tol:
        raise AssertionError(f"2D Vec not equal -- check failed by {diff}")
