"""Multifrontal device QR (factor/frontal_qr.py) — VERDICT round-2 item #5.

qrsol at scale must run the device tree with no host-engine involvement,
for both the least-squares (m >= n) and minimum-norm (m < n) branches,
including the reference's largest QR asset (qrsol_3, 8000x8000).
"""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu.data import Sprs
from rsparse_tpu.symbolic import sqr
from rsparse_tpu.factor.frontal_qr import (
    build_qr_mf_plan, qr_mf, qrsol_mf_ls)

from conftest import ASSETS
import os


def _sparse_ls(m, n, extra, seed=0):
    rng = np.random.default_rng(seed)
    d = np.zeros((m, n))
    for i in range(n):
        d[i, i] = 5.0 + rng.random()
    for _ in range(extra):
        i, j = rng.integers(0, m), rng.integers(0, n)
        d[i, j] += rng.standard_normal()
    return Sprs.new_from_vec([list(r) for r in d]), d


def test_mf_qr_factor_valid():
    a, d = _sparse_ls(300, 200, 900)
    s = sqr(a, 2, True)
    plan = build_qr_mf_plan(a, s, smax=16)
    assert plan is not None
    Rp, Ri, Rx = qr_mf(a, s, plan)
    q = np.asarray(s.q)
    Aq = d[:, q]
    n = a.n
    R = np.zeros((n, n))
    R[Ri, np.repeat(np.arange(n), np.diff(Rp))] = Rx
    # any valid QR satisfies R'R = A'A
    scale = np.abs(Aq.T @ Aq).max()
    assert np.abs(R.T @ R - Aq.T @ Aq).max() < 1e-10 * scale
    # diag LAST per column (usolve convention, reference src/lib.rs:1232)
    assert (Ri[Rp[1:] - 1] == np.arange(n)).all()


def test_mf_qr_least_squares():
    a, d = _sparse_ls(320, 220, 1000, seed=3)
    s = sqr(a, 2, True)
    plan = build_qr_mf_plan(a, s, smax=16)
    assert plan is not None
    qr_mf(a, s, plan)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(320)
    xp, _ = qrsol_mf_ls(a, s, plan, b)
    x = np.zeros(220)
    x[np.asarray(s.q)] = xp
    want, *_ = np.linalg.lstsq(d, b, rcond=None)
    assert np.abs(x - want).max() < 1e-8


def test_qrsol_driver_mf_large_ls(monkeypatch):
    """Driver path with the host engine disabled: square system at device
    scale runs the MF tree end-to-end."""
    from rsparse_tpu.symbolic import native

    def boom(*a_, **k_):
        raise AssertionError("host qr engine must not run")

    monkeypatch.setattr(native, "qr_numeric", boom)
    n = 2000
    rng = np.random.default_rng(5)
    d = np.zeros((n, n))
    for i in range(n):
        d[i, i] = 6.0
    ii = rng.integers(0, n, 6000)
    jj = rng.integers(0, n, 6000)
    for i_, j_ in zip(ii, jj):
        d[i_, j_] += rng.standard_normal()
    a = Sprs.new_from_vec([list(r) for r in d])
    xt = rng.standard_normal(n)
    b = d @ xt
    x = np.asarray(rs.qrsol(a, list(b), 2))
    assert np.abs(x - xt).max() < 1e-7


def test_qrsol_driver_mf_minimum_norm(monkeypatch):
    from rsparse_tpu.symbolic import native

    def boom(*a_, **k_):
        raise AssertionError("host qr engine must not run")

    monkeypatch.setattr(native, "qr_numeric", boom)
    m, n = 1600, 2400
    rng = np.random.default_rng(7)
    d = np.zeros((m, n))
    for i in range(m):
        d[i, i] = 5.0 + rng.random()
    ii = rng.integers(0, m, 4000)
    jj = rng.integers(0, n, 4000)
    for i_, j_ in zip(ii, jj):
        d[i_, j_] += rng.standard_normal()
    a = Sprs.new_from_vec([list(r) for r in d])
    b = rng.standard_normal(m)
    x = np.asarray(rs.qrsol(a, list(b), 2))
    # consistency (residual) + minimum-norm property vs pinv solution
    assert np.abs(d @ x - b).max() < 1e-8
    want = np.linalg.pinv(d) @ b
    assert np.abs(x - want).max() < 1e-6


def test_qrsol_3_golden_device_only(monkeypatch):
    """The VERDICT done-criterion: qrsol_3 (8000x8000) passes its golden
    with the host engine disabled."""
    import json

    from rsparse_tpu.symbolic import native
    from conftest import GOLDEN

    def boom(*a_, **k_):
        raise AssertionError("host qr engine must not run")

    monkeypatch.setattr(native, "qr_numeric", boom)
    with open(os.path.join(GOLDEN, "qrsol_3.json")) as f:
        g = json.load(f)
    a = Sprs.new_from_file(os.path.join(ASSETS, g["asset"]))
    b = list(g["b"])
    x = rs.qrsol(a, b, g.get("order", 2))
    from utils import assert_eq_f_vec

    assert_eq_f_vec(x[: len(g["x"])], g["x"], g["tol"])


def test_qrsol_sym_reuse_refreshed_values(monkeypatch):
    """sym= reuse is per sparsity PATTERN: refreshing a's values must
    refactor the cached MF tree, not silently solve with the stale factor
    (regression: _qr_mf_try cached _cache_q without a value fingerprint)."""
    import numpy as np

    monkeypatch.setattr(rs.config, "mf_min_n", 600)  # small + MF tier
    a, _ = _sparse_ls(900, 700, 4200, seed=9)
    rng = np.random.default_rng(10)
    b = rng.standard_normal(a.m)
    s = rs.sqr(a, 2, True)
    x1 = np.asarray(rs.qrsol(a, list(b), 2, sym=s))
    nz = a.nnz()
    a.x[:nz] *= 2.0  # same pattern, refreshed values
    x2 = np.asarray(rs.qrsol(a, list(b), 2, sym=s))
    assert np.abs(x2 - x1 / 2.0).max() < 1e-8  # NOT the stale x1
