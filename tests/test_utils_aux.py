"""Aux subsystem tests: profiling metrics + symbolic checkpointing."""

import os

import numpy as np

import rsparse_tpu as rs
from rsparse_tpu.utils import (
    get_metrics,
    load_symbolic,
    phase_timer,
    reset_metrics,
    save_symbolic,
)

from conftest import ASSETS


def test_phase_timer_registry():
    reset_metrics()
    with phase_timer("unit.demo", nnz=1000):
        sum(range(1000))
    m = get_metrics()
    assert m["unit.demo"]["calls"] == 1
    assert m["unit.demo"]["seconds"] > 0
    assert m["unit.demo"]["work"] == 1000
    assert m["unit.demo"]["work_per_s"] > 0


def test_solvers_populate_metrics():
    reset_metrics()
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_1.sprs")
    rs.cholsol(a, [0.1] * a.n, 0)
    m = get_metrics()
    assert {"cholsol.symbolic", "cholsol.factor", "cholsol.solve"} <= set(m)


def test_symbolic_checkpoint_roundtrip(tmp_path):
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_2.sprs")
    s = rs.schol(a, 0)
    p = str(tmp_path / "symb.npz")
    save_symbolic(s, p)
    s2 = load_symbolic(p)
    np.testing.assert_array_equal(s.pinv, s2.pinv)
    np.testing.assert_array_equal(s.parent, s2.parent)
    np.testing.assert_array_equal(s.cp, s2.cp)
    assert (s.lnz, s.unz, s.m2) == (s2.lnz, s2.unz, s2.m2)
    # the restored Symb drives a numeric factorization + solve end-to-end
    nm = rs.chol(a, s2)
    b = np.linspace(1, 2, a.n)
    x = np.zeros(a.n)
    rs.ipvec(a.n, s2.pinv, b, x)
    x = rs.lsolve(nm.l, x)
    x = rs.ltsolve(nm.l, x)
    out = np.zeros(a.n)
    rs.pvec(a.n, s2.pinv, x, out)
    resid = np.asarray(rs.gaxpy(a, list(out), [0.0] * a.n)) - b
    assert np.abs(resid).max() < 1e-9


def test_symbolic_checkpoint_then_mf_factor():
    """A Symb restored from disk must drive the multifrontal device factor
    (plans rebuild lazily)."""
    from bench import laplacian_5pt
    from rsparse_tpu.data import Sprs

    n, p, i, x = laplacian_5pt(44)  # n=1936 >= mf_min_n
    a = Sprs(len(x), n, n, p, i, x)
    s = rs.schol(a, 0)
    path = "/tmp/symb_mf_test.npz"
    save_symbolic(s, path)
    s2 = load_symbolic(path)
    b = np.linspace(0.5, 1.5, n)
    x1 = np.asarray(rs.cholsol(a, list(b), 0, sym=s2))
    assert getattr(s2, "_mf_plan", None) is not None
    r = np.abs(np.asarray(rs.gaxpy(a, list(x1), [0.0] * n)) - b).max()
    assert r < 1e-9
    os.remove(path)


def test_factor_checkpoint_roundtrip(tmp_path):
    """save_factor/load_factor: a restored LU Nmrc solves without
    refactorizing (serving restart scenario)."""
    from rsparse_tpu.utils import load_factor, save_factor

    a = rs.Sprs.new_from_file(f"{ASSETS}/lusol_3.sprs")
    s = rs.sqr(a, 1, False)
    nm = rs.lu(a, s, 1e-12)
    p = str(tmp_path / "factor.npz")
    save_factor(nm, p)
    nm2 = load_factor(p)
    assert nm2.l.nnz() == nm.l.nnz() and nm2.u.nnz() == nm.u.nnz()
    np.testing.assert_array_equal(np.asarray(nm2.pinv),
                                  np.asarray(nm.pinv))
    # reference lusol composition (src/lib.rs:672-683) with restored factors
    b = np.linspace(0.5, 1.5, a.n)
    x = np.zeros(a.n)
    rs.ipvec(a.n, nm2.pinv, b, x)
    x = rs.lsolve(nm2.l, x)
    x = rs.usolve(nm2.u, x)
    out = np.zeros(a.n)
    rs.ipvec(a.n, s.q, x, out)
    resid = np.asarray(rs.gaxpy(a, list(out), [0.0] * a.n)) - b
    assert np.abs(resid).max() < 1e-8


def test_factor_checkpoint_qr(tmp_path):
    """QR Nmrc (V/R/beta) round-trips including the beta vector."""
    from rsparse_tpu.utils import load_factor, save_factor

    a = rs.Sprs.new_from_file(f"{ASSETS}/qrsol_5.sprs")
    s = rs.sqr(a, 2, True)
    nm = rs.qr(a, s)
    p = str(tmp_path / "qrf.npz")
    save_factor(nm, p)
    nm2 = load_factor(p)
    np.testing.assert_allclose(np.asarray(nm2.b), np.asarray(nm.b),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(nm2.l.x[: nm2.l.nnz()]),
                               np.asarray(nm.l.x[: nm.l.nnz()]),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(nm2.u.x[: nm2.u.nnz()]),
                               np.asarray(nm.u.x[: nm.u.nnz()]),
                               rtol=0, atol=0)
