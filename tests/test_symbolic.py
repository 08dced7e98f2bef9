"""Symbolic-layer tests: the reference's qr_1/qr_2 golden tests pin the exact
AMD ordering, etree, column counts, vcount row permutation, and QR factor
arrays (basic_tests.rs:1272-1335) — bit-exact oracles for the C++ engine."""

import json
import os

import numpy as np

import rsparse_tpu as rs
from rsparse_tpu import Sprs
from rsparse_tpu.symbolic import schol, sqr
from rsparse_tpu.factor import qr as qr_factor

from conftest import ASSETS, GOLDEN
from utils import assert_eq_f_vec


def load_basic(name):
    with open(os.path.join(GOLDEN, f"basic_{name}.json")) as f:
        return json.load(f)


def test_qr_1_golden_symbolic_and_factors():
    g = load_basic("qr_1")
    s = Sprs.new_from_file(os.path.join(ASSETS, g["asset"]))
    sym = sqr(s, 2, True)
    assert list(sym.q) == [int(v) for v in g["sym_q"][: s.n]]
    assert list(sym.parent) == [int(v) for v in g["sym_parent"]]
    assert list(sym.cp) == [int(v) for v in g["sym_cp"]]
    assert list(sym.pinv[: len(g["sym_pinv"])]) == [int(v) for v in g["sym_pinv"]]
    assert sym.m2 == g["sym_m2"]
    assert sym.lnz == g["sym_lnz"]
    assert sym.unz == g["sym_unz"]

    nm = qr_factor(s, sym)
    assert nm.l.m == g["qr_l_m"] and nm.l.n == g["qr_l_n"]
    assert int(nm.l.p[-1]) == g["qr_l_nzmax"]
    assert list(nm.l.i) == [int(v) for v in g["qr_l_i"]]
    assert list(nm.l.p) == [int(v) for v in g["qr_l_p"]]
    assert_eq_f_vec(nm.l.x, g["qr_l_x"], 1e-5)
    assert int(nm.u.p[-1]) == g["qr_u_nzmax"]
    assert list(nm.u.i) == [int(v) for v in g["qr_u_i"]]
    assert list(nm.u.p) == [int(v) for v in g["qr_u_p"]]
    assert_eq_f_vec(nm.u.x, g["qr_u_x"], 1e-5)
    assert nm.pinv is None
    assert_eq_f_vec(nm.b, g["qr_b"], 1e-5)


def test_qr_2_golden_factors():
    g = load_basic("qr_2")
    s = Sprs.new_from_file(os.path.join(ASSETS, g["asset"]))
    sym = sqr(s, 2, True)
    nm = qr_factor(s, sym)
    assert list(nm.l.i) == [int(v) for v in g["qr_l_i"]]
    assert list(nm.l.p) == [int(v) for v in g["qr_l_p"]]
    assert_eq_f_vec(nm.l.x, g["qr_l_x"], 1e-5)
    assert list(nm.u.i) == [int(v) for v in g["qr_u_i"]]
    assert list(nm.u.p) == [int(v) for v in g["qr_u_p"]]
    assert_eq_f_vec(nm.u.x, g["qr_u_x"], 1e-5)
    assert_eq_f_vec(nm.b, g["qr_b"], 1e-5)


def test_schol_structures():
    a = Sprs.new_from_file(os.path.join(ASSETS, "cholsol_1.sprs"))
    s = schol(a, 0)
    n = a.n
    assert s.lnz == s.unz == int(s.cp[n])
    # pinv is a valid permutation
    assert sorted(s.pinv) == list(range(n))
    # parent is an etree: parent[k] > k or -1
    assert all(p == -1 or p > k for k, p in enumerate(s.parent))


def test_natural_order_is_none():
    a = Sprs.new_from_file(os.path.join(ASSETS, "cholsol_1.sprs"))
    from rsparse_tpu.symbolic import amd

    assert amd(a, -1) is None
    p = amd(a, 0)
    assert p is not None and sorted(p) == list(range(a.n))


def test_qr_ls_apply_matches_host_qrsol():
    """rt_qr_ls_apply (native happly sweep + usolve — the bench denominator
    for qrsol_solve_wall_s) reproduces the host qrsol m>=n apply exactly
    (reference src/lib.rs:936-940)."""
    from rsparse_tpu import config
    from rsparse_tpu.symbolic import native

    a = Sprs.new_from_file(os.path.join(ASSETS, "qrsol_5.sprs"))
    m, n, nz = a.m, a.n, a.nnz()
    b = np.random.default_rng(0).standard_normal(m)
    s = sqr(a, 2, True)
    Vp, Vi, Vx, Rp, Ri, Rx, beta = native.qr_numeric(
        m, n, a.p, a.i[:nz], a.x[:nz], s.q, s.parent, s.pinv, s.m2,
        s.lnz, s.unz)
    xx = np.zeros(s.m2)
    xx[np.asarray(s.pinv[:m], np.int64)] = b
    native.qr_ls_apply(n, Vp, Vi, Vx, beta, Rp, Ri, Rx, xx)
    out = np.zeros(n)
    out[np.asarray(s.q, np.int64)] = xx[:n]

    prev = config.backend
    config.backend = "host"
    try:
        want = np.asarray(rs.qrsol(a, list(b), 2))
    finally:
        config.backend = prev
    err = np.abs(out - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-12
