"""Round-5 regression tests.

1. Duplicate-entry (i,j) handling in the multifrontal planners: legal Sprs
   content (`Trpl.to_sprs` keeps duplicates, reference src/data.rs:939-944;
   after `sum_dupl` the LAST slot holds the sum and the others explicit
   zeros). The planners' searchsorted lookups used to take the FIRST slot —
   a zero — silently corrupting MF chol/LU/QR factors while the host
   engine (reference last-wins assign, src/lib.rs:278-337) stayed right.
2. The lazy AOT-cache guard decides from the RESOLVED backend.
"""

import numpy as np
import pytest

import rsparse_tpu as rs
import rsparse_tpu.data as rd
from rsparse_tpu.config import config


def _mk_dup_ls(m, n, nnz, seed):
    rng = np.random.default_rng(seed)
    t = rd.Trpl()
    for i in range(min(m, n)):
        t.append(i, i, 3.0 + rng.random())
    for _ in range(nnz):
        t.append(int(rng.integers(m)), int(rng.integers(n)),
                 rng.standard_normal())
    t.sum_dupl()  # sums into the LAST duplicate slot, zeroes the others
    return t.to_sprs()


def _mk_dup_spd(n, seed):
    rng = np.random.default_rng(seed)
    t = rd.Trpl()
    for i in range(n):
        t.append(i, i, 10.0)
        t.append(i, i, 2.5)  # duplicate diagonal
    for _ in range(3 * n):
        i, j = int(rng.integers(n)), int(rng.integers(n))
        v = 0.3 * rng.standard_normal()
        t.append(min(i, j), max(i, j), v)
        t.append(max(i, j), min(i, j), v)
    t.sum_dupl()
    return t.to_sprs()


def _dense_sum(a):
    from rsparse_tpu.ops.plan import col_ids

    nz = a.nnz()
    d = np.zeros((a.m, a.n))
    np.add.at(d, (a.i[:nz], col_ids(a.p, a.n)), a.x[:nz])
    return d


def test_mf_qr_duplicate_entries(monkeypatch):
    monkeypatch.setattr(config, "mf_min_n", 50)
    a = _mk_dup_ls(120, 90, 400, 5)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(120)
    s = rs.sqr(a, 2, True)
    x = np.asarray(rs.qrsol(a, list(b), 2, sym=s))[:90]
    assert s._mf_qr_plan is not None  # the MF path actually ran
    want = np.linalg.lstsq(_dense_sum(a), b, rcond=None)[0]
    assert np.abs(x - want).max() < 1e-8


def test_mf_chol_duplicate_entries(monkeypatch):
    monkeypatch.setattr(config, "mf_min_n", 50)
    a = _mk_dup_spd(150, 0)
    d = _dense_sum(a)
    dsym = np.triu(d) + np.triu(d, 1).T  # chol reads triu (reference)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(150)
    s = rs.schol(a, 0)
    x = np.asarray(rs.cholsol(a, list(b), 0, sym=s))
    assert getattr(s, "_mf_plan", None) is not None
    want = np.linalg.solve(dsym, b)
    assert np.abs(x - want).max() < 1e-8


def test_mf_lu_duplicate_entries(monkeypatch):
    monkeypatch.setattr(config, "mf_min_n", 50)
    a = _mk_dup_spd(150, 2)
    d = _dense_sum(a)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(150)
    x = np.asarray(rs.lusol(a, list(b), 1, 1e-6))
    want = np.linalg.solve(d, b)
    assert np.abs(x - want).max() < 1e-8


def test_vals_duplicate_entries(monkeypatch):
    monkeypatch.setattr(config, "mf_min_n", 50)
    a = _mk_dup_spd(150, 4)
    nz = a.nnz()
    K = 3
    AxK = np.tile(np.asarray(a.x[:nz]), (K, 1))
    from rsparse_tpu.ops.plan import col_ids

    diag = a.i[:nz] == col_ids(a.p, a.n)
    AxK[:, diag] *= (1.0 + 0.5 * np.arange(K))[:, None]
    rng = np.random.default_rng(5)
    B = rng.standard_normal((K, 150))
    X = rs.cholsol_vals(a, AxK, B, 0)
    for k in range(K):
        ak = rd.Sprs(nz, 150, 150, a.p, a.i[:nz], AxK[k])
        d = _dense_sum(ak)
        dsym = np.triu(d) + np.triu(d, 1).T
        assert np.abs(X[k] - np.linalg.solve(dsym, B[k])).max() < 1e-8


def test_cache_guard_resolved_backend(monkeypatch):
    """maybe_enable_compilation_cache must decide from the resolved
    backend: on this CPU test backend it must NOT set the cache dir."""
    import importlib

    import jax

    # the package re-exports the Config INSTANCE as `rsparse_tpu.config`,
    # shadowing the submodule attribute — resolve the module explicitly
    cfgmod = importlib.import_module("rsparse_tpu.config")

    monkeypatch.setitem(cfgmod._cache_state, "done", False)
    before = jax.config.jax_compilation_cache_dir
    cfgmod.maybe_enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == before
    assert cfgmod._cache_state["done"]  # decided once, stays decided


def test_qr_host_exact_after_plan_commit(monkeypatch):
    """The host-exact QR fallbacks must use the PRE-commit column ordering.

    build_qr_mf_plan commits the postorder-composed ordering into s.q but
    leaves s.parent/pinv/cp/m2/lnz/unz describing the original q0 — feeding
    the mixed tuple to the C++ engine overran its buffers (segfault on TPU,
    where the f32 acceptance gate actually trips; round-5 bisect). The plan
    now carries q_host and solve._qr_{ls,mn}_host_exact take it."""
    from rsparse_tpu.solve import _qr_ls_host_exact

    monkeypatch.setattr(config, "mf_min_n", 50)
    a = _mk_dup_ls(120, 90, 400, 3)  # seed 3: postorder != identity
    rng = np.random.default_rng(11)
    b = rng.standard_normal(120)
    s = rs.sqr(a, 2, True)
    from rsparse_tpu.factor.frontal_qr import build_qr_mf_plan

    plan = build_qr_mf_plan(a, s)  # commits s.q
    assert plan is not None
    s._mf_qr_plan = plan
    # the commit actually changed the ordering in this fixture —
    # otherwise the test exercises nothing
    assert not np.array_equal(np.asarray(plan.q),
                              np.asarray(plan.q_host))
    xp = _qr_ls_host_exact(a, s, b, q=plan.q_host)
    out = np.zeros(90)
    qh = (np.asarray(plan.q_host, np.int64) if plan.q_host is not None
          else np.arange(90))
    out[qh] = xp  # ipvec with the SAME ordering the host engine used
    want = np.linalg.lstsq(_dense_sum(a), b, rcond=None)[0]
    assert np.abs(out - want).max() < 1e-8
