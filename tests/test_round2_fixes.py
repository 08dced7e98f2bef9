"""Round-2 regression tests: ADVICE findings + dead-surface wiring.

Covers the advisor's confirmed spgemm_dia rectangular-slice bug, the
frontal_lu Symb-mutation discipline, the chol_mf cache invalidation on
NotPositiveDefinite, the plan cache, and the CSCDevice jit consumer.
"""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu.data import Sprs
from rsparse_tpu.ops import spmv as spmv_mod


def _to_dense(a: Sprs) -> np.ndarray:
    return np.asarray(a.to_dense(), dtype=np.float64)


def test_spgemm_dia_tall_rectangular():
    # ADVICE (medium): tall A (m >> n) used to push the padded-B dynamic
    # slice out of bounds; XLA clamped the start and misaligned B's diagonals.
    m, k = 512, 128
    a = rs.Trpl()
    for i in range(k):
        a.append(i, i, 1.0)
    a.append(k - 2 + 126, k - 2, 3.0)  # offset +126 entry in the tall part
    a.m = m
    a.n = k
    A = a.to_sprs()
    b = rs.Trpl()
    for i in range(k):
        b.append(i, i, float(i + 1))
    B = b.to_sprs()
    got = _to_dense(spmv_mod.spgemm_dia(A, B))
    want = np.zeros((m, k))
    da = np.zeros((m, k))
    da[np.arange(k), np.arange(k)] = 1.0
    da[k - 2 + 126, k - 2] = 3.0
    want = da @ np.diag(np.arange(1, k + 1, dtype=np.float64))
    assert np.abs(got - want).max() == 0.0


def test_spgemm_dia_wide_rectangular():
    # wide A (n >> m): exercises the n_el_b > n_el_c sizing branch
    m, k = 64, 400
    rng = np.random.default_rng(5)
    da = np.zeros((m, k))
    da[np.arange(m), np.arange(m)] = rng.standard_normal(m)
    da[np.arange(m), np.arange(m) + 300] = rng.standard_normal(m)
    db = np.zeros((k, 32))
    db[np.arange(32), np.arange(32)] = 2.0
    db[np.arange(32) + 300, np.arange(32)] = 1.5
    A = Sprs.new_from_vec([list(r) for r in da])
    B = Sprs.new_from_vec([list(r) for r in db])
    got = _to_dense(spmv_mod.spgemm_dia(A, B))
    assert np.abs(got - da @ db).max() < 1e-12


def test_plan_cache_reuse():
    from rsparse_tpu.ops import plan as pl

    a = Sprs.new_from_vec([[1.0, 2.0, 0.0], [0.0, 3.0, 4.0], [5.0, 0.0, 6.0]])
    b = Sprs.new_from_vec([[1.0, 0.0, 1.0], [2.0, 1.0, 0.0], [0.0, 2.0, 1.0]])
    assert pl.spgemm_plan(a, b) is pl.spgemm_plan(a, b)
    assert pl.add_plan(a, b) is pl.add_plan(a, b)
    assert pl.transpose_plan(a) is pl.transpose_plan(a)
    # pattern mutation invalidates the fingerprint -> fresh plan
    t1 = pl.transpose_plan(a)
    rs.fkeep(a, lambda i, j, x: i != j)
    assert pl.transpose_plan(a) is not t1
    # values-only change keeps the plan (pattern unchanged)
    b.x = b.x * 2.0
    assert pl.add_plan(Sprs.new_from_vec([[1.0]]), Sprs.new_from_vec([[2.0]])) \
        is pl.add_plan(Sprs.new_from_vec([[1.0]]), Sprs.new_from_vec([[2.0]]))


def test_cscdevice_jit_consumer():
    import jax
    import jax.numpy as jnp
    from rsparse_tpu.ops.device import spmv_csc

    a = Sprs.new_from_vec([[2.0, 0.0, 1.0], [0.0, 3.0, 0.0], [4.0, 0.0, 5.0]])
    d = a.to_device()
    x = jnp.asarray(np.array([1.0, 2.0, 3.0]), d.x.dtype)

    @jax.jit
    def f(dev, xx):  # CSCDevice flows through jit as a pytree
        return spmv_csc(dev, xx)

    r = np.asarray(f(d, x), np.float64)
    want = np.array([[2.0, 0, 1], [0, 3, 0], [4, 0, 5.0]]) @ np.array([1.0, 2, 3])
    assert np.abs(r - want).max() < 1e-6


def test_lu_mf_plan_failure_leaves_symb_q_untouched():
    # ADVICE: a failed MF-LU plan build must not swap s.q under the caller.
    from rsparse_tpu.factor.frontal_lu import build_lu_mf_plan
    from rsparse_tpu.symbolic import sqr

    n = 40
    rng = np.random.default_rng(0)
    d = np.eye(n) * 4.0
    for _ in range(80):
        i, j = rng.integers(0, n, 2)
        d[i, j] += 0.5
    a = Sprs.new_from_vec([list(r) for r in d])
    s = sqr(a, 1, False)
    q0 = None if s.q is None else np.asarray(s.q).copy()
    import rsparse_tpu.factor.frontal_lu as fl

    # force the plan build to fail at the last step (skeleton plan): disable
    # both the dense-skeleton path and the level-plan fallback
    import importlib

    lud = importlib.import_module("rsparse_tpu.factor.lu_device")
    orig_bp = lud.build_lu_plan
    orig_dmax = fl.DENSE_SKEL_MAX
    try:
        lud.build_lu_plan = lambda *a_, **k_: None
        fl.DENSE_SKEL_MAX = -1
        plan = build_lu_mf_plan(a, s, smax=8)
    finally:
        lud.build_lu_plan = orig_bp
        fl.DENSE_SKEL_MAX = orig_dmax
    assert plan is None
    if q0 is None:
        assert s.q is None
    else:
        assert np.array_equal(np.asarray(s.q), q0)


def test_chol_mf_not_pd_clears_cache():
    from rsparse_tpu.errors import NotPositiveDefiniteError
    from rsparse_tpu.config import config

    n = 2000
    # SPD tridiagonal, then break positive-definiteness
    rows = []
    t = rs.Trpl()
    for i in range(n):
        t.append(i, i, 4.0)
        if i + 1 < n:
            t.append(i + 1, i, -1.0)
            t.append(i, i + 1, -1.0)
    a = t.to_sprs()
    s = rs.schol(a, 0)
    b = list(np.ones(n))
    x = rs.cholsol(a, list(b), 0, sym=s)
    mfp = getattr(s, "_mf_plan", None)
    bad = a.copy()
    bad.x = bad.x.copy()
    # flip one diagonal to a large negative value
    for k in range(bad.nnz()):
        pass
    di = np.where(bad.i[: bad.nnz()] == n // 2)[0]
    cols = np.repeat(np.arange(n), np.diff(bad.p[: n + 1]))
    dk = [k for k in di if cols[k] == n // 2][0]
    bad.x[dk] = -100.0
    with pytest.raises(NotPositiveDefiniteError):
        rs.cholsol(bad, list(b), 0, sym=s)
    if mfp is not None:
        assert "_cache_tree" not in mfp.__dict__
    # a subsequent good solve repopulates and still works
    x2 = rs.cholsol(a, list(b), 0, sym=s)
    assert np.abs(np.asarray(x2) - np.asarray(x)).max() < 1e-8


def test_dia_plan_cache_value_refresh():
    from rsparse_tpu.ops.spmv import dia_plan_cached, spgemm_dia

    t = rs.Trpl()
    n = 300
    for i in range(n):
        t.append(i, i, 2.0)
        if i + 1 < n:
            t.append(i + 1, i, -1.0)
    a = t.to_sprs()
    c1 = spgemm_dia(a, a)
    d1 = np.asarray(c1.to_dense())
    # change VALUES only; the cached plan must refresh, not stale-reuse
    a.x = a.x * 3.0
    c2 = spgemm_dia(a, a)
    d2 = np.asarray(c2.to_dense())
    assert np.abs(d2 - 9.0 * d1).max() < 1e-9
