"""Round-3 regression tests for the read-only-writeback bug class.

VERDICT.md (round 2) Weak #1/#2: `np.asarray` on a dtype-matching JAX
array (and `jax.device_get` output) is a zero-copy READ-ONLY view of the
runtime's cached host buffer; the batched-values drivers then mutated it
in their per-instance fallback tiers (`out[k] = ...`), crashing with
"assignment destination is read-only" — on real TPU only, because the CPU
tests never triggered the redo tier. These tests force the redo/fallback
tiers with device-derived `out` arrays so the hazard stays covered on CPU.
"""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu import solve as solve_mod


def _laplacian(g):
    from conftest import laplacian_sprs

    return laplacian_sprs(g)


def _chol_vals_fixture(g=40, K=4):  # n=1600: smallest MF-tier size
    a = _laplacian(g)
    nz = a.nnz()
    diag = a.i[:nz] == np.repeat(np.arange(a.n), np.diff(a.p))
    AxK = np.tile(a.x[:nz], (K, 1))
    for k in range(K):
        AxK[k][diag] *= 1.0 + 0.5 * k
    rng = np.random.default_rng(7)
    B = rng.standard_normal((K, a.n))
    return a, AxK, B


def test_asarray_of_jax_array_is_readonly_and_writable_copies():
    """Pin the hazard itself: np.asarray of a dtype-matching JAX array is
    read-only (if JAX ever changes this, the guard becomes a no-op and
    this pin documents why it existed)."""
    import jax.numpy as jnp

    y = jnp.arange(4, dtype=jnp.float64)
    v = np.asarray(y, np.float64)
    if v.flags.writeable:
        pytest.skip("jax now returns writable host views; hazard gone")
    w = solve_mod._writable(v)
    assert w.flags.writeable
    w[0] = 42.0  # must not raise
    # a writable array passes through untouched (no copy on the fast path)
    z = np.zeros(3)
    assert solve_mod._writable(z) is z


def test_chol_vals_finish_readonly_out():
    """The accept/fallback pass must handle a READ-ONLY `out` (what the
    device path hands it) when every instance is forced into the redo
    tier — the exact crash that voided BENCH_r02."""
    a = rs.Sprs.new_from_file(
        "/root/reference/tests/assets/cholsol_2.sprs")
    n, nz = a.n, a.nnz()
    K = 3
    AxK = np.tile(a.x[:nz], (K, 1)) * (1.0 + np.arange(K))[:, None]
    rng = np.random.default_rng(3)
    B = rng.standard_normal((K, n))
    s = rs.schol(a, 0)
    out = np.zeros((K, n))  # wrong values on purpose; redo must fix all
    out.flags.writeable = False
    got = solve_mod._chol_vals_finish(
        a, s, AxK, B, out,
        np.ones(K), np.full(K, np.inf), np.ones(K), 0)
    Ad = a.to_dense_np()
    for k in range(K):
        want = np.linalg.solve(Ad * (1.0 + k), B[k])
        assert np.abs(got[k] - want).max() < 1e-8


def test_cholsol_vals_forced_redo_through_device_out(monkeypatch):
    """End-to-end: the MF vmapped tier produces the device-derived `out`;
    the accept gate is forced to reject EVERY instance, so the redo loop
    rewrites every row of it. Results must match the unforced run."""
    a, AxK, B = _chol_vals_fixture()
    assert a.n >= rs.config.mf_min_n, "fixture must exercise the MF tier"
    s = rs.schol(a, 0)
    want = rs.cholsol_vals(a, AxK, B, 0, sym=s)
    orig = solve_mod._chol_vals_finish

    calls = {"n": 0}

    def force(a_, s_, AxK_, Bm_, out, dmin_h, rmax_h, xmax_h, order):
        calls["n"] += 1
        return orig(a_, s_, AxK_, Bm_, out, dmin_h,
                    np.full_like(rmax_h, np.inf), xmax_h, order)

    monkeypatch.setattr(solve_mod, "_chol_vals_finish", force)
    got = rs.cholsol_vals(a, AxK, B, 0, sym=s)
    assert calls["n"] == 1
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_lusol_vals_forced_fallback_through_device_out(monkeypatch):
    """Same forcing for lusol_vals: `_lu_vals_compose`'s per-instance
    accept flags are all flipped to False, driving the `out[bad_idx] = ...`
    writeback on the device-derived array (VERDICT Weak #2)."""
    a0 = _laplacian(40)
    n, nz = a0.n, a0.nnz()
    rng = np.random.default_rng(5)
    ax = a0.x[:nz] + 0.3 * rng.standard_normal(nz)
    a = rs.Sprs(nz, n, n, a0.p, a0.i[:nz], ax)
    diag = a.i[:nz] == np.repeat(np.arange(n), np.diff(a.p))
    K = 3
    AxK = np.tile(ax, (K, 1))
    for k in range(K):
        AxK[k][diag] += 2.0 + 0.5 * k
    B = rng.standard_normal((K, n))
    s = rs.sqr(a, 1, False)
    want = rs.lusol_vals(a, AxK, B, 1, 1e-6, sym=s)
    orig = solve_mod._lu_vals_compose

    def force(plan, stats_h, perm_h, n_, tol):
        ok, pinK, inners = orig(plan, stats_h, perm_h, n_, tol)
        return np.zeros_like(ok), pinK, inners

    monkeypatch.setattr(solve_mod, "_lu_vals_compose", force)
    got = rs.lusol_vals(a, AxK, B, 1, 1e-6, sym=s)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_dist_cholsol_vals_forced_redo(monkeypatch):
    """The distributed vals driver funnels through the same finish pass;
    force its redo tier over the mesh-sharded result too."""
    import jax
    from jax.sharding import Mesh

    from rsparse_tpu import parallel as par

    a, AxK, B = _chol_vals_fixture()
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    s = rs.schol(a, 0)
    want = rs.cholsol_vals(a, AxK, B, 0, sym=s)
    orig = solve_mod._chol_vals_finish

    def force(a_, s_, AxK_, Bm_, out, dmin_h, rmax_h, xmax_h, order):
        return orig(a_, s_, AxK_, Bm_, out, dmin_h,
                    np.full_like(rmax_h, np.inf), xmax_h, order)

    monkeypatch.setattr(solve_mod, "_chol_vals_finish", force)
    got = par.dist_cholsol_vals(a, AxK, B, mesh, 0, sym=s)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_qrsol_vals_minimum_norm_returns_writable(monkeypatch):
    """The min-norm MF branch used to return the runtime's read-only
    view of the device result straight to the caller."""
    from test_solve_multi import _tall_fixture

    monkeypatch.setattr(rs.config, "mf_min_n", 600)  # small + MF tier
    a, _ = _tall_fixture(n=700, m=900, nnz=5200, K=2, seed=9)
    at = rs.ops.transpose(a)  # wide: m < n -> minimum-norm branch
    assert at.m >= rs.config.mf_min_n, "must exercise the MF tier"
    nz = at.nnz()
    K = 2
    AxK = np.tile(at.x[:nz], (K, 1))
    rng = np.random.default_rng(11)
    B = rng.standard_normal((K, at.m))
    X = rs.qrsol_vals(at, AxK, B, 2)
    assert X.flags.writeable
    X[0, 0] = 0.0  # must not raise


# ---------------------------------------------------------------------------
# One-shot fused cholsol (factor+solve+refine in ONE device program) —
# VERDICT.md (round 2) next-round item 3.
# ---------------------------------------------------------------------------


def _diag_sprs(n, vals):
    t = rs.Trpl()
    for i in range(n):
        t.append(i, i, float(vals[i]))
    return rs.Sprs.new_from_trpl(t)


def test_chol_one_shot_path_taken_and_exact():
    """At MF scale the driver must take the one-shot path (never the
    split chol()+solve legacy path) and match the host oracle."""
    a = _laplacian(40)  # n=1600 >= mf_min_n
    n = a.n
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n)
    old = rs.config.backend
    rs.config.backend = "host"
    try:
        want = rs.cholsol(a, list(b), 0)
    finally:
        rs.config.backend = old
    s = rs.symbolic.schol(a, 0)
    got = rs.cholsol(a, list(b), 0, sym=s)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # the one-shot cached its device factor tree on the plan
    assert "_cache_tree" in s._mf_plan.__dict__
    assert "_oneshot_jit_4" in s._mf_plan.__dict__


def test_chol_one_shot_f32_underflow_retries_f64(monkeypatch):
    """One-shot internal mixed-precision retry: a diagonal entry that
    underflows to zero in f32 (dmin == 0) must retry in f64 inside the
    one-shot driver, not raise a spurious NotPositiveDefiniteError."""
    from rsparse_tpu.config import config

    n = 2000
    vals = np.ones(n)
    vals[n // 2] = 1e-46  # f32(1e-46) == 0 -> zero pivot in f32
    a = _diag_sprs(n, vals)
    b = np.ones(n)
    old = config.chol_factor_dtype
    config.chol_factor_dtype = "float32"
    try:
        x = np.asarray(rs.cholsol(a, list(b), 0))
    finally:
        config.chol_factor_dtype = old
    np.testing.assert_allclose(x, 1.0 / vals, rtol=1e-12)


def test_chol_one_shot_genuine_npd_raises():
    """A genuinely indefinite matrix at one-shot scale must raise
    NotPositiveDefiniteError (dmin <= 0 in f64 too)."""
    n = 2000
    vals = np.ones(n)
    vals[7] = -1.0
    a = _diag_sprs(n, vals)
    with pytest.raises(rs.NotPositiveDefiniteError):
        rs.cholsol(a, [1.0] * n, 0)


def test_chol_one_shot_refine_fallback(monkeypatch):
    """If the in-program refinement reports a residual above the accept
    gate, the driver must continue through the step-by-step
    _chol_mf_refine using the cached device tree — and still land on the
    exact answer."""
    a = _laplacian(40)
    n = a.n
    rng = np.random.default_rng(5)
    b = rng.standard_normal(n)
    old = rs.config.backend
    rs.config.backend = "host"
    try:
        want = rs.cholsol(a, list(b), 0)
    finally:
        rs.config.backend = old

    orig = solve_mod._chol_one_shot
    calls = {"refine": 0}

    def bad_rmax(a_, s_, Bm, steps=3):
        out = orig(a_, s_, Bm, steps)
        if out is None:
            return None
        X, _, xmax, mfp = out
        return X, np.inf, xmax, mfp  # force the fallback tier

    orig_refine = solve_mod._chol_mf_refine

    def spy_refine(*args, **kw):
        calls["refine"] += 1
        return orig_refine(*args, **kw)

    monkeypatch.setattr(solve_mod, "_chol_one_shot", bad_rmax)
    monkeypatch.setattr(solve_mod, "_chol_mf_refine", spy_refine)
    got = rs.cholsol(a, list(b), 0)
    assert calls["refine"] == 1
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)


# ---------------------------------------------------------------------------
# LU one-shot (factor + in-program perm compose + solve + refine, one launch)
# ---------------------------------------------------------------------------


def _unsym_band(n, seed=0, diag=lambda j: 4.0):
    """Unsymmetric banded test matrix (offsets -3, -1, 0, +2)."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for j in range(n):
        for i in (j - 3, j - 1, j, j + 2):
            if 0 <= i < n:
                rows.append(i)
                cols.append(j)
                vals.append(diag(j) if i == j else rng.standard_normal())
    r = np.asarray(rows)
    c = np.asarray(cols)
    v = np.asarray(vals)
    p = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(c, minlength=n), out=p[1:])
    order = np.argsort(c, kind="stable")
    return rs.Sprs(len(v), n, n, p, r[order], v[order])


def test_lu_one_shot_path_taken_and_exact():
    """At MF scale lusol must take the one-shot path (factorization, device
    perm compose, solve and refinement in ONE program) and produce an
    f64-residual solution; a second solve reuses the cached program."""
    a = _unsym_band(1600, seed=2)
    n = a.n
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n)
    s = rs.symbolic.sqr(a, 1, False)
    got = np.asarray(rs.lusol(a, list(b), 1, sym=s))
    assert s._mf_lu_plan is not None
    assert "_oneshot_jit_4" in s._mf_lu_plan.__dict__
    assert "_cache_tree" in s._mf_lu_plan.__dict__
    Ad = a.to_dense_np()
    scale = max(1.0, np.abs(b).max(), np.abs(got).max())
    assert np.abs(Ad @ got - b).max() <= 1e-10 * scale
    b2 = rng.standard_normal(n)
    got2 = np.asarray(rs.lusol(a, list(b2), 1, sym=s))
    assert np.abs(Ad @ got2 - b2).max() <= 1e-10 * max(
        1.0, np.abs(b2).max(), np.abs(got2).max())


def test_lu_one_shot_pivoting_composes_perms_on_device():
    """Near-zero diagonals force in-front pivot swaps: the device-composed
    elimination perm (pinv) must match what the host finalize pass would
    produce — verified end-to-end via the residual."""
    a = _unsym_band(1600, seed=4, diag=lambda j: 1e-9)
    n = a.n
    b = np.random.default_rng(5).standard_normal(n)
    s = rs.symbolic.sqr(a, 1, False)
    got = np.asarray(rs.lusol(a, list(b), 1, sym=s))
    assert "_oneshot_jit_4" in s._mf_lu_plan.__dict__
    Ad = a.to_dense_np()
    scale = max(1.0, np.abs(b).max(), np.abs(got).max())
    assert np.abs(Ad @ got - b).max() <= 1e-10 * scale


def test_lu_one_shot_refine_fallback(monkeypatch):
    """If the in-program refinement reports a residual above the accept
    gate, lusol must continue through the step-by-step _lu_mf_refine with
    the device-composed pinv and the cached tree — and still land on the
    exact answer."""
    a = _unsym_band(1600, seed=6)
    n = a.n
    b = np.random.default_rng(7).standard_normal(n)

    orig = solve_mod._lu_one_shot
    calls = {"refine": 0}

    def bad_rmax(a_, s_, Bm, tol, steps=4):
        out = orig(a_, s_, Bm, tol, steps)
        if out is None:
            return None
        X, _, xmax, mfp, pinv = out
        return X, np.inf, xmax, mfp, pinv  # force the fallback tier

    orig_refine = solve_mod._lu_mf_refine

    def spy_refine(*args, **kw):
        calls["refine"] += 1
        return orig_refine(*args, **kw)

    monkeypatch.setattr(solve_mod, "_lu_one_shot", bad_rmax)
    monkeypatch.setattr(solve_mod, "_lu_mf_refine", spy_refine)
    got = np.asarray(rs.lusol(a, list(b), 1))
    assert calls["refine"] == 1
    Ad = a.to_dense_np()
    scale = max(1.0, np.abs(b).max(), np.abs(got).max())
    assert np.abs(Ad @ got - b).max() <= 1e-10 * scale


def test_lu_one_shot_margin_reject_degrades_to_host(monkeypatch):
    """A bad-pivot report from the factorization must reject the one-shot
    (setting _static_rejected so sym-reuse callers skip the device attempt)
    and fall through to a correct solve."""
    from rsparse_tpu.factor import frontal_lu

    a = _unsym_band(1600, seed=8)
    n = a.n
    b = np.random.default_rng(9).standard_normal(n)

    orig_vals = frontal_lu._lu_mf_values

    def poisoned(Ax, plan, tolv, dev):
        import jax.numpy as jnp

        Lx, Ux, margins, bads, cache, perms = orig_vals(Ax, plan, tolv, dev)
        return Lx, Ux, margins, [jnp.asarray(True)], cache, perms

    monkeypatch.setattr(frontal_lu, "_lu_mf_values", poisoned)
    s = rs.symbolic.sqr(a, 1, False)
    got = np.asarray(rs.lusol(a, list(b), 1, sym=s))
    assert getattr(s, "_static_rejected", False)
    Ad = a.to_dense_np()
    scale = max(1.0, np.abs(b).max(), np.abs(got).max())
    assert np.abs(Ad @ got - b).max() <= 1e-8 * scale


def test_lusol_multi_one_shot_batched():
    """lusol_multi at MF scale routes the whole batch through the one-shot
    (one program; no separate lu() factor launch)."""
    a = _unsym_band(1600, seed=10)
    n = a.n
    B = np.random.default_rng(11).standard_normal((n, 8))
    s = rs.symbolic.sqr(a, 1, False)
    X = np.asarray(rs.lusol_multi(a, B, 1, sym=s))
    assert "_oneshot_jit_4" in s._mf_lu_plan.__dict__
    Ad = a.to_dense_np()
    scale = max(1.0, np.abs(B).max(), np.abs(X).max())
    assert np.abs(Ad @ X - B).max() <= 1e-10 * scale
    assert X.flags.writeable
