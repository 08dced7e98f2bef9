"""Batched-RHS triangular solves and cholsol_multi (TPU serving shape)."""

import numpy as np
import pytest

import rsparse_tpu as rs

from conftest import ASSETS


def _factor(name, order):
    a = rs.Sprs.new_from_file(f"{ASSETS}/{name}.sprs")
    s = rs.schol(a, order)
    return a, rs.chol(a, s).l, s


@pytest.mark.parametrize("kind", ["l", "lt", "u", "ut"])
def test_multi_matches_single(kind):
    a, l, _ = _factor("cholsol_2", 0)
    t = rs.transpose(l) if kind in ("u", "ut") else l
    fn_multi = {
        "l": rs.lsolve_multi, "lt": rs.ltsolve_multi,
        "u": rs.usolve_multi, "ut": rs.utsolve_multi,
    }[kind]
    fn_one = {"l": rs.lsolve, "lt": rs.ltsolve, "u": rs.usolve, "ut": rs.utsolve}[kind]
    rng = np.random.default_rng(0)
    X = rng.standard_normal((t.n, 5))
    got = fn_multi(t, X)
    for c in range(5):
        want = fn_one(t, list(X[:, c]))
        np.testing.assert_allclose(got[:, c], np.asarray(want), rtol=1e-12, atol=1e-12)


def test_cholsol_multi_matches_cholsol():
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_2.sprs")
    rng = np.random.default_rng(1)
    B = rng.standard_normal((a.n, 4))
    X = rs.cholsol_multi(a, B, 0)
    for c in range(4):
        want = rs.cholsol(a, list(B[:, c]), 0)
        np.testing.assert_allclose(X[:, c], np.asarray(want), rtol=1e-10, atol=1e-10)


def test_cholsol_multi_residual_large():
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_7.sprs")  # 4000x4000
    rng = np.random.default_rng(2)
    B = rng.standard_normal((a.n, 3))
    X = rs.cholsol_multi(a, B, 0)
    # cholsol reads only triu(A) (reference symperm semantics,
    # src/lib.rs:2369-2408) and this asset is NOT exactly symmetric — the
    # correct residual operator is the symmetrized triu-based matrix.
    d = a.to_dense_np()
    sym = np.triu(d) + np.triu(d, 1).T
    R = sym @ X - B
    assert np.abs(R).max() < 1e-9


def test_cholsol_ir_recovers_f64_accuracy():
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_2.sprs")
    rng = np.random.default_rng(3)
    b = rng.standard_normal(a.n)
    x64 = np.asarray(rs.cholsol(a, list(b), 0))
    x_ir = np.asarray(rs.cholsol_ir(a, list(b), 0, "float32", refine=3))
    # f32 factor alone is ~1e-6; refinement must reach f64-class accuracy
    assert np.abs(x_ir - x64).max() < 1e-10


def test_sym_reuse_across_solves():
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_2.sprs")
    s = rs.schol(a, 0)
    rng = np.random.default_rng(4)
    b1 = rng.standard_normal(a.n)
    b2 = rng.standard_normal(a.n)
    x1 = np.asarray(rs.cholsol(a, list(b1), 0, sym=s))
    x2 = np.asarray(rs.cholsol(a, list(b2), 0, sym=s))
    assert s.plan is not None  # device plan cached on the Symb
    np.testing.assert_allclose(x1, np.asarray(rs.cholsol(a, list(b1), 0)),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(x2, np.asarray(rs.cholsol(a, list(b2), 0)),
                               rtol=1e-12, atol=1e-12)


def test_lusol_multi_matches_lusol():
    a = rs.Sprs.new_from_file(f"{ASSETS}/lusol_3.sprs")
    rng = np.random.default_rng(6)
    B = rng.standard_normal((a.n, 3))
    s = rs.sqr(a, 1, False)
    X = rs.lusol_multi(a, B, 1, 1e-6, sym=s)
    for c in range(3):
        want = rs.lusol(a, list(B[:, c]), 1, 1e-6)
        np.testing.assert_allclose(X[:, c], np.asarray(want), rtol=1e-9, atol=1e-9)


def test_qrsol_ls_matches_qrsol_overdetermined():
    a = rs.Sprs.new_from_file(f"{ASSETS}/qrsol_8.sprs")  # 200x201? -> use transpose
    at = rs.transpose(a)  # tall 201x200
    t = at if at.m >= at.n else a
    rng = np.random.default_rng(9)
    b = rng.standard_normal(t.m)
    want = np.asarray(rs.qrsol(t, list(b), 2))[: t.n]
    got = np.asarray(rs.qrsol_ls(t, b, 0, refine=3))
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)


def test_qrsol_ls_minimum_norm():
    a = rs.Sprs.new_from_vec([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    b = [1.0, 2.0]
    want = np.asarray(rs.qrsol(a, list(b), 2))
    got = np.asarray(rs.qrsol_ls(a, b, 0, refine=3))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


# ---------------------------------------------------------------------------
# cholsol_vals: batched-VALUES solve (K same-pattern systems, one program)
# ---------------------------------------------------------------------------


def _laplacian(g):
    from conftest import laplacian_sprs

    return laplacian_sprs(g)


def _vals_fixture(g=40, K=5):  # n=1600: smallest MF-tier size
    a = _laplacian(g)
    nz = a.nnz()
    diag = a.i[:nz] == np.repeat(np.arange(a.n), np.diff(a.p))
    AxK = np.tile(a.x[:nz], (K, 1))
    for k in range(K):
        AxK[k][diag] *= 1.0 + 0.5 * k
    return a, AxK, diag


def test_cholsol_vals_mf_path_matches_dense():
    a, AxK, _ = _vals_fixture()
    K, n = AxK.shape[0], a.n
    assert n >= rs.config.mf_min_n, "fixture must exercise the MF path"
    rng = np.random.default_rng(1)
    B = rng.standard_normal((K, n))
    s = rs.schol(a, 0)
    X = rs.cholsol_vals(a, AxK, B, 0, sym=s)
    Ad = a.to_dense_np()
    dd = np.arange(n)
    for k in range(K):
        Adk = Ad.copy()
        Adk[dd, dd] *= 1.0 + 0.5 * k
        want = np.linalg.solve(Adk, B[k])
        assert np.abs(X[k] - want).max() < 1e-8
    # per-instance answers match the single-matrix driver
    a1 = rs.Sprs(a.nnz(), n, n, a.p, a.i[: a.nnz()], AxK[2])
    x1 = np.asarray(rs.cholsol(a1, list(B[2]), 0))
    assert np.abs(X[2] - x1).max() < 1e-8


def test_cholsol_vals_broadcast_reuse_and_npd():
    a, AxK, diag = _vals_fixture()
    K, n = AxK.shape[0], a.n
    rng = np.random.default_rng(2)
    B = rng.standard_normal((K, n))
    s = rs.schol(a, 0)
    X = rs.cholsol_vals(a, AxK, B, 0, sym=s)
    # [n] RHS broadcasts to all instances
    Xb = rs.cholsol_vals(a, AxK, B[0], 0, sym=s)
    assert np.abs(Xb[0] - X[0]).max() < 1e-12
    # plan + program reuse across calls with fresh values
    X2 = rs.cholsol_vals(a, AxK * 1.25, B, 0, sym=s)
    assert np.isfinite(X2).all()
    # one indefinite instance fails the whole batch, naming the instance
    bad = AxK.copy()
    bad[3][diag] = -5.0
    with pytest.raises(rs.NotPositiveDefiniteError, match=r"\[3\]"):
        rs.cholsol_vals(a, bad, B, 0, sym=s)


def test_cholsol_vals_small_problem_fallback():
    a = rs.Sprs.new_from_file(f"{ASSETS}/cholsol_2.sprs")
    nz, n = a.nnz(), a.n
    K = 3
    AxK = np.tile(a.x[:nz], (K, 1)) * (1.0 + np.arange(K))[:, None]
    rng = np.random.default_rng(3)
    B = rng.standard_normal((K, n))
    X = rs.cholsol_vals(a, AxK, B, 0)
    Ad = a.to_dense_np()
    for k in range(K):
        want = np.linalg.solve(Ad * (1.0 + k), B[k])
        assert np.abs(X[k] - want).max() < 1e-8


def test_cholsol_vals_shape_validation():
    a, AxK, _ = _vals_fixture()
    B = np.zeros((AxK.shape[0], a.n))
    with pytest.raises(ValueError):
        rs.cholsol_vals(a, AxK[:, :-1], B, 0)
    with pytest.raises(ValueError):
        rs.cholsol_vals(a, AxK, B[:, :-1], 0)


# ---------------------------------------------------------------------------
# qrsol_vals: batched-VALUES least-squares / minimum-norm
# ---------------------------------------------------------------------------


def _tall_fixture(n=1600, m=2000, nnz=12000, K=4, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    k = np.unique(c * np.int64(m) + r)
    c2, r2 = k // m, (k % m).astype(np.int64)
    v = rng.standard_normal(len(k))
    r2 = np.concatenate([r2, np.arange(n)])  # identity block: full rank
    c2 = np.concatenate([c2, np.arange(n)])
    v = np.concatenate([v, np.full(n, 5.0)])
    order = np.lexsort((r2, c2))
    r2, c2, v = r2[order], c2[order], v[order]
    kk = c2 * np.int64(m) + r2
    keep = np.concatenate([[True], kk[1:] != kk[:-1]])
    r2, c2, v = r2[keep], c2[keep], v[keep]
    p = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(c2, minlength=n), out=p[1:])
    a = rs.Sprs(len(v), m, n, p, r2, v)
    AxK = np.tile(v, (K, 1)) * (1.0 + 0.3 * np.arange(K))[:, None]
    return a, AxK


def test_qrsol_vals_least_squares_mf(monkeypatch):
    # small problem + lowered MF threshold: the vmapped whole-tree program
    # compiles in seconds instead of the ~17 min the 2000x1600 fixture
    # cost (coverage is the MF code path, not the size)
    monkeypatch.setattr(rs.config, "mf_min_n", 600)
    a, AxK = _tall_fixture(n=700, m=900, nnz=5200)
    assert a.n >= rs.config.mf_min_n
    K = AxK.shape[0]
    rng = np.random.default_rng(1)
    B = rng.standard_normal((K, a.m))
    X = rs.qrsol_vals(a, AxK, B, 2)
    Ad = a.to_dense_np()
    for k in range(K):
        want, *_ = np.linalg.lstsq(Ad * (1.0 + 0.3 * k), B[k], rcond=None)
        err = np.abs(X[k] - want).max() / max(1.0, np.abs(want).max())
        assert err < 1e-8
    # matches the single-matrix driver
    a1 = rs.Sprs(a.nnz(), a.m, a.n, a.p, a.i[: a.nnz()], AxK[1])
    x1 = np.asarray(rs.qrsol(a1, list(B[1]), 2))
    assert np.abs(X[1] - x1).max() < 1e-8


def test_qrsol_vals_minimum_norm_mf(monkeypatch):
    monkeypatch.setattr(rs.config, "mf_min_n", 600)  # see least_squares_mf
    a, AxK = _tall_fixture(n=700, m=900, nnz=5200, seed=2)
    at = rs.ops.transpose(a)  # wide: m < n
    K = AxK.shape[0]
    nz = at.nnz()
    AxtK = np.tile(at.x[:nz], (K, 1)) * (1.0 + 0.3 * np.arange(K))[:, None]
    rng = np.random.default_rng(3)
    B = rng.standard_normal((K, at.m))
    X = rs.qrsol_vals(at, AxtK, B, 2)
    Ad = at.to_dense_np()
    for k in range(K):
        Adk = Ad * (1.0 + 0.3 * k)
        assert np.abs(Adk @ X[k] - B[k]).max() < 1e-8  # consistent
        wmin = np.linalg.lstsq(Adk, B[k], rcond=None)[0]
        assert np.abs(X[k] - wmin).max() < 1e-6  # minimum-norm


def test_qrsol_vals_small_fallback_and_validation():
    a = rs.Sprs.new_from_file(f"{ASSETS}/qrsol_5.sprs")
    nz = a.nnz()
    K = 3
    AxK = np.tile(a.x[:nz], (K, 1)) * (1.0 + np.arange(K))[:, None]
    rng = np.random.default_rng(4)
    B = rng.standard_normal((K, a.m))
    X = rs.qrsol_vals(a, AxK, B, 2)
    Ad = a.to_dense_np()
    for k in range(K):
        want, *_ = np.linalg.lstsq(Ad * (1.0 + k), B[k], rcond=None)
        assert np.abs(X[k] - want).max() < 1e-8
    with pytest.raises(ValueError):
        rs.qrsol_vals(a, AxK[:, :-1], B, 2)
    with pytest.raises(ValueError):
        rs.qrsol_vals(a, AxK, B[:, :-1], 2)


# ---------------------------------------------------------------------------
# lusol_vals: batched-VALUES LU (vmapped MF pivoting tree + f64 refinement)
# ---------------------------------------------------------------------------


def _lu_vals_fixture(g=40, K=5, seed=0):  # n=1600 (suite wall)
    a0 = _laplacian(g)
    n, nz = a0.n, a0.nnz()
    rng = np.random.default_rng(seed)
    ax = a0.x[:nz] + 0.3 * rng.standard_normal(nz)  # nonsymmetric
    a = rs.Sprs(nz, n, n, a0.p, a0.i[:nz], ax)
    diag = a.i[:nz] == np.repeat(np.arange(n), np.diff(a.p))
    AxK = np.tile(ax, (K, 1))
    for k in range(K):
        AxK[k][diag] += 2.0 + 0.5 * k
    return a, AxK, diag


def _densify(a, ax):
    nz = a.nnz()
    d = np.zeros((a.n, a.n))
    cols = np.repeat(np.arange(a.n), np.diff(a.p))
    d[a.i[:nz], cols] = ax
    return d


def test_lusol_vals_mf_matches_dense():
    a, AxK, _ = _lu_vals_fixture()
    assert a.n >= rs.config.mf_min_n
    K = AxK.shape[0]
    rng = np.random.default_rng(1)
    B = rng.standard_normal((K, a.n))
    s = rs.sqr(a, 1, False)
    X = rs.lusol_vals(a, AxK, B, 1, 1e-6, sym=s)
    for k in range(K):
        want = np.linalg.solve(_densify(a, AxK[k]), B[k])
        err = np.abs(X[k] - want).max() / max(1.0, np.abs(want).max())
        assert err < 1e-9
    # agreement with the single-matrix driver
    a1 = rs.Sprs(a.nnz(), a.n, a.n, a.p, a.i[: a.nnz()], AxK[3])
    x1 = np.asarray(rs.lusol(a1, list(B[3]), 1, 1e-6))
    assert np.abs(X[3] - x1).max() < 1e-9


def test_lusol_vals_pivot_instance_in_batch():
    """One instance with a zeroed diagonal entry (pivoting required) rides
    the same batched program; the rest are bit-identical to a clean run."""
    a, AxK, diag = _lu_vals_fixture(seed=2)
    K = AxK.shape[0]
    rng = np.random.default_rng(2)
    B = rng.standard_normal((K, a.n))
    s = rs.sqr(a, 1, False)
    X = rs.lusol_vals(a, AxK, B, 1, 1e-6, sym=s)
    bad = AxK.copy()
    dpos = np.nonzero(diag)[0]
    bad[2][dpos[7]] = 0.0
    XB = rs.lusol_vals(a, bad, B, 1, 1e-6, sym=s)
    want = np.linalg.solve(_densify(a, bad[2]), B[2])
    err = np.abs(XB[2] - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-8
    assert np.abs(XB[0] - X[0]).max() < 1e-12


def test_lusol_vals_small_tier_and_validation():
    a = rs.Sprs.new_from_file(f"{ASSETS}/lusol_3.sprs")
    nz = a.nnz()
    K = 3
    AxK = np.tile(a.x[:nz], (K, 1)) * (1.0 + np.arange(K))[:, None]
    rng = np.random.default_rng(3)
    B = rng.standard_normal((K, a.n))
    X = rs.lusol_vals(a, AxK, B, 1, 1e-6)
    for k in range(K):
        want = np.linalg.solve(_densify(a, AxK[k]), B[k])
        assert np.abs(X[k] - want).max() < 1e-8
    with pytest.raises(ValueError):
        rs.lusol_vals(a, AxK[:, :-1], B)
    with pytest.raises(ValueError):
        rs.lusol_vals(a, AxK, B[:, :-1])


def test_vals_mixed_precision_f32_factor():
    """Force the f32 factor path (the TPU default) on CPU: the in-program
    f64 refinement must recover full accuracy for both cholsol_vals and
    lusol_vals, and the spurious-f32-NPD / residual gates must not
    misfire on well-conditioned instances."""
    a, AxK, _ = _vals_fixture()
    al, AxKl, _ = _lu_vals_fixture(seed=5)
    K = AxK.shape[0]
    rng = np.random.default_rng(7)
    B = rng.standard_normal((K, a.n))
    Bl = rng.standard_normal((AxKl.shape[0], al.n))
    old_c, old_l = rs.config.chol_factor_dtype, rs.config.lu_factor_dtype
    rs.config.chol_factor_dtype = "float32"
    rs.config.lu_factor_dtype = "float32"
    # fresh Symb objects: cached _vals_jit programs bake the factor dtype
    try:
        s = rs.schol(a, 0)
        X = rs.cholsol_vals(a, AxK, B, 0, sym=s)
        Ad = a.to_dense_np()
        dd = np.arange(a.n)
        for k in range(K):
            Adk = Ad.copy()
            Adk[dd, dd] *= 1.0 + 0.5 * k
            want = np.linalg.solve(Adk, B[k])
            err = np.abs(X[k] - want).max() / max(1.0, np.abs(want).max())
            assert err < 1e-9, (k, err)
        sl = rs.sqr(al, 1, False)
        Xl = rs.lusol_vals(al, AxKl, Bl, 1, 1e-6, sym=sl)
        for k in range(AxKl.shape[0]):
            want = np.linalg.solve(_densify(al, AxKl[k]), Bl[k])
            err = np.abs(Xl[k] - want).max() / max(1.0, np.abs(want).max())
            assert err < 1e-9, (k, err)
    finally:
        rs.config.chol_factor_dtype = old_c
        rs.config.lu_factor_dtype = old_l
