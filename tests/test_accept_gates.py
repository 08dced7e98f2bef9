"""Conditioning-swept property tests for the f32-factor accept gates.

VERDICT.md (round 2) Weak #4 / next-round #6: the mixed-precision drivers
(f32 factor + f64 refinement) ship tuned accept thresholds; these tests pin
the CONTRACT those constants serve, across condition numbers kappa
1e2..1e8: (a) accept-or-fallback — whatever tier serves the solve, the
result matches the exact f64 oracle to 1e-6 relative; (b) the
NotPositiveDefinite contract names exactly the truly-indefinite instances
of a batch. A 1-D Laplacian shifted by 4/(kappa-1) has eigenvalues in
[shift, 4+shift], so kappa is controlled exactly.
"""

import numpy as np
import pytest

import rsparse_tpu as rs


def _lap1d_shifted(n, kappa):
    """1-D Laplacian + shift*I with condition number ~kappa (CSC arrays)."""
    shift = 4.0 / (kappa - 1.0)
    rows, cols, vals = [], [], []
    for j in range(n):
        if j > 0:
            rows.append(j - 1)
            cols.append(j)
            vals.append(-1.0)
        rows.append(j)
        cols.append(j)
        vals.append(2.0 + shift)
        if j < n - 1:
            rows.append(j + 1)
            cols.append(j)
            vals.append(-1.0)
    r = np.asarray(rows)
    c = np.asarray(cols)
    v = np.asarray(vals, np.float64)
    p = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(c, minlength=n), out=p[1:])
    return rs.Sprs(len(v), n, n, p, r, v)


def _oracle(a, B):
    old = rs.config.backend
    rs.config.backend = "host"
    try:
        return np.stack([np.asarray(rs.cholsol(a, list(b), 0))
                         for b in B])
    finally:
        rs.config.backend = old


KAPPAS = [1e2, 1e5, 1e8]


@pytest.mark.parametrize("kappa", KAPPAS)
def test_cholsol_vals_accept_or_fallback(kappa):
    n, K = 2000, 3
    assert n >= rs.config.mf_min_n
    a = _lap1d_shifted(n, kappa)
    nz = a.nnz()
    rng = np.random.default_rng(int(kappa) % 97)
    AxK = np.tile(a.x[:nz], (K, 1))
    diag = a.i[:nz] == np.repeat(np.arange(n), np.diff(a.p))
    for k in range(K):
        AxK[k][diag] *= 1.0 + 0.25 * k  # distinct same-pattern instances
    B = rng.standard_normal((K, n))
    X = np.asarray(rs.cholsol_vals(a, AxK, B, 0))
    for k in range(K):
        ak = rs.Sprs(nz, n, n, a.p, a.i[:nz], AxK[k])
        want = _oracle(ak, B[k:k + 1])[0]
        rel = np.abs(X[k] - want).max() / max(1.0, np.abs(want).max())
        assert rel < 1e-6, (kappa, k, rel)


@pytest.mark.parametrize("kappa", KAPPAS)
def test_lusol_vals_accept_or_fallback(kappa):
    n, K = 2000, 3
    a = _lap1d_shifted(n, kappa)
    nz = a.nnz()
    rng = np.random.default_rng(3 + int(kappa) % 89)
    AxK = np.tile(a.x[:nz], (K, 1))
    for k in range(K):  # general perturbation: LU territory
        AxK[k] = AxK[k] * (1.0 + 0.1 * k)
    B = rng.standard_normal((K, n))
    X = np.asarray(rs.lusol_vals(a, AxK, B, 1, 1e-6))
    for k in range(K):
        ak = rs.Sprs(nz, n, n, a.p, a.i[:nz], AxK[k])
        r = np.asarray(rs.gaxpy(ak, list(X[k]), [0.0] * n)) - B[k]
        scale = max(1.0, np.abs(B[k]).max(), np.abs(X[k]).max())
        assert np.abs(r).max() / scale < 1e-6, (kappa, k)


@pytest.mark.parametrize("kappa", [1e2, 1e6])
def test_chol_one_shot_accept_or_fallback(kappa):
    """The fused one-shot driver across conditioning: same contract."""
    n = 2000
    a = _lap1d_shifted(n, kappa)
    rng = np.random.default_rng(11)
    b = rng.standard_normal(n)
    want = _oracle(a, b[None])[0]
    got = np.asarray(rs.cholsol(a, list(b), 0))
    rel = np.abs(got - want).max() / max(1.0, np.abs(want).max())
    assert rel < 1e-6, (kappa, rel)


def test_cholsol_vals_npd_names_exact_instances():
    """The batch NPD error must name exactly the indefinite instances."""
    n, K = 2000, 4
    a = _lap1d_shifted(n, 1e3)
    nz = a.nnz()
    AxK = np.tile(a.x[:nz], (K, 1))
    diag = a.i[:nz] == np.repeat(np.arange(n), np.diff(a.p))
    for bad in (1, 3):
        AxK[bad][diag] = -1.0  # genuinely indefinite
    B = np.random.default_rng(5).standard_normal((K, n))
    with pytest.raises(rs.NotPositiveDefiniteError) as ei:
        rs.cholsol_vals(a, AxK, B, 0)
    msg = str(ei.value)
    assert "1" in msg and "3" in msg
    assert "0" not in msg.replace("[1, 3]", "") or "[1, 3]" in msg


def test_serve_handle_residual_is_honest():
    """cholsol_serve: the handle's reported last_residual must bound the
    TRUE residual of the returned X (serving pipelines gate on it)."""
    import jax

    if jax.default_backend() == "tpu":
        pytest.skip("CPU-interpreter test")
    n = 400
    old = rs.config.serve_mixed
    rs.config.serve_mixed = "force"
    try:
        a = _lap1d_shifted(n, 1e5)
        h = rs.cholsol_serve(a, 0)
        B = np.random.default_rng(7).standard_normal((n, 4))
        X = np.asarray(h(B))
        rep = float(h.last_residual)
        true_r = np.abs(B - np.stack(
            [np.asarray(rs.gaxpy(a, list(X[:, k]), [0.0] * n))
             for k in range(4)], axis=1)).max()
        assert true_r <= max(2.0 * rep, 1e-9), (true_r, rep)
        scale = max(1.0, np.abs(B).max())
        assert true_r < 1e-6 * scale
    finally:
        rs.config.serve_mixed = old
