"""Round-4 regressions: TPU-viable multifrontal QR.

Round 3's bench died in the qrsol section: qr_mf traced ALL front buckets
into ONE jit (81 buckets / 370M index entries at qrsol_3 scale — >30 min
remote compile) and factored in f64 (batched f64 lax.linalg.qr measured
~56x slower than f32 on v5e). Round 4 chunks the factor into
compile-bounded programs and factors in f32 on accelerators, recovering
f64 accuracy with fused refinement: CSNE steps for least squares (no
eps32*||r*|| floor from the nonzero optimal residual), Q^T re-solve steps
for the consistent minimum-norm branch. These tests force the f32 path on
CPU and pin both the accuracy contract and the chunking machinery.
"""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu.config import config
from rsparse_tpu.data import Trpl
from rsparse_tpu.symbolic import sqr


def _mk(m, n, rng, diag=2.0):
    t = Trpl()
    for i in range(m):
        cols = {i % n, (i * 7 + 3) % n, (i * 13 + 11) % n}
        for c in cols:
            t.append(i, c, (diag if c == i % n else 0.0)
                     + rng.standard_normal())
    return t.to_sprs()


@pytest.fixture
def f32_qr():
    config.qr_factor_dtype = "float32"
    yield
    config.qr_factor_dtype = "auto"


def test_qrsol_mf_ls_f32_csne_reaches_f64(f32_qr, monkeypatch):
    """f32 fronts + fused CSNE refinement must match lstsq to f64 levels
    (the Q^T-based refinement it replaces stalled at ~2e-6: the optimal LS
    residual is NONZERO, so S(r*) ~ eps32*||r*||/sigma_min floors it)."""
    monkeypatch.setattr(config, "mf_min_n", 600)
    rng = np.random.default_rng(0)
    A = _mk(900, 760, rng)
    b = rng.standard_normal(900)
    want = np.linalg.lstsq(A.to_dense_np(), b, rcond=None)[0]
    s = sqr(A, 2, True)
    x = np.asarray(rs.qrsol(A, list(b), 2, sym=s))[:760]
    assert s._mf_qr_plan is not None  # the MF device path actually ran
    err = np.abs(x - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-10, err


def test_qrsol_mf_mn_f32_refine_reaches_f64(f32_qr, monkeypatch):
    monkeypatch.setattr(config, "mf_min_n", 600)
    rng = np.random.default_rng(1)
    A = _mk(760, 900, rng)
    b = rng.standard_normal(760)
    Ad = A.to_dense_np()
    want = np.linalg.lstsq(Ad, b, rcond=None)[0]
    x = np.asarray(rs.qrsol(A, list(b), 2))[:900]
    resid = np.abs(Ad @ x - b).max()
    assert resid < 1e-8, resid
    # minimum-norm property survives refinement (corrections stay in
    # range(A') because they map through Q's columns)
    gap = abs(np.linalg.norm(x) - np.linalg.norm(want))
    assert gap < 1e-6 * max(1.0, np.linalg.norm(want)), gap


def test_qr_mf_chunked_factor_matches_monolithic(f32_qr, monkeypatch):
    """Forcing a tiny per-program entry cap must split the factor into
    many chunks without changing the solution (sequential chunk execution
    preserves level order at any cut)."""
    from rsparse_tpu.factor import frontal, frontal_qr

    monkeypatch.setattr(config, "mf_min_n", 600)
    rng = np.random.default_rng(2)
    A = _mk(900, 760, rng)
    b = rng.standard_normal(900)
    want = np.linalg.lstsq(A.to_dense_np(), b, rcond=None)[0]

    monkeypatch.setattr(frontal, "FUSE_ENTRY_CAP", 50_000)
    s = sqr(A, 2, True)
    x = np.asarray(rs.qrsol(A, list(b), 2, sym=s))[:760]
    plan = s._mf_qr_plan
    assert plan is not None
    chunks = plan.__dict__["_chunks"]
    assert len(chunks) > 3  # the tiny cap really split the tree
    assert sorted(i for ck in chunks for i in ck) == list(
        range(sum(len(lev) for lev in plan.levels)))
    err = np.abs(x - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-10, err


def test_qrsol_vals_entry_cap_falls_back_per_instance(f32_qr, monkeypatch):
    """Plans beyond the fuse cap must take the per-instance tier (which
    runs the chunked qr_mf path) instead of tracing the K-batched
    whole-tree program — the hang that killed the round-3 bench."""
    from rsparse_tpu.factor import frontal

    monkeypatch.setattr(config, "mf_min_n", 600)
    rng = np.random.default_rng(3)
    A = _mk(900, 760, rng)
    K = 3
    nz = A.nnz()
    AxK = np.tile(A.x[:nz], (K, 1)) * (1.0 + 0.1 * np.arange(K))[:, None]
    B = rng.standard_normal((K, 900))

    monkeypatch.setattr(frontal, "FUSE_ENTRY_CAP", 50_000)
    s = sqr(A, 2, True)
    X = rs.qrsol_vals(A, AxK, B, 2, sym=s)
    assert s._mf_qr_plan is not None
    assert s._mf_qr_plan.__dict__.get("_vals_fuse_ok") is False
    for k in range(K):
        Ak = A.to_dense_np() * (1.0 + 0.1 * k)
        want = np.linalg.lstsq(Ak, B[k], rcond=None)[0]
        err = np.abs(X[k] - want).max() / max(1.0, np.abs(want).max())
        assert err < 1e-9, (k, err)


def test_qrsol_mf_pallas_sweeps_interpret(monkeypatch):
    """The TPU solve path routes the R sweeps through the Pallas VMEM
    kernel (the XLA level loop measured ~0.5 s/sweep on qrsol_3's
    nlev=2420 schedule vs ~30 ms); serve_mixed='force' runs it through
    the interpreter on CPU, pinning trace structure + accuracy."""
    monkeypatch.setattr(config, "qr_factor_dtype", "float32")
    monkeypatch.setattr(config, "serve_mixed", "force")
    monkeypatch.setattr(config, "mf_min_n", 50)

    rng = np.random.default_rng(7)
    A = _mk(90, 70, rng)
    b = rng.standard_normal(90)
    want = np.linalg.lstsq(A.to_dense_np(), b, rcond=None)[0]
    s = sqr(A, 2, True)
    x = np.asarray(rs.qrsol(A, list(b), 2, sym=s))[:70]
    assert s._mf_qr_plan is not None
    assert any(k.startswith("_solve_jit") and "_True" in k
               for k in s._mf_qr_plan.__dict__)  # the Pallas variant ran
    err = np.abs(x - want).max() / max(1.0, np.abs(want).max())
    assert err < 1e-8, err

    A2 = _mk(70, 90, rng)
    b2 = rng.standard_normal(70)
    A2d = A2.to_dense_np()
    x2 = np.asarray(rs.qrsol(A2, list(b2), 2))[:90]
    resid = np.abs(A2d @ x2 - b2).max()
    assert resid < 1e-8, resid


def test_qr_factor_dtype_auto_is_f64_on_cpu():
    import jax.numpy as jnp

    from rsparse_tpu.factor.frontal_qr import _qr_factor_dtype

    assert config.qr_factor_dtype == "auto"
    assert _qr_factor_dtype() == jnp.float64  # tests run on CPU


def test_sprs_fields_are_writable_from_device_arrays():
    """np.asarray of a dtype-matching JAX array is a zero-copy READ-ONLY
    view; Sprs built from device-op results must still honor the reference
    idiom `a.x[k] = v` (the bug class that voided BENCH_r02)."""
    import jax.numpy as jnp

    x = jnp.asarray(np.array([1.0, 2.0, 3.0]))
    i = jnp.asarray(np.array([0, 1, 2]))
    p = jnp.asarray(np.array([0, 1, 2, 3]))
    a = rs.Sprs(3, 3, 3, p, i, x)
    a.x[0] = 7.0  # must not raise ValueError: assignment destination ...
    a.i[0] = 1
    a.p[0] = 0
    assert a.x[0] == 7.0
