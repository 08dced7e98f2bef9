"""DIA fast-path SpMV tests (ops/spmv.py) against dense and gaxpy oracles."""

import numpy as np
import pytest

import rsparse_tpu as rs
from rsparse_tpu.ops import spmv as spmv_mod

from conftest import ASSETS


def _load(name):
    return rs.Sprs.new_from_file(f"{ASSETS}/{name}.sprs")


@pytest.mark.parametrize("name", ["cholsol_1", "allsol_1", "cholsol_2", "lusol_3"])
def test_spmv_matches_dense(name):
    a = _load(name)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.n)
    r = np.asarray(spmv_mod.spmv(a, x), np.float64)
    want = a.to_dense_np() @ x
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(r, want, atol=1e-5 * scale)  # f32 path


def test_spmv_remainder_split():
    """Force a tiny max_diags so most entries go through the COO remainder."""
    a = _load("allsol_1")
    p = spmv_mod.dia_plan(a, max_diags=2)
    assert p.rem_vals is not None and len(p.offsets) == 2
    rng = np.random.default_rng(1)
    x = rng.standard_normal(a.n)
    r = np.asarray(spmv_mod.spmv(a, x, p), np.float64)
    want = a.to_dense_np() @ x
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(r, want, atol=1e-5 * scale)


def test_spmv_f64_plan():
    a = _load("cholsol_2")
    p = spmv_mod.dia_plan(a, dtype=np.float64)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(a.n)
    r = np.asarray(spmv_mod.spmv(a, x, p))
    want = a.to_dense_np() @ x
    np.testing.assert_allclose(r, want, rtol=1e-12, atol=1e-12)


def test_spgemm_dia_matches_multiply():
    a = _load("cholsol_1")
    at = rs.transpose(a)
    want = rs.multiply(a, at)
    got = spmv_mod.spgemm_dia(a, at)
    np.testing.assert_allclose(got.to_dense_np(), want.to_dense_np(),
                               rtol=1e-12, atol=1e-12)


def test_spgemm_dia_rectangular():
    a = _load("qrsol_8")  # 200x201
    at = rs.transpose(a)
    want = rs.multiply(at, a)  # 201x201
    got = spmv_mod.spgemm_dia(at, a)
    np.testing.assert_allclose(got.to_dense_np(), want.to_dense_np(),
                               rtol=1e-12, atol=1e-12)


def test_spgemm_dia_dimension_check():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        spmv_mod.spgemm_dia(rs.Sprs.eye(3), rs.Sprs.eye(4))


def test_spgemm_dia_fallback_dense_pattern():
    """Operands with too many distinct diagonals route to Gustavson."""
    rng = np.random.default_rng(3)
    d = (rng.random((60, 60)) < 0.5) * rng.standard_normal((60, 60))
    a = rs.Sprs.new_from_vec(d.tolist())
    got = spmv_mod.spgemm_dia(a, a, trim=False)
    want = rs.multiply(a, a)
    np.testing.assert_allclose(got.to_dense_np(), want.to_dense_np(),
                               rtol=1e-12, atol=1e-12)
