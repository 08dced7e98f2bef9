"""Save/load round-trip tests (ports of save_load_tests.rs) + verbatim
compatibility with the reference's .sprs assets."""

import os

import numpy as np

import rsparse_tpu as rs
from rsparse_tpu import Sprs

from conftest import ASSETS


def test_save_load_roundtrip(tmp_path):
    rng = np.random.RandomState(7)
    d = rng.rand(8, 8)
    d[d < 0.5] = 0.0
    a = Sprs.new_from_vec(d)
    path = str(tmp_path / "m.sprs")
    a.save(path)
    b = Sprs.new_from_file(path)
    assert b.nzmax == a.nzmax and b.m == a.m and b.n == a.n
    assert list(b.p) == list(a.p)
    assert list(b.i) == list(a.i)
    assert np.allclose(b.x, a.x)


def test_save_load_empty(tmp_path):
    a = Sprs.new()
    path = str(tmp_path / "empty.sprs")
    a.save(path)
    b = Sprs.new_from_file(path)
    assert b.nzmax == 0 and b.m == 0 and b.n == 0


def test_load_reference_assets_verbatim():
    """Every reference asset must parse and be self-consistent."""
    for f in sorted(os.listdir(ASSETS)):
        a = Sprs.new_from_file(os.path.join(ASSETS, f))
        assert a.n + 1 == len(a.p)
        assert int(a.p[a.n]) == len(a.i) == len(a.x)
        assert a.i.max() < a.m
        assert (np.diff(a.p) >= 0).all()


def test_roundtrip_reference_asset(tmp_path):
    src = os.path.join(ASSETS, "cholsol_1.sprs")
    a = Sprs.new_from_file(src)
    path = str(tmp_path / "roundtrip.sprs")
    a.save(path)
    b = Sprs.new_from_file(path)
    assert list(a.p) == list(b.p) and list(a.i) == list(b.i)
    assert np.array_equal(a.x, b.x)
