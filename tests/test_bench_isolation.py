"""bench.py fault-isolation contract (VERDICT r2 Weak #3 / Next #2).

BENCH_r02 was voided because the whole metric set was printed once at the
very end: one crash after minutes of TPU benching erased every number.
These tests pin the round-3 harness properties with stubbed bench bodies:

  - one JSON snapshot line per completed section (driver keeps the tail),
  - an injected failure in one section costs exactly that metric,
  - the final line carries the error marker + all surviving metrics,
  - losing the lusol headline falls back to the next headline metric.
"""

import json

import pytest

import bench


@pytest.fixture(autouse=True)
def _restore_x64():
    """main() flips x64 off for its kernel sections; the rest of the
    suite relies on it being on."""
    import jax

    yield
    jax.config.update("jax_enable_x64", True)


def _stub_all(monkeypatch, fail=()):
    """Replace every bench_* body with an instant canned result (or a
    raiser) so main() exercises only the harness."""

    def make(name, ret):
        if name in fail:
            def boom(*a, **k):
                raise RuntimeError(f"injected {name} failure")
            return boom
        return lambda *a, **k: ret

    monkeypatch.setattr(bench, "_ensure_tpu", lambda jax: None)
    monkeypatch.setattr(bench, "bench_lusol", make("lusol", (0.5, 1.0)))
    monkeypatch.setattr(bench, "bench_cholsol",
                        make("cholsol", (0.2, 0.3, 0.4)))
    monkeypatch.setattr(bench, "bench_lusol_vals",
                        make("lusol_vals", (0.1, 1.0, 8)))
    monkeypatch.setattr(bench, "bench_qrsol_vals",
                        make("qrsol_vals", (0.1, 1.0, 8)))
    monkeypatch.setattr(bench, "bench_dist_halo",
                        make("dist_halo", (0.01, 1000)))
    monkeypatch.setattr(bench, "bench_qr_serve",
                        make("qr_serve", (0.1, 1.0)))
    monkeypatch.setattr(bench, "bench_serve", make("serve", (0.1, 1.0)))
    monkeypatch.setattr(bench, "bench_serve_lu",
                        make("serve_lu", (0.1, 1.0)))
    monkeypatch.setattr(bench, "bench_cholsol_vals",
                        make("cholsol_vals", (0.1, 1.0, 16)))
    monkeypatch.setattr(bench, "bench_qrsol",
                        make("qrsol", (0.1, 0.2, 0.3, 0.6)))
    monkeypatch.setattr(bench, "bench_spgemm",
                        make("spgemm", (1e9, 1e8, 5e8)))
    monkeypatch.setattr(bench, "bench_spmv_dia",
                        make("spmv_dia", (1e9, 1e8)))
    monkeypatch.setattr(bench, "bench_spmv_general",
                        make("spmv_general", (1e9, 1e8)))
    monkeypatch.setattr(bench, "bench_spgemm_general",
                        make("spgemm_general", (1e9, 1e8)))
    monkeypatch.setattr(bench, "bench_spmm", make("spmm", (1e9, 1e8)))
    monkeypatch.setattr(bench, "bench_opchain",
                        make("opchain", (0.01, 0.02)))
    monkeypatch.setattr(bench, "bench_sptrsv",
                        make("sptrsv", (1e9, 2.0, 3.0)))


def _json_lines(out):
    return [json.loads(ln) for ln in out.splitlines()
            if ln.startswith("{")]


def test_all_sections_emit_incremental_snapshots(monkeypatch, capsys):
    _stub_all(monkeypatch)
    bench.main()
    lines = _json_lines(capsys.readouterr().out)
    assert len(lines) >= 12  # one snapshot per section + the final line
    last = lines[-1]
    assert last["metric"] == "lusol_wall_s"
    assert last["value"] == 0.5 and last["vs_baseline"] == 2.0
    for key in ("cholsol_wall_s", "qrsol_wall_s", "spgemm_nnz_per_s",
                "spmv_dia_nnz_per_s", "spmv_general_nnz_per_s",
                "spgemm_general_nnz_per_s", "spmm_pallas_nnzrow_per_s",
                "sptrsv_pallas_nnzrow_per_s", "cholsol_serve_wall_s",
                "lusol_serve_wall_s", "cholsol_vals_wall_s"):
        assert key in last["extra"], key
    assert "failed_sections" not in last["extra"]


def test_injected_failure_costs_one_metric(monkeypatch, capsys):
    _stub_all(monkeypatch, fail={"cholsol_vals"})
    bench.main()  # must not raise
    lines = _json_lines(capsys.readouterr().out)
    last = lines[-1]
    assert last["metric"] == "lusol_wall_s" and last["value"] == 0.5
    assert "cholsol_vals_wall_s" not in last["extra"]
    assert "injected" in last["extra"]["cholsol_vals_error"]
    assert last["extra"]["failed_sections"] == "cholsol_vals"
    # every other metric survived
    for key in ("cholsol_wall_s", "qrsol_wall_s", "spgemm_nnz_per_s",
                "sptrsv_pallas_nnzrow_per_s"):
        assert key in last["extra"], key


def test_headline_falls_back_when_lusol_dies(monkeypatch, capsys):
    _stub_all(monkeypatch, fail={"lusol"})
    bench.main()
    lines = _json_lines(capsys.readouterr().out)
    last = lines[-1]
    assert last["metric"] == "cholsol_wall_s"
    assert last["value"] == 0.2 and last["vs_baseline"] == 2.0
    assert "lusol_error" in last["extra"]


def test_total_failure_exits_nonzero(monkeypatch, capsys):
    _stub_all(monkeypatch, fail={"lusol", "cholsol", "qrsol"})
    with pytest.raises(SystemExit):
        bench.main()
    lines = _json_lines(capsys.readouterr().out)
    assert lines[-1]["metric"] == "bench_failed"


def test_deadline_skips_remaining_sections(monkeypatch, capsys):
    """Round-4 time bounding: once the budget is nearly spent, later
    sections are SKIPPED (recorded in extra.skipped_sections) instead of
    risking the driver's hard kill — and the budget anchors at main()
    entry, not module import (the bug that skipped qrsol in CI)."""
    import time as _t

    _stub_all(monkeypatch)

    def slow_serve(*a, **k):
        _t.sleep(1.5)
        return (0.1, 1.0)

    monkeypatch.setattr(bench, "bench_serve", slow_serve)
    # lusol/cholsol/serve start with >30s left; after serve burns 1.5s the
    # remaining budget drops below the 30s floor and everything later skips
    monkeypatch.setattr(bench, "DEADLINE_S", 31.0)
    bench.main()  # must not raise: the headline landed before the cut
    last = _json_lines(capsys.readouterr().out)[-1]
    assert last["metric"] == "lusol_wall_s" and last["value"] == 0.5
    skipped = last["extra"]["skipped_sections"].split(",")
    assert "serve_lu" in skipped and "qrsol" in skipped
    assert "spgemm" in skipped
    assert "cholsol_wall_s" in last["extra"]  # pre-cut sections survived
    assert "lusol_serve_wall_s" not in last["extra"]
