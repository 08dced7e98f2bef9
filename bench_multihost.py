"""Multi-process SPMD validation: N JAX processes, one global mesh.

The reference has no multi-node story (SURVEY.md §2.5); BASELINE.md's
scaling target names "N>=2 hosts". Real multi-host TPU hardware is not
reachable from this environment, so this driver runs the SURVEY §4
fallback: **N OS processes on one machine, each owning a slice of virtual
CPU devices, joined by `jax.distributed.initialize`** — the exact runtime
shape of a TPU pod slice (one process per host, Gloo/gRPC standing in for
DCN). Cross-process collectives (the `ppermute` halo exchanges and `psum`
reductions) run over the distributed backend, NOT shared memory, so the
programs validated here are the ones a pod slice would run.

Workloads (all over the global mesh, x sharded n/D across processes):
  - halo SpMV (parallel.halo.dist_gaxpy_halo) vs the host oracle
  - halo level-fused SpTRSV (dist_tri_solve_halo, L and U sweeps)
  - dist_lusol end-to-end (factor on the primary, sharded sweeps)

Usage:
  python bench_multihost.py              # parent: spawns 2 processes x 4 devices
  python bench_multihost.py --procs 4    # 4 processes x 2 devices
Process 0 prints one JSON line with correctness errors and wall times.
"""

import argparse
import json
import os
import subprocess
import sys
import time

PORT = 19741


def child(pid: int, nproc: int, ldev: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ldev}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", None)
    jax.distributed.initialize(f"localhost:{PORT}", num_processes=nproc,
                               process_id=pid)
    import numpy as np

    import rsparse_tpu as rs
    from rsparse_tpu import parallel as par
    from rsparse_tpu.parallel import halo as H
    from bench import laplacian_5pt

    D = len(jax.devices())
    assert D == nproc * ldev, (D, nproc, ldev)
    mesh = par.make_mesh(D, data=1)
    res = {"processes": nproc, "local_devices": ldev, "global_devices": D}

    # ---- halo SpMV ------------------------------------------------------
    g = 64
    n, Ap, Ai, Ax = laplacian_5pt(g)
    lap = rs.Sprs(len(Ax), n, n, Ap, Ai, Ax)
    rp = H.partition_rows(lap, D)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    t0 = time.perf_counter()
    r = H.dist_gaxpy_halo(rp, x, np.zeros(n), mesh)
    t_spmv = time.perf_counter() - t0
    want = np.zeros(n)
    cols = np.repeat(np.arange(n), np.diff(Ap))
    np.add.at(want, Ai, Ax * x[cols])
    res["spmv_err"] = float(np.abs(r - want).max())
    res["spmv_wall_s"] = round(t_spmv, 3)

    # ---- halo SpTRSV + dist_lusol --------------------------------------
    a = rs.Sprs.new_from_file(
        "/root/reference/tests/assets/lusol_3.sprs")
    b = np.linspace(0.5, 1.5, a.n)
    t0 = time.perf_counter()
    xs = H.dist_lusol(a, list(b), mesh, 1, 1e-12)
    t_lusol = time.perf_counter() - t0
    resid = np.asarray(rs.gaxpy(a, list(xs), [0.0] * a.n)) - b
    res["dist_lusol_resid"] = float(np.abs(resid).max())
    res["dist_lusol_wall_s"] = round(t_lusol, 3)

    ok = res["spmv_err"] < 1e-8 and res["dist_lusol_resid"] < 1e-8
    res["ok"] = bool(ok)
    if pid == 0:
        print(json.dumps(res), flush=True)
    if not ok:
        sys.exit(1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--child", type=int, default=None)
    args = ap.parse_args()
    if args.child is not None:
        child(args.child, args.procs, args.devices_per_proc)
        return
    procs = []
    for pid in range(args.procs):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(pid), "--procs", str(args.procs),
             "--devices-per-proc", str(args.devices_per_proc)],
            env={**os.environ, "PYTHONPATH":
                 os.path.dirname(os.path.abspath(__file__))}))
    rc = 0
    for p in procs:
        rc |= p.wait(timeout=900)
    sys.exit(rc)


if __name__ == "__main__":
    main()
