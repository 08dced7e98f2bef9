"""Scaling harness: halo-sharded SPMD SpMV at 1..D shards.

BASELINE.md targets ">= 80% nnz/s scaling efficiency at 1 chip / 1 host /
N hosts". Real multi-chip hardware isn't available in this environment
(one tunneled chip), so this harness runs the honest SPMD program — the
halo-exchange design of parallel/halo.py (x SHARDED, per-device memory
n/D, nearest-neighbor ppermute boundary exchange) — on the virtual CPU
device mesh. What the virtual mesh can validate: correctness, sharded
memory, and the communication structure (reported as comm_reduction_x =
full-vector-psum bytes / halo bytes). What it CANNOT validate: wall-clock
efficiency — all virtual devices share one host's cores, so the d=1
baseline already uses the whole machine and measured "efficiency" is a
hard lower bound. On a pod slice the same jitted program measures real
ICI scaling.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py
Prints one JSON line per mesh size + a structure summary line.
"""

import json
import os
import time

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from bench import laplacian_5pt
    from rsparse_tpu.data import Sprs
    from rsparse_tpu import parallel as par

    g = 2048
    n, Ap, Ai, Ax = laplacian_5pt(g)
    a = Sprs(len(Ax), n, n, Ap, Ai, Ax)
    nnz = a.nnz()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    y = np.zeros(n)

    results = {}
    nd = len(jax.devices())
    for d in (1, 2, 4, nd):
        if d > nd:
            continue
        mesh = par.make_mesh(d, data=1)
        # halo design: x SHARDED (per-device memory n/d), boundary-only
        # ppermute exchange — the SURVEY §2.5 layout
        from rsparse_tpu.parallel.halo import partition_rows, make_gaxpy_halo

        rp = partition_rows(a, d)
        assert rp is not None and rp.nb == -(-n // d), "x must be sharded"
        fn = make_gaxpy_halo(rp, mesh)
        xs = np.zeros(d * rp.nb)
        xs[:n] = x
        ys = np.zeros(d * rp.nb)
        args = (jnp.asarray(rp.vals), jnp.asarray(rp.rows),
                jnp.asarray(rp.cols), jnp.asarray(xs.reshape(d, rp.nb)),
                jnp.asarray(ys.reshape(d, rp.nb)))
        r = np.asarray(fn(*args)).reshape(-1)[:n]  # warm/compile
        want = np.zeros(n)
        np.add.at(want, Ai, Ax * x[np.repeat(np.arange(n), np.diff(Ap))])
        assert np.allclose(r, want, atol=1e-8), "dist SpMV mismatch"
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        float(jnp.sum(r))  # readback barrier
        dt = (time.perf_counter() - t0) / iters
        results[d] = nnz / dt
    base = results.get(1)
    for d, v in results.items():
        eff = v / (base * d) if base else None
        print(json.dumps({
            "metric": f"dist_spmv_nnz_per_s@{d}",
            "value": round(v, 1),
            "unit": "nnz/s",
            "vs_baseline": round(eff, 3) if eff else None,
        }))
    # structural summary at d=8: halo traffic vs replicate+psum traffic and
    # the per-device memory fraction (the two properties a virtual mesh CAN
    # certify; see module docstring for why wall-clock efficiency cannot)
    from rsparse_tpu.parallel.halo import partition_rows

    rp = partition_rows(a, 8)
    halo_bytes = 2 * rp.hops * rp.nb * 8
    psum_bytes = 2 * n * 8  # ring allreduce moves ~2n per device
    print(json.dumps({
        "metric": "halo_structure@8",
        "value": round(psum_bytes / halo_bytes, 2),
        "unit": "comm_reduction_x",
        "vs_baseline": round(rp.nb / n, 4),
        "note": "vs_baseline = per-device x memory fraction (n/D ideal)",
    }))


if __name__ == "__main__":
    main()
