"""Scaling-efficiency harness: SPMD SpMV nnz/s at 1..D shards.

BASELINE.md targets ">= 80% nnz/s scaling efficiency at 1 chip / 1 host /
N hosts". Real multi-chip hardware isn't available in this environment
(one tunneled chip), so this harness runs the honest SPMD program —
shard_map over a ("data","model") mesh with psum combines — on the
virtual CPU device mesh to validate the scaling *structure*; on a pod
slice the same code paths measure real ICI scaling.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py
Prints one JSON line per mesh size.
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

    g = 512
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
        ep = par.partition_entries(a, d)
        # hoist ONE jitted shard_map out of the loop: rebuilding it per
        # iteration times tracing/dispatch, not the SPMD kernel
        fn = par.make_gaxpy(ep, mesh)
        args = (jnp.asarray(ep.vals), jnp.asarray(ep.rows),
                jnp.asarray(ep.cols), jnp.asarray(x, ep.vals.dtype),
                jnp.asarray(y, ep.vals.dtype))
        r = np.asarray(fn(*args))  # warm/compile
        want = np.zeros(n)
        np.add.at(want, Ai, Ax * x[np.repeat(np.arange(n), np.diff(Ap))])
        assert np.allclose(r, want, atol=1e-8), "dist SpMV mismatch"
        iters = 20
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


if __name__ == "__main__":
    main()
