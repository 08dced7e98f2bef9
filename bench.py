"""Benchmark: SpMV (gaxpy) throughput on TPU vs the reference CPU algorithm.

Headline metric (BASELINE.md north-star): nnz/s of the device SpMV on a
5-point Laplacian of a 1024x1024 grid (n=1,048,576, nnz≈5.2M), using the
framework's DIA-format Pallas kernel (rsparse_tpu/ops/spmv.py). The baseline
denominator is the reference's exact sequential column-major gaxpy loop
(src/lib.rs:411-421) re-implemented in C++ -O3 (native rt_gaxpy) measured on
this machine — the reference itself publishes no numbers (BASELINE.md).

Timing notes:
  - The axon TPU tunnel does NOT block in `block_until_ready`; every timed
    region ends with a VALUE READBACK (float(jnp.sum(...))) as the barrier.
  - The SpMV is timed as a dependent chain (power iteration inside one jitted
    fori_loop) so per-iteration cost is sustained, not pipelined dispatch.
  - Device values are f32 (the reference's Numeric trait also covers f32,
    src/data.rs:137-171; f64 is VPU-emulated on TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def laplacian_5pt(g: int):
    """5-point Laplacian on a g x g grid, CSC, symmetric positive definite."""
    n = g * g
    idx = np.arange(n, dtype=np.int64)
    gx, gy = idx // g, idx % g
    rows = [idx]
    cols = [idx]
    vals = [np.full(n, 4.0)]
    for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nx, ny = gx + dx, gy + dy
        ok = (nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
        rows.append((nx * g + ny)[ok])
        cols.append(idx[ok])
        vals.append(np.full(int(ok.sum()), -1.0))
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    v = np.concatenate(vals)
    order = np.lexsort((r, c))
    r, c, v = r[order], c[order], v[order]
    p = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(c, minlength=n), out=p[1:])
    return n, p, r, v


def main():
    import jax
    import jax.numpy as jnp

    from rsparse_tpu.data import Sprs
    from rsparse_tpu.ops import spmv as spmv_mod
    from rsparse_tpu.symbolic import native

    # The package enables x64 for reference-parity f64 solves; the f32 DIA
    # bench path doesn't need it, and Mosaic's index plumbing requires i32.
    jax.config.update("jax_enable_x64", False)

    g = 1024
    n, Ap, Ai, Ax = laplacian_5pt(g)
    nnz = len(Ax)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    y = np.zeros(n)

    # --- CPU baseline: the reference's sequential gaxpy loop, C++ -O3 ------
    # best-of-5 to damp host load noise in the denominator
    best_cpu = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        r_cpu = native.gaxpy_host(n, n, Ap, Ai, Ax, x, y)
        best_cpu = min(best_cpu, time.perf_counter() - t0)
    cpu_nnz_s = nnz / best_cpu

    # --- device DIA kernel --------------------------------------------------
    a = Sprs(nnz, n, n, Ap, Ai, Ax)
    plan = spmv_mod.dia_plan(a)
    f = spmv_mod.spmv_fn(plan)
    dia = jnp.asarray(plan.dia)
    dx = jnp.asarray(x, dia.dtype)

    iters = 50

    @jax.jit
    def chain(dv, xx):
        def body(_, cur):
            r = f(dv, cur)
            return r / jnp.max(jnp.abs(r))

        return jax.lax.fori_loop(0, iters, body, xx)

    # correctness guard (readback doubles as device sync)
    r_dev = np.asarray(f(dia, dx), np.float64)
    err = float(np.max(np.abs(r_dev - r_cpu)))
    assert err < 1e-3 * max(1.0, float(np.max(np.abs(r_cpu)))), f"SpMV mismatch {err}"

    float(jnp.sum(chain(dia, dx)))  # compile + warm (full readback barrier)
    t0 = time.perf_counter()
    checksum = float(jnp.sum(chain(dia, dx)))  # readback = real barrier
    dev_t = (time.perf_counter() - t0) / iters
    dev_nnz_s = nnz / dev_t
    assert np.isfinite(checksum)

    print(json.dumps({
        "metric": "spmv_nnz_per_s",
        "value": round(dev_nnz_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(dev_nnz_s / cpu_nnz_s, 3),
    }))


if __name__ == "__main__":
    main()
