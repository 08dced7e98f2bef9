"""SPMD multi-chip workflow on a `jax.sharding.Mesh`.

Runs on a virtual 8-device CPU mesh so it works anywhere; on a pod slice
the same code runs over real chips (call `parallel.init_distributed()` per
process first — one process per host). The halo layer shards the vector
n/D per device and exchanges only ring-neighbor boundary segments via
`ppermute` (see parallel/halo.py and SURVEY.md §2.5).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import rsparse_tpu as rs  # noqa: E402
from rsparse_tpu import parallel as par  # noqa: E402

mesh = par.make_mesh(8, data=1)  # 8-way model axis
print("mesh:", mesh)

# A 5-point Laplacian system, solved distributed three ways
from bench import laplacian_5pt  # noqa: E402

n, p, i, x = laplacian_5pt(24)
A = rs.Sprs(len(x), n, n, p, i, x)
rng = np.random.default_rng(0)
b = rng.standard_normal(n)

# SpMV with halo exchange: x sharded n/D, ppermute boundary segments
rp = par.partition_rows(A, 8)
r = par.dist_gaxpy_halo(rp, b, np.zeros(n), mesh)
print("halo SpMV max |r|:", float(np.abs(np.asarray(r)).max()))

# Distributed direct solves (factor once on the primary, sharded sweeps)
x1 = np.asarray(par.dist_cholsol(A, b.copy(), mesh, 0))
x2 = np.asarray(par.dist_lusol(A, b.copy(), mesh, 1))
want = np.asarray(rs.cholsol(A, list(b.copy()), 0))
print("dist_cholsol vs single-chip:", np.abs(x1 - want).max())
print("dist_lusol  vs single-chip:", np.abs(x2 - want).max())

# Distributed SpGEMM: expansion stream sharded over the mesh
C = par.dist_spgemm(A, A, mesh)
print("dist_spgemm nnz(A@A):", C.nnz())

# Batched iterative refinement: RHS batch over `data`, entries over `model`.
# refine_step consumes an unpermuted factor (natural order: L@L' = A), so
# pass order=-1; ordered factors go through dist_cholsol above instead.
mesh2 = par.make_mesh(8, data=2)
s = rs.schol(A, -1)
nm = rs.chol(A, s)
B = rng.standard_normal((4, n))
X = np.zeros_like(B)
X1 = np.asarray(par.refine_step(A, nm.l, X, B, mesh2))
print("refine_step residual:",
      np.abs(np.asarray(A.to_dense_np()) @ X1.T - B.T).max())
