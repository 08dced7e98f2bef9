"""TPU serving workflow: analyze + factor once, stream batched solves.

The reference is single-RHS, host-only; the TPU-first serving shape
amortizes one symbolic analysis and factorization over lane-aligned RHS
batches, with each solve a single fused device program (f32 Pallas SpTRSV
sweeps + on-device f64 iterative refinement — see docs/DESIGN.md).

Run on a TPU host with `python examples/serving.py`; it also runs on CPU
(the Pallas kernels execute through the interpreter when forced).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

import rsparse_tpu as rs
from rsparse_tpu.config import config

# On CPU, force the serving path through the Pallas interpreter so the
# example is runnable anywhere; on TPU this line is unnecessary.
import jax

if jax.default_backend() != "tpu":
    config.serve_mixed = "force"

# An SPD system (reference test asset) and a nonsymmetric one
spd = rs.Sprs.new_from_file("/root/reference/tests/assets/cholsol_2.sprs")
rng = np.random.default_rng(0)

# 1. Build the handle: one analysis + factorization, device-resident consts
handle = rs.cholsol_serve(spd, order=0)

# 2. Stream batches — each call is ONE fused device program. Keep inputs /
#    outputs as device arrays in real pipelines to avoid host transfers.
for step in range(3):
    B = rng.standard_normal((spd.n, 64))
    X = np.asarray(handle(B))
    resid = np.abs(np.asarray(spd.to_dense_np()) @ X - B).max()
    print(f"batch {step}: solved 64 RHS, residual {resid:.2e}")

# 3. The same shape exists for LU and least-squares:
#    rs.lusol_serve(A, order=1, tol=1e-6)   — square nonsymmetric systems
#    rs.qrsol_serve(A, order=0)             — rectangular (CSNE least-squares)
# and as one-shot batched drivers with the same dispatch underneath:
B = rng.standard_normal((spd.n, 32))
X = rs.cholsol_multi(spd, B, 0)
print("cholsol_multi residual:",
      np.abs(np.asarray(spd.to_dense_np()) @ X - B).max())

# 4. Analysis / factor reuse across related solves: pass `sym=` explicitly
s = rs.schol(spd, 0)
x1 = rs.cholsol(spd, list(B[:, 0]), 0, sym=s)
x2 = rs.cholsol(spd, list(B[:, 1]), 0, sym=s)  # reuses schedules + plans
print("sym-reuse solves done")

# 5. Factor checkpointing for serving restarts
from rsparse_tpu.utils.checkpoint import load_factor, save_factor  # noqa: E402

nm = rs.chol(spd, s)
save_factor(nm, "/tmp/spd_factor.npz")
nm2 = load_factor("/tmp/spd_factor.npz")
print("factor checkpoint round-trip ok:",
      np.allclose(np.asarray(nm.l.x), np.asarray(nm2.l.x)))

# 6. Batched-VALUES solves: K systems sharing one sparsity pattern
#    (time-stepping, parameter sweeps) factor+solve in ONE vmapped device
#    program — the K dense front factorizations batch onto the MXU.
K = 8
nz = spd.nnz()
diag = spd.i[:nz] == np.repeat(np.arange(spd.n), np.diff(spd.p))
AxK = np.tile(spd.x[:nz], (K, 1))
AxK[:, diag] *= (1.0 + 0.1 * np.arange(K))[:, None]  # K diagonal shifts
BK = rng.standard_normal((K, spd.n))
XK = rs.cholsol_vals(spd, AxK, BK, 0, sym=s)
worst = 0.0
for k in range(K):
    Ad = np.asarray(spd.to_dense_np())
    Ad[np.arange(spd.n), np.arange(spd.n)] *= 1.0 + 0.1 * k
    worst = max(worst, np.abs(Ad @ XK[k] - BK[k]).max())
print(f"cholsol_vals: {K} same-pattern systems in one program, "
      f"worst residual {worst:.2e}")

# 7. The same axis exists for LU and least-squares:
#    rs.lusol_vals(A, AxK, B, order=1, tol=1e-6) — K square nonsymmetric
#      systems through the vmapped multifrontal pivoting tree
#    rs.qrsol_vals(A, AxK, B, order=2)           — K rectangular systems
#      (least-squares / minimum-norm)
# and distribution shards the instance axis over a mesh:
#    rsparse_tpu.parallel.dist_cholsol_vals(A, AxK, B, mesh)
