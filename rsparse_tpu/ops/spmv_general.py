"""General-sparsity SpMV: the block-lane kernel (arbitrary patterns).

The DIA kernel (ops/spmv.py) is the roofline path for banded matrices; this
module is the fast path for *arbitrary* sparsity, where the naive lowering
(`segment_sum(vals * x[cols], rows)`) collapses to scalar gathers/scatters —
measured ~0.07 Gnnz/s on TPU, slower than the reference's sequential CPU
loop (src/lib.rs:411-421, ~0.45 Gnnz/s in C++ -O3).

TPU-native shape: make every memory access 128-lane granular.

    x2 = x.reshape(nbx, 128)            # x as 512-byte rows
    xr = x2[cols >> 7]                  # [E,128] ROW gather (512B DMAs)
    xv = sum(xr * (lane == cols&127))   # lane select (VPU)
    c  = (vals*xv)[:,None] * (lane == rows&127)   # [E,128] expand
    r2 = segment_sum(c, rows >> 7)      # row-granular scatter, rb-sorted
    r  = r2.reshape(-1)[:m]

All index tensors are static per sparsity pattern (plan below); entries are
pre-sorted by row-block so the segment-sum reduces contiguous runs. The
amplification is 128x in compute/VMEM traffic but every HBM transaction is a
full vector — two orders of magnitude over the scalar path, and above the
C++ baseline. Entries stream in chunks through a `lax.scan` so peak memory
stays at chunk size [C,128] regardless of nnz.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

from ..data import Sprs
from .plan import col_ids

__all__ = ["BlockLanePlan", "block_lane_plan", "spmv_general", "spmv_general_fn"]

_LANE = 128


@dataclasses.dataclass(frozen=True)
class BlockLanePlan:
    """Static per-pattern plan for the block-lane SpMV."""

    m: int
    n: int
    nnz: int
    nbx: int  # x row-blocks (ceil(n/128))
    nbr: int  # r row-blocks (ceil(m/128))
    chunk: int  # entries per scan step
    nchunks: int
    cb: np.ndarray  # [E'] column block of entry (E' = chunk*nchunks, padded)
    cl: np.ndarray  # [E'] column lane
    rb: np.ndarray  # [E'] row block (sorted ascending; pad -> nbr)
    rl: np.ndarray  # [E'] row lane
    vals: np.ndarray  # [E'] values (pad 0)
    perm: np.ndarray  # [nnz] original entry -> sorted position (value refresh)


def block_lane_plan(a: Sprs, dtype=np.float32, chunk: int = 1 << 16) -> BlockLanePlan:
    nz = a.nnz()
    rows = a.i[:nz].astype(np.int64)
    cols = col_ids(a.p, a.n)
    order = np.argsort(rows >> 7, kind="stable")
    rows_s = rows[order]
    cols_s = cols[order]
    vals_s = a.x[:nz][order].astype(dtype)
    nbx = max(1, -(-a.n // _LANE))
    nbr = max(1, -(-a.m // _LANE))
    chunk = min(chunk, max(_LANE, 1 << (int(max(nz, 1) - 1).bit_length())))
    nchunks = max(1, -(-nz // chunk))
    E = chunk * nchunks
    pad = E - nz
    cb = np.concatenate([cols_s >> 7, np.zeros(pad, np.int64)]).astype(np.int32)
    cl = np.concatenate([cols_s & 127, np.zeros(pad, np.int64)]).astype(np.int32)
    rb = np.concatenate([rows_s >> 7, np.full(pad, nbr, np.int64)]).astype(np.int32)
    rl = np.concatenate([rows_s & 127, np.zeros(pad, np.int64)]).astype(np.int32)
    v = np.concatenate([vals_s, np.zeros(pad, dtype)])
    return BlockLanePlan(
        m=a.m, n=a.n, nnz=nz, nbx=nbx, nbr=nbr, chunk=chunk,
        nchunks=nchunks, cb=cb, cl=cl, rb=rb, rl=rl, vals=v,
        perm=order.astype(np.int64),
    )


@functools.lru_cache(maxsize=32)
def _block_lane_kernel(nbx: int, nbr: int, chunk: int, nchunks: int,
                       m: int, n: int, dtype_name: str):
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(dtype_name)

    @jax.jit
    def run(vals, cb, cl, rb, rl, x):
        xp = jnp.zeros((nbx * _LANE,), dt).at[: x.shape[0]].set(x.astype(dt))
        x2 = xp.reshape(nbx, _LANE)
        lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, _LANE), 1)
        C = chunk

        def step(acc, args):
            v, cbk, clk, rbk, rlk = args
            xr = x2[cbk]                       # [C,128] row gather
            xv = jnp.sum(jnp.where(lane == clk[:, None], xr, 0), axis=1)
            contrib = (v * xv)[:, None] * (lane == rlk[:, None]).astype(dt)
            acc = acc.at[rbk].add(contrib, indices_are_sorted=True)
            return acc, None

        acc0 = jnp.zeros((nbr + 1, _LANE), dt)  # +1 garbage block for pad
        args = tuple(t.reshape(nchunks, C) for t in (vals, cb, cl, rb, rl))
        acc, _ = jax.lax.scan(step, acc0, args)
        return acc[:nbr].reshape(-1)[:m]

    return run


def spmv_general_fn(plan: BlockLanePlan):
    """Return jit-compatible `f(vals_dev, x) -> r` for the plan."""
    kern = _block_lane_kernel(plan.nbx, plan.nbr, plan.chunk, plan.nchunks,
                              plan.m, plan.n, np.dtype(plan.vals.dtype).name)
    import jax.numpy as jnp

    idx = [jnp.asarray(t) for t in (plan.cb, plan.cl, plan.rb, plan.rl)]

    def f(vals, x):
        return kern(vals, *idx, x)

    return f


def spmv_general(a: Sprs, x, plan: Optional[BlockLanePlan] = None):
    """r = A @ x through the block-lane path (plan built on the fly)."""
    import jax.numpy as jnp

    p = plan or block_lane_plan(a)
    f = spmv_general_fn(p)
    return f(jnp.asarray(p.vals), jnp.asarray(np.asarray(x), p.vals.dtype))
