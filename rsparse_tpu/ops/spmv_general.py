"""General-sparsity SpMV: scatter/gather as implicit one-hot MXU matmuls.

The DIA kernel (ops/spmv.py) is the roofline path for banded matrices; this
module is the fast path for *arbitrary* sparsity, where the naive lowering
(`segment_sum(vals * x[cols], rows)`) collapses to scalar gathers/scatters.
Measured on this chip: XLA gather/scatter costs ~10 ns per index and
`lax.sort` ~2.8 ns per element regardless of granularity, so every
permutation-based general SpMV formulation loses to the reference's C++
loop (src/lib.rs:411-421: 0.20-0.27 Gnnz/s on random patterns here).

The TPU-native answer is to route data through the MXU instead of through
addresses. Split row/column spaces into 16384-wide subtables viewed as
[128(hi), 128(lo)] blocks, group entries by (row-subtable, col-subtable)
pair (static per pattern), and per chunk of entries:

    gather :  xr = onehot(ch) @ X_block          # [C,128]@... on the MXU
              xv = sum(xr * onehot(cl), -1)      # lane select, VPU
    scatter:  R_block += onehot(rh)^T @ ((v*xv)[:,None] * onehot(rl))

Both "address" operations become 128x128 systolic matmuls with one-hot
operands generated on the fly from iota compares — zero per-element index
ops, ~33k flops per entry, which at MXU rate is ~1 ns/entry: several times
the C++ baseline on patterns with no structure at all. Entries are padded
per block-pair to a fixed chunk size and streamed through a `lax.scan`
(G block-pairs per step) so peak memory stays O(chunk).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

from ..data import Sprs
from .plan import col_ids

__all__ = ["MxuSpmvPlan", "mxu_spmv_plan", "spmv_general", "spmv_general_fn"]

_LANE = 128
_SUB = _LANE * _LANE  # 16384-entry subtables, viewed [128, 128]


@dataclasses.dataclass(frozen=True)
class MxuSpmvPlan:
    """Static per-pattern plan for the one-hot-MXU SpMV."""

    m: int
    n: int
    nnz: int
    ncb: int  # col subtables
    nrb: int  # row subtables
    ch_size: int  # entries per chunk
    g: int  # chunks per scan step
    nsteps: int
    # [nsteps, g] subtable ids per chunk
    cbid: np.ndarray
    rbid: np.ndarray
    # [nsteps, g, ch_size] int32 hi/lo indices (pad: lane 0 with val 0)
    ch: np.ndarray
    cl: np.ndarray
    rh: np.ndarray
    rl: np.ndarray
    vals: np.ndarray  # [nsteps, g, ch_size]
    perm: np.ndarray  # original entry -> (step, chunk, slot) flat position


def mxu_spmv_plan(a: Sprs, dtype=np.float32, ch_size: int = 512,
                  g: int = 128) -> MxuSpmvPlan:
    """g (chunks per scan step) defaults high: the scan's per-step
    overhead is the dominant cost at bench scale (5.2M-nnz random,
    measured: g=16 0.526 / g=32 0.603 / g=128 0.632 Gnnz/s), and it is
    clamped to the actual chunk count so small problems pad at most one
    step."""
    nz = a.nnz()
    rows = a.i[:nz].astype(np.int64)
    cols = col_ids(a.p, a.n)
    vals = a.x[:nz].astype(dtype)
    ncb = max(1, -(-a.n // _SUB))
    nrb = max(1, -(-a.m // _SUB))
    bp = (rows // _SUB) * np.int64(ncb) + (cols // _SUB)
    order = np.argsort(bp, kind="stable")
    bps = bp[order]
    # per-pair chunking: pad each pair's run to a multiple of ch_size
    upair, counts = np.unique(bps, return_counts=True)
    nchunks_per = -(-counts // ch_size)
    total_chunks = int(nchunks_per.sum())
    g = max(1, min(g, total_chunks))
    nsteps = max(1, -(-total_chunks // g))
    Cp = nsteps * g  # padded chunk count
    E = Cp * ch_size
    ch_ = np.zeros(E, np.int32)
    cl_ = np.zeros(E, np.int32)
    rh_ = np.zeros(E, np.int32)
    rl_ = np.zeros(E, np.int32)
    v_ = np.zeros(E, dtype)
    cb_ = np.zeros(Cp, np.int32)
    rb_ = np.zeros(Cp, np.int32)
    perm = np.zeros(nz, np.int64)
    ci = 0  # chunk cursor
    pos = 0  # cursor into sorted entries
    for pi, cnt in zip(upair, counts):
        nck = int(-(-cnt // ch_size))
        sel = order[pos : pos + cnt]
        base = ci * ch_size
        fill = np.arange(cnt)
        dst = base + fill
        r_ = rows[sel]
        c_ = cols[sel]
        ch_[dst] = ((c_ % _SUB) // _LANE).astype(np.int32)
        cl_[dst] = (c_ % _LANE).astype(np.int32)
        rh_[dst] = ((r_ % _SUB) // _LANE).astype(np.int32)
        rl_[dst] = (r_ % _LANE).astype(np.int32)
        v_[dst] = vals[sel]
        perm[sel] = dst
        cb_[ci : ci + nck] = int(pi % ncb)
        rb_[ci : ci + nck] = int(pi // ncb)
        ci += nck
        pos += cnt
    return MxuSpmvPlan(
        m=a.m, n=a.n, nnz=nz, ncb=ncb, nrb=nrb, ch_size=ch_size, g=g,
        nsteps=nsteps,
        cbid=cb_.reshape(nsteps, g),
        rbid=rb_.reshape(nsteps, g),
        ch=ch_.reshape(nsteps, g, ch_size),
        cl=cl_.reshape(nsteps, g, ch_size),
        rh=rh_.reshape(nsteps, g, ch_size),
        rl=rl_.reshape(nsteps, g, ch_size),
        vals=v_.reshape(nsteps, g, ch_size),
        perm=perm,
    )


@functools.lru_cache(maxsize=32)
def _mxu_kernel(ncb: int, nrb: int, ch_size: int, g: int, nsteps: int,
                m: int, n: int, dtype_name: str, precision: str = "highest"):
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(dtype_name)

    # One operand of every matmul is a one-hot matrix (exact at any
    # precision); Precision.HIGHEST makes the value operand exact too, so
    # the "gather/scatter" matmuls are bit-identical to real gathers.
    # (A bf16 hi/lo split of the value operand is algebraically re-fused by
    # XLA into one low-precision matmul — measured — so HIGHEST it is.)
    # precision="high" is the opt-in serving path: 1.83x faster matmuls
    # (measured), values to ~6e-5 relative (bf16_3x class) instead of exact.
    hi = (jax.lax.Precision.HIGHEST if precision == "highest"
          else jax.lax.Precision.HIGH)

    @jax.jit
    def run(vals, cbid, rbid, ch, cl, rh, rl, x):
        xp = jnp.zeros((ncb * _SUB,), dt).at[: x.shape[0]].set(x.astype(dt))
        X3 = xp.reshape(ncb, _LANE, _LANE)
        lane = jax.lax.broadcasted_iota(jnp.int32, (g, ch_size, _LANE), 2)

        def step(acc, args):
            v, cb, rb, chk, clk, rhk, rlk = args
            oh_ch = (lane == chk[..., None]).astype(dt)
            xr = jnp.einsum("gce,geh->gch", oh_ch, X3[cb], precision=hi,
                            preferred_element_type=dt)
            xv = jnp.sum(jnp.where(lane == clk[..., None], xr, 0), axis=-1)
            p = v * xv
            oh_rh = (lane == rhk[..., None]).astype(dt)
            oh_rl = (lane == rlk[..., None]).astype(dt)
            contrib = jnp.einsum("gch,gcl->ghl", oh_rh,
                                 p[..., None] * oh_rl, precision=hi,
                                 preferred_element_type=dt)
            acc = acc.at[rb].add(contrib)
            return acc, None

        acc0 = jnp.zeros((nrb, _LANE, _LANE), dt)
        acc, _ = jax.lax.scan(step, acc0, (vals, cbid, rbid, ch, cl, rh, rl))
        return acc.reshape(-1)[:m]

    return run


def spmv_general_fn(plan: MxuSpmvPlan, precision: str = "highest"):
    """Return jit-compatible `f(vals_dev, x) -> r` for the plan.

    `vals_dev` is `jnp.asarray(plan.vals)` (refresh values without
    replanning by scattering `a.x[plan-order]` through `plan.perm`).
    `precision="high"` trades exactness for ~1.8x matmul speed (see
    _mxu_kernel).
    """
    import jax.numpy as jnp

    kern = _mxu_kernel(plan.ncb, plan.nrb, plan.ch_size, plan.g, plan.nsteps,
                       plan.m, plan.n, np.dtype(plan.vals.dtype).name,
                       precision)
    idx = [jnp.asarray(t) for t in (plan.cbid, plan.rbid, plan.ch, plan.cl,
                                    plan.rh, plan.rl)]

    def f(vals, x):
        return kern(vals, *idx, x)

    return f


def spmv_general(a: Sprs, x, plan: Optional[MxuSpmvPlan] = None):
    """r = A @ x through the one-hot-MXU path (plan built on the fly)."""
    import jax.numpy as jnp

    p = plan or mxu_spmv_plan(a)
    f = spmv_general_fn(p)
    return f(jnp.asarray(p.vals), jnp.asarray(np.asarray(x), p.vals.dtype))
