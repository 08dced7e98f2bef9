"""Pallas general-pattern SpMM: R = A @ X for a dense RHS block X[n, B].

The reference's only matrix-vector product is single-RHS gaxpy
(/root/reference/src/lib.rs:411-421). On TPU the serving shape is a
lane-aligned RHS *batch*, and for arbitrary sparsity the XLA lowering of
`R.at[rows].add(vals * X[cols])` costs ~10 ns per index (measured on this
chip) — address-bound, pattern-independent. This kernel instead streams the
entry list HBM->SMEM in aligned chunks (the machinery proven in
ops/sptrsv_pallas.py) and processes each entry as one dynamic [1, B] VMEM
row FMA:

    acc[row, :] += v * X[col, :]

Every memory access moves a full lane row, so the per-entry loop overhead
amortizes over B lanes (measured ~0.2 ns/element at B=128 in the SpTRSV
sweep kernel — ~50x the XLA scatter path). No level scheduling is needed
(unlike SpTRSV there are no dependencies); entries stream in CSC order.

VMEM budget: X[n_pad, B] + acc[m_pad, B] must fit (see
`spmm_pallas_available`), which covers every reference-scale asset
(8000^2 at B=128 f32 = 8.2 MB). Larger problems use the XLA fallback in
`ops.gaxpy_multi`.
"""

from __future__ import annotations

import functools

import numpy as np

from ..data import Sprs
from .plan import col_ids

__all__ = ["spmm_pallas", "spmm_pallas_available", "spmm_plan", "spmm_fn"]

_CH = 1024  # entries DMA'd per SMEM chunk (Mosaic tiles 1-D HBM at 1024)


def spmm_pallas_available(m: int, n: int, B: int, dtype) -> bool:
    """VMEM budget check: X + acc resident with headroom."""
    itm = np.dtype(dtype).itemsize
    need = (n + 8) * B * itm + (m + 8) * B * itm
    return np.dtype(dtype) == np.float32 and need < 9 * 2**20


def _chpad(a, dtype=np.int32):
    a = np.asarray(a, dtype)
    total = -(-max(a.size, 1) // _CH) * _CH
    out = np.zeros(total, dtype)
    out[: a.size] = a
    return out


def spmm_plan(a: Sprs):
    """Static entry streams for the kernel (cached on the Sprs pattern)."""
    nz = a.nnz()
    rows = _chpad(a.i[:nz])
    cols = _chpad(col_ids(a.p, a.n))
    # padding entries: v=0 at row 0 / col 0 — harmless FMA no-ops
    return dict(m=a.m, n=a.n, nnz=nz, rows=rows, cols=cols)


@functools.lru_cache(maxsize=64)
def _spmm_call(nchunks: int, nnz: int, m_pad: int, n_pad: int, B: int,
               interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(vals_h, rows_h, cols_h,  # HBM entry streams
               x_in,  # VMEM [n_pad, B]
               acc,  # VMEM [m_pad, B] (output)
               v_s, r_s, c_s,  # SMEM chunk windows [_CH]
               sem):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        base = c * _CH

        def dma(src, dst):
            cp = pltpu.make_async_copy(src.at[pl.ds(base, _CH)], dst, sem)
            cp.start()
            cp.wait()

        dma(vals_h, v_s)
        dma(rows_h, r_s)
        dma(cols_h, c_s)
        hi = jnp.minimum(jnp.int32(nnz) - base, jnp.int32(_CH))

        def body(e, _):
            v = v_s[e]
            r = r_s[e]
            cl = c_s[e]
            acc[pl.ds(r, 1), :] = (acc[pl.ds(r, 1), :]
                                   + v * x_in[pl.ds(cl, 1), :])
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), hi, body, jnp.int32(0))

    f32 = jnp.float32
    call = pl.pallas_call(
        kernel,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # vals
            pl.BlockSpec(memory_space=pl.ANY),  # rows
            pl.BlockSpec(memory_space=pl.ANY),  # cols
            pl.BlockSpec(memory_space=pltpu.VMEM),  # X
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, B), f32),
        scratch_shapes=[
            pltpu.SMEM((_CH,), f32),
            pltpu.SMEM((_CH,), jnp.int32),
            pltpu.SMEM((_CH,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )
    return jax.jit(call)


def spmm_fn(plan):
    """Return jitted `f(vals_dev, X[n, B]) -> R[m, B]` for the pattern.

    vals_dev: f32 entry values in CSC order, `_CH`-padded
    (`jnp.asarray(ops.spmm_pallas._chpad(a.x[:nnz], np.float32))`), kept
    device-resident across calls.
    """
    import jax
    import jax.numpy as jnp

    m, n, nnz = plan["m"], plan["n"], plan["nnz"]
    rows_d = jnp.asarray(plan["rows"])
    cols_d = jnp.asarray(plan["cols"])
    m_pad = -(-(m + 8) // 8) * 8
    n_pad = -(-(n + 8) // 8) * 8
    nchunks = plan["rows"].size // _CH
    interpret = jax.default_backend() != "tpu"

    def f(vals, X):
        B = X.shape[1]
        call = _spmm_call(nchunks, nnz, m_pad, n_pad, B, interpret)
        Xp = jnp.zeros((n_pad, B), jnp.float32).at[:n].set(
            X.astype(jnp.float32))
        with jax.enable_x64(False):
            out = call(vals, rows_d, cols_d, Xp)
        return out[:m]

    return f


def spmm_plan_cached(a: Sprs):
    """Pattern-keyed plan cache (repeated SpMM on one pattern skips the
    stream build); shares ops.plan's LRU."""
    from .plan import _cached_plan

    return _cached_plan("spmm", spmm_plan, a)


def spmm_pallas(a: Sprs, X):
    """R = A @ X through the Pallas kernel (f32; plan cached per pattern —
    use `spmm_plan`/`spmm_fn` directly to keep values device-resident)."""
    import jax.numpy as jnp

    f = spmm_fn(spmm_plan_cached(a))
    vals = jnp.asarray(_chpad(a.x[: a.nnz()], np.float32))
    return f(vals, jnp.asarray(np.asarray(X), jnp.float32))
