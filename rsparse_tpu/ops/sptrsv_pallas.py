"""Pallas level-scheduled SpTRSV: the whole triangular sweep in ONE kernel.

The XLA sweeps (`solve._tri_sweep[_multi]`) batch each dependency level as
masked gather/segment-sum/scatter ops inside a `fori_loop`; every level
processes `emax`-padded windows, so skewed level histograms (a handful of
huge levels + a long tail of tiny ones) pay `nlev * emax` work for
`sum(ecnt)` useful entries. This kernel is the TPU-native alternative for
the batched-RHS serving shape X[n, B]:

  - X stays resident in VMEM for the whole sweep (one kernel launch; the
    XLA path round-trips HBM between level steps).
  - The entry/column schedule streams HBM -> SMEM in fixed chunks with
    dynamic-trip inner loops, so each level costs its ACTUAL entry count,
    not the padded maximum.
  - Every per-entry memory access is a full [1, B] lane row (the RHS batch
    rides the lane dimension), never a scalar gather.

Semantics match the reference triangular solves exactly
(lsolve/ltsolve/usolve/utsolve, /root/reference/src/lib.rs:464-471,
505-512, 1230-1237, 1271-1278) batched over RHS columns; the level
schedule comes from `solve.tri_plan` (same plan the XLA path uses).

Forms (mirroring `_tri_sweep`'s `scatter_form` switch):
  scatter (lsolve/usolve):  x[j] /= d_j   then   x[row_e] -= v_e * x[col_e]
  gather (ltsolve/utsolve): c[slot_e] += v_e * x[row_e]
                            then x[j] = (x[j] - c[slot_j]) / d_j

The gather form keeps a `contrib` scratch whose rows are re-zeroed as they
are consumed, preserving the "all-zero at level entry" invariant without a
per-level wipe.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["sptrsv_pallas_multi", "pallas_sweep_available"]

_CH = 1024  # schedule entries DMA'd per SMEM chunk; Mosaic tiles 1-D HBM
# refs at (1024,), so the kernel DMAs floor-aligned windows and loops only
# over each level's valid intersection.


def pallas_sweep_available(n: int, B: int, dtype) -> bool:
    """VMEM budget check: X (+ contrib) must fit with headroom."""
    bytes_x = (n + 8) * B * np.dtype(dtype).itemsize
    return np.dtype(dtype) == np.float32 and 2 * bytes_x < 9 * 2**20


def _chpad(a):
    """Pad a flat stream so its length is a multiple of _CH plus one spare
    chunk — every floor-aligned _CH-window the kernel DMAs stays in
    bounds."""
    a = np.asarray(a, np.int32)
    total = (-(-max(a.size, 1) // _CH) + 1) * _CH
    out = np.zeros(total, np.int32)
    out[: a.size] = a
    return out


def _streams(plan):
    """Flat schedule streams derived from a TriPlan (cached on it)."""
    cached = plan.__dict__.get("_pallas_streams")
    if cached is not None:
        return cached
    streams = dict(
        epos=_chpad(plan.ent_pos),
        erow=_chpad(plan.ent_row),
        ecol=_chpad(plan.ent_col),
        eslot=_chpad(plan.ent_slot),
        cid=_chpad(plan.col_id),
        cdiag=_chpad(plan.col_diag),
        eoff=np.asarray(plan.ent_off, np.int32),
        coff=np.asarray(plan.col_off, np.int32),
    )
    plan.__dict__["_pallas_streams"] = streams
    return streams


@functools.lru_cache(maxsize=64)
def _sweep_call(nlev: int, n_pad: int, B: int, wmax_pad: int,
                scatter_form: bool, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(eoff, coff,  # SMEM [nlev+1]
               ev_h, ea_h, eb_h,  # HBM entry streams (f32, i32, i32)
               dv_h, ci_h,  # HBM column streams (f32, i32)
               x_in, x_out,  # VMEM [n_pad, B]
               contrib,  # VMEM [wmax_pad, B]
               ev_s, ea_s, eb_s, dv_s, ci_s,  # SMEM chunk windows [_CH]
               sem):
        lev = pl.program_id(0)

        @pl.when(lev == 0)
        def _():
            x_out[:] = x_in[:]
            contrib[:] = jnp.zeros_like(contrib)

        eo = eoff[lev]
        ecnt = eoff[lev + 1] - eo
        co = coff[lev]
        ccnt = coff[lev + 1] - co

        def dma(src, dst, off):
            # Mosaic tiles 1-D HBM refs at (1024,): `off` is always a
            # multiple of _CH (floor-aligned by the callers below).
            cp = pltpu.make_async_copy(src.at[pl.ds(off, _CH)], dst, sem)
            cp.start()
            cp.wait()

        CH = jnp.int32(_CH)
        zero = jnp.int32(0)

        def entry_chunks(_unused=None):
            c0 = eo // CH  # first aligned chunk overlapping the window
            nch = (eo + ecnt + CH - 1) // CH - c0

            def chunk_body(c, _):
                base = (c0 + c) * CH
                dma(ev_h, ev_s, base)
                dma(ea_h, ea_s, base)
                dma(eb_h, eb_s, base)
                lo = jnp.maximum(eo - base, 0)
                hi = jnp.minimum(eo + ecnt - base, CH)

                def entry_body(e, _):
                    v = ev_s[e]
                    a = ea_s[e]
                    bidx = eb_s[e]
                    if scatter_form:
                        # x[row a] -= v * x[col b]
                        src = x_out[pl.ds(bidx, 1), :]
                        x_out[pl.ds(a, 1), :] = (
                            x_out[pl.ds(a, 1), :] - v * src)
                    else:
                        # contrib[slot b] += v * x[row a]
                        src = x_out[pl.ds(a, 1), :]
                        contrib[pl.ds(bidx, 1), :] = (
                            contrib[pl.ds(bidx, 1), :] + v * src)
                    return zero

                jax.lax.fori_loop(lo, hi, entry_body, zero)
                return zero

            jax.lax.fori_loop(zero, nch, chunk_body, zero)

        def col_chunks(_unused=None):
            c0 = co // CH
            nch = (co + ccnt + CH - 1) // CH - c0

            def chunk_body(c, _):
                base = (c0 + c) * CH
                dma(dv_h, dv_s, base)
                dma(ci_h, ci_s, base)
                lo = jnp.maximum(co - base, 0)
                hi = jnp.minimum(co + ccnt - base, CH)

                def col_body(k, _):
                    j = ci_s[k]
                    d = dv_s[k]
                    if scatter_form:
                        x_out[pl.ds(j, 1), :] = x_out[pl.ds(j, 1), :] / d
                    else:
                        slot = base + k - co  # position within the level
                        x_out[pl.ds(j, 1), :] = (
                            x_out[pl.ds(j, 1), :]
                            - contrib[pl.ds(slot, 1), :]) / d
                        # restore the all-zero invariant for the next level
                        contrib[pl.ds(slot, 1), :] = jnp.zeros(
                            (1, B), contrib.dtype)
                    return zero

                jax.lax.fori_loop(lo, hi, col_body, zero)
                return zero

            jax.lax.fori_loop(zero, nch, chunk_body, zero)

        if scatter_form:
            col_chunks()
            entry_chunks()
        else:
            entry_chunks()
            col_chunks()

    f32 = jnp.float32
    call = pl.pallas_call(
        kernel,
        grid=(nlev,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eoff
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coff
            pl.BlockSpec(memory_space=pl.ANY),  # ev
            pl.BlockSpec(memory_space=pl.ANY),  # ea
            pl.BlockSpec(memory_space=pl.ANY),  # eb
            pl.BlockSpec(memory_space=pl.ANY),  # dv
            pl.BlockSpec(memory_space=pl.ANY),  # ci
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x_in
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, B), f32),
        scratch_shapes=[
            pltpu.VMEM((wmax_pad, B), f32),
            pltpu.SMEM((_CH,), f32),
            pltpu.SMEM((_CH,), jnp.int32),
            pltpu.SMEM((_CH,), jnp.int32),
            pltpu.SMEM((_CH,), f32),
            pltpu.SMEM((_CH,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )
    return jax.jit(call)


def sptrsv_pallas_multi(tx, X, plan, kind: int):
    """Batched triangular solve via the Pallas sweep.

    tx: factor value array (device or numpy, any float dtype — cast f32).
    X:  [n, B] RHS batch; returns solved [n, B] f32 jnp array.
    plan: `solve.tri_plan(t, kind)` schedule.
    kind: 0 lsolve / 1 usolve (scatter form), 2 ltsolve / 3 utsolve.
    """
    import jax
    import jax.numpy as jnp

    st = _streams(plan)
    n = plan.n
    Xa = jnp.asarray(X, jnp.float32)
    B = Xa.shape[1]
    n_pad = -(-(n + 1) // 8) * 8
    wmax_pad = max(-(-plan.wmax // 8) * 8, 8)
    scatter_form = kind in (0, 1)
    interpret = jax.default_backend() != "tpu"

    txf = jnp.asarray(tx, jnp.float32)
    if txf.shape[0] == 0:
        txf = jnp.zeros((1,), jnp.float32)
    # value prepass: schedule-ordered factor values (plain XLA gathers, one
    # O(nnz) pass per call; the sweep itself then never touches indices->x)
    ev = txf[jnp.asarray(st["epos"])]
    dv = txf[jnp.asarray(st["cdiag"])]
    eb = st["ecol"] if scatter_form else st["eslot"]

    Xp = jnp.zeros((n_pad, B), jnp.float32).at[:n].set(Xa)
    call = _sweep_call(plan.nlev, n_pad, B, wmax_pad, scatter_form,
                       interpret)
    # Trace with x64 disabled: under jax_enable_x64 the auto-generated
    # BlockSpec index maps emit i64 constants, which Mosaic cannot
    # legalize ("failed to legalize func.return(i64)"). All operands here
    # are f32/i32, so the narrow trace is exact.
    with jax.enable_x64(False):
        out = call(jnp.asarray(st["eoff"]), jnp.asarray(st["coff"]),
                   ev, jnp.asarray(st["erow"]), jnp.asarray(eb),
                   dv, jnp.asarray(st["cid"]), Xp)
    return out[:n]
