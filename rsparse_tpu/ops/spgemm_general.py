"""General-sparsity SpGEMM: the ESC numeric phase as one-hot MXU matmuls.

`multiply` (ops/__init__.py) computes C = A@B with the reference's Gustavson
semantics (src/lib.rs:713-748) via a cached ESC plan: expand every
(A(i,k), B(k,j)) product with static gather indices, segment-sum into the
precomputed output pattern. Its device lowering
(`segment_sum(Ax[a_idx] * Bx[b_idx], seg)`) collapses to scalar
gathers/scatters on TPU (~10 ns per index, measured), so on patterns with
no band/DIA structure the C++ loop wins.

This module is the arbitrary-pattern fast path, the SpGEMM analog of
ops/spmv_general.py: route ALL three address streams (two gathers, one
scatter-accumulate) through the MXU as implicit one-hot matmuls.

  Value arrays Ax, Bx and the output Cx are split into 16384-entry
  subtables viewed as [128(hi), 128(lo)] blocks. Expanded products are
  sorted by the (C-subtable, A-subtable, B-subtable) triple — static per
  pattern pair — and padded per triple into fixed-size chunks. Per chunk:

    gather A :  ar = onehot(ah) @ A3[ta]           # [C,128] MXU
                av = sum(ar * onehot(al), -1)      # lane select, VPU
    gather B :  likewise from B3[tb]
    product  :  p = av * bv
    scatter  :  C3[tc] += onehot(ch)^T @ (p[:,None] * onehot(cl))

Pad slots carry ch = -1, which matches no lane, so their (junk) products
are dropped by the scatter's one-hot. One operand of every matmul is
one-hot (exact at any precision) and Precision.HIGHEST keeps the value
operand exact, so results are bit-identical to the scalar ESC lowering up
to summation order within a segment.

Chunk fragmentation: the natural expansion order (per B entry, a run over
one A column) keeps tb and tc nearly monotone while ta jumps — but all
entries sharing a triple are chunked together after the global sort, so
per-triple runs are ~|region| / (#A-subtables touched), typically well
above the chunk size for the nnz regimes where this path is worth
launching at all.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

from ..data import Sprs
from . import plan as _plan

__all__ = ["MxuSpgemmPlan", "mxu_spgemm_plan", "spgemm_general",
           "spgemm_general_fn", "spgemm_general_dist"]

_LANE = 128
_SUB = _LANE * _LANE  # 16384-entry subtables, viewed [128, 128]


@dataclasses.dataclass(frozen=True)
class MxuSpgemmPlan:
    """Static per-pattern-pair plan for the one-hot-MXU SpGEMM."""

    m: int
    n: int
    anz: int
    bnz: int
    nnz: int  # nnz(C)
    na: int  # A subtables
    nb: int  # B subtables
    nc: int  # C subtables
    ch_size: int
    g: int
    nsteps: int
    # [nsteps, g] subtable ids per chunk
    abid: np.ndarray
    bbid: np.ndarray
    cbid: np.ndarray
    # [nsteps, g, ch_size] int32 hi/lo indices (pad: ch = -1 kills the slot)
    ah: np.ndarray
    al: np.ndarray
    bh: np.ndarray
    bl: np.ndarray
    ch: np.ndarray
    cl: np.ndarray
    out_p: np.ndarray  # [n+1] C column pointers
    out_i: np.ndarray  # [nnzC] C row indices


def mxu_spgemm_plan(a: Sprs, b: Sprs, ch_size: int = 256,
                    g: int = 64) -> MxuSpgemmPlan:
    """Default ch_size is smaller than the SpMV plan's: SpGEMM triples
    (C-, A-, B-subtable) fragment finer than SpMV pairs on random
    patterns (measured pad waste at 1M^2/5-per-col random: 2.98x @512,
    1.37x @128), and per-entry MXU cost is chunk-size independent.
    ch=256/g=64 re-measured fastest in round 4 (0.24 vs 0.20 Gnnz/s at
    ch=128/g=32 — scan-step overhead dominates; ch=512 exceeds the remote
    compiler's request size limit). g is clamped to the chunk count so
    small problems pad at most one step."""
    base = _plan.spgemm_plan(a, b)  # cached ESC expansion (pattern only)
    E = len(base.seg)
    a_idx = base.a_idx.astype(np.int64)
    b_idx = base.b_idx.astype(np.int64)
    seg = base.seg.astype(np.int64)
    na = max(1, -(-a.nnz() // _SUB))
    nb = max(1, -(-b.nnz() // _SUB))
    nc = max(1, -(-max(base.nnz, 1) // _SUB))
    if E == 0:
        z3 = np.zeros((1, g, ch_size), np.int32)
        return MxuSpgemmPlan(
            m=base.m, n=base.n, anz=a.nnz(), bnz=b.nnz(), nnz=base.nnz,
            na=na, nb=nb, nc=nc, ch_size=ch_size, g=g, nsteps=1,
            abid=np.zeros((1, g), np.int32), bbid=np.zeros((1, g), np.int32),
            cbid=np.zeros((1, g), np.int32),
            ah=z3, al=z3, bh=z3, bl=z3, ch=np.full((1, g, ch_size), -1, np.int32),
            cl=z3, out_p=base.out_p, out_i=base.out_i)

    ta = a_idx // _SUB
    tb = b_idx // _SUB
    tc = seg // _SUB
    key = (tc * np.int64(na) + ta) * np.int64(nb) + tb
    order = np.argsort(key, kind="stable")
    ks = key[order]
    utrip, counts = np.unique(ks, return_counts=True)
    nchunks_per = -(-counts // ch_size)
    total_chunks = int(nchunks_per.sum())
    g = max(1, min(g, total_chunks))
    nsteps = max(1, -(-total_chunks // g))
    Cp = nsteps * g
    Et = Cp * ch_size
    ah_ = np.zeros(Et, np.int32)
    al_ = np.zeros(Et, np.int32)
    bh_ = np.zeros(Et, np.int32)
    bl_ = np.zeros(Et, np.int32)
    ch_ = np.full(Et, -1, np.int32)  # pad slots match no lane
    cl_ = np.zeros(Et, np.int32)
    ab_ = np.zeros(Cp, np.int32)
    bb_ = np.zeros(Cp, np.int32)
    cb_ = np.zeros(Cp, np.int32)
    ci = 0
    pos = 0
    for trip, cnt in zip(utrip, counts):
        nck = int(-(-cnt // ch_size))
        sel = order[pos: pos + cnt]
        dst = ci * ch_size + np.arange(cnt)
        aa = a_idx[sel]
        bb2 = b_idx[sel]
        cc = seg[sel]
        ah_[dst] = ((aa % _SUB) // _LANE).astype(np.int32)
        al_[dst] = (aa % _LANE).astype(np.int32)
        bh_[dst] = ((bb2 % _SUB) // _LANE).astype(np.int32)
        bl_[dst] = (bb2 % _LANE).astype(np.int32)
        ch_[dst] = ((cc % _SUB) // _LANE).astype(np.int32)
        cl_[dst] = (cc % _LANE).astype(np.int32)
        t_b = int(trip % nb)
        t_a = int((trip // nb) % na)
        t_c = int(trip // (na * nb))
        ab_[ci: ci + nck] = t_a
        bb_[ci: ci + nck] = t_b
        cb_[ci: ci + nck] = t_c
        ci += nck
        pos += cnt
    sh2 = (nsteps, g)
    sh3 = (nsteps, g, ch_size)
    return MxuSpgemmPlan(
        m=base.m, n=base.n, anz=a.nnz(), bnz=b.nnz(), nnz=base.nnz,
        na=na, nb=nb, nc=nc, ch_size=ch_size, g=g, nsteps=nsteps,
        abid=ab_.reshape(sh2), bbid=bb_.reshape(sh2), cbid=cb_.reshape(sh2),
        ah=ah_.reshape(sh3), al=al_.reshape(sh3), bh=bh_.reshape(sh3),
        bl=bl_.reshape(sh3), ch=ch_.reshape(sh3), cl=cl_.reshape(sh3),
        out_p=base.out_p, out_i=base.out_i)


@functools.lru_cache(maxsize=32)
def _mxu_spgemm_kernel(na: int, nb: int, nc: int, ch_size: int, g: int,
                       nsteps: int, anz: int, bnz: int, nnzc: int,
                       dtype_name: str, precision: str = "highest"):
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(dtype_name)
    # see spmv_general._mxu_kernel for the precision tradeoff
    hi = (jax.lax.Precision.HIGHEST if precision == "highest"
          else jax.lax.Precision.HIGH)

    @jax.jit
    def run(ax, bx, abid, bbid, cbid, ah, al, bh, bl, ch, cl):
        A3 = jnp.zeros((na * _SUB,), dt).at[:anz].set(ax.astype(dt))
        A3 = A3.reshape(na, _LANE, _LANE)
        B3 = jnp.zeros((nb * _SUB,), dt).at[:bnz].set(bx.astype(dt))
        B3 = B3.reshape(nb, _LANE, _LANE)
        lane = jax.lax.broadcasted_iota(jnp.int32, (g, ch_size, _LANE), 2)

        def step(acc, args):
            ab, bb, cb, ahk, alk, bhk, blk, chk, clk = args
            oh_ah = (lane == ahk[..., None]).astype(dt)
            ar = jnp.einsum("gce,geh->gch", oh_ah, A3[ab], precision=hi,
                            preferred_element_type=dt)
            av = jnp.sum(jnp.where(lane == alk[..., None], ar, 0), axis=-1)
            oh_bh = (lane == bhk[..., None]).astype(dt)
            br = jnp.einsum("gce,geh->gch", oh_bh, B3[bb], precision=hi,
                            preferred_element_type=dt)
            bv = jnp.sum(jnp.where(lane == blk[..., None], br, 0), axis=-1)
            p = av * bv
            oh_ch = (lane == chk[..., None]).astype(dt)
            oh_cl = (lane == clk[..., None]).astype(dt)
            contrib = jnp.einsum("gch,gcl->ghl", oh_ch,
                                 p[..., None] * oh_cl, precision=hi,
                                 preferred_element_type=dt)
            acc = acc.at[cb].add(contrib)
            return acc, None

        acc0 = jnp.zeros((nc, _LANE, _LANE), dt)
        acc, _ = jax.lax.scan(step, acc0,
                              (abid, bbid, cbid, ah, al, bh, bl, ch, cl))
        return acc.reshape(-1)[:nnzc]

    return run


def spgemm_general_fn(plan: MxuSpgemmPlan, dtype: str = "float32",
                      precision: str = "highest"):
    """Return jit-compatible `f(ax_dev, bx_dev) -> Cx` for the plan.

    Device-resident: both operands' value arrays stay in HBM; only the
    static index tensors ship once per plan. `precision="high"` trades
    exactness for ~1.8x matmul speed (see spmv_general._mxu_kernel).
    """
    import jax.numpy as jnp

    kern = _mxu_spgemm_kernel(
        plan.na, plan.nb, plan.nc, plan.ch_size, plan.g, plan.nsteps,
        plan.anz, plan.bnz, plan.nnz, dtype, precision)
    idx = [jnp.asarray(t) for t in (plan.abid, plan.bbid, plan.cbid, plan.ah,
                                    plan.al, plan.bh, plan.bl, plan.ch,
                                    plan.cl)]

    def f(ax, bx):
        return kern(ax, bx, *idx)

    # outer-jit callers (ops.chain, bench loops) must thread the index
    # tensors as ARGUMENTS — a closure capture would bake them into the
    # uploaded HLO as constants (megabytes of program text through the
    # remote-compile tunnel): call f.run(ax, bx, *f.consts)
    f.run = kern
    f.consts = tuple(idx)

    return f


def spgemm_general_dist(a: Sprs, b: Sprs, mesh, axis: str = "model",
                        dtype: str = "float32") -> Sprs:
    """SPMD C = A @ B: the one-hot-MXU chunk stream sharded over the mesh.

    Each device scans 1/D of the (C-,A-,B-subtable) chunk stream into its
    own block accumulator; one `psum` combines the accumulators (disjoint
    chunks → pure addition). Operand value arrays are replicated (they are
    O(nnz), the expansion stream is O(flops) — the big axis is what
    shards). Reference semantics: multiply, src/lib.rs:713-748.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # jax < 0.8
        from jax.experimental.shard_map import shard_map

    D = mesh.shape[axis]
    p = mxu_spgemm_plan(a, b)
    # pad the step axis to a multiple of D (pad steps carry ch = -1 chunks)
    ns = p.nsteps
    nsp = -(-ns // D) * D
    def padsteps(t, fill=0):
        if nsp == ns:
            return t
        pad = np.full((nsp - ns,) + t.shape[1:], fill, t.dtype)
        return np.concatenate([t, pad])

    idx = dict(
        abid=padsteps(p.abid), bbid=padsteps(p.bbid), cbid=padsteps(p.cbid),
        ah=padsteps(p.ah), al=padsteps(p.al), bh=padsteps(p.bh),
        bl=padsteps(p.bl), ch=padsteps(p.ch, -1), cl=padsteps(p.cl))

    dt = jnp.dtype(dtype)
    hi = jax.lax.Precision.HIGHEST

    def shard_fn(ax, bx, abid, bbid, cbid, ah, al, bh, bl, ch, cl):
        A3 = jnp.zeros((p.na * _SUB,), dt).at[: p.anz].set(ax.astype(dt))
        A3 = A3.reshape(p.na, _LANE, _LANE)
        B3 = jnp.zeros((p.nb * _SUB,), dt).at[: p.bnz].set(bx.astype(dt))
        B3 = B3.reshape(p.nb, _LANE, _LANE)
        lane = jax.lax.broadcasted_iota(jnp.int32, (p.g, p.ch_size, _LANE), 2)

        def step(acc, args):
            ab, bb, cb, ahk, alk, bhk, blk, chk, clk = args
            oh_ah = (lane == ahk[..., None]).astype(dt)
            ar = jnp.einsum("gce,geh->gch", oh_ah, A3[ab], precision=hi,
                            preferred_element_type=dt)
            av = jnp.sum(jnp.where(lane == alk[..., None], ar, 0), axis=-1)
            oh_bh = (lane == bhk[..., None]).astype(dt)
            br = jnp.einsum("gce,geh->gch", oh_bh, B3[bb], precision=hi,
                            preferred_element_type=dt)
            bv = jnp.sum(jnp.where(lane == blk[..., None], br, 0), axis=-1)
            pv = av * bv
            oh_ch = (lane == chk[..., None]).astype(dt)
            oh_cl = (lane == clk[..., None]).astype(dt)
            contrib = jnp.einsum("gch,gcl->ghl", oh_ch,
                                 pv[..., None] * oh_cl, precision=hi,
                                 preferred_element_type=dt)
            return acc.at[cb].add(contrib), None

        acc0 = jnp.zeros((p.nc, _LANE, _LANE), dt)
        # the carry varies per shard (each scans different chunks): mark it
        if hasattr(jax.lax, "pcast"):
            acc0 = jax.lax.pcast(acc0, (axis,), to="varying")
        elif hasattr(jax.lax, "pvary"):
            acc0 = jax.lax.pvary(acc0, (axis,))
        acc, _ = jax.lax.scan(
            step, acc0, (abid, bbid, cbid, ah, al, bh, bl, ch, cl))
        return jax.lax.psum(acc, axis)  # replicated: shards are disjoint

    specs_in = (P(),) * 2 + (P(axis),) * 9
    fn = jax.jit(shard_map(shard_fn, mesh=mesh, in_specs=specs_in,
                           out_specs=P()))
    dd = [jnp.asarray(t) for t in idx.values()]
    axd = jnp.asarray(a.x[: a.nnz()] if a.nnz() else np.zeros(1), dt)
    bxd = jnp.asarray(b.x[: b.nnz()] if b.nnz() else np.zeros(1), dt)
    acc = fn(axd, bxd, *dd)
    cx = np.asarray(acc).reshape(-1)[: p.nnz]
    return Sprs(p.nnz, p.m, p.n, p.out_p, p.out_i,
                cx.astype(a.x.dtype if a.nnz() else np.float64))


def spgemm_general(a: Sprs, b: Sprs, plan: Optional[MxuSpgemmPlan] = None,
                   dtype: str = "float32") -> Sprs:
    """C = A @ B through the one-hot-MXU ESC path (f32 accumulate by
    default; pass dtype="float64" for exact parity off-TPU).

    Reference semantics: multiply, src/lib.rs:713-748; rows per column
    sorted ascending (canonical form, matching ops.multiply).
    """
    import jax.numpy as jnp

    p = plan or mxu_spgemm_plan(a, b)
    f = spgemm_general_fn(p, dtype)
    dt = jnp.dtype(dtype)
    cx = f(jnp.asarray(a.x[: a.nnz()], dt), jnp.asarray(b.x[: b.nnz()], dt))
    return Sprs(p.nnz, p.m, p.n, p.out_p, p.out_i,
                np.asarray(cx, dtype=a.x.dtype if a.nnz() else np.float64))
