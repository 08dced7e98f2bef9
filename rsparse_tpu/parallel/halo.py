"""Halo-exchange distributed kernels: sharded x over a 1-D row partition.

The first-generation layer (parallel/__init__.py) replicates x on every
device and psums full m-vectors — correct, but communication is O(n) per
op and per-device memory does not shrink with D. This module implements the
SURVEY §2.5/§5 design: x, b and r are SHARDED over the mesh axis
(per-device memory ∝ n/D), matrix entries are partitioned by row block, and
each SpMV/SpTRSV sweep exchanges only BOUNDARY SEGMENTS of x with ring
neighbors via `ppermute` (ICI traffic = O(halo), not O(n)).

  x_ext = [left halo | own shard | right halo]     (ppermute from neighbors)
  r_own = segment_sum(vals * x_ext[cols_local], rows_local)   (no psum!)

`hops` ring exchanges widen the halo to reach matrices whose column span
exceeds one shard; patterns wider than `hops` shards fall back to the
dense-replication layer (the caller chooses).

For triangular solves the level schedule is FUSED into blocks of K levels:
one halo exchange serves the whole block (the halo is re-exchanged when a
block boundary is crossed), amortizing latency over levels — the
"level-fusion" mechanism SURVEY §7 hard-part #6 calls for.

`dist_lusol` composes the device LU factorization with halo-sharded L/U
sweeps — the multi-chip serving path for repeated solves.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..data import Sprs
from ..ops.plan import col_ids

__all__ = [
    "RowPartition", "partition_rows", "make_gaxpy_halo", "dist_gaxpy_halo",
    "HaloTriPlan", "halo_tri_plan", "dist_tri_solve_halo", "dist_lusol",
    "dist_qrsol",
]


@dataclasses.dataclass(frozen=True)
class RowPartition:
    """Row-block partition of a CSC matrix with halo-remapped columns.

    Entries are grouped by owner (row // nb); within each device the column
    indices are remapped into the extended-vector coordinate system
    [left halo (hops*nb) | own shard (nb) | right halo (hops*nb)].
    """

    m: int
    n: int
    d: int  # devices
    nb: int  # shard length (rows/x entries per device)
    hops: int  # halo width in shards on each side
    chunk: int  # entries per device (padded)
    vals: np.ndarray  # [d*chunk]
    rows: np.ndarray  # [d*chunk] row - own_base (local row)
    cols: np.ndarray  # [d*chunk] extended-coordinate column
    perm: np.ndarray  # original entry -> padded position (value refresh)


def partition_rows(a: Sprs, n_shards: int,
                   hops: Optional[int] = None) -> Optional[RowPartition]:
    """Build the sharded partition; None if the pattern needs halos wider
    than (d-1) shards (caller should use the replication layer instead)."""
    if a.m != a.n:
        return None
    n = a.n
    d = n_shards
    nb = -(-n // d)
    nz = a.nnz()
    rows = a.i[:nz].astype(np.int64)
    cols = col_ids(a.p, n)
    owner = rows // nb
    # required halo: max shard distance between an entry's row and column
    dist = np.abs(cols // nb - owner)
    need = int(dist.max()) if nz else 0
    h = need if hops is None else max(hops, need)
    if h > d - 1:
        h = d - 1
    if need > h:
        return None
    order = np.argsort(owner, kind="stable")
    counts = np.bincount(owner, minlength=d)
    chunk = max(1, int(counts.max()))
    E = chunk * d
    v = np.zeros(E, a.x.dtype)
    rl = np.zeros(E, np.int32)
    cl = np.zeros(E, np.int32)
    perm = np.zeros(nz, np.int64)
    off = np.zeros(d + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    for dev in range(d):
        sel = order[off[dev] : off[dev + 1]]
        base = dev * chunk
        k = len(sel)
        dst = base + np.arange(k)
        v[dst] = a.x[:nz][sel]
        # local row; pad rows scatter to the garbage slot nb
        rl[dst] = (rows[sel] - dev * nb).astype(np.int32)
        # extended coordinate: cols relative to (dev-h)*nb
        cl[dst] = (cols[sel] - (dev - h) * nb).astype(np.int32)
        perm[sel] = dst
        rl[base + k :base + chunk] = nb
        cl[base + k :base + chunk] = 0
    return RowPartition(m=a.m, n=n, d=d, nb=nb, hops=h, chunk=chunk,
                        vals=v, rows=rl, cols=cl, perm=perm)


def _halo_exchange(x_own, hops: int, axis: str):
    """Build [left halos | own | right halos] via ring ppermutes.

    x_own: [nb] this device's shard. Returns [(2*hops+1)*nb]. Chained
    one-hop permutes keep every transfer nearest-neighbor on the ICI ring
    (k-hop halos arrive after k permute rounds)."""
    nd = jax.lax.axis_size(axis)
    send_right = [(i, (i + 1) % nd) for i in range(nd)]  # recv from i-1
    send_left = [(i, (i - 1) % nd) for i in range(nd)]  # recv from i+1
    segs_left = []
    segs_right = []
    cur_l = x_own
    cur_r = x_own
    for _ in range(hops):
        cur_l = jax.lax.ppermute(cur_l, axis, send_right)
        segs_left.insert(0, cur_l)
        cur_r = jax.lax.ppermute(cur_r, axis, send_left)
        segs_right.append(cur_r)
    return jnp.concatenate(segs_left + [x_own] + segs_right)


def make_gaxpy_halo(rp: RowPartition, mesh: Mesh, axis: str = "model"):
    """Jitted sharded r = A@x + y: x/y/r sharded [d, nb]; entries sharded.

    Per-device memory is nb = n/d (plus the halo window); the only
    communication is `hops` nearest-neighbor ppermutes per call."""
    nb, hops = rp.nb, rp.hops

    def shard(vals, rows, cols, x_own, y_own):
        xe = _halo_exchange(x_own[0], hops, axis)
        prod = vals * xe[cols]
        r = jax.ops.segment_sum(prod, rows, num_segments=nb + 1)[:nb]
        return (r + y_own[0])[None]

    fn = shard_map(
        shard, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return jax.jit(fn)


def dist_gaxpy_halo(rp: RowPartition, x, y, mesh: Mesh, axis: str = "model"):
    """One-shot wrapper; loops should reuse make_gaxpy_halo + shard x once.

    x, y are logical [n] host vectors; returns the assembled [n] result.
    """
    fn = make_gaxpy_halo(rp, mesh, axis)
    xp = _shard_vec(np.asarray(x, rp.vals.dtype), rp)
    yp = _shard_vec(np.asarray(y, rp.vals.dtype), rp)
    r = fn(jnp.asarray(rp.vals), jnp.asarray(rp.rows), jnp.asarray(rp.cols),
           xp, yp)
    return _fetch(r).reshape(-1)[: rp.m]


def _fetch(r) -> np.ndarray:
    """Read a device result back to host numpy.

    Under multi-process SPMD (jax.distributed: one process per host, the
    SURVEY §5 pod-slice runtime) a sharded output spans devices this
    process cannot address, so the shards are allgathered across processes
    first; single-process arrays read back directly."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(r, tiled=True))
    return np.asarray(r)


def _shard_vec(v: np.ndarray, rp: RowPartition):
    out = np.zeros(rp.d * rp.nb, v.dtype)
    out[: len(v)] = v
    return jnp.asarray(out.reshape(rp.d, rp.nb))


# ---------------------------------------------------------------------------
# Halo-sharded level-scheduled SpTRSV
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class HaloTriPlan:
    """Level schedule with entries row-sharded and levels fused into blocks
    of `kfuse` levels per halo exchange."""

    n: int
    d: int
    nb: int
    hops: int
    nlev: int
    kfuse: int
    nblocks: int
    wmax: int  # max columns (per device) per level
    emax: int  # max off-diag entries (per device) per level
    # [d, nlev, wmax]: this device's columns per level (local idx; nb pad)
    col_loc: np.ndarray
    col_diag: np.ndarray  # positions into T.x (-1 pad)
    # [d, nlev, emax]: off-diag entries whose ROW this device owns
    ent_pos: np.ndarray  # into T.x (-1 pad)
    ent_row: np.ndarray  # local row
    ent_col: np.ndarray  # extended coordinate column
    # scatter form only: diag position of the entry's column when the read
    # crosses shards (-1 local). Remote halo values are pre-division
    # snapshots; dividing locally by the REPLICATED factor diagonal
    # reproduces the owner's same-level division ("diag trick").
    ent_div: np.ndarray
    scatter_form: bool


def halo_tri_plan(t: Sprs, kind: int, n_shards: int,
                  kfuse: int = 8) -> Optional[HaloTriPlan]:
    """kind: 0=lsolve, 1=usolve (scatter), 2=ltsolve, 3=utsolve (gather).

    Returns None when the pattern's halo exceeds the ring (use the
    replication layer). NOTE on fusion correctness: within a fused block
    the off-diagonal updates read x values that may have been written by a
    level in the SAME block on a REMOTE device; the halo is only as fresh
    as the last exchange, so blocks re-exchange whenever any level in the
    block has a cross-shard dependency still pending. We conservatively
    re-exchange at every block boundary AND restrict fusion to kfuse
    consecutive levels; cross-shard updates never skip an exchange because
    scattered x writes land on the OWNER device (entries are row-sharded),
    and reads come from the halo refreshed at the block head. A dependency
    chain crossing shards within one block would be stale — so the plan
    only fuses levels whose cross-shard reads come from levels in EARLIER
    blocks; otherwise the level starts a new block."""
    from ..solve import tri_plan

    from ..symbolic import native

    n = t.n
    d = n_shards
    nb = -(-n // d)
    nz = t.nnz()
    rows = t.i[:nz].astype(np.int64)
    cols = col_ids(t.p, n)
    dist = np.abs(cols // nb - rows // nb)
    hops = int(dist.max()) if nz else 0
    if hops > d - 1:
        return None
    lev = native.tri_levels(n, t.p, t.i[:nz], kind)
    nlev = int(lev.max()) + 1 if n else 1
    lower_diag = kind in (0, 2)
    diag_pos = t.p[:-1] if lower_diag else t.p[1:] - 1

    # Halo-freshness block boundaries. A cross-shard entry at level L reads
    # a remote x value through the halo snapshot taken at its block's
    # start, so every level that last WROTE that value must precede the
    # block. Gather form (kinds 2/3) reads x[row], finalized at lev[row].
    # Scatter form (kinds 0/1) reads x[col] at L = lev[col]; all UPDATES to
    # col land at levels of entries targeting row=col (upd_max below), and
    # the same-level division is reproduced locally from the replicated
    # factor diagonal (the "diag trick" in the kernel) — so only upd_max
    # gates the block.
    src_lev_max = np.full(nlev, -1, dtype=np.int64)
    offd = np.ones(nz, dtype=bool)
    offd[diag_pos] = False
    ecols_all = cols[offd]
    erows_all = rows[offd]
    elev = lev[ecols_all]
    e_cross = (ecols_all // nb) != (erows_all // nb)
    if kind in (0, 1):
        upd_max = np.full(n, -1, dtype=np.int64)
        np.maximum.at(upd_max, erows_all, elev)
        e_src = upd_max[ecols_all]
    else:
        e_src = lev[erows_all]
    for L, S, X in zip(elev, e_src, e_cross):
        if X and S > src_lev_max[L]:
            src_lev_max[L] = S
    blocks = np.zeros(nlev, dtype=np.int64)
    bstart = 0
    bid = 0
    for L in range(nlev):
        if L > bstart and (L - bstart >= kfuse or src_lev_max[L] >= bstart):
            bid += 1
            bstart = L
        blocks[L] = bid
    nblocks = bid + 1

    owner_c = cols // nb
    owner_r = rows // nb
    # per-device per-level column tables
    wmax = 1
    emax = 1
    per_dev_cols: List[List[List[int]]] = [
        [[] for _ in range(nlev)] for _ in range(d)]
    for j in range(n):
        per_dev_cols[int(j // nb)][int(lev[j])].append(j)
    for dev in range(d):
        for L in range(nlev):
            wmax = max(wmax, len(per_dev_cols[dev][L]))
    pos_all = np.arange(nz, dtype=np.int64)[offd]
    per_dev_ents: List[List[List[int]]] = [
        [[] for _ in range(nlev)] for _ in range(d)]
    for p_, r_, c_ in zip(pos_all, erows_all, ecols_all):
        own = int(r_ // nb) if kind in (0, 1) else int(c_ // nb)
        per_dev_ents[own][int(lev[c_])].append(int(p_))
    for dev in range(d):
        for L in range(nlev):
            emax = max(emax, len(per_dev_ents[dev][L]))

    col_loc = np.full((d, nlev, wmax), nb, np.int32)
    col_diag = np.full((d, nlev, wmax), -1, np.int32)
    ent_pos = np.full((d, nlev, emax), -1, np.int32)
    ent_row = np.full((d, nlev, emax), nb, np.int32)
    ent_col = np.full((d, nlev, emax), 0, np.int32)
    ent_div = np.full((d, nlev, emax), -1, np.int32)
    for dev in range(d):
        for L in range(nlev):
            cs = per_dev_cols[dev][L]
            col_loc[dev, L, : len(cs)] = [j - dev * nb for j in cs]
            col_diag[dev, L, : len(cs)] = [diag_pos[j] for j in cs]
            es = per_dev_ents[dev][L]
            ent_pos[dev, L, : len(es)] = es
            if kind in (0, 1):
                ent_row[dev, L, : len(es)] = [int(rows[p] - dev * nb)
                                              for p in es]
                ent_col[dev, L, : len(es)] = [
                    int(cols[p] - (dev - hops) * nb) for p in es]
                ent_div[dev, L, : len(es)] = [
                    int(diag_pos[cols[p]]) if cols[p] // nb != dev else -1
                    for p in es]
            else:
                ent_row[dev, L, : len(es)] = [int(cols[p] - dev * nb)
                                              for p in es]
                ent_col[dev, L, : len(es)] = [
                    int(rows[p] - (dev - hops) * nb) for p in es]
    plan = HaloTriPlan(
        n=n, d=d, nb=nb, hops=hops, nlev=nlev, kfuse=kfuse,
        nblocks=nblocks, wmax=wmax, emax=emax,
        col_loc=col_loc, col_diag=col_diag,
        ent_pos=ent_pos, ent_row=ent_row, ent_col=ent_col, ent_div=ent_div,
        scatter_form=kind in (0, 1),
    )
    plan.__dict__["_blocks"] = blocks
    return plan


def _block_tables(p: HaloTriPlan):
    """Reshape the per-level tables into [d, nblocks, kfuse, ...] blocked
    layout (pad slots empty) so the solve scans over blocks instead of
    unrolling every level into the trace."""
    bt = p.__dict__.get("_blocked")
    if bt is not None:
        return bt
    blocks = p.__dict__["_blocks"]
    d, nlev = p.d, p.nlev
    K = p.kfuse
    NB = p.nblocks
    cl = np.full((d, NB, K, p.wmax), p.nb, np.int32)
    cd = np.full((d, NB, K, p.wmax), -1, np.int32)
    ep = np.full((d, NB, K, p.emax), -1, np.int32)
    er = np.full((d, NB, K, p.emax), p.nb, np.int32)
    ec = np.full((d, NB, K, p.emax), 0, np.int32)
    ed = np.full((d, NB, K, p.emax), -1, np.int32)
    slot = np.zeros(NB, np.int64)
    for L in range(nlev):
        b = int(blocks[L])
        k = int(slot[b])
        slot[b] = k + 1
        cl[:, b, k] = p.col_loc[:, L]
        cd[:, b, k] = p.col_diag[:, L]
        ep[:, b, k] = p.ent_pos[:, L]
        er[:, b, k] = p.ent_row[:, L]
        ec[:, b, k] = p.ent_col[:, L]
        ed[:, b, k] = p.ent_div[:, L]
    # fresh-patch bounds: per (device, block), the static range of OWN
    # positions the block writes (level columns; plus row partial-updates
    # in scatter form). The prefetch path ships only this range on the
    # critical path — the full halo exchange rides ahead of the compute.
    valid_cl = np.where(cl < p.nb, cl, -1)
    lo = np.full((d, NB), 0, np.int64)
    hi = np.full((d, NB), 0, np.int64)
    m_any = (valid_cl >= 0).any(axis=(2, 3))
    lo_cl = np.where(valid_cl >= 0, valid_cl, p.nb).min(axis=(2, 3))
    hi_cl = (valid_cl.max(axis=(2, 3)) + 1)
    lo = np.where(m_any, lo_cl, 0)
    hi = np.where(m_any, hi_cl, 0)
    if p.scatter_form:
        valid_er = np.where(er < p.nb, er, -1)
        e_any = (valid_er >= 0).any(axis=(2, 3))
        lo_er = np.where(valid_er >= 0, valid_er, p.nb).min(axis=(2, 3))
        hi_er = valid_er.max(axis=(2, 3)) + 1
        lo = np.where(e_any, np.minimum(lo, lo_er), lo)
        hi = np.where(e_any, np.maximum(hi, hi_er), hi)
    F = max(1, int((hi - lo).max()))
    flo = np.minimum(lo, p.nb - F).clip(min=0).astype(np.int32)
    bt = tuple(jnp.asarray(t) for t in (cl, cd, ep, er, ec, ed, flo)) + (F,)
    p.__dict__["_blocked"] = bt
    return bt


def make_tri_solve_halo(p: HaloTriPlan, mesh: Mesh, axis: str = "model",
                        prefetch: bool = True):
    """Jitted sharded triangular solve; x sharded [d, nb]. One halo
    exchange per fused level-block; levels inside a block run in a
    fori_loop (no per-level unrolling in the trace).

    prefetch=True (comm/compute overlap, SURVEY §5): the FULL halo
    exchange for block b+1 is issued at the START of block b, before the
    level loop — it carries no data dependency on block b's compute, so
    XLA's async collective-permute scheduling can run it concurrently
    with the block's FMAs. The critical path at each block boundary then
    ships only an F-wide "fresh" segment (the static range of positions
    the previous block wrote, F = max over blocks) that patches the
    prefetched snapshot up to date: snapshot(start of b-1) + writes
    during b-1 == snapshot(start of b), which is exactly what the
    non-prefetch path exchanges. prefetch=False keeps the blocking
    exchange-per-block structure for A/B comparison."""
    nb, hops = p.nb, p.hops
    K = p.kfuse
    F = _block_tables(p)[-1]

    def _fresh_patch(xe, fseg, flo):
        """Patch neighbors' fresh segments into the prefetched halo."""
        nd = jax.lax.axis_size(axis)
        send_right = [(i, (i + 1) % nd) for i in range(nd)]
        send_left = [(i, (i - 1) % nd) for i in range(nd)]
        seg_l, lo_l = fseg, flo
        seg_r, lo_r = fseg, flo
        for h in range(1, hops + 1):
            seg_l = jax.lax.ppermute(seg_l, axis, send_right)
            lo_l = jax.lax.ppermute(lo_l, axis, send_right)
            xe = jax.lax.dynamic_update_slice(
                xe, seg_l, ((hops - h) * nb + lo_l[0],))
            seg_r = jax.lax.ppermute(seg_r, axis, send_left)
            lo_r = jax.lax.ppermute(lo_r, axis, send_left)
            xe = jax.lax.dynamic_update_slice(
                xe, seg_r, ((hops + h) * nb + lo_r[0],))
        return xe

    def shard(tx, cl_b, cd_b, ep_b, er_b, ec_b, ed_b, flo_b, x_own):
        xp = jnp.concatenate([x_own[0], jnp.zeros((1,), tx.dtype)])

        def block(carry, tabs):
            if prefetch:
                xp, xe_pref, fseg, flo_prev = carry
                cl_, cd_, ep_, er_, ec_, ed_, flo_cur = tabs
                xe0 = _fresh_patch(xe_pref, fseg, flo_prev)
                # next block's full halo: issued BEFORE the level loop,
                # data-independent of it — overlappable by XLA
                xe_next = _halo_exchange(xp[:nb], hops, axis)
            else:
                xp = carry
                cl_, cd_, ep_, er_, ec_, ed_, flo_cur = tabs
                xe0 = _halo_exchange(xp[:nb], hops, axis)

            def level(k, st):
                xp, xe = st
                cl = cl_[k]
                cd = cd_[k]
                cvalid = cd >= 0
                dvals = jnp.where(
                    cvalid, tx[jnp.clip(cd, 0, tx.shape[0] - 1)],
                    jnp.ones((), tx.dtype))
                ep = ep_[k]
                ev = jnp.where(ep >= 0,
                               tx[jnp.clip(ep, 0, tx.shape[0] - 1)],
                               jnp.zeros((), tx.dtype))
                er = er_[k]
                ec = ec_[k]
                if p.scatter_form:
                    xj = xp[cl] / dvals
                    xp = xp.at[jnp.where(cvalid, cl, nb)].set(
                        jnp.where(cvalid, xj, 0.0), mode="drop")
                    # refresh OWN segment of the extended view before reads
                    xe = jax.lax.dynamic_update_slice(
                        xe, xp[:nb], (hops * nb,))
                    # diag trick: remote halo values are pre-division;
                    # reproduce the owner's division from the replicated
                    # factor diagonal (ed >= 0 marks cross-shard reads)
                    ed = ed_[k]
                    dv = jnp.where(ed >= 0,
                                   tx[jnp.clip(ed, 0, tx.shape[0] - 1)],
                                   jnp.ones((), tx.dtype))
                    xp = xp.at[er].add(-(ev * xe[ec] / dv), mode="drop")
                else:
                    xe = jax.lax.dynamic_update_slice(
                        xe, xp[:nb], (hops * nb,))
                    acc = jnp.zeros((nb + 1,), tx.dtype).at[er].add(
                        ev * xe[ec], mode="drop")
                    xj = (xp[cl] - acc[jnp.clip(cl, 0, nb)]) / dvals
                    xp = xp.at[jnp.where(cvalid, cl, nb)].set(
                        jnp.where(cvalid, xj, 0.0), mode="drop")
                return (xp, xe)

            xp, _ = jax.lax.fori_loop(0, K, level, (xp, xe0))
            if prefetch:
                fseg_next = jax.lax.dynamic_slice(xp, (flo_cur[0],), (F,))
                return (xp, xe_next, fseg_next, flo_cur), None
            return xp, None

        # scan over blocks: tables arrive as [1, NB, K, ...] per device
        flo_dev = flo_b[0][:, None]  # [NB, 1] (lo rides ppermute as [1])
        xs = (cl_b[0], cd_b[0], ep_b[0], er_b[0], ec_b[0], ed_b[0], flo_dev)
        if prefetch:
            carry0 = (xp, _halo_exchange(xp[:nb], hops, axis),
                      jax.lax.dynamic_slice(xp, (0,), (F,)),
                      flo_dev[0] * 0)  # *0: keep the sharded-varying vma
            (xp, _, _, _), _ = jax.lax.scan(block, carry0, xs)
        else:
            xp, _ = jax.lax.scan(block, xp, xs)
        return xp[:nb][None]

    fn = shard_map(
        shard, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis)),
        out_specs=P(axis),
    )
    return jax.jit(fn)


def dist_tri_solve_halo(t: Sprs, x, kind: int, mesh: Mesh,
                        axis: str = "model",
                        plan: Optional[HaloTriPlan] = None,
                        prefetch: bool = True):
    """Sharded-x level-scheduled triangular solve (halo design)."""
    D = mesh.shape[axis]
    p = plan or halo_tri_plan(t, kind, D)
    if p is None:
        from . import dist_tri_solve

        return dist_tri_solve(t, x, kind, mesh, axis)
    key = "_fn" if prefetch else "_fn_nopf"
    fn = p.__dict__.get(key)
    if fn is None:
        fn = make_tri_solve_halo(p, mesh, axis, prefetch=prefetch)
        p.__dict__[key] = fn
    nz = t.nnz()
    rp_dummy = RowPartition(t.m, t.n, p.d, p.nb, p.hops, 1,
                            np.zeros(1, np.float64), np.zeros(1, np.int32),
                            np.zeros(1, np.int32), np.zeros(1, np.int64))
    xs = _shard_vec(np.asarray(x, np.float64), rp_dummy)
    cl_b, cd_b, ep_b, er_b, ec_b, ed_b, flo_b, _F = _block_tables(p)
    out = fn(jnp.asarray(t.x[:nz]), cl_b, cd_b, ep_b, er_b, ec_b, ed_b,
             flo_b, xs)
    return _fetch(out).reshape(-1)[: t.n]


def dist_qrsol(a: Sprs, b, mesh: Mesh, order: int = 2, axis: str = "model",
               refine: int = 2):
    """Distributed least-squares / minimum-norm solve via corrected
    seminormal equations: R from the Cholesky of AᵀA (or AAᵀ), both
    triangular sweeps as halo-sharded SPMD solves, f64 refinement on host
    residuals. The single-chip `qrsol` keeps exact Householder semantics;
    this is the multi-chip serving path (same solutions for the
    well-conditioned systems CSNE+refinement covers)."""
    from .. import ops
    from ..factor import chol
    from ..symbolic import schol

    m, n = a.m, a.n
    bb = np.asarray(b, dtype=np.float64)
    at = ops.transpose(a)
    g = ops.multiply(at, a) if m >= n else ops.multiply(a, at)
    s = schol(g, order)
    nm = chol(g, s)
    lmat = nm.l
    lmat.x = np.asarray(lmat.x)
    pinv = np.asarray(s.pinv, dtype=np.int64) if s.pinv is not None else None
    k = g.n
    p0 = halo_tri_plan(lmat, 0, mesh.shape[axis])
    p2 = halo_tri_plan(lmat, 2, mesh.shape[axis])

    def spd_solve(r):
        z = np.zeros(k)
        if pinv is not None:
            z[pinv] = r
        else:
            z[:] = r
        z = np.asarray(dist_tri_solve_halo(lmat, z, 0, mesh, axis, plan=p0))
        z = np.asarray(dist_tri_solve_halo(lmat, z, 2, mesh, axis, plan=p2))
        out = np.zeros(k)
        if pinv is not None:
            out[:] = z[pinv]
        else:
            out[:] = z
        return out

    if m >= n:
        x = spd_solve(np.asarray(ops.gaxpy(at, list(bb), [0.0] * n)))
        for _ in range(max(0, refine)):
            r = bb - np.asarray(ops.gaxpy(a, list(x), [0.0] * m))
            x = x + spd_solve(np.asarray(ops.gaxpy(at, list(r), [0.0] * n)))
        return x
    y = spd_solve(bb)
    x = np.asarray(ops.gaxpy(at, list(y), [0.0] * n))
    for _ in range(max(0, refine)):
        r = bb - np.asarray(ops.gaxpy(a, list(x), [0.0] * m))
        x = x + np.asarray(ops.gaxpy(at, list(spd_solve(r)), [0.0] * n))
    return x


def dist_lusol(a: Sprs, b, mesh: Mesh, order: int = 1, tol: float = 1e-6,
               axis: str = "model"):
    """Distributed A\\b via LU: factorization on the primary device
    (multifrontal partial pivoting), then both triangular sweeps as
    halo-sharded SPMD solves over the mesh. Semantics match single-chip
    `solve.lusol` (reference src/lib.rs:672-683)."""
    from ..factor import lu
    from ..symbolic import sqr
    from .. import ops

    n = a.n
    s = sqr(a, order, False)
    nm = lu(a, s, tol)
    bb = np.asarray(b, dtype=np.float64)
    x = np.zeros(n)
    ops.ipvec(n, nm.pinv, bb, x)
    x = np.asarray(dist_tri_solve_halo(nm.l, x, 0, mesh, axis))
    x = np.asarray(dist_tri_solve_halo(nm.u, x, 1, mesh, axis))
    out = np.zeros(n)
    ops.ipvec(n, s.q, x, out)
    return out
