"""Multifrontal Householder QR: batched dense fronts over the column etree.

The reference's QR (src/lib.rs:788-877) applies reflectors column by column
with per-column pattern walks; at 8000-scale its compact-WY level schedule
needs ~7e9 index-tensor entries (measured) — hopeless. The multifrontal
structure is the TPU shape: partition the column etree of AᵀA into
connected chunks (pruned subtrees; greedy postorder merge up to `smax`
columns), assign each row to the front of its leftmost column, and per
front factor the dense matrix

    F_f = [ A(O_f, S_f ∪ E_f) ; child contribution blocks ]

with one batched `geqrf` (exact Householder semantics, LAPACK
conventions). The first |S_f| rows of the triangular factor are final rows
of R; the next cb_f = min(rows-|S_f|, |E_f|) rows form the contribution
block passed to the parent front. Structure arguments (why E_f ⊆ columns
beyond the chunk root, why rows can be over-included safely) are the
standard MF-QR theory; row i's column set always has leftmost(i) as its
etree descendant, so completed child subtrees can never need a row
assigned to an ancestor chunk.

Fronts at the same depth with the same padded shape batch into one kernel;
Q's first k = min(rows, cols) columns are materialized per front (via
`householder_product`) and cached, so a solve is one gather + one batched
matmul + one scatter per level — Qᵀb (least squares) forward or Q·x
(minimum norm, driver works on Aᵀ) backward — plus a level-scheduled
usolve on the static R pattern.

The public `qr()` keeps the reference-exact V/R/beta export paths (level
kernel / host); this module powers `qrsol` at scale, where the orthogonal
factor lives as the front tree.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Sprs, Symb
from ..symbolic import native


def _next_pow2(x: int) -> int:
    return 1 << max(0, (int(x) - 1).bit_length())


@dataclasses.dataclass
class QRFrontBucket:
    """One (level, padded-shape) batch of fronts.

    Round 4: the big index streams (front assembly gathers, R/CB scatter
    maps) are NOT materialized on the host — at qrsol_3 scale they came to
    ~3 GB and uploading them through the remote-TPU tunnel took minutes
    per process. Instead the bucket stores COMPACT descriptors (a few
    scalars per (front, child) pair plus the irregular `r_dst`/`cpos`
    lookups) and `_qr_front_body` EXPANDS them on device with iota /
    searchsorted arithmetic inside the factor trace. Upload shrinks to
    ~40 MB; the expansion itself is vector math fused into the program."""
    F: int  # fronts in the bucket
    rp: int  # padded rows
    cp: int  # padded cols
    kq: int  # min(rp, cp)
    # A assembly: COO (front, row, col) <- Ax[pos], valid entries only
    a_f: np.ndarray
    a_r: np.ndarray
    a_c: np.ndarray
    a_pos: np.ndarray
    # child-CB stacking: one descriptor per (front, child) pair; entry k of
    # pair p maps cbx[offv[p]+k] -> Fm[t[p], roff[p]+k//L[p],
    # cpos[cpos_off[p] + k%L[p]]]
    cb_t: np.ndarray
    cb_offv: np.ndarray
    cb_roff: np.ndarray
    cb_L: np.ndarray
    cb_cpos_off: np.ndarray
    cpos: np.ndarray  # concatenated child-column -> front-column maps
    cb_cum: np.ndarray  # [P+1] cumulative nb*L
    # R scatter: per-front rect ns x nc; r_dst holds the Rx position (dump
    # slot rnz where masked: below-diagonal or absent)
    r_t: np.ndarray
    r_nc: np.ndarray
    r_cum: np.ndarray  # [Pf+1] cumulative ns*nc
    r_dst: np.ndarray
    # CB output: per-front rect nb x L over ext columns; entry k of front
    # descriptor p maps Rt[t, ns+k//L, ns+k%L] -> cbx[offv[p]+k] (dump when
    # below the trapezoid)
    o_t: np.ndarray
    o_L: np.ndarray
    o_ns: np.ndarray
    o_offv: np.ndarray
    o_cum: np.ndarray  # [Pf+1] cumulative nb*L
    # solve-side maps
    row_src: np.ndarray  # [F, rp] gather into concat([z(m), cbz]) (-1 pad)
    c_dst: np.ndarray  # [F, kq] scatter Qᵀz rows: global member col or -1
    cbz_dst: np.ndarray  # [F, kq] scatter Qᵀz rows into cbz (-1 none)

    @property
    def dims(self):
        """Static expansion sizes for `_qr_front_body`."""
        return (self.F, self.rp, self.cp, int(self.cb_cum[-1]),
                int(self.r_cum[-1]), int(self.o_cum[-1]))


@dataclasses.dataclass
class QRMFPlan:
    m: int
    n: int
    rnz: int
    Rp: np.ndarray
    Ri: np.ndarray
    levels: List[List[QRFrontBucket]]  # buckets grouped by front-tree depth
    cb_total: int  # flat CB value-buffer length
    cbz_total: int  # flat CB rhs-buffer length
    q: Optional[np.ndarray]  # composed column order (committed to s.q)
    # pre-commit ordering — the one s.parent/pinv/cp/m2/lnz/unz describe;
    # REQUIRED by the host-exact fallbacks (see build_qr_mf_plan tail)
    q_host: Optional[np.ndarray] = None


def build_qr_mf_plan(a: Sprs, s: Symb, smax: int = 256) -> Optional[QRMFPlan]:
    """Build the multifrontal QR plan; composes s.q with the etree postorder
    (committed only on success). Returns None when not applicable.

    smax (chunk-merge bound for the column etree) trades front count
    against R fill. Measured on qrsol_3 (v5e, warm): smax=64 gives 81
    buckets / 47 levels and a 3.1 s factor; smax=256 gives 44 buckets /
    18 levels and a 1.64 s factor (fewer batched-QR calls, each
    MXU-denser) at +19% rnz — the device factor then beats the host
    C++ engine (2.9 s). 384/512 only shave ~0.1 s more (est) for more
    fill, so 256 is the default."""
    from ..ops.plan import col_ids

    m, n = a.m, a.n
    if n == 0 or m < n:
        return None
    parent = np.asarray(s.parent, dtype=np.int64)
    post = native.post(n, parent)
    q0 = np.asarray(s.q, dtype=np.int64) if s.q is not None else None
    if np.array_equal(post, np.arange(n)):
        qt = q0
        parent2 = parent
    else:
        if q0 is None:
            return None  # natural order must stay untouched (parity)
        qt = q0[post]
        pinv_post = np.empty(n, dtype=np.int64)
        pinv_post[post] = np.arange(n)
        parent2 = np.where(parent[post] >= 0,
                           pinv_post[np.clip(parent[post], 0, n - 1)], -1)
        # the relabeled postordered etree must itself be postordered
        chk = native.post(n, parent2)
        if not np.array_equal(chk, np.arange(n)):
            return None

    nz = a.nnz()
    arows = a.i[:nz].astype(np.int64)
    acols = col_ids(a.p, n)
    if qt is not None:
        qinv = np.empty(n, dtype=np.int64)
        qinv[qt] = np.arange(n)
        kcols = qinv[acols]
    else:
        kcols = acols
    leftmost = np.full(m, n, dtype=np.int64)
    np.minimum.at(leftmost, arows, kcols)

    # ---- greedy etree chunking into pruned subtrees ----------------------
    chunk_of = np.full(n, -1, dtype=np.int64)
    chunk_sz: List[int] = []
    chunk_children: List[List[int]] = []
    children_nodes: List[List[int]] = [[] for _ in range(n)]
    for k in range(n):
        p_ = parent2[k]
        if p_ >= 0:
            children_nodes[p_].append(k)
    for k in range(n):
        kids = children_nodes[k]
        best, bsz = -1, 0
        for c in kids:
            cid = int(chunk_of[c])
            if chunk_sz[cid] < smax and chunk_sz[cid] > bsz:
                best, bsz = cid, chunk_sz[cid]
        if best >= 0:
            chunk_of[k] = best
            chunk_sz[best] += 1
            for c in kids:
                if chunk_of[c] != best:
                    chunk_children[best].append(int(chunk_of[c]))
        else:
            chunk_of[k] = len(chunk_sz)
            chunk_sz.append(1)
            chunk_children.append([int(chunk_of[c]) for c in kids])
    nf = len(chunk_sz)
    members: List[List[int]] = [[] for _ in range(nf)]
    for k in range(n):
        members[int(chunk_of[k])].append(k)

    # ---- per-front structure (bottom-up in root order) -------------------
    akeys = kcols * np.int64(m) + arows
    aorder = np.argsort(akeys, kind="stable")
    akeys_s = akeys[aorder]

    def alookup(kc, rw):
        # LAST match on duplicate (i,j) entries (reference last-wins
        # assign semantics — see frontal._lookup; after sum_dupl the last
        # slot holds the sum)
        kq = np.asarray(kc) * np.int64(m) + np.asarray(rw)
        pos = np.clip(np.searchsorted(akeys_s, kq, side="right") - 1,
                      0, max(len(akeys_s) - 1, 0))
        ok = akeys_s[pos] == kq
        return np.where(ok, aorder[pos], -1)

    froot = np.array([max(mb) for mb in members])
    order = np.argsort(froot)
    lm_chunk = np.where(leftmost < n, chunk_of[np.clip(leftmost, 0, n - 1)], -1)
    E: List[np.ndarray] = [None] * nf
    Of: List[np.ndarray] = [None] * nf
    nrows = np.zeros(nf, dtype=np.int64)
    cb = np.zeros(nf, dtype=np.int64)
    flev = np.zeros(nf, dtype=np.int64)
    for fi_ in order:
        fi = int(fi_)
        mb = np.asarray(members[fi], dtype=np.int64)
        inS = np.zeros(n, dtype=bool)
        inS[mb] = True
        of = np.nonzero(lm_chunk == fi)[0]
        Of[fi] = of
        msk = np.isin(arows, of)
        ext = np.unique(kcols[msk][~inS[kcols[msk]]])
        for c in chunk_children[fi]:
            ec = E[c]
            ext = np.union1d(ext, ec[~inS[ec]])
        E[fi] = ext
        nr = int(len(of) + sum(cb[c] for c in chunk_children[fi]))
        ns = len(mb)
        nrows[fi] = max(nr, ns)  # pad zero rows for structural deficiency
        cb[fi] = min(max(nrows[fi] - ns, 0), len(ext))
        flev[fi] = (max((int(flev[c]) for c in chunk_children[fi]),
                        default=-1) + 1)

    # ---- R pattern (static CSC, diag LAST per column: usolve convention) --
    # vectorized: per front the (row=mb[i], col=cols_all[j], j >= i) upper-
    # trapezoid pairs, concatenated and counting-sorted into CSC (the
    # per-element append/sort formulation measured minutes at 8000-scale)
    r_rows_parts: List[np.ndarray] = []
    r_cols_parts: List[np.ndarray] = []
    for fi in range(nf):
        mb = np.asarray(members[fi], dtype=np.int64)
        ns_ = len(mb)
        ext_ = E[fi]
        cols_all = np.concatenate([mb, ext_]) if len(ext_) else mb
        nc_ = len(cols_all)
        if ns_ == 0:
            continue
        I = np.repeat(np.arange(ns_), nc_)
        J = np.tile(np.arange(nc_), ns_)
        keep = J >= I
        r_rows_parts.append(mb[I[keep]])
        r_cols_parts.append(cols_all[J[keep]])
    if r_rows_parts:
        r_rows = np.concatenate(r_rows_parts)
        r_cols = np.concatenate(r_cols_parts)
        order_ = np.lexsort((r_rows, r_cols))
        Ri = r_rows[order_]
        Rp = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(np.bincount(r_cols, minlength=n), out=Rp[1:])
    else:
        Ri = np.zeros(0, np.int64)
        Rp = np.zeros(n + 1, dtype=np.int64)
    rnz = int(Rp[n])
    rkeys = np.repeat(np.arange(n, dtype=np.int64), np.diff(Rp)) * n + Ri
    rorder = np.argsort(rkeys, kind="stable")
    rkeys_s = rkeys[rorder]

    def rlookup(col, row):
        kq = np.asarray(col) * np.int64(n) + np.asarray(row)
        pos = np.clip(np.searchsorted(rkeys_s, kq), 0, max(rnz - 1, 0))
        ok = rkeys_s[pos] == kq
        return np.where(ok, rorder[pos], -1)

    # ---- CB slot layout ---------------------------------------------------
    cb_off = np.zeros(nf + 1, dtype=np.int64)  # value entries: cb * |E|
    cbz_off = np.zeros(nf + 1, dtype=np.int64)  # rhs entries: cb
    for fi in range(nf):
        cb_off[fi + 1] = cb_off[fi] + int(cb[fi]) * len(E[fi])
        cbz_off[fi + 1] = cbz_off[fi] + int(cb[fi])

    # ---- buckets by (level, padded shape) --------------------------------
    nlev = int(flev.max()) + 1 if nf else 0
    level_buckets: List[List[QRFrontBucket]] = []
    for lev in range(nlev):
        fis = [fi for fi in range(nf) if flev[fi] == lev]
        bmap = {}
        for fi in fis:
            ncols = len(members[fi]) + len(E[fi])
            key = (_next_pow2(max(int(nrows[fi]), 1)),
                   _next_pow2(max(ncols, 1)))
            bmap.setdefault(key, []).append(fi)
        buckets = []
        for (rp, cp), bf in sorted(bmap.items()):
            F = len(bf)
            kq = min(rp, cp)
            a4 = ([], [], [], [])  # COO: f, r, c, pos (valid only)
            cbd = ([], [], [], [], [])  # t, offv, roff, L, cpos_off
            cpos_parts: List[np.ndarray] = []
            cb_lens: List[int] = []
            cpos_total = 0
            rd = ([], [])  # t, nc
            r_lens: List[int] = []
            r_dst_parts: List[np.ndarray] = []
            od = ([], [], [], [])  # t, L, ns, offv
            o_lens: List[int] = []
            row_src = np.full((F, rp), -1, dtype=np.int64)
            c_dst = np.full((F, kq), -1, dtype=np.int64)
            cbz_dst = np.full((F, kq), -1, dtype=np.int64)
            for t, fi in enumerate(bf):
                mb = np.asarray(members[fi], dtype=np.int64)
                ns = len(mb)
                ext = E[fi]
                cols_all = np.concatenate([mb, ext]) if len(ext) else mb
                nc = len(cols_all)
                of = Of[fi]
                no = len(of)
                if no:
                    pos = alookup(cols_all[None, :].repeat(no, 0),
                                  of[:, None].repeat(nc, 1))
                    vr, vc = np.nonzero(pos >= 0)
                    a4[0].append(np.full(len(vr), t, dtype=np.int64))
                    a4[1].append(vr)
                    a4[2].append(vc)
                    a4[3].append(pos[vr, vc])
                # child CBs stacked below the original rows: one compact
                # descriptor per (front, child) pair, expanded on device
                roff = no
                ca_order = np.argsort(cols_all, kind="stable")
                ca_sorted = cols_all[ca_order]
                for ci in chunk_children[fi]:
                    ec = E[ci]
                    nb = int(cb[ci])
                    L = len(ec)
                    if nb and L:
                        # every child-CB column is a column of this front
                        cposv = ca_order[np.searchsorted(ca_sorted, ec)]
                        cbd[0].append(t)
                        cbd[1].append(int(cb_off[ci]))
                        cbd[2].append(roff)
                        cbd[3].append(L)
                        cbd[4].append(cpos_total)
                        cpos_parts.append(cposv)
                        cpos_total += L
                        cb_lens.append(nb * L)
                    roff += nb
                # R scatter: per-front ns x nc rect, dump slot rnz below
                # the trapezoid / outside the pattern
                if ns:
                    I = np.repeat(np.arange(ns), nc)
                    J = np.tile(np.arange(nc), ns)
                    d = rlookup(cols_all[J], mb[I])
                    rd[0].append(t)
                    rd[1].append(nc)
                    r_lens.append(ns * nc)
                    r_dst_parts.append(np.where((J >= I) & (d >= 0), d,
                                                rnz))
                # CB output: nb x L rect over ext columns (below-trapezoid
                # lanes route to the cbx dump slot on device)
                nb = int(cb[fi])
                L = len(ext)
                if nb and L:
                    od[0].append(t)
                    od[1].append(L)
                    od[2].append(ns)
                    od[3].append(int(cb_off[fi]))
                    o_lens.append(nb * L)
                # solve maps
                row_src[t, :no] = of
                roff = no
                for ci in chunk_children[fi]:
                    nbc = int(cb[ci])
                    row_src[t, roff : roff + nbc] = (
                        m + cbz_off[ci] + np.arange(nbc))
                    roff += nbc
                c_dst[t, :ns] = mb
                cbz_dst[t, ns : ns + nb] = cbz_off[fi] + np.arange(nb)

            def cat(parts):
                return (np.concatenate(parts) if parts
                        else np.zeros(0, np.int64))

            def i64(v):
                return np.asarray(v, dtype=np.int64)

            def cum(lens):
                c_ = np.zeros(len(lens) + 1, dtype=np.int64)
                np.cumsum(i64(lens), out=c_[1:])
                return c_

            buckets.append(QRFrontBucket(
                F=F, rp=rp, cp=cp, kq=kq,
                a_f=cat(a4[0]), a_r=cat(a4[1]), a_c=cat(a4[2]),
                a_pos=cat(a4[3]),
                cb_t=i64(cbd[0]), cb_offv=i64(cbd[1]), cb_roff=i64(cbd[2]),
                cb_L=i64(cbd[3]), cb_cpos_off=i64(cbd[4]),
                cpos=cat(cpos_parts), cb_cum=cum(cb_lens),
                r_t=i64(rd[0]), r_nc=i64(rd[1]), r_cum=cum(r_lens),
                r_dst=cat(r_dst_parts),
                o_t=i64(od[0]), o_L=i64(od[1]), o_ns=i64(od[2]),
                o_offv=i64(od[3]), o_cum=cum(o_lens),
                row_src=row_src, c_dst=c_dst, cbz_dst=cbz_dst,
            ))
        level_buckets.append(buckets)
    if qt is not None:
        s.q = qt  # commit composed ordering
    plan = QRMFPlan(m=m, n=n, rnz=rnz, Rp=Rp, Ri=Ri, levels=level_buckets,
                    cb_total=int(cb_off[nf]), cbz_total=int(cbz_off[nf]),
                    q=qt)
    # The commit above rebinds s.q to the postorder-composed ordering, but
    # s.parent/pinv/cp/m2/lnz/unz still describe the PRE-commit q0 — the
    # host engine's qr walks out of bounds (segfault) if fed the mixed
    # tuple. Keep q0 on the plan so the host-exact fallbacks
    # (solve._qr_ls_host_exact/_qr_mn_host_exact) can use the consistent
    # set. (Round-5 fix: the acceptance-gate fallback crashed the process
    # on TPU, where the f32 tree trips the gate and CPU's f64 never does.)
    plan.q_host = q0
    return plan


def _expand(cumv, T):
    """k -> (descriptor index p, offset within descriptor) for the flat
    entry streams: the on-device inverse of the host-side concatenation."""
    k = jax.lax.iota(jnp.int32, T)
    p = jnp.searchsorted(cumv, k, side="right").astype(jnp.int32) - 1
    return k, p, k - cumv[p]


def _qr_front_body(Rx, cbx, Ax, dev, dims):
    """One bucket's batched front factorization, traced.

    `dev`: the compact descriptor arrays (`_prep_qr_indices`); `dims` the
    STATIC expansion sizes (F, rp, cp, Tcb, Tr, Tout). The index streams
    the gathers/scatters need are generated here with iota/searchsorted
    arithmetic — nothing bigger than `r_dst`/`cpos` ever crosses the
    host->device boundary (at qrsol_3 scale: ~40 MB uploaded vs the ~3 GB
    the materialized streams measured)."""
    (F, rp, cp, Tcb, Tr, Tout) = dims
    (af, ar, ac, apos,
     cb_t, cb_offv, cb_roff, cb_L, cb_cpos_off, cposv, cb_cum,
     r_t, r_nc, r_cum, r_dst,
     o_t, o_L, o_ns, o_offv, o_cum) = dev
    ft = Rx.dtype
    Fm = (jnp.zeros((F, rp, cp), ft)
          .at[af, ar, ac].set(Ax[apos], mode="drop"))
    if Tcb:
        _, p, off = _expand(cb_cum, Tcb)
        L = cb_L[p]
        bi = off // L
        j = off - bi * L
        Fm = Fm.at[cb_t[p], cb_roff[p] + bi,
                   cposv[cb_cpos_off[p] + j]].add(
            cbx[cb_offv[p] + off], mode="drop")
    # thin QR: Q [rp, kq] (all the columns the solve ever touches) and the
    # upper-trapezoid Rt [kq, cp] holding both R rows and the CB block
    Q, Rt = jax.lax.linalg.qr(Fm, full_matrices=False)
    if Tr:
        _, p, off = _expand(r_cum, Tr)
        nc = r_nc[p]
        i = off // nc
        Rx = Rx.at[r_dst].set(Rt[r_t[p], i, off - i * nc], mode="drop")
    if Tout:
        _, p, off = _expand(o_cum, Tout)
        L = o_L[p]
        bi = off // L
        j = off - bi * L
        dst = jnp.where(j >= bi, o_offv[p] + off, cbx.shape[0] - 1)
        cbx = cbx.at[dst].set(Rt[o_t[p], o_ns[p] + bi, o_ns[p] + j],
                              mode="drop")
    return Rx, cbx, Q


def _plan_dims(plan: QRMFPlan):
    """Tuple of per-bucket static dims, flat bucket order (hashable — used
    as a static jit argument)."""
    d = plan.__dict__.get("_dims")
    if d is None:
        d = tuple(b.dims for lev in plan.levels for b in lev)
        plan.__dict__["_dims"] = d
    return d


def _prep_qr_indices(plan: QRMFPlan):
    def j32(t):
        return jnp.asarray(np.asarray(t, np.int32))

    j = jnp.asarray
    for lev in plan.levels:
        for b in lev:
            if b.__dict__.get("_dev") is None:
                b.__dict__["_dev"] = tuple(j32(t) for t in (
                    b.a_f, b.a_r, b.a_c, b.a_pos,
                    b.cb_t, b.cb_offv, b.cb_roff, b.cb_L, b.cb_cpos_off,
                    b.cpos, b.cb_cum,
                    b.r_t, b.r_nc, b.r_cum, b.r_dst,
                    b.o_t, b.o_L, b.o_ns, b.o_offv, b.o_cum))
            if b.__dict__.get("_sdev") is None:
                b.__dict__["_sdev"] = (j(b.row_src), j(b.c_dst), j(b.cbz_dst))


def _qr_factor_dtype():
    """Front-kernel value dtype. f32 on accelerators (batched f64
    lax.linalg.qr measured [7,2048,2048]: 3.0 s warm / 127 s compile vs
    0.054 s / 14.5 s in f32 on v5e — f64 is software-emulated); f64 on CPU
    for exact reference parity in tests."""
    from ..config import config

    opt = getattr(config, "qr_factor_dtype", "auto")
    if opt == "float64":
        return jnp.float64
    if opt == "float32":
        return jnp.float32
    return jnp.float64 if jax.default_backend() == "cpu" else jnp.float32


def _bucket_entries(b: QRFrontBucket) -> int:
    F, rp, cp, tcb, tr, tout = b.dims
    return int(F * rp * cp + 4 * tcb + 4 * tr + 4 * tout)


def _qr_plan_index_entries(plan: QRMFPlan) -> int:
    return sum(_bucket_entries(b) for lev in plan.levels for b in lev)


# A chunk's inlined batched-QR count also bounds its compile size (each
# distinct front shape expands into a blocked Householder program).
_CHUNK_BUCKETS = 16


def _qr_chunks(plan: QRMFPlan):
    """Partition the flat bucket list into compile-bounded chunks.

    One program over ALL buckets at qrsol_3 scale (81 buckets, 370M index
    entries) compiled for >30 min through the remote TPU tunnel; chunks
    bounded by frontal.fuse_entry_cap() keep each program's compile
    tractable and persistent-cacheable while still amortizing launch
    latency over many fronts. Sequential chunk execution preserves the
    level order, so inter-front dependencies are safe at any cut."""
    ch = plan.__dict__.get("_chunks")
    if ch is None:
        from .frontal import fuse_entry_cap

        cap = fuse_entry_cap()
        flat = [b for lev in plan.levels for b in lev]
        ch, cur, acc = [], [], 0
        for bi, b in enumerate(flat):
            sz = _bucket_entries(b)
            if cur and (acc + sz > cap or len(cur) >= _CHUNK_BUCKETS):
                ch.append(cur)
                cur, acc = [], 0
            cur.append(bi)
            acc += sz
        if cur:
            ch.append(cur)
        plan.__dict__["_chunks"] = ch
    return ch


@partial(jax.jit, donate_argnums=(1, 2), static_argnums=(4,))
def _qr_chunk_run(Ax, Rx, cbx, devs, dimss):
    # descriptor tensors flow in as ARGUMENTS (a pytree), not closure
    # captures — captured jnp arrays are baked into the executable as
    # constants, slowing compiles badly; `dimss` (per-bucket static
    # expansion sizes) rides as a static argument
    qs = []
    for dev, dims in zip(devs, dimss):
        Rx, cbx, Q = _qr_front_body(Rx, cbx, Ax, dev, dims)
        qs.append(Q)
    return Rx, cbx, tuple(qs)


# Cache a DENSE R^{-1} when the factor is f32 and n^2 f32 fits this budget:
# the R level schedule is deep (qrsol_3: nlev=2420) and even the Pallas
# VMEM sweep pays ~12 us/level, so each R application costs ~30 ms; with
# the precomputed inverse it is ONE [n, n] MXU matmul (~0.5 ms at n=8000).
# The f32 inverse's rounding is covered by the drivers' f64 CSNE/residual
# refinement, exactly like the front factors themselves.
DENSE_RINV_MAX_BYTES = 512 * 1024 * 1024
DENSE_RINV_MIN_N = 512


@partial(jax.jit, static_argnames=("n",))
def _dense_rinv_kern(Rx, ri, cind, n: int):
    U = jnp.zeros((n, n), Rx.dtype).at[ri, cind].set(Rx[:-1], mode="drop")
    d = jnp.diagonal(U)
    ar = jnp.arange(n)
    # structural zero pivots become unit pivots (the refinement/fallback
    # chain owns rank deficiency, mirroring the sweep path's behavior)
    U = U.at[ar, ar].set(jnp.where(d == 0, jnp.ones((), U.dtype), d))
    return jax.lax.linalg.triangular_solve(
        U, jnp.eye(n, dtype=U.dtype), left_side=True, lower=False)


def _maybe_dense_rinv(plan: QRMFPlan, Rx, fdt):
    if (fdt != jnp.float32 or plan.n < DENSE_RINV_MIN_N
            or 4 * plan.n * plan.n > DENSE_RINV_MAX_BYTES):
        return None
    pat = plan.__dict__.get("_rinv_pat")
    if pat is None:
        cind = np.repeat(np.arange(plan.n, dtype=np.int64),
                         np.diff(plan.Rp))
        pat = (jnp.asarray(np.asarray(plan.Ri, np.int64)),
               jnp.asarray(cind))
        plan.__dict__["_rinv_pat"] = pat
    return _dense_rinv_kern(Rx, pat[0], pat[1], plan.n)


def qr_mf(a: Sprs, s: Symb, plan: QRMFPlan):
    """Factor on device; caches per-front Q blocks + R values on the plan.

    TPU-first shape (round 4): fronts factor in `_qr_factor_dtype()` (f32
    on accelerators, f64 on CPU), and the tree runs as CHUNKED fused
    programs (`_qr_chunks`) instead of one monolithic trace. The qrsol
    drivers recover f64 accuracy with fused refinement when the factor is
    f32 (see `qrsol_mf_ls` / `qrsol_mf_mn`). On TPU a dense R^{-1} is also
    cached (see `_maybe_dense_rinv`) so every R application in the solve
    programs is one MXU matmul instead of a deep level sweep.

    Returns (Rp, Ri, Rx) — R in static CSC (diag last per column)."""
    from ..config import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    _prep_qr_indices(plan)
    fdt = _qr_factor_dtype()
    nz = a.nnz()
    Ax = jnp.asarray(a.x[:nz], fdt)
    # refreshed on every (re)factor: the drivers' fused refinement computes
    # the f64 residual against the CURRENT values (sym-reuse safe)
    plan.__dict__["_resid_ax"] = jnp.asarray(a.x[:nz], jnp.float64)
    flat = [b.__dict__["_dev"] for lev in plan.levels for b in lev]
    dims = _plan_dims(plan)
    Rx = jnp.zeros(plan.rnz + 1, dtype=fdt)
    cbx = jnp.zeros(plan.cb_total + 1, dtype=fdt)
    qs: list = []
    for ck in _qr_chunks(plan):
        Rx, cbx, qck = _qr_chunk_run(Ax, Rx, cbx, [flat[i] for i in ck],
                                     tuple(dims[i] for i in ck))
        qs.extend(qck)
    plan.__dict__["_cache_q"] = tuple(qs)
    plan.__dict__["_cache_rx"] = Rx
    plan.__dict__["_cache_rinv"] = _maybe_dense_rinv(plan, Rx, fdt)
    return plan.Rp, plan.Ri, np.asarray(Rx[: plan.rnz], np.float64)


def _qt_apply(plan: QRMFPlan, z, qs, sdevs):
    """c = (Qᵀ z) restricted to R rows; z is [m, B]."""
    B = z.shape[1]
    ft = z.dtype
    cvec = jnp.zeros((plan.n + 1, B), ft)
    cbz = jnp.zeros((plan.cbz_total + 1, B), ft)
    qi = 0
    for (row_src, c_dst, cbz_dst) in sdevs:
        zcat = jnp.concatenate([z, cbz])
        src = jnp.where(row_src >= 0, row_src, z.shape[0] + plan.cbz_total)
        zf = zcat[jnp.clip(src, 0, zcat.shape[0] - 1)]
        zf = jnp.where((row_src >= 0)[..., None], zf, 0.0)
        Q = qs[qi]
        qi += 1
        y = jnp.einsum("frk,frb->fkb", Q, zf)
        cvec = cvec.at[jnp.where(c_dst >= 0, c_dst, plan.n)].set(
            jnp.where((c_dst >= 0)[..., None], y, 0.0), mode="drop")
        cbz = cbz.at[jnp.where(cbz_dst >= 0, cbz_dst, plan.cbz_total)].set(
            jnp.where((cbz_dst >= 0)[..., None], y, 0.0), mode="drop")
    return cvec[: plan.n]


def _q_apply(plan: QRMFPlan, w, qs, sdevs):
    """z = Q [w; 0] — reverse traversal (minimum-norm branch). w is [n, B]."""
    B = w.shape[1]
    ft = w.dtype
    z = jnp.zeros((plan.m + 1, B), ft)
    cbz = jnp.zeros((plan.cbz_total + 1, B), ft)
    flat = [b for lev in plan.levels for b in lev]
    for bi in range(len(flat) - 1, -1, -1):
        b = flat[bi]
        row_src, c_dst, cbz_dst = sdevs[bi]
        Q = qs[bi]
        wcat = jnp.concatenate([w, jnp.zeros((1, B), ft)])
        u1 = wcat[jnp.clip(jnp.where(c_dst >= 0, c_dst, plan.n), 0, plan.n)]
        u1 = jnp.where((c_dst >= 0)[..., None], u1, 0.0)
        cbcat = jnp.concatenate([cbz, jnp.zeros((1, B), ft)])
        u2 = cbcat[jnp.clip(jnp.where(cbz_dst >= 0, cbz_dst,
                                      plan.cbz_total), 0, plan.cbz_total)]
        u2 = jnp.where((cbz_dst >= 0)[..., None], u2, 0.0)
        u = u1 + u2
        zf = jnp.einsum("frk,fkb->frb", Q, u)
        is_row = (b.row_src >= 0) & (b.row_src < plan.m)
        is_cb = b.row_src >= plan.m
        rdst = jnp.asarray(np.where(is_row, b.row_src, plan.m))
        z = z.at[rdst].set(jnp.where(jnp.asarray(is_row)[..., None], zf,
                                     z[rdst]), mode="drop")
        cdst = jnp.asarray(np.where(is_cb, b.row_src - plan.m,
                                    plan.cbz_total))
        cbz = cbz.at[cdst].set(jnp.where(jnp.asarray(is_cb)[..., None], zf,
                                         cbz[cdst]), mode="drop")
    return z[: plan.m]


def _use_pallas_sweeps(n: int, fdt) -> bool:
    """Route the solve's R sweeps through the Pallas VMEM kernel: the R
    schedule is DEEP (qrsol_3: nlev=2420) and the XLA level loop pays
    per-level padded work — measured ~0.5 s/sweep vs ~30 ms for the
    Pallas kernel. f32 factors on TPU only (serve_mixed == "force" runs
    the interpreter for CPU tests, mirroring the serve handles)."""
    from ..config import config
    from ..ops.sptrsv_pallas import pallas_sweep_available

    if fdt != jnp.float32 or not config.use_pallas:
        return False
    if not pallas_sweep_available(n, 1, np.float32):
        return False
    return jax.default_backend() == "tpu" or config.serve_mixed == "force"


def _pallas_sweep_args(tp):
    """Device-resident schedule streams for `_sweep_call`, cached on the
    TriPlan. Value streams stay POSITIONS (epos/cdiag): ev/dv are gathered
    from the live Rx inside the solve program, so refactoring with new
    values never invalidates these."""
    cached = tp.__dict__.get("_qr_pal_args")
    if cached is None:
        from ..ops.sptrsv_pallas import _streams

        st = _streams(tp)
        j = jnp.asarray
        cached = dict(eoff=j(st["eoff"]), coff=j(st["coff"]),
                      epos=j(st["epos"]), erow=j(st["erow"]),
                      ecol=j(st["ecol"]), eslot=j(st["eslot"]),
                      cdiag=j(st["cdiag"]), cid=j(st["cid"]))
        tp.__dict__["_qr_pal_args"] = cached
    return cached


def _r_sweeps(plan, Rv, pal, fdt, specs):
    """Sweep closures over the live R values for the solve programs.

    specs: [(TriPlan, tridev, pal_args_or_None, scatter_form), ...];
    every returned closure maps [n, B] -> [n, B] in the factor dtype.
    Pallas VMEM kernels when `pal` — the XLA level loop pays nlev padded
    steps per sweep (~0.5 s on qrsol_3's nlev=2420 R schedule vs ~30 ms
    for the kernel); ev/dv are gathered from the live Rv inside the
    program, so refactored values flow through without rebuilding."""
    out = []
    if pal:
        from ..ops.sptrsv_pallas import _sweep_call

        n_pad = -(-(plan.n + 1) // 8) * 8
        interpret = jax.default_backend() != "tpu"
        Rf = Rv.astype(jnp.float32)
        for tp, tridev, args, scatter in specs:
            wp = max(-(-tp.wmax // 8) * 8, 8)
            with jax.enable_x64(False):
                call = _sweep_call(tp.nlev, n_pad, 1, wp, scatter,
                                   interpret)

            def sweep(c, call=call, args=args, scatter=scatter):
                ev = Rf[args["epos"]]
                dv = Rf[args["cdiag"]]
                eb = args["ecol"] if scatter else args["eslot"]
                Xp = (jnp.zeros((n_pad, 1), jnp.float32)
                      .at[: plan.n].set(c.astype(jnp.float32)))
                with jax.enable_x64(False):
                    o = call(args["eoff"], args["coff"], ev, args["erow"],
                             eb, dv, args["cid"], Xp)
                return o[: plan.n]

            out.append(sweep)
    else:
        from ..solve import _tri_sweep_multi

        for tp, tridev, args, scatter in specs:

            def sweep(c, tp=tp, tridev=tridev, scatter=scatter):
                return _tri_sweep_multi(Rv, c.astype(fdt), *tridev,
                                        tp.nlev, tp.emax, tp.wmax,
                                        plan.n, scatter)

            out.append(sweep)
    return out


def _resid_pattern(plan: QRMFPlan, A: Sprs):
    """Cached (rows, colind) int device arrays of the FACTORED matrix's
    pattern, for the fused f64 residual SpMV inside the solve programs."""
    idx = plan.__dict__.get("_resid_pat")
    if idx is None:
        nz = A.nnz()
        p = np.asarray(A.p[: A.n + 1], np.int64)
        colind = np.repeat(np.arange(A.n, dtype=np.int64), np.diff(p))
        idx = (jnp.asarray(np.asarray(A.i[:nz], np.int64)),
               jnp.asarray(colind))
        plan.__dict__["_resid_pat"] = idx
    return idx


_RESID_PAD_MAX = 64


def _resid_padded(plan: QRMFPlan, A: Sprs):
    """Padded entry-index maps of A for the fused residual/gradient SpMVs:
    row-major `pr` [m, kr] and column-major `pc` [n, kc] entry positions
    (-1 pad), EACH side built only when its max degree is <= 64. With them
    the refinement's r = b - A x and g = A'r run as masked gather+einsum
    rows instead of COO scatter-adds (~160 ns/element on TPU). A denser
    side stays scatter-form: a [8000, 328] padded gather MEASURED 5x
    slower than the scatter it replaced (TPU row gathers at that width
    lower poorly), so padding is strictly degree-bounded. Returns
    (pr_or_None, pc_or_None), or None when neither side qualifies."""
    pad = plan.__dict__.get("_resid_padded", "unset")
    if pad == "unset":
        nz = A.nnz()
        rows = np.asarray(A.i[:nz], np.int64)
        p = np.asarray(A.p[: A.n + 1], np.int64)
        ccnt = np.diff(p)
        rcnt = np.bincount(rows, minlength=A.m)
        kr, kc = int(rcnt.max()) if nz else 1, int(ccnt.max()) if nz else 1
        ar = np.arange(nz)
        pr = pc = None
        if kr <= _RESID_PAD_MAX:
            rord = np.argsort(rows, kind="stable")
            roffs = np.zeros(A.m + 1, np.int64)
            np.cumsum(rcnt, out=roffs[1:])
            prh = np.full((A.m, max(kr, 1)), -1, np.int64)
            prh[rows[rord], ar - roffs[rows[rord]]] = rord
            pr = jnp.asarray(prh.astype(np.int32))
        if kc <= _RESID_PAD_MAX:
            pch = np.full((A.n, max(kc, 1)), -1, np.int64)
            pch[np.repeat(np.arange(A.n), ccnt),
                ar - np.repeat(p[:-1], ccnt)] = ar
            pc = jnp.asarray(pch.astype(np.int32))
        pad = None if (pr is None and pc is None) else (pr, pc)
        plan.__dict__["_resid_padded"] = pad
    return pad


def qrsol_mf_ls(a: Sprs, s: Symb, plan: QRMFPlan, b: np.ndarray) -> np.ndarray:
    """Least-squares solve (m >= n): x = R^{-1} (Qᵀ b)[:n], then ipvec(q).

    Requires a preceding qr_mf. Returns x [n] in the PERMUTED column order
    (the driver applies s.q). When the factor is f32 (accelerator default,
    see `_qr_factor_dtype`) the program appends `config.qr_refine` fused
    CSNE refinement steps xp += R⁻¹R⁻ᵀ·(A'(b - A x))_q — corrected
    seminormal equations, Björck. The gradient A'(b - Ax) is computed in
    f64 on device, so unlike Qᵀ-based refinement there is no
    eps32·‖r*‖/σmin floor from the nonzero optimal LS residual; the f32
    sweeps contract the error by ~κ²·eps32 per step. The whole solve stays
    ONE launch."""
    from ..config import config
    from ..solve import tri_plan, _tri_sweep_multi, _plan_dev

    qs = plan.__dict__.get("_cache_q")
    if qs is None:
        raise RuntimeError("qrsol_mf_ls requires a preceding qr_mf")
    Rx = plan.__dict__["_cache_rx"]
    fdt = Rx.dtype
    nref = 0 if fdt == jnp.float64 else max(0, int(config.qr_refine))
    rinv = plan.__dict__.get("_cache_rinv")
    if plan.__dict__.get("_rtri") is None and rinv is None:
        rmat = Sprs(plan.rnz, plan.n, plan.n, plan.Rp, plan.Ri,
                    np.zeros(plan.rnz))
        tp = tri_plan(rmat, 1)
        _plan_dev(tp)
        plan.__dict__["_rtri"] = tp
    if nref and rinv is None and plan.__dict__.get("_rtri_t") is None:
        rmat = Sprs(plan.rnz, plan.n, plan.n, plan.Rp, plan.Ri,
                    np.zeros(plan.rnz))
        tp = tri_plan(rmat, 3)  # utsolve for the R⁻ᵀ half of CSNE
        _plan_dev(tp)
        plan.__dict__["_rtri_t"] = tp
    pal = rinv is None and _use_pallas_sweeps(plan.n, fdt)
    key = f"_solve_jit_{np.dtype(fdt)}_{nref}_{pal}_{rinv is not None}"
    fn = plan.__dict__.get(key)
    if fn is None:

        def run(b64, Rx, qs_, sdevs, tridev, tridev_t, pu, pt, ai, acol,
                ax, rpad, *rinv_opt):
            if rinv_opt:  # dense R^{-1}: each application is one matmul
                Ri_ = rinv_opt[0]

                def usolve(c):
                    return jnp.matmul(Ri_, c.astype(fdt),
                                      precision="highest")

                def utsolve(g):
                    return jnp.matmul(Ri_.T, g.astype(fdt),
                                      precision="highest")
            else:
                tp_ = plan.__dict__["_rtri"]
                tpt = plan.__dict__.get("_rtri_t")
                Rv = Rx[: plan.rnz]
                specs = [(tp_, tridev, pu, True)]
                if nref:
                    specs.append((tpt, tridev_t, pt, False))
                sweeps = _r_sweeps(plan, Rv, pal, fdt, specs)
                usolve = sweeps[0]
                utsolve = sweeps[1] if nref else None

            pr = pc = jq_ = colseg = None
            if rpad is not None:
                # per-side padded gather forms (see _resid_padded); jq_
                # maps permuted slot c -> original column q[c]; colseg is
                # the (sorted, CSC-order) original column id per entry
                pr, pc, jq_, colseg, gscale = rpad
            if pr is not None:
                prc = jnp.clip(pr, 0, None)
                axr = jnp.where(pr >= 0, ax[prc], 0.0)
                colr = acol[prc]  # permuted col per row-entry slot

                def resid(xp):
                    return b64 - jnp.einsum("mk,mk->m", axr, xp[colr])
            else:
                def resid(xp):
                    return b64 - (jnp.zeros(plan.m, jnp.float64)
                                  .at[ai].add(ax * xp[acol]))
            if pc is not None:
                pcc = jnp.clip(pc, 0, None)
                axc = jnp.where(pc >= 0, ax[pcc], 0.0)
                rowc = ai[pcc]

                def grad(r):
                    gq = jnp.einsum("nk,nk->n", axc, r[rowc])
                    # pc is column-major in ORIGINAL order; permuted slot c
                    # holds original column q[c] — a pure gather
                    return gq[jq_]
            elif colseg is not None:
                def grad(r):
                    # entries are CSC-sorted by column: a SORTED segment
                    # reduction lowers far better than the random scatter
                    gq = jax.ops.segment_sum(ax * r[ai], colseg,
                                             num_segments=plan.n,
                                             indices_are_sorted=True)
                    return gq[jq_]
            else:
                def grad(r):
                    return (jnp.zeros(plan.n, jnp.float64)
                            .at[acol].add(ax * r[ai]))

            c = _qt_apply(plan, b64.astype(fdt)[:, None], qs_, sdevs)
            xp = usolve(c)[:, 0].astype(jnp.float64)
            g = grad(resid(xp))
            gmax0 = jnp.max(jnp.abs(g))
            if not nref:
                return xp, gmax0

            # early-exit KEEP-BEST refinement on the f64 LS-optimality
            # gradient A'(b - Ax): CSNE contracts by ~kappa^2*eps32 per
            # step, which DIVERGES for ill-conditioned systems — the
            # keep-best guard makes extra steps harmless and the returned
            # best gradient norm lets the caller accept or fall back to
            # the exact host path (advisor r4 high: a fixed 3-step loop
            # could silently return a diverged iterate).
            def cond(st):
                _, _, k, gmax, prev = st
                return ((k < nref) & (gmax > 1e-14 * gscale)
                        & (gmax < prev))

            def body(st):
                xp, g, k, gmax, _ = st
                dx = usolve(utsolve(g[:, None]))[:, 0]
                x2 = xp + dx.astype(jnp.float64)
                g2 = grad(resid(x2))
                g2max = jnp.max(jnp.abs(g2))
                better = g2max < gmax
                xp = jnp.where(better, x2, xp)
                g = jnp.where(better, g2, g)
                return (xp, g, k + 1, jnp.minimum(g2max, gmax), gmax)

            xp, g, _, gmax, _ = jax.lax.while_loop(
                cond, body, (xp, g, 0, gmax0, jnp.inf))
            return xp, gmax

        fn = jax.jit(run)
        plan.__dict__[key] = fn
    pu = _pallas_sweep_args(plan.__dict__["_rtri"]) if pal else None
    pt = (_pallas_sweep_args(plan.__dict__["_rtri_t"])
          if pal and nref else None)
    rinv_opt = (rinv,) if rinv is not None else ()
    ai, colind = _resid_pattern(plan, a)
    # x lives in PERMUTED column order: x_orig[c] = xp[jq[c]] with jq the
    # inverse of s.q, folded into the gather index once per plan
    acol = plan.__dict__.get("_resid_acol")
    if acol is None:
        q = (np.asarray(s.q, np.int64) if s.q is not None
             else np.arange(a.n, dtype=np.int64))
        jq = np.empty(a.n, np.int64)
        jq[q] = np.arange(a.n)
        acol = jnp.asarray(jq[np.asarray(colind)])
        plan.__dict__["_resid_acol"] = acol
    z = jnp.asarray(np.asarray(b, dtype=np.float64))
    sdevs = [b_.__dict__["_sdev"] for lev in plan.levels for b_ in lev]
    if rinv is None:
        tridev = _plan_dev(plan.__dict__["_rtri"])
        tridev_t = (_plan_dev(plan.__dict__["_rtri_t"]) if nref
                    else tridev)
    else:
        tridev = tridev_t = None
    rpad = None
    if nref:
        pads = _resid_padded(plan, a) or (None, None)
        qdev = plan.__dict__.get("_resid_qcol")
        if qdev is None:
            q_ = (np.asarray(s.q, np.int64) if s.q is not None
                  else np.arange(a.n, dtype=np.int64))
            qdev = jnp.asarray(q_)
            plan.__dict__["_resid_qcol"] = qdev
        csdev = plan.__dict__.get("_resid_colseg")
        if csdev is None:
            csdev = jnp.asarray(np.repeat(
                np.arange(a.n, dtype=np.int32),
                np.diff(np.asarray(a.p[: a.n + 1], np.int64))))
            plan.__dict__["_resid_colseg"] = csdev
        # gscale = max|A'b| computed HOST-side (one O(nnz) pass) so the
        # trace needs no extra gradient evaluation
        nz_ = a.nnz()
        colind_h = np.repeat(np.arange(a.n),
                             np.diff(np.asarray(a.p[: a.n + 1], np.int64)))
        bh = np.asarray(b, np.float64)
        g0 = np.zeros(a.n)
        np.add.at(g0, colind_h, np.asarray(a.x[:nz_], np.float64)
                  * bh[np.asarray(a.i[:nz_], np.int64)])
        gscale = jnp.asarray(max(1.0, float(np.abs(g0).max())))
        rpad = (pads[0], pads[1], qdev, csdev, gscale)
    x, gmax = fn(z, Rx, qs, sdevs, tridev, tridev_t,
                 pu, pt, ai, acol, plan.__dict__["_resid_ax"], rpad,
                 *rinv_opt)
    # gmax: best achieved f64 LS-optimality gradient max (None-equivalent
    # check is nref==0 — f64 factor needs no gate)
    return np.asarray(x), (float(gmax) if nref else None)


def qrsol_mf_mn(at: Sprs, s: Symb, plan: QRMFPlan, b: np.ndarray) -> np.ndarray:
    """Minimum-norm solve through the tree built on Aᵀ (reference
    underdetermined branch, src/lib.rs:943-955): x = Q [R^{-T} b_q ; 0].

    `plan` is the QR plan of Aᵀ (so plan.m = original n); `b` has length
    plan.n (= original m). Returns x [plan.m] in original row order. When
    the factor is f32 the program appends `config.qr_refine` fused
    refinement steps x += S((b - A x)_q), keeping x in range(Aᵀ) (S maps
    through Q's columns) so the minimum-norm property is preserved."""
    from ..config import config
    from ..solve import tri_plan, _tri_sweep_multi, _plan_dev

    qs = plan.__dict__.get("_cache_q")
    if qs is None:
        raise RuntimeError("qrsol_mf_mn requires a preceding qr_mf")
    Rx = plan.__dict__["_cache_rx"]
    fdt = Rx.dtype
    nref = 0 if fdt == jnp.float64 else max(0, int(config.qr_refine))
    rinv = plan.__dict__.get("_cache_rinv")
    if plan.__dict__.get("_rtri_t") is None and rinv is None:
        rmat = Sprs(plan.rnz, plan.n, plan.n, plan.Rp, plan.Ri,
                    np.zeros(plan.rnz))
        tp = tri_plan(rmat, 3)  # utsolve: Rᵀ y = c
        _plan_dev(tp)
        plan.__dict__["_rtri_t"] = tp
    pal = rinv is None and _use_pallas_sweeps(plan.n, fdt)
    key = f"_solve_mn_jit_{np.dtype(fdt)}_{nref}_{pal}_{rinv is not None}"
    fn = plan.__dict__.get(key)
    if fn is None:

        def run(b64, Rx, qs_, sdevs, tridev, pt, ati, acol, ax, qd,
                *rinv_opt):
            if rinv_opt:  # dense R^{-T}: one matmul per application
                Ri_ = rinv_opt[0]

                def utsolve(c):
                    return jnp.matmul(Ri_.T, c.astype(fdt),
                                      precision="highest")
            else:
                tp_ = plan.__dict__["_rtri_t"]
                utsolve, = _r_sweeps(plan, Rx[: plan.rnz], pal, fdt,
                                     [(tp_, tridev, pt, False)])

            def S(rq):
                y = utsolve(rq.astype(fdt)[:, None])
                return _q_apply(plan, y, qs_, sdevs)[:, 0]

            def resid(x):
                # A = atᵀ: (A x)[c] = Σ_{k ∈ at col c} at.x[k]·x[at.i[k]];
                # at's entries are CSC-sorted by column, so this is a
                # SORTED segment reduction (lowering far better than the
                # equivalent random scatter-add)
                y = jax.ops.segment_sum(ax * x[ati], acol,
                                        num_segments=plan.n,
                                        indices_are_sorted=True)
                return b64 - y

            x = S(b64[qd]).astype(jnp.float64)
            r = resid(x)
            rmax0 = jnp.max(jnp.abs(r))
            if not nref:
                return x, rmax0
            scale = jnp.maximum(jnp.max(jnp.abs(b64)), 1.0)

            # early-exit keep-best refinement on the f64 residual (the
            # system is consistent in the minimum-norm branch); the best
            # residual max returns to the caller for accept/fallback
            # (advisor r4 high — no silent divergence)
            def cond(st):
                _, _, k, rmax, prev = st
                return ((k < nref) & (rmax > 1e-14 * scale)
                        & (rmax < prev))

            def body(st):
                x, r, k, rmax, _ = st
                x2 = x + S(r[qd]).astype(jnp.float64)
                r2 = resid(x2)
                r2max = jnp.max(jnp.abs(r2))
                better = r2max < rmax
                x = jnp.where(better, x2, x)
                r = jnp.where(better, r2, r)
                return (x, r, k + 1, jnp.minimum(r2max, rmax), rmax)

            x, r, _, rmax, _ = jax.lax.while_loop(
                cond, body, (x, r, 0, rmax0, jnp.inf))
            return x, rmax

        fn = jax.jit(run)
        plan.__dict__[key] = fn
    pt = _pallas_sweep_args(plan.__dict__["_rtri_t"]) if pal else None
    ati, acol = _resid_pattern(plan, at)
    qd = plan.__dict__.get("_resid_q")
    if qd is None:
        qd = jnp.asarray(np.asarray(plan.q, np.int64) if plan.q is not None
                         else np.arange(plan.n, dtype=np.int64))
        plan.__dict__["_resid_q"] = qd
    sdevs = [b_.__dict__["_sdev"] for lev in plan.levels for b_ in lev]
    tridev = (_plan_dev(plan.__dict__["_rtri_t"]) if rinv is None
              else None)
    x, rmax = fn(jnp.asarray(np.asarray(b, dtype=np.float64)), Rx, qs,
                 sdevs, tridev, pt, ati, acol,
                 plan.__dict__["_resid_ax"], qd,
                 *((rinv,) if rinv is not None else ()))
    # rmax: best achieved f64 residual max (gate only applies when the
    # factor was f32 — nref > 0)
    return np.asarray(x), (float(rmax) if nref else None)
