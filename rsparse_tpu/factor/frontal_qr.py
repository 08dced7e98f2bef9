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
    rp: int  # padded rows
    cp: int  # padded cols
    a_pos: np.ndarray  # [F, rp, cp] A-value positions (-1 absent)
    cb_src: np.ndarray  # gather: child CB values -> F slots (flat)
    cb_f: np.ndarray
    cb_r: np.ndarray
    cb_c: np.ndarray
    r_src_r: np.ndarray  # scatter: packed[f, r, c] -> Rx (flat lists)
    r_src_c: np.ndarray
    r_f: np.ndarray
    r_dst: np.ndarray
    out_src_r: np.ndarray  # scatter: packed rows ns.. -> cbx (this front's CB)
    out_src_c: np.ndarray
    out_f: np.ndarray
    out_dst: np.ndarray
    # solve-side maps
    row_src: np.ndarray  # [F, rp] gather into concat([z(m), cbz]) (-1 pad)
    c_dst: np.ndarray  # [F, kq] scatter Qᵀz rows: global member col or -1
    cbz_dst: np.ndarray  # [F, kq] scatter Qᵀz rows into cbz (-1 none)
    kq: int  # min(rp, cp)


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


def build_qr_mf_plan(a: Sprs, s: Symb, smax: int = 64) -> Optional[QRMFPlan]:
    """Build the multifrontal QR plan; composes s.q with the etree postorder
    (committed only on success). Returns None when not applicable."""
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
        kq = np.asarray(kc) * np.int64(m) + np.asarray(rw)
        pos = np.clip(np.searchsorted(akeys_s, kq), 0, max(len(akeys_s) - 1, 0))
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
    Rcols: List[List[int]] = [[] for _ in range(n)]
    for fi in range(nf):
        mb = members[fi]
        cols_all = list(mb) + list(E[fi])
        for i, scol in enumerate(mb):
            for j in range(i, len(cols_all)):
                Rcols[cols_all[j]].append(scol)
    Rp = np.zeros(n + 1, dtype=np.int64)
    for c in range(n):
        Rcols[c] = sorted(Rcols[c])
        Rp[c + 1] = Rp[c] + len(Rcols[c])
    Ri = (np.concatenate([np.asarray(rc, dtype=np.int64) for rc in Rcols])
          if n else np.zeros(0, np.int64))
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
            a_pos = np.full((F, rp, cp), -1, dtype=np.int64)
            cbs = ([], [], [], [])
            rs = ([], [], [], [])
            outs = ([], [], [], [])
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
                    a_pos[t, :no, :nc] = alookup(
                        cols_all[None, :].repeat(no, 0),
                        of[:, None].repeat(nc, 1))
                # child CBs stacked below the original rows
                roff = no
                colpos = {int(c_): j for j, c_ in enumerate(cols_all)}
                for ci in chunk_children[fi]:
                    ec = E[ci]
                    nb = int(cb[ci])
                    for bi in range(nb):
                        for j, c_ in enumerate(ec):
                            cbs[0].append(int(cb_off[ci]) + bi * len(ec) + j)
                            cbs[1].append(t)
                            cbs[2].append(roff + bi)
                            cbs[3].append(colpos[int(c_)])
                    roff += nb
                # R scatter: packed rows 0..ns-1
                for i in range(ns):
                    dsts = rlookup(cols_all[i:], np.full(nc - i, mb[i]))
                    for j, d_ in enumerate(dsts):
                        if d_ >= 0:
                            rs[0].append(i)
                            rs[1].append(i + j)
                            rs[2].append(t)
                            rs[3].append(int(d_))
                # CB output: packed rows ns..ns+cb-1 over ext columns
                nb = int(cb[fi])
                for bi in range(nb):
                    for j in range(len(ext)):
                        cj = ns + j
                        if cj >= ns + bi:  # upper-trapezoid only
                            outs[0].append(ns + bi)
                            outs[1].append(cj)
                            outs[2].append(t)
                            outs[3].append(int(cb_off[fi]) + bi * len(ext) + j)
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
            arr = lambda v: np.asarray(v, dtype=np.int64)
            buckets.append(QRFrontBucket(
                rp=rp, cp=cp,
                a_pos=a_pos,
                cb_src=arr(cbs[0]), cb_f=arr(cbs[1]), cb_r=arr(cbs[2]),
                cb_c=arr(cbs[3]),
                r_src_r=arr(rs[0]), r_src_c=arr(rs[1]), r_f=arr(rs[2]),
                r_dst=arr(rs[3]),
                out_src_r=arr(outs[0]), out_src_c=arr(outs[1]),
                out_f=arr(outs[2]), out_dst=arr(outs[3]),
                row_src=row_src, c_dst=c_dst, cbz_dst=cbz_dst, kq=kq,
            ))
        level_buckets.append(buckets)
    if qt is not None:
        s.q = qt  # commit composed ordering
    return QRMFPlan(m=m, n=n, rnz=rnz, Rp=Rp, Ri=Ri, levels=level_buckets,
                    cb_total=int(cb_off[nf]), cbz_total=int(cbz_off[nf]),
                    q=qt)


@partial(jax.jit, donate_argnums=(0, 1))
def _qr_front_kernel(Rx, cbx, Ax, a_pos, cb_src, cb_f, cb_r, cb_c,
                     r_src_r, r_src_c, r_f, r_dst,
                     out_src_r, out_src_c, out_f, out_dst):
    ft = Rx.dtype
    Fm = jnp.where(a_pos >= 0, Ax[jnp.clip(a_pos, 0, Ax.shape[0] - 1)],
                   jnp.zeros((), ft))
    Fm = Fm.at[cb_f, cb_r, cb_c].add(cbx[cb_src], mode="drop")
    # thin QR: Q [rp, kq] (all the columns the solve ever touches) and the
    # upper-trapezoid Rt [kq, cp] holding both R rows and the CB block
    Q, Rt = jax.lax.linalg.qr(Fm, full_matrices=False)
    Rx = Rx.at[r_dst].set(Rt[r_f, r_src_r, r_src_c], mode="drop")
    cbx = cbx.at[out_dst].set(Rt[out_f, out_src_r, out_src_c], mode="drop")
    return Rx, cbx, Q


def _prep_qr_indices(plan: QRMFPlan):
    j = jnp.asarray
    for lev in plan.levels:
        for b in lev:
            if b.__dict__.get("_dev") is None:
                b.__dict__["_dev"] = tuple(j(t) for t in (
                    b.a_pos, b.cb_src, b.cb_f, b.cb_r, b.cb_c,
                    b.r_src_r, b.r_src_c, b.r_f, b.r_dst,
                    b.out_src_r, b.out_src_c, b.out_f, b.out_dst))
            if b.__dict__.get("_sdev") is None:
                b.__dict__["_sdev"] = (j(b.row_src), j(b.c_dst), j(b.cbz_dst))


def qr_mf(a: Sprs, s: Symb, plan: QRMFPlan):
    """Factor on device; caches per-front Q blocks + R values on the plan.

    Returns (Rp, Ri, Rx) — R in static CSC (diag last per column)."""
    _prep_qr_indices(plan)
    Ax = jnp.asarray(a.x[: a.nnz()])
    fn = plan.__dict__.get("_factor_jit")
    if fn is None:
        # index tensors flow in as ARGUMENTS (a pytree), not closure
        # captures — captured jnp arrays are baked into the executable as
        # constants (GBs at 8000-scale; measured), slowing compiles badly
        def run(Ax, devs):
            Rx = jnp.zeros(plan.rnz + 1, dtype=Ax.dtype)
            cbx = jnp.zeros(plan.cb_total + 1, dtype=Ax.dtype)
            qs = []
            for dev in devs:
                Rx, cbx, Q = _qr_front_kernel(Rx, cbx, Ax, *dev)
                qs.append(Q)
            return Rx, tuple(qs)

        fn = jax.jit(run)
        plan.__dict__["_factor_jit"] = fn
    devs = [b.__dict__["_dev"] for lev in plan.levels for b in lev]
    Rx, qs = fn(Ax, devs)
    plan.__dict__["_cache_q"] = qs
    plan.__dict__["_cache_rx"] = Rx
    return plan.Rp, plan.Ri, np.asarray(Rx[: plan.rnz])


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


def qrsol_mf_ls(a: Sprs, s: Symb, plan: QRMFPlan, b: np.ndarray) -> np.ndarray:
    """Least-squares solve (m >= n): x = R^{-1} (Qᵀ b)[:n], then ipvec(q).

    Requires a preceding qr_mf. Returns x [n] in the PERMUTED column order
    (the driver applies s.q)."""
    from ..solve import tri_plan, _tri_sweep_multi, _plan_dev

    qs = plan.__dict__.get("_cache_q")
    if qs is None:
        raise RuntimeError("qrsol_mf_ls requires a preceding qr_mf")
    fn = plan.__dict__.get("_solve_jit")
    if fn is None:
        rmat = Sprs(plan.rnz, plan.n, plan.n, plan.Rp, plan.Ri,
                    np.zeros(plan.rnz))
        tp = tri_plan(rmat, 1)
        _plan_dev(tp)
        plan.__dict__["_rtri"] = tp

        def run(z, Rx, qs_, sdevs, tridev):
            tp_ = plan.__dict__["_rtri"]
            c = _qt_apply(plan, z, qs_, sdevs)
            return _tri_sweep_multi(Rx[: plan.rnz], c, *tridev,
                                    tp_.nlev, tp_.emax, tp_.wmax, plan.n,
                                    True)

        fn = jax.jit(run)
        plan.__dict__["_solve_jit"] = fn
    Rx = plan.__dict__["_cache_rx"]
    z = jnp.asarray(np.asarray(b, dtype=np.float64)[:, None])
    sdevs = [b_.__dict__["_sdev"] for lev in plan.levels for b_ in lev]
    x = fn(z, Rx, qs, sdevs, _plan_dev(plan.__dict__["_rtri"]))
    return np.asarray(x[:, 0])


def qrsol_mf_mn(a: Sprs, s: Symb, plan: QRMFPlan, b: np.ndarray) -> np.ndarray:
    """Minimum-norm solve through the tree built on Aᵀ (reference
    underdetermined branch, src/lib.rs:943-955): x = Q [R^{-T} b_q ; 0].

    `plan` is the QR plan of Aᵀ (so plan.m = original n); `b` has length
    plan.n (= original m). Returns x [plan.m] in original row order."""
    from ..solve import tri_plan, _tri_sweep_multi, _plan_dev

    qs = plan.__dict__.get("_cache_q")
    if qs is None:
        raise RuntimeError("qrsol_mf_mn requires a preceding qr_mf")
    fn = plan.__dict__.get("_solve_mn_jit")
    if fn is None:
        rmat = Sprs(plan.rnz, plan.n, plan.n, plan.Rp, plan.Ri,
                    np.zeros(plan.rnz))
        tp = tri_plan(rmat, 3)  # utsolve: Rᵀ y = c
        _plan_dev(tp)
        plan.__dict__["_rtri_t"] = tp

        def run(c, Rx, qs_, sdevs, tridev):
            tp_ = plan.__dict__["_rtri_t"]
            y = _tri_sweep_multi(Rx[: plan.rnz], c, *tridev,
                                 tp_.nlev, tp_.emax, tp_.wmax, plan.n, False)
            return _q_apply(plan, y, qs_, sdevs)

        fn = jax.jit(run)
        plan.__dict__["_solve_mn_jit"] = fn
    bq = np.asarray(b, dtype=np.float64)
    if plan.q is not None:
        bq = bq[np.asarray(plan.q, dtype=np.int64)]
    Rx = plan.__dict__["_cache_rx"]
    sdevs = [b_.__dict__["_sdev"] for lev in plan.levels for b_ in lev]
    x = fn(jnp.asarray(bq[:, None]), Rx, qs, sdevs,
           _plan_dev(plan.__dict__["_rtri_t"]))
    return np.asarray(x[:, 0])
