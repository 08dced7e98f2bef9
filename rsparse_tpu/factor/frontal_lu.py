"""Multifrontal LU with device partial pivoting inside fronts.

Unsymmetric analog of factor/frontal.py, for the device LU (lu_device.py).
Structure theory (all in k-space after the symmetric GESP permutation): for
a postorder-contiguous subtree S = [aa, r] of the elimination tree of
pattern(A + Aᵀ):

  - an edge (i, j) of A+Aᵀ with j ∈ S, i ∉ S forces i to be an ancestor of
    j, hence i > r and i in the ancestor-closed skeleton. Therefore
        Br := rows of A(:, S) outside S    (⊆ skeleton, all > r)
        Bc := cols of A(S, :) outside S    (⊆ skeleton, all > r)
  - with row pivoting RESTRICTED to S, all front fill stays inside the
    dense S x S triangle, the Br x S block, and the S x Bc block, so the
    factor patterns are static even though the pivot order is data-driven:

        P_f A(S,S) = L_SS U_SS        threshold-pivoted dense LU (device)
        L_B  = A(Br, S) U_SS^{-1}     (dense triangular solve)
        U_B  = L_SS^{-1} P_f A(S,Bc)
        Schur= -L_B U_B               extend-added into the skeleton

The compacted skeleton recurses (its fronts pivot too); the innermost level
uses lu_device's level kernels + dense tail. The reference's tol rule
(src/lib.rs:587-589) is enforced exactly *within the pivot pool*: the
threshold pivot search reproduces "prefer the diagonal iff
|diag| >= tol*colmax"; a boundary (Br) row that the reference would have
pivoted to instead (max|L_B| > 1/tol) degrades to the host engine's exact
global partial pivoting — detected per column via the same margin flag.

CSC output convention: row indices of L/U are ELIMINATION positions (the
reference also renumbers L rows to pinv at the end, src/lib.rs:614-617).
Front-triangle labels are static; boundary/skeleton labels are finalized by
a host pass that composes the per-front pivot permutations returned from
the device (see `_finalize_perm`). The returned `pinv` maps original rows
to elimination positions, so `lusol`'s ipvec/lsolve/usolve chain works
unchanged.
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


def _lookup(keys_sorted, order, qkeys):
    if len(keys_sorted) == 0:
        return np.full(np.shape(qkeys), -1, dtype=np.int64)
    # LAST match on duplicate keys (reference last-wins assign semantics —
    # see frontal._lookup)
    pos = np.clip(np.searchsorted(keys_sorted, qkeys, side="right") - 1,
                  0, len(keys_sorted) - 1)
    found = keys_sorted[pos] == qkeys
    return np.where(found, order[pos], -1).astype(np.int64)


@dataclasses.dataclass
class LUFrontBucket:
    sp: int
    bpr: int  # padded row-boundary size
    bpc: int  # padded col-boundary size
    ass_pos: np.ndarray  # [F, Sp, Sp] A positions (k-space), -1 absent
    abr_pos: np.ndarray  # [F, Bpr, Sp] A(Br, S)
    abc_pos: np.ndarray  # [F, Sp, Bpc] A(S, Bc)
    # scatter maps (flat; all dense now — fronts fill their whole blocks)
    lss_pos: np.ndarray
    lss_f: np.ndarray
    lss_r: np.ndarray
    lss_c: np.ndarray
    uss_pos: np.ndarray
    uss_f: np.ndarray
    uss_r: np.ndarray
    uss_c: np.ndarray
    lb_pos: np.ndarray
    lb_f: np.ndarray
    lb_r: np.ndarray
    lb_c: np.ndarray
    ub_pos: np.ndarray
    ub_f: np.ndarray
    ub_r: np.ndarray
    ub_c: np.ndarray
    schur_src: np.ndarray  # flat into Schur [F, Bpr, Bpc]
    schur_dst: np.ndarray  # into skeleton values
    srow: np.ndarray  # [F, Sp] global k-rows of S slots (n = pad)
    br_skel: np.ndarray  # [F, Bpr] compact skeleton index of Br rows (ns = pad)
    bc_skel: np.ndarray  # [F, Bpc] compact skeleton index of Bc cols (ns = pad)


@dataclasses.dataclass
class LUMFPlan:
    n: int
    lnz: int
    unz: int
    Lp: np.ndarray
    Li: np.ndarray  # labels: elim positions (static) or pre-pivot skel rows
    Up: np.ndarray
    Ui: np.ndarray
    li_skel: np.ndarray  # bool [lnz]: Li entry is a pre-pivot label (remap)
    ui_skel: np.ndarray  # bool [unz]
    buckets: List[LUFrontBucket]
    skel: np.ndarray
    skel_plan: object  # LUMFPlan (recursion) or lu_device.LUPlan
    skel_cnnz: int
    skel_a_src: np.ndarray
    skel_a_dst: np.ndarray
    skel_l_src: np.ndarray
    skel_l_dst: np.ndarray
    skel_u_src: np.ndarray
    skel_u_dst: np.ndarray
    # symmetric-permutation mode (order >= 0): the factorization runs on
    # A2 = A(P, P) with s.q := P; vperm maps a.x -> A2.x
    row_pinv: Optional[np.ndarray] = None
    vperm: Optional[np.ndarray] = None


def _sym_pattern_etree(a: Sprs, q: Optional[np.ndarray]):
    """etree + postorder of triu(pattern(A(:,q) + A(:,q)')) in k-space."""
    from ..ops.plan import col_ids

    n = a.n
    nz = a.nnz()
    rows = a.i[:nz].astype(np.int64)
    cols = col_ids(a.p, n)
    if q is not None:
        qinv = np.empty(n, dtype=np.int64)
        qinv[np.asarray(q, dtype=np.int64)] = np.arange(n)
        cols = qinv[cols]
    r2 = np.minimum(rows, cols)
    c2 = np.maximum(rows, cols)
    keys = np.unique(np.concatenate(
        [c2 * np.int64(n) + r2,
         np.arange(n, dtype=np.int64) * (n + 1)]))  # ensure diagonal
    ti = keys % n
    tc = keys // n
    tp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(tc, minlength=n), out=tp[1:])
    parent = native.etree(n, n, tp, ti, False)
    post = native.post(n, parent)
    return parent, post


MAX_DEPTH = 4
# Skeletons up to this size factor DENSELY with full partial pivoting on
# device (the skeleton rows are exactly the not-yet-eliminated pool, so the
# pivot search there is unrestricted — reference-equivalent). Larger
# skeletons recurse into another front layer first.
DENSE_SKEL_MAX = 2048


@dataclasses.dataclass
class DenseSkelPlan:
    """Dense pivoted-LU plan for the compacted skeleton system."""

    ns: int
    srows: np.ndarray  # compact CSC -> dense scatter rows
    scols: np.ndarray
    lnz: int  # = ns*ns + 1 (flattened dense factor + constant-1 slot)
    unz: int


def build_lu_mf_plan(a: Sprs, s: Symb, smax: int = 64,
                     depth: int = 0) -> Optional["LUMFPlan"]:
    """Build the pivoting multifrontal LU plan. May COMPOSE s.q with the
    symmetrized etree postorder (admissible — lusol applies s.q consistently
    afterward; committed only on success). Large skeletons recurse into
    another front layer. Returns None when not applicable."""
    from ..ops.plan import col_ids
    from .lu_device import build_lu_plan, LUPlan

    n = a.n
    row_pinv = None
    vperm = None
    if s.q is not None:
        from ..ops.plan import permute_plan
        from ..symbolic import _permute_host

        # 1) Static-pivoting row matching (MC64-flavoured, SuperLU_DIST's
        #    GESP prep): put large entries on the diagonal so the in-front
        #    threshold pivoting + tol margin rarely needs the host engine.
        #    The reference pivots dynamically instead (src/lib.rs:565-589);
        #    the margin check keeps its tol semantics authoritative.
        pm = native.match(n, a.p, a.i[: a.nnz()], a.x[: a.nnz()])
        if pm is not None and np.array_equal(pm, np.arange(n)):
            pm = None  # identity matching: skip the extra permute
        if pm is not None:
            a_m = _permute_host(a, pm, None)
            vperm_m = permute_plan(a, pm, None).perm
        else:
            a_m = a
            vperm_m = None
        # 2) GESP symmetric permutation: P = postordered AMD(A + A')
        #    applied to BOTH rows and columns — preserves the (matched)
        #    diagonal and gives a bushy elimination tree for the fronts.
        #    Admissible because lusol's driver applies pinv (rows) and s.q
        #    (columns) consistently.
        P = native.amd(0, n, n, a_m.p, a_m.i[: a_m.nnz()])
        if P is None:
            P = np.arange(n, dtype=np.int64)
        for _ in range(3):
            pinvP = np.empty(n, dtype=np.int64)
            pinvP[P] = np.arange(n)
            a2 = _permute_host(a_m, pinvP, P)
            parent, post = _sym_pattern_etree(a2, None)
            if np.array_equal(post, np.arange(n)):
                break
            P = P[post]
        else:
            return None
        # committed to s.q only when plan construction succeeds
        new_q = P
        row_pinv = pinvP[pm] if pm is not None else pinvP
        vperm2 = permute_plan(a_m, pinvP, P).perm
        vperm = vperm_m[vperm2] if vperm_m is not None else vperm2
        a_work = a2
    else:
        parent, post = _sym_pattern_etree(a, None)
        if not np.array_equal(post, np.arange(n)):
            return None  # natural order must stay untouched (parity)
        new_q = None
        a_work = a
    a = a_work

    # ---- subtree fronts over the symmetrized etree -----------------------
    sz = np.ones(n, dtype=np.int64)
    for k in range(n):
        p_ = parent[k]
        if p_ >= 0:
            sz[p_] += sz[k]
    is_root = (sz <= smax) & ((parent < 0) | (sz[np.clip(parent, 0, n - 1)] > smax))
    roots = np.nonzero(is_root)[0]
    in_front = np.zeros(n, dtype=bool)
    for r in roots:
        in_front[r - sz[r] + 1 : r + 1] = True
    skel = np.nonzero(~in_front)[0]
    ns = len(skel)
    if len(roots) == 0 or ns in (0, n):
        return None
    g = np.full(n, -1, dtype=np.int64)
    g[skel] = np.arange(ns)
    fr_of = np.full(n, -1, dtype=np.int64)
    for fi, r in enumerate(roots):
        fr_of[int(r - sz[r] + 1) : int(r) + 1] = fi

    # ---- structural boundaries (see module docstring for the theory) -----
    anz = a.nnz()
    arows = a.i[:anz].astype(np.int64)
    acols = col_ids(a.p, n)
    sk_mask = ~in_front
    # Br: rows outside S of columns in S; Bc: cols outside S of rows in S
    m_br = (fr_of[acols] >= 0) & sk_mask[arows]
    m_bc = (fr_of[arows] >= 0) & sk_mask[acols]
    fronts = []
    for fi, r in enumerate(roots):
        aa = int(r - sz[r] + 1)
        S = np.arange(aa, int(r) + 1)
        Br = np.unique(arows[m_br & (fr_of[acols] == fi)])
        Bc = np.unique(acols[m_bc & (fr_of[arows] == fi)])
        if (len(Br) and Br.min() <= r) or (len(Bc) and Bc.min() <= r):
            return None  # subtree theory violated (shouldn't happen)
        fronts.append((S, Br, Bc))

    # A keys in k-space (a is already permuted; columns are k columns)
    akeys = acols * np.int64(n) + arows
    aorder = np.argsort(akeys, kind="stable")
    akeys_s = akeys[aorder]

    # ---- skeleton pattern: A(skel, skel) + diag + Br x Bc cliques --------
    keep = sk_mask[arows] & sk_mask[acols]
    pairs = set(zip(g[arows[keep]].tolist(), g[acols[keep]].tolist()))
    for d in range(ns):
        pairs.add((d, d))
    for S, Br, Bc in fronts:
        gr = g[Br]
        gc = g[Bc]
        for x_ in gr:
            for y_ in gc:
                pairs.add((int(x_), int(y_)))
    pr = np.array(sorted(pairs, key=lambda t: (t[1], t[0])), dtype=np.int64) \
        if pairs else np.zeros((0, 2), dtype=np.int64)
    srows = pr[:, 0] if len(pr) else np.zeros(0, np.int64)
    scols = pr[:, 1] if len(pr) else np.zeros(0, np.int64)
    sCp = np.zeros(ns + 1, dtype=np.int64)
    np.cumsum(np.bincount(scols, minlength=ns), out=sCp[1:])
    s_cnnz = len(srows)
    skeys = scols * np.int64(ns) + srows
    sk_order = np.arange(s_cnnz, dtype=np.int64)

    ka = np.nonzero(keep)[0]
    skel_a_src = ka.astype(np.int64)
    skel_a_dst = _lookup(skeys, sk_order,
                         g[acols[keep]] * np.int64(ns) + g[arows[keep]])

    # ---- skeleton plan ---------------------------------------------------
    # Preference order: recurse (fronts pivot) while the skeleton is large;
    # then factor the compact remainder DENSELY with full partial pivoting
    # (skeleton rows = the whole remaining pool, so the pivot search there
    # is unrestricted); only fall back to the static-pivot level machinery
    # when the skeleton is still too big after MAX_DEPTH recursions.
    c_skel = Sprs(s_cnnz, ns, ns, sCp, srows, np.zeros(s_cnnz))
    s_sub = Symb()
    s_sub.q = None
    skel_plan = None
    if ns > DENSE_SKEL_MAX and depth < MAX_DEPTH:
        try:
            skel_plan = build_lu_mf_plan(c_skel, s_sub, smax, depth + 1)
        except Exception:
            skel_plan = None
    if skel_plan is None:
        if ns <= DENSE_SKEL_MAX:
            skel_plan = DenseSkelPlan(ns=ns, srows=srows.copy(),
                                      scols=scols.copy(),
                                      lnz=ns * ns + 1, unz=ns * ns + 1)
        else:
            skel_plan = build_lu_plan(c_skel, s_sub)
    if skel_plan is None or not isinstance(
            skel_plan, (LUPlan, LUMFPlan, DenseSkelPlan)):
        return None
    if isinstance(skel_plan, LUMFPlan):
        in_li_skel = skel_plan.li_skel
        in_ui_skel = skel_plan.ui_skel
    elif isinstance(skel_plan, LUPlan):
        in_li_skel = np.zeros(skel_plan.lnz, dtype=bool)
        in_ui_skel = np.zeros(skel_plan.unz, dtype=bool)

    # ---- synthesized global pattern (dense front blocks) -----------------
    # L col j=aa+c: elim triangle [j..r] then Br (pre-pivot labels).
    # U col j: elim rows [aa..j] (diag last).
    # Skel col skel[q]: U first gets the full S range of every front with
    # skel[q] in Bc (elim labels), then the inner pattern mapped via skel[].
    Lcols: List[np.ndarray] = [None] * n
    Lmask: List[np.ndarray] = [None] * n
    Ucols: List[np.ndarray] = [None] * n
    Umask: List[np.ndarray] = [None] * n
    for S, Br, Bc in fronts:
        aa, r = int(S[0]), int(S[-1])
        for c in range(len(S)):
            j = aa + c
            tri = np.arange(j, r + 1)
            Lcols[j] = np.concatenate([tri, Br])
            Lmask[j] = np.concatenate(
                [np.zeros(len(tri), bool), np.ones(len(Br), bool)])
            Ucols[j] = np.arange(aa, j + 1)
            Umask[j] = np.zeros(c + 1, bool)
    # fronts contributing S-rows to each skeleton column's U
    bc_contrib: List[List[np.ndarray]] = [[] for _ in range(ns)]
    for S, Br, Bc in fronts:
        rng = np.arange(int(S[0]), int(S[-1]) + 1)
        for cq in g[Bc]:
            bc_contrib[int(cq)].append(rng)
    # Skeleton columns carry the inner plan's pattern mapped through skel[].
    # Mask semantics: inner ELIM labels are already final (inner step e
    # happens at global position skel[e] — a static map), so they must NOT
    # be remapped by the composed einv pass; inner PRE-PIVOT labels must.
    # The inner masks are therefore inherited verbatim. For the dense
    # skeleton and the innermost LUPlan every label is an elim label.
    if isinstance(skel_plan, DenseSkelPlan):
        for q in range(ns):
            c = int(skel[q])
            Lcols[c] = skel[q:]
            Lmask[c] = np.zeros(ns - q, bool)
            pre = (np.concatenate(bc_contrib[q]) if bc_contrib[q]
                   else np.zeros(0, np.int64))
            Ucols[c] = np.concatenate([pre, skel[: q + 1]])
            Umask[c] = np.zeros(len(pre) + q + 1, bool)
    else:
        sLp, sLi = skel_plan.Lp, skel_plan.Li
        sUp, sUi = skel_plan.Up, skel_plan.Ui
        for q in range(ns):
            c = int(skel[q])
            Lcols[c] = skel[sLi[sLp[q] : sLp[q + 1]]]
            Lmask[c] = in_li_skel[sLp[q] : sLp[q + 1]].copy()
            uin = sUi[sUp[q] : sUp[q + 1]]
            pre = (np.concatenate(bc_contrib[q]) if bc_contrib[q]
                   else np.zeros(0, np.int64))
            Ucols[c] = np.concatenate([pre, skel[uin]])
            Umask[c] = np.concatenate(
                [np.zeros(len(pre), bool),
                 in_ui_skel[sUp[q] : sUp[q + 1]].copy()])

    Lp = np.zeros(n + 1, dtype=np.int64)
    Up = np.zeros(n + 1, dtype=np.int64)
    for j in range(n):
        Lp[j + 1] = Lp[j] + len(Lcols[j])
        Up[j + 1] = Up[j] + len(Ucols[j])
    Li = np.concatenate(Lcols) if n else np.zeros(0, np.int64)
    Ui = np.concatenate(Ucols) if n else np.zeros(0, np.int64)
    li_skel = np.concatenate(Lmask) if n else np.zeros(0, bool)
    ui_skel = np.concatenate(Umask) if n else np.zeros(0, bool)
    lnz, unz = int(Lp[n]), int(Up[n])

    # position maps inner L/U -> global (for the value copy-back)
    sl_src_p, sl_dst_p, su_src_p, su_dst_p = [], [], [], []
    if isinstance(skel_plan, DenseSkelPlan):
        # inner values live in the flattened dense factor [ns*ns]; slot
        # ns*ns holds the constant 1.0 for L's unit diagonal
        for q in range(ns):
            c = int(skel[q])
            sl_src_p.append(np.concatenate(
                [[ns * ns], np.arange(q + 1, ns, dtype=np.int64) * ns + q]))
            sl_dst_p.append(np.arange(Lp[c], Lp[c + 1], dtype=np.int64))
            su_src_p.append(np.arange(0, q + 1, dtype=np.int64) * ns + q)
            su_dst_p.append(np.arange(Up[c + 1] - (q + 1), Up[c + 1],
                                      dtype=np.int64))
    else:
        for q in range(ns):
            c = int(skel[q])
            sl_src_p.append(np.arange(sLp[q], sLp[q + 1], dtype=np.int64))
            sl_dst_p.append(np.arange(Lp[c], Lp[c] + (sLp[q + 1] - sLp[q]),
                                      dtype=np.int64))
            nU = int(sUp[q + 1] - sUp[q])
            su_src_p.append(np.arange(sUp[q], sUp[q + 1], dtype=np.int64))
            su_dst_p.append(np.arange(Up[c + 1] - nU, Up[c + 1],
                                      dtype=np.int64))
    cat = lambda ps: (np.concatenate(ps) if ps else np.zeros(0, np.int64))
    sl_src = cat(sl_src_p)
    sl_dst = cat(sl_dst_p)
    su_src = cat(su_src_p)
    su_dst = cat(su_dst_p)

    # ---- buckets ---------------------------------------------------------
    bmap = {}
    for fi, (S, Br, Bc) in enumerate(fronts):
        key = (_next_pow2(max(len(S), 1)), _next_pow2(max(len(Br), 1)),
               _next_pow2(max(len(Bc), 1)))
        bmap.setdefault(key, []).append(fi)

    buckets = []
    for (sp, bpr, bpc), fis in sorted(bmap.items()):
        F = len(fis)
        ass_pos = np.full((F, sp, sp), -1, dtype=np.int64)
        abr_pos = np.full((F, bpr, sp), -1, dtype=np.int64)
        abc_pos = np.full((F, sp, bpc), -1, dtype=np.int64)
        lss = ([], [], [], [])
        uss = ([], [], [], [])
        lb = ([], [], [], [])
        ub = ([], [], [], [])
        s_src, s_dst = [], []
        srow = np.full((F, sp), n, dtype=np.int64)
        br_skel = np.full((F, bpr), ns, dtype=np.int64)
        bc_skel = np.full((F, bpc), ns, dtype=np.int64)
        for t, fi in enumerate(fis):
            S, Br, Bc = fronts[fi]
            aa, r = int(S[0]), int(S[-1])
            ls, lbr, lbc = len(S), len(Br), len(Bc)
            srow[t, :ls] = S
            br_skel[t, :lbr] = g[Br]
            bc_skel[t, :lbc] = g[Bc]
            ass_pos[t, :ls, :ls] = _lookup(
                akeys_s, aorder, S[None, :] * np.int64(n) + S[:, None])
            if lbr:
                abr_pos[t, :lbr, :ls] = _lookup(
                    akeys_s, aorder, S[None, :] * np.int64(n) + Br[:, None])
            if lbc:
                abc_pos[t, :ls, :lbc] = _lookup(
                    akeys_s, aorder, Bc[None, :] * np.int64(n) + S[:, None])
            for c in range(ls):
                j = aa + c
                # L triangle: rows j..r at positions Lp[j]..; dense
                cnt = r + 1 - j
                lss[0].extend(range(int(Lp[j]), int(Lp[j]) + cnt))
                lss[1].extend([t] * cnt)
                lss[2].extend(range(c, ls))
                lss[3].extend([c] * cnt)
                # L boundary rows
                lb[0].extend(range(int(Lp[j]) + cnt, int(Lp[j + 1])))
                lb[1].extend([t] * lbr)
                lb[2].extend(range(lbr))
                lb[3].extend([c] * lbr)
                # U triangle: rows aa..j
                uss[0].extend(range(int(Up[j]), int(Up[j + 1])))
                uss[1].extend([t] * (c + 1))
                uss[2].extend(range(c + 1))
                uss[3].extend([c] * (c + 1))
            # U_B: skeleton columns' S rows (front-sorted prefix of Ucols)
            for cloc, cglob in enumerate(Bc):
                base = int(Up[cglob])
                # find this front's range within the column's prefix
                off = 0
                for rng in bc_contrib[int(g[cglob])]:
                    if int(rng[0]) == aa:
                        break
                    off += len(rng)
                ub[0].extend(range(base + off, base + off + ls))
                ub[1].extend([t] * ls)
                ub[2].extend(range(ls))
                ub[3].extend([cloc] * ls)
            if lbr and lbc:
                gr = g[Br]
                gc = g[Bc]
                xs = np.repeat(np.arange(lbr), lbc)
                ys = np.tile(np.arange(lbc), lbr)
                dsts = _lookup(skeys, sk_order, gc[ys] * np.int64(ns) + gr[xs])
                ok = dsts >= 0
                s_src.extend(((t * bpr + xs[ok]) * bpc + ys[ok]).tolist())
                s_dst.extend(dsts[ok].tolist())
        arr = lambda v: np.asarray(v, np.int64)
        buckets.append(LUFrontBucket(
            sp=sp, bpr=bpr, bpc=bpc,
            ass_pos=ass_pos, abr_pos=abr_pos, abc_pos=abc_pos,
            lss_pos=arr(lss[0]), lss_f=arr(lss[1]), lss_r=arr(lss[2]), lss_c=arr(lss[3]),
            uss_pos=arr(uss[0]), uss_f=arr(uss[1]), uss_r=arr(uss[2]), uss_c=arr(uss[3]),
            lb_pos=arr(lb[0]), lb_f=arr(lb[1]), lb_r=arr(lb[2]), lb_c=arr(lb[3]),
            ub_pos=arr(ub[0]), ub_f=arr(ub[1]), ub_r=arr(ub[2]), ub_c=arr(ub[3]),
            schur_src=arr(s_src), schur_dst=arr(s_dst),
            srow=srow, br_skel=br_skel, bc_skel=bc_skel,
        ))

    if row_pinv is not None:
        s.q = new_q  # commit the composed ordering only on success
    return LUMFPlan(
        n=n, lnz=lnz, unz=unz, Lp=Lp, Li=Li, Up=Up, Ui=Ui,
        li_skel=li_skel, ui_skel=ui_skel, buckets=buckets,
        skel=skel, skel_plan=skel_plan, skel_cnnz=s_cnnz,
        skel_a_src=skel_a_src, skel_a_dst=skel_a_dst,
        skel_l_src=np.asarray(sl_src, np.int64),
        skel_l_dst=np.asarray(sl_dst, np.int64),
        skel_u_src=np.asarray(su_src, np.int64),
        skel_u_dst=np.asarray(su_dst, np.int64),
        row_pinv=row_pinv, vperm=vperm,
    )


def _pivoted_lu(M, valid, tol):
    """Batched dense LU with threshold partial pivoting restricted to the
    block rows. M: [F, Sp, Sp]; `valid` marks real pivot slots (padded
    slots get identity pivots and are never swapped).

    Pivot rule per column c (the reference's shape, src/lib.rs:565-589):
    colmax = max |M[r, c]| over r >= c; keep the diagonal iff
    |M[c,c]| >= tol*colmax, else swap in the argmax row. Callers pass the
    DEVICE threshold (>= the user tol — pivoting more eagerly than the
    reference is always admissible and strictly more stable; the user tol
    governs only the boundary-row fallback margin). Returns (packed LU in
    elimination row order, perm [F, Sp] with perm[c] = pre-pivot slot
    eliminated at step c, worst ratio |piv|/colmax over real columns)."""
    ft = M.dtype
    F, spn, _ = M.shape
    M = M + jax.vmap(jnp.diag)(jnp.where(valid, 0.0, 1.0).astype(ft))
    rows = jax.lax.broadcasted_iota(jnp.int32, (spn,), 0)
    perm0 = jnp.tile(rows[None, :], (F, 1))
    real_col = valid  # [F, Sp]

    def body(c, carry):
        M, perm, worst = carry
        col = M[:, :, c]  # [F, Sp]
        below_eq = rows >= c
        absb = jnp.where(below_eq[None, :], jnp.abs(col), -1.0)
        colmax = jnp.max(absb, axis=1)
        diag = jnp.abs(M[:, c, c])
        use_diag = diag >= tol * colmax
        amax = jnp.argmax(absb, axis=1).astype(jnp.int32)
        pivrow = jnp.where(use_diag, c, amax)
        # swap rows c <-> pivrow (full working rows: L part + trailing)
        base = jnp.tile(rows[None, :], (F, 1))
        swapidx = jnp.where(base == c, pivrow[:, None],
                            jnp.where(base == pivrow[:, None], c, base))
        M = jnp.take_along_axis(M, swapidx[:, :, None], axis=1)
        perm = jnp.take_along_axis(perm, swapidx, axis=1)
        piv = M[:, c, c]
        rc = jnp.take_along_axis(real_col, jnp.full((F, 1), c, jnp.int32),
                                 axis=1)[:, 0]
        ratio = jnp.abs(piv) / jnp.maximum(colmax, jnp.finfo(ft).tiny)
        worst = jnp.minimum(worst, jnp.where(rc, ratio, jnp.inf))
        below = rows > c
        colc = M[:, :, c]
        safe = jnp.where(piv == 0, jnp.ones((), ft), piv)
        l = jnp.where(below[None, :], colc / safe[:, None], 0.0)
        u = jnp.where(rows[None, :] > c, M[:, c, :], 0.0)
        M = M - l[:, :, None] * u[:, None, :]
        M = M.at[:, :, c].set(jnp.where(below[None, :], l, colc))
        return M, perm, worst

    M, perm, worst = jax.lax.fori_loop(
        0, spn, body, (M, perm0, jnp.full(F, jnp.inf, ft)))
    return M, perm, worst


def _pivoted_lu_single_blocked(M, theta, panel: int = 64):
    """Right-looking blocked LU with threshold partial pivoting for ONE
    dense [ns, ns] matrix (the compacted skeleton). The unblocked batched
    kernel (`_pivoted_lu`) does ns sequential full-matrix rank-1 updates —
    VPU-bound and the warm-path bottleneck at skeleton sizes; here only the
    [R, panel] panel is touched per pivot step and the trailing update is
    one MXU matmul per panel. Returns (packed LU, perm, worst ratio)."""
    ft = M.dtype
    ns = M.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ns,), 0)
    perm = rows
    worst = jnp.asarray(jnp.inf, ft)
    for b0 in range(0, ns, panel):
        pb = min(panel, ns - b0)
        blk = jax.lax.dynamic_slice(M, (0, b0), (ns, pb))  # full-height panel

        def step(c, carry):
            M, blk, perm, worst = carry
            gc = b0 + c
            col = jax.lax.dynamic_index_in_dim(blk, c, axis=1, keepdims=False)
            below_eq = rows >= gc
            absb = jnp.where(below_eq, jnp.abs(col), -1.0)
            colmax = jnp.max(absb)
            diag = jnp.abs(jax.lax.dynamic_index_in_dim(col, gc, axis=0,
                                                        keepdims=False))
            pivrow = jnp.where(diag >= theta * colmax, gc,
                               jnp.argmax(absb).astype(jnp.int32))
            # swap rows gc <-> pivrow in M (full rows: left L + trailing),
            # the panel copy, and perm
            pz = jnp.zeros((), jnp.int32)
            gc32 = jnp.asarray(gc, jnp.int32)
            pr32 = jnp.asarray(pivrow, jnp.int32)
            rowc_M = jax.lax.dynamic_slice(M, (gc32, pz), (1, ns))
            rowp_M = jax.lax.dynamic_slice(M, (pr32, pz), (1, ns))
            M = jax.lax.dynamic_update_slice(M, rowp_M, (gc32, pz))
            M = jax.lax.dynamic_update_slice(M, rowc_M, (pr32, pz))
            rowc_b = jax.lax.dynamic_slice(blk, (gc32, pz), (1, pb))
            rowp_b = jax.lax.dynamic_slice(blk, (pr32, pz), (1, pb))
            blk = jax.lax.dynamic_update_slice(blk, rowp_b, (gc32, pz))
            blk = jax.lax.dynamic_update_slice(blk, rowc_b, (pr32, pz))
            pc = perm[gc]
            pp = perm[pivrow]
            perm = perm.at[gc].set(pp).at[pivrow].set(pc)
            # eliminate within the panel
            col = jax.lax.dynamic_index_in_dim(blk, c, axis=1, keepdims=False)
            piv = jax.lax.dynamic_index_in_dim(col, gc, axis=0, keepdims=False)
            ratio = jnp.abs(piv) / jnp.maximum(colmax, jnp.finfo(ft).tiny)
            worst = jnp.minimum(worst, ratio)
            below = rows > gc
            safe = jnp.where(piv == 0, jnp.ones((), ft), piv)
            l = jnp.where(below, col / safe, 0.0)
            urow = jax.lax.dynamic_index_in_dim(blk, gc, axis=0,
                                                keepdims=False)
            cols_p = jax.lax.broadcasted_iota(jnp.int32, (pb,), 0)
            u = jnp.where(cols_p > c, urow, 0.0)
            blk = blk - l[:, None] * u[None, :]
            blk = jax.lax.dynamic_update_index_in_dim(
                blk, jnp.where(below, l, col), c, axis=1)
            return M, blk, perm, worst

        M, blk, perm, worst = jax.lax.fori_loop(
            0, pb, step, (M, blk, perm, worst))
        M = jax.lax.dynamic_update_slice(M, blk, (0, b0))
        if b0 + pb < ns:
            L11 = (jnp.tril(jax.lax.dynamic_slice(M, (b0, b0), (pb, pb)), -1)
                   + jnp.eye(pb, dtype=ft))
            A12 = jax.lax.dynamic_slice(M, (b0, b0 + pb),
                                        (pb, ns - b0 - pb))
            U12 = jax.lax.linalg.triangular_solve(
                L11, A12, left_side=True, lower=True, unit_diagonal=True)
            M = jax.lax.dynamic_update_slice(M, U12, (b0, b0 + pb))
            L21 = jax.lax.dynamic_slice(M, (b0 + pb, b0), (ns - b0 - pb, pb))
            M = jax.lax.dynamic_update_slice(
                M,
                jax.lax.dynamic_slice(M, (b0 + pb, b0 + pb),
                                      (ns - b0 - pb, ns - b0 - pb))
                - L21 @ U12,
                (b0 + pb, b0 + pb))
    return M, perm, worst


@partial(jax.jit, static_argnames=("ns",))
def _dense_skel_kernel(Cs, sr, sc, ns: int):
    """One-launch dense skeleton factorization: scatter-assemble the compact
    values into [ns, ns] and run the blocked full-partial-pivoting LU.
    Threshold 1.0 = plain partial pivoting (a dense block gains no sparsity
    from diagonal preference, so take the most stable pivot)."""
    Sd = jnp.zeros((ns, ns), Cs.dtype).at[sr, sc].set(Cs)
    return _pivoted_lu_single_blocked(Sd, jnp.asarray(1.0, Cs.dtype))


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _lu_front_kernel(Lx, Ux, Csx, Ax, tol, valid, ass_pos, abr_pos, abc_pos,
                     lss_pos, lss_f, lss_r, lss_c,
                     uss_pos, uss_f, uss_r, uss_c,
                     lb_pos, lb_f, lb_r, lb_c,
                     ub_pos, ub_f, ub_r, ub_c,
                     schur_src, schur_dst):
    ft = Lx.dtype

    def g(idx):
        return jnp.where(idx >= 0, Ax[jnp.clip(idx, 0, Ax.shape[0] - 1)],
                         jnp.zeros((), ft))

    Ass = g(ass_pos)
    # device pivot threshold: at least 0.1 (standard sparse threshold
    # pivoting) — bounds in-front element growth regardless of the user tol
    LUp, perm, worst = _pivoted_lu(Ass, valid, jnp.maximum(tol, 0.1))
    spn = LUp.shape[-1]
    eye = jnp.eye(spn, dtype=ft)
    Lss = jnp.tril(LUp, -1) + eye[None]
    Uss = jnp.triu(LUp)
    Abr = g(abr_pos)
    # L_B = A(Br,S) Uss^{-1}  -> solve X Uss = Abr (column ops: perm-free)
    LB = jax.lax.linalg.triangular_solve(Uss, Abr, left_side=False, lower=False)
    # U_B = Lss^{-1} P_f A(S,Bc)
    Abc = g(abc_pos)
    Abc = jnp.take_along_axis(Abc, perm[:, :, None], axis=1)
    UB = jax.lax.linalg.triangular_solve(Lss, Abc, left_side=True, lower=True,
                                         unit_diagonal=True)
    Schur = jnp.einsum("frs,fsc->frc", LB, UB)
    # boundary rows also compete for the pivot in the reference's rule:
    # |L_B| = |x_row| / |piv|, so the tol ratio there is 1 / max(1, |L_B|)
    lbmax = jnp.max(jnp.abs(LB), axis=1)  # [F, Sp]
    worst = jnp.minimum(worst, jnp.min(1.0 / jnp.maximum(1.0, lbmax), axis=-1))
    Lx = Lx.at[lss_pos].set(Lss[lss_f, lss_r, lss_c], mode="drop")
    Ux = Ux.at[uss_pos].set(Uss[uss_f, uss_r, uss_c], mode="drop")
    Lx = Lx.at[lb_pos].set(LB[lb_f, lb_r, lb_c], mode="drop")
    Ux = Ux.at[ub_pos].set(UB[ub_f, ub_r, ub_c], mode="drop")
    Csx = Csx.at[schur_dst].add(-Schur.reshape(-1)[schur_src], mode="drop")
    margin = jnp.min(worst) - tol  # worst |piv|/colmax vs tol
    bad = jnp.any(worst == 0.0)
    return Lx, Ux, Csx, margin, bad, Lss, Uss, LB, UB, perm


@partial(jax.jit, donate_argnums=(0,))
def _lu_fwd_front(X, Ds, Lss, LB, srow, br_skel):
    """L forward, front phase. X is in full elimination order, so the S
    window [aa..r] is already pivot-permuted — feed Lss directly."""
    xs = X[srow]
    ys = jax.lax.linalg.triangular_solve(Lss, xs, left_side=True, lower=True,
                                         unit_diagonal=True)
    X = X.at[srow].set(ys)
    Ds = Ds.at[br_skel].add(jnp.einsum("frs,fsk->frk", LB, ys))
    return X, Ds


@partial(jax.jit, donate_argnums=(0,))
def _lu_bwd_front(X, Uss, UB, srow, bc_glob):
    """U backward, front phase: x_S = Uss^{-1} (y_S - UB x_Bc)."""
    xb = X[bc_glob]
    bs = X[srow] - jnp.einsum("fsc,fck->fsk", UB, xb)
    xs = jax.lax.linalg.triangular_solve(Uss, bs, left_side=True, lower=False)
    return X.at[srow].set(xs)


def _lu_skel_tri_plans(plan: LUMFPlan):
    """Lazy sweep schedules for the skeleton L (kind 0) and U (kind 1)."""
    from ..solve import tri_plan

    tp = plan.__dict__.get("_skel_tri")
    if tp is None:
        sp = plan.skel_plan
        ns = len(plan.skel)
        lsk = Sprs(sp.lnz, ns, ns, sp.Lp, sp.Li, np.zeros(sp.lnz))
        usk = Sprs(sp.unz, ns, ns, sp.Up, sp.Ui, np.zeros(sp.unz))
        tp = (tri_plan(lsk, 0), tri_plan(usk, 1))
        plan.__dict__["_skel_tri"] = tp
    return tp


def _prep_lu_solve_indices(plan: LUMFPlan):
    """Eagerly build device-resident index caches (must not be created
    inside the jit trace — tracer leak)."""
    from ..solve import _plan_dev

    ns = len(plan.skel)
    n = plan.n
    for b in plan.buckets:
        if b.__dict__.get("_sdev") is None:
            bc_glob = np.where(b.bc_skel < ns,
                               plan.skel[np.clip(b.bc_skel, 0, ns - 1)], n)
            b.__dict__["_sdev"] = (jnp.asarray(b.srow),
                                   jnp.asarray(b.br_skel),
                                   jnp.asarray(bc_glob))
    if isinstance(plan.skel_plan, LUMFPlan):
        _prep_lu_solve_indices(plan.skel_plan)
    elif not isinstance(plan.skel_plan, DenseSkelPlan):
        p0, p1 = _lu_skel_tri_plans(plan)
        _plan_dev(p0)
        _plan_dev(p1)


def solve_lu_mf(plan: LUMFPlan, X: np.ndarray) -> np.ndarray:
    """X := U^{-1} L^{-1} X using the factors cached by the last lu_mf call.

    X is [n, B] in FULL elimination order (the caller ipvecs with the pinv
    returned by lu_mf). Front work is dense batched triangular solves; only
    the innermost skeleton runs level sweeps."""
    tree = plan.__dict__.get("_cache_tree")
    if tree is None:
        raise RuntimeError("solve_lu_mf requires a preceding lu_mf")
    _prep_lu_solve_indices(plan)
    fn = plan.__dict__.get("_solve_jit")
    if fn is None:
        # index tensors flow in as ARGUMENTS — captured jnp arrays would be
        # baked into the executable as constants (slow compiles, big blobs)
        fn = jax.jit(lambda Xd, cache, sdev: _solve_lu_mf_dev(
            plan, Xd, cache, sdev))
        plan.__dict__["_solve_jit"] = fn
    Xd = jnp.asarray(X, tree[1].dtype)
    return np.asarray(fn(Xd, tree, _collect_lu_sdev(plan)))


def _collect_lu_sdev(plan: LUMFPlan):
    """Nested pytree of the solve-side index tensors (passed as jit args)."""
    sdev = {
        "buckets": [b.__dict__["_sdev"] for b in plan.buckets],
        "skel_idx": jnp.asarray(plan.skel),
    }
    sp = plan.skel_plan
    if isinstance(sp, LUMFPlan):
        sdev["skel"] = _collect_lu_sdev(sp)
    elif isinstance(sp, DenseSkelPlan):
        sdev["skel"] = None
    else:
        from ..solve import _plan_dev

        p0, p1 = _lu_skel_tri_plans(plan)
        sdev["skel"] = (_plan_dev(p0), _plan_dev(p1))
    return sdev


def _solve_lu_mf_dev(plan: LUMFPlan, X, cache, sdev):
    """Recursive device core: X [n, B] (elim order) -> U^{-1} L^{-1} X."""
    from ..solve import _tri_sweep_multi

    fronts, Lxs, Uxs, sub_cache, elim_inner = cache
    ns = len(plan.skel)
    n = plan.n
    B = X.shape[1]
    Xd = jnp.concatenate([X, jnp.zeros((1, B), X.dtype)])
    Ds = jnp.zeros((ns + 1, B), X.dtype)
    devs = sdev["buckets"]
    for (Lss, Uss, LB, UB, _perm), (srow, br_skel, _) in zip(fronts, devs):
        Xd, Ds = _lu_fwd_front(Xd, Ds, Lss, LB, srow, br_skel)
    skel_idx = sdev["skel_idx"]
    # Ds is accumulated at PRE-PIVOT compact rows; the inner solve consumes
    # inner-elimination order, so convert with the composed inner perm.
    bs = Xd[skel_idx] - Ds[:ns][elim_inner]
    if isinstance(plan.skel_plan, LUMFPlan):  # recursive layer
        ys = _solve_lu_mf_dev(plan.skel_plan, bs, sub_cache, sdev["skel"])
    elif isinstance(plan.skel_plan, DenseSkelPlan):
        LUd = Lxs[: ns * ns].reshape(ns, ns)
        Ld = jnp.tril(LUd, -1) + jnp.eye(ns, dtype=LUd.dtype)
        ys = jax.lax.linalg.triangular_solve(
            Ld, bs, left_side=True, lower=True, unit_diagonal=True)
        ys = jax.lax.linalg.triangular_solve(
            jnp.triu(LUd), ys, left_side=True, lower=False)
    else:
        p0, p1 = _lu_skel_tri_plans(plan)
        d0, d1 = sdev["skel"]
        ys = _tri_sweep_multi(Lxs[: plan.skel_plan.lnz], bs, *d0,
                              p0.nlev, p0.emax, p0.wmax, ns, True)
        ys = _tri_sweep_multi(Uxs[: plan.skel_plan.unz], ys, *d1,
                              p1.nlev, p1.emax, p1.wmax, ns, True)
    Xd = Xd.at[skel_idx].set(ys)
    for (Lss, Uss, LB, UB, _perm), (srow, _, bc_glob) in zip(
            reversed(fronts), reversed(devs)):
        Xd = _lu_bwd_front(Xd, Uss, UB, srow, bc_glob)
    return Xd[:n]


def _prep_lu_factor_indices(plan: LUMFPlan):
    """Eagerly build every device index tensor the factorization reads (the
    fused jit must not create tracers into plan caches)."""
    from ._scan import stack_groups
    from .lu_device import LUPlan, _prep_lu_tail_dev

    j = jnp.asarray
    for b in plan.buckets:
        if b.__dict__.get("_dev") is None:
            b.__dict__["_dev"] = tuple(j(t) for t in (
                (b.srow < plan.n),  # real pivot slots
                b.ass_pos, b.abr_pos, b.abc_pos,
                b.lss_pos, b.lss_f, b.lss_r, b.lss_c,
                b.uss_pos, b.uss_f, b.uss_r, b.uss_c,
                b.lb_pos, b.lb_f, b.lb_r, b.lb_c,
                b.ub_pos, b.ub_f, b.ub_r, b.ub_c,
                b.schur_src, b.schur_dst))
    if plan.__dict__.get("_asm_dev") is None:
        plan.__dict__["_asm_dev"] = (j(plan.skel_a_src), j(plan.skel_a_dst))
        plan.__dict__["_map_dev"] = (j(plan.skel_l_src), j(plan.skel_l_dst),
                                     j(plan.skel_u_src), j(plan.skel_u_dst))
    sp = plan.skel_plan
    if isinstance(sp, LUMFPlan):
        _prep_lu_factor_indices(sp)
    elif isinstance(sp, DenseSkelPlan):
        if sp.__dict__.get("_dev") is None:
            sp.__dict__["_dev"] = (j(sp.srows), j(sp.scols))
    else:
        assert isinstance(sp, LUPlan)
        cache = sp.__dict__.setdefault("_dev_groups", [])
        if not cache:
            cache.extend(stack_groups(sp.levels))
        if sp.tail is not None:
            _prep_lu_tail_dev(sp.tail)


def _collect_lu_dev(plan: LUMFPlan):
    """Nested pytree of the factor-side index tensors (passed as jit args —
    closure-captured jnp arrays are baked into executables as constants)."""
    from .lu_device import LUPlan

    dev = {
        "buckets": [b.__dict__["_dev"] for b in plan.buckets],
        "asm": plan.__dict__["_asm_dev"],
        "map": plan.__dict__["_map_dev"],
    }
    sp = plan.skel_plan
    if isinstance(sp, LUMFPlan):
        dev["skel"] = _collect_lu_dev(sp)
    elif isinstance(sp, DenseSkelPlan):
        dev["skel"] = sp.__dict__["_dev"]
    else:
        assert isinstance(sp, LUPlan)
        dev["skel"] = {
            "groups": list(sp.__dict__["_dev_groups"]),
            "tail": (sp.tail.__dict__["_dev"] if sp.tail is not None
                     else None),
        }
    return dev


def _lu_mf_values(Ax, plan: LUMFPlan, tolv, dev):
    """Recursive core: factor device values Ax of the plan's (permuted)
    system. Returns (Lx, Ux, margins, bads, cache tree, perm_parts) where
    perm_parts is the traversal-ordered list of flattened pivot perms — the
    caller concatenates them so the host finalize pass needs ONE readback
    instead of one per front bucket (each a full tunnel round-trip).
    Requires _prep_lu_factor_indices(plan) to have run eagerly; `dev` is
    the matching _collect_lu_dev tree."""
    from ._scan import run_grouped
    from .lu_device import LUPlan, _lu_step, _lu_tail_kernel

    Lx = jnp.zeros(plan.lnz + 1, dtype=Ax.dtype)
    Ux = jnp.zeros(plan.unz + 1, dtype=Ax.dtype)
    Csx = jnp.zeros(plan.skel_cnnz + 1, dtype=Ax.dtype)
    a_src, a_dst = dev["asm"]
    Csx = Csx.at[a_dst].add(Ax[a_src], mode="drop")
    margins, bads = [], []
    front_vals = []
    perm_parts = []
    for bdev in dev["buckets"]:
        Lx, Ux, Csx, mg, bd, Lss, Uss, LB, UB, perm = _lu_front_kernel(
            Lx, Ux, Csx, Ax, tolv, *bdev)
        margins.append(mg)
        bads.append(bd)
        front_vals.append((Lss, Uss, LB, UB, perm))
        perm_parts.append(perm.reshape(-1))

    sp = plan.skel_plan
    if isinstance(sp, LUMFPlan):  # recursive layer (skeleton is unpermuted)
        Lxs, Uxs, m2, b2, sub_cache, sub_perms = _lu_mf_values(
            Csx[: plan.skel_cnnz], sp, tolv, dev["skel"])
        margins += m2
        bads += b2
        perm_parts += sub_perms
    elif isinstance(sp, DenseSkelPlan):
        # dense skeleton: FULL partial pivoting — the pivot pool here is
        # every not-yet-eliminated row, so the search is unrestricted and
        # the tol rule is satisfiable by construction (bad only if the
        # whole remaining column is zero = numerically singular).
        LUd, permd, worst = _dense_skel_kernel(
            Csx[: plan.skel_cnnz], *dev["skel"], ns=sp.ns)
        bads.append(jnp.any(worst == 0.0))
        margins.append(jnp.asarray(0.0, Ax.dtype))
        Lxs = jnp.concatenate(
            [LUd.reshape(-1), jnp.ones((1,), Ax.dtype)])
        Uxs = Lxs
        sub_cache = permd
        perm_parts.append(permd.reshape(-1))
    else:
        assert isinstance(sp, LUPlan)
        sub_cache = None
        Lxs = jnp.zeros(sp.lnz + 1, dtype=Ax.dtype)
        Uxs = jnp.zeros(sp.unz + 1, dtype=Ax.dtype)
        (Lxs, Uxs), aux = run_grouped(
            sp.levels, _lu_step, (Lxs, Uxs),
            (Csx[: plan.skel_cnnz], tolv), dev["skel"]["groups"])
        for gq in aux:
            margins.append(jnp.min(jnp.atleast_1d(gq[0])))
            bads.append(jnp.any(jnp.atleast_1d(gq[1])))
        if sp.tail is not None:
            (*_, nlev, emax, wmax) = sp.tail.tri
            Lxs, Uxs, mgt, bdt = _lu_tail_kernel(
                Lxs, Uxs, Csx[: plan.skel_cnnz], tolv,
                *dev["skel"]["tail"],
                nlev=nlev, emax=emax, wmax=wmax, cut=sp.tail.cut)
            margins.append(mgt)
            bads.append(bdt)
    l_src, l_dst, u_src, u_dst = dev["map"]
    Lx = Lx.at[l_dst].set(Lxs[l_src], mode="drop")
    Ux = Ux.at[u_dst].set(Uxs[u_src], mode="drop")
    # elim_inner placeholder (identity) — replaced by the host finalize pass
    cache = (tuple(front_vals), Lxs, Uxs, sub_cache,
             jnp.arange(len(plan.skel), dtype=jnp.int32))
    return Lx, Ux, margins, bads, cache, perm_parts


def _compose_elim(plan: LUMFPlan, permh: np.ndarray, ofs: int,
                  out_inners: list):
    """Pure host integer pass: compose the per-front device pivot perms
    with the recursive skeleton perm (consumed from the single `permh`
    readback in traversal order via `ofs`).

    Appends each nesting level's inner elimination map to `out_inners`
    in POST-ORDER (children before self — the order `_attach_inners`
    consumes). Returns (elim, ofs): elim[e] = pre-pivot k-row eliminated
    at step e in this plan's space."""
    n = plan.n
    elim = np.arange(n, dtype=np.int64)
    for b in plan.buckets:
        srow = b.srow
        F, spn = srow.shape
        permh_b = permh[ofs : ofs + F * spn].reshape(F, spn)
        ofs += F * spn
        for t in range(F):
            valid = srow[t] < n
            s = int(valid.sum())
            if s == 0:
                continue
            aa = int(srow[t, 0])
            elim[aa : aa + s] = aa + permh_b[t, :s]
    if isinstance(plan.skel_plan, LUMFPlan):
        inner, ofs = _compose_elim(plan.skel_plan, permh, ofs, out_inners)
    elif isinstance(plan.skel_plan, DenseSkelPlan):
        ns = plan.skel_plan.ns
        inner = permh[ofs : ofs + ns].astype(np.int64)  # dense pivot perm
        ofs += ns
    else:
        inner = np.arange(len(plan.skel), dtype=np.int64)
    elim[plan.skel] = plan.skel[inner]
    out_inners.append(inner)
    return elim, ofs


def _attach_inners(plan: LUMFPlan, cache, inners: list, idx: int = 0):
    """Rebuild the cache tree with the given inner-elimination leaves
    (post-order, matching `_compose_elim`). `inners` entries may carry a
    leading batch axis (vmapped factorization) — the solve core gathers
    through them per instance either way."""
    fronts, Lxs, Uxs, sub_cache, _ = cache
    if isinstance(plan.skel_plan, LUMFPlan):
        sub_cache, idx = _attach_inners(plan.skel_plan, sub_cache, inners,
                                        idx)
    new_cache = (fronts, Lxs, Uxs, sub_cache, inners[idx])
    return new_cache, idx + 1


def _collect_compose_dev(plan: LUMFPlan):
    """Static index tensors for the IN-PROGRAM perm compose
    (`_compose_elim_dev`): per bucket, the scatter destinations of each
    front's elimination window (dst[t, j] = aa_t + j for j < s_t, padded
    with n = dropped) and the window bases aa_t; plus the skeleton index
    vector. Built once per plan, passed as jit arguments."""
    cdev = plan.__dict__.get("_compose_dev")
    if cdev is not None:
        return cdev
    n = plan.n
    buckets = []
    for b in plan.buckets:
        srow = b.srow
        F, spn = srow.shape
        s_t = (srow < n).sum(axis=1)
        aa_t = np.where(s_t > 0, srow[:, 0], 0).astype(np.int32)
        j = np.arange(spn, dtype=np.int32)
        dst = np.where(j[None, :] < s_t[:, None],
                       aa_t[:, None] + j[None, :], n).astype(np.int32)
        buckets.append((jnp.asarray(dst), jnp.asarray(aa_t)))
    cdev = {
        "buckets": buckets,
        "skel": jnp.asarray(plan.skel.astype(np.int32)),
        "sub": (_collect_compose_dev(plan.skel_plan)
                if isinstance(plan.skel_plan, LUMFPlan) else None),
        "row_pinv": (jnp.asarray(plan.row_pinv.astype(np.int32))
                     if plan.row_pinv is not None else None),
    }
    plan.__dict__["_compose_dev"] = cdev
    return cdev


def _compose_elim_dev(plan: LUMFPlan, perms: list, idx: int, cdev,
                      out_inners: list):
    """Traced mirror of `_compose_elim`: compose the per-front device pivot
    perms with the recursive skeleton perm ENTIRELY ON DEVICE (no host
    readback between factorization and solve — this is what lets
    `solve._lu_one_shot` fuse factor+solve+refine into one program).
    Consumes `perms` (the perm_parts list from `_lu_mf_values`) in the same
    traversal order the host pass consumes its concatenated readback.
    Appends inner elimination maps post-order; returns (elim, idx)."""
    n = plan.n
    elim = jnp.arange(n, dtype=jnp.int32)
    for (dst, aa), b in zip(cdev["buckets"], plan.buckets):
        F, spn = b.srow.shape
        P = perms[idx].reshape(F, spn).astype(jnp.int32)
        idx += 1
        elim = elim.at[dst].set(aa[:, None] + P, mode="drop")
    if isinstance(plan.skel_plan, LUMFPlan):
        inner, idx = _compose_elim_dev(plan.skel_plan, perms, idx,
                                       cdev["sub"], out_inners)
    elif isinstance(plan.skel_plan, DenseSkelPlan):
        inner = perms[idx].astype(jnp.int32)
        idx += 1
    else:
        inner = jnp.arange(len(plan.skel), dtype=jnp.int32)
    skel = cdev["skel"]
    elim = elim.at[skel].set(skel[inner])
    out_inners.append(inner)
    return elim, idx


def _finalize_cache(plan: LUMFPlan, cache, permh: np.ndarray, ofs: int = 0):
    """Host pass after a successful factorization: compose the per-front
    device pivot perms with the recursive skeleton perm.

    `permh` is the single host readback of the concatenated perm_parts from
    _lu_mf_values, consumed in the same traversal order via `ofs` (one
    transfer instead of a ~17 ms tunnel round-trip per bucket).

    Returns (elim, new_cache, ofs): elim[e] = pre-pivot k-row eliminated at
    step e in this plan's space; new_cache carries the inner elimination map
    the solve path needs to convert Ds (pre-pivot compact) to inner-elim
    order."""
    inners: list = []
    elim, ofs = _compose_elim(plan, permh, ofs, inners)
    new_cache, _ = _attach_inners(
        plan, cache, [jnp.asarray(v.astype(np.int32)) for v in inners])
    return elim, new_cache, ofs


def _lu_plan_index_entries(plan: LUMFPlan) -> int:
    total = sum(b.ass_pos.size + b.abr_pos.size + b.abc_pos.size
                + b.lss_pos.size + b.uss_pos.size + b.lb_pos.size
                + b.ub_pos.size + b.schur_src.size for b in plan.buckets)
    total += plan.skel_a_src.size + plan.skel_l_src.size + plan.skel_u_src.size
    sp = plan.skel_plan
    if isinstance(sp, LUMFPlan):
        total += _lu_plan_index_entries(sp)
    elif isinstance(sp, DenseSkelPlan):
        total += sp.ns * sp.ns
    else:
        total += sum(sum(t.size for t in lev) for lev in sp.levels)
    return total


def _lu_factor_dtype(mixed: bool):
    """Factor-value dtype: f32 on TPU when the caller owns a refinement
    loop (config.lu_factor_dtype="auto") — TPU f64 is software-emulated and
    MXU-ineligible, so mixed precision is the speed-of-light configuration
    (factor+solve in f32, residual recovered to f64 by refinement)."""
    from ..config import config

    if not mixed:
        return None
    ld = config.lu_factor_dtype
    if ld == "auto":
        return jnp.float32 if jax.default_backend() == "tpu" else None
    if ld in ("", "float64", None):
        return None
    return jnp.dtype(ld)


def lu_mf(a: Sprs, s: Symb, plan: LUMFPlan, tol: float, mixed: bool = False):
    """Run the pivoting multifrontal LU — fused into one launch when the
    plan is small enough for the compile pipeline, eagerly otherwise.
    (Fusing everything at lusol_6 scale was measured SLOWER warm — eager
    launches pipeline through the tunnel — so the cap stays conservative;
    see frontal.FUSE_ENTRY_CAP.)"""
    from .frontal import fuse_entry_cap

    from ..config import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    _prep_lu_factor_indices(plan)
    ax_host = a.x[: a.nnz()]
    if plan.vperm is not None:  # factorization runs on A(P, P)
        ax_host = ax_host[plan.vperm]
    fdt = _lu_factor_dtype(mixed)
    Ax = jnp.asarray(ax_host) if fdt is None else jnp.asarray(ax_host, fdt)
    tolv = jnp.asarray(float(tol), Ax.dtype)
    fuse = plan.__dict__.setdefault(
        "_fuse_ok", _lu_plan_index_entries(plan) <= fuse_entry_cap())
    dev = _collect_lu_dev(plan)
    if fuse:
        fn = plan.__dict__.get("_factor_jit")
        if fn is None:
            def run(Ax, tolv, dev):
                Lx, Ux, margins, bads, cache, perms = _lu_mf_values(
                    Ax, plan, tolv, dev)
                mg = (jnp.min(jnp.stack(margins)) if margins
                      else jnp.asarray(0.0, Ax.dtype))
                bad = jnp.any(jnp.stack(bads)) if bads else jnp.asarray(False)
                # one readback for both accept stats
                stats = jnp.stack([mg, bad.astype(Ax.dtype)])
                perm_cat = (jnp.concatenate(perms) if perms
                            else jnp.zeros((0,), jnp.int32))
                return Lx, Ux, stats, cache, perm_cat

            fn = jax.jit(run)
            plan.__dict__["_factor_jit"] = fn
        Lx, Ux, stats, cache, perm_cat = fn(Ax, tolv, dev)
    else:
        Lx, Ux, margins, bads, cache, perms = _lu_mf_values(
            Ax, plan, tolv, dev)
        mg = jnp.min(jnp.stack(margins)) if margins else jnp.zeros(())
        bad = jnp.any(jnp.stack(bads)) if bads else jnp.zeros((), bool)
        stats = jnp.stack([mg.astype(Ax.dtype), bad.astype(Ax.dtype)])
        perm_cat = (jnp.concatenate(perms) if perms
                    else jnp.zeros((0,), jnp.int32))
    # Accept unless a pivot is exactly zero or the element growth implied by
    # a dominating boundary row (worst = 1/max|L_B|) is beyond what the
    # solver drivers' iterative refinement can contract (growth*eps must be
    # well below 1; 1e10 leaves two orders of safety). The drivers verify
    # the actual residual and fall back to the host engine's exact global
    # pivoting if refinement diverges (solve._lu_mf_refine).
    # one batched transfer for both accept stats and the pivot perms (the
    # perms are wasted only on the rare reject; a second tunnel round-trip
    # costs ~25 ms — measured — so optimistic batching wins)
    stats_h, perm_h = jax.device_get((stats, perm_cat))
    worst_min = float(stats_h[0]) + float(tol)
    if bool(stats_h[1]) or not (worst_min >= 1e-10):
        plan.__dict__.pop("_cache_tree", None)
        return None
    # host finalize: compose pivot perms -> labels + pinv
    elim, cache, _ = _finalize_cache(plan, cache, np.asarray(perm_h))
    plan.__dict__["_cache_tree"] = cache
    einv = np.empty(plan.n, dtype=np.int64)
    einv[elim] = np.arange(plan.n)
    Li = plan.Li.copy()
    Li[plan.li_skel] = einv[Li[plan.li_skel]]
    Ui = plan.Ui.copy()
    Ui[plan.ui_skel] = einv[Ui[plan.ui_skel]]
    if plan.row_pinv is not None:
        pinv = einv[plan.row_pinv]
    else:
        pinv = einv.copy()
    # device slices — the MF solve path never reads factor values on host
    return (plan.Lp, Li, Lx[: plan.lnz],
            plan.Up, Ui, Ux[: plan.unz], pinv)
