"""Multifrontal static-pivot LU: batched dense leaf fronts + reduced skeleton.

Unsymmetric analog of factor/frontal.py, for the GESP-style device LU
(lu_device.py). Structure theory: with diagonal (static) pivoting,
struct(L) ⊆ struct(chol(A+Aᵀ)) and struct(U) ⊆ struct(chol(A+Aᵀ))ᵀ, so the
elimination tree of the SYMMETRIZED pattern orders the work: for a subtree
S (contiguous under a postordered column permutation),

  - U(:,k) rows for k ∈ S lie inside S          (descendants)
  - L(:,k) offdiag rows lie in S ∪ skeleton      (ancestors of the root)
  - U(j,c) with j ∈ S, c ∉ S has c ∈ skeleton    (ancestors)

so each front factors independently:

    [L_SS, U_SS] = unpivoted dense LU of A(S,S)
    L_B = A(Br, S) · U_SS⁻¹        (front columns' skeleton rows)
    U_B = L_SS⁻¹ · A(S, Bc)        (skeleton columns' S rows)
    Schur = −L_B · U_B             extend-added into the skeleton system

and the compacted skeleton factors with the level machinery of
lu_device.build_lu_plan. The reference's tol pivot rule
(src/lib.rs:587-589) is evaluated per front column and per skeleton column
as a stability margin; any violation falls back to the host engine's exact
partial pivoting — identical semantics to lu_device.
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
    pos = np.clip(np.searchsorted(keys_sorted, qkeys), 0, len(keys_sorted) - 1)
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
    # scatter maps (flat)
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
    srow: np.ndarray  # [F, Sp] global rows of S slots (n = pad)
    br_skel: np.ndarray  # [F, Bpr] compact skeleton index of Br rows (ns = pad)
    bc_skel: np.ndarray  # [F, Bpc] compact skeleton index of Bc cols (ns = pad)


@dataclasses.dataclass
class LUMFPlan:
    n: int
    lnz: int
    unz: int
    Lp: np.ndarray
    Li: np.ndarray
    Up: np.ndarray
    Ui: np.ndarray
    buckets: List[LUFrontBucket]
    skel: np.ndarray
    skel_plan: object  # lu_device.LUPlan for the compact skeleton
    skel_cnnz: int
    skel_a_src: np.ndarray
    skel_a_dst: np.ndarray
    skel_l_src: np.ndarray
    skel_l_dst: np.ndarray
    skel_u_src: np.ndarray
    skel_u_dst: np.ndarray
    # symmetric-permutation mode (order >= 0): the factorization runs on
    # A2 = A(P, P) with s.q := P and pinv := P^{-1} returned to the driver;
    # vperm maps a.x -> A2.x (static value permutation)
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
    keys = np.unique(c2 * np.int64(n) + r2)
    ti = keys % n
    tc = keys // n
    tp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(tc, minlength=n), out=tp[1:])
    parent = native.etree(n, n, tp, ti, False)
    post = native.post(n, parent)
    return parent, post


RECURSE_MIN = 3000
MAX_DEPTH = 4


def build_lu_mf_plan(a: Sprs, s: Symb, smax: int = 64,
                     depth: int = 0) -> Optional["LUMFPlan"]:
    """Build the multifrontal LU plan. May COMPOSE s.q with the symmetrized
    etree postorder (admissible — lusol applies s.q consistently afterward).
    Large skeletons recurse into another front layer. Returns None when not
    applicable."""
    from ..errors import NoPivotError
    from ..ops.plan import col_ids
    from .lu_device import build_lu_plan, LUPlan

    n = a.n
    row_pinv = None
    vperm = None
    if s.q is not None:
        # GESP symmetric permutation: P = postordered AMD(A + A') applied to
        # BOTH rows and columns — preserves the diagonal (static pivots stay
        # structurally viable, unlike a column-only AMD(A'A)) and gives a
        # bushy elimination tree for the fronts. Admissible because lusol's
        # driver applies pinv (rows) and s.q (columns) consistently; the tol
        # margin still guards numerical deviation from the reference.
        P = native.amd(0, n, n, a.p, a.i[: a.nnz()])
        if P is None:
            P = np.arange(n, dtype=np.int64)
        for _ in range(3):
            pinvP = np.empty(n, dtype=np.int64)
            pinvP[P] = np.arange(n)
            from ..symbolic import _permute_host

            a2 = _permute_host(a, pinvP, P)
            parent, post = _sym_pattern_etree(a2, None)
            if np.array_equal(post, np.arange(n)):
                break
            P = P[post]
        else:
            return None
        # committed to s.q only when plan construction succeeds (bail-outs
        # below must leave the caller's Symb untouched for the host path)
        new_q = P
        row_pinv = pinvP
        from ..ops.plan import permute_plan

        vperm = permute_plan(a, pinvP, P).perm
        a_work = a2
        q = None
    else:
        parent, post = _sym_pattern_etree(a, None)
        if not np.array_equal(post, np.arange(n)):
            return None  # natural order must stay untouched (parity)
        new_q = None
        a_work = a
        q = None
    a = a_work

    cap = 4 * a.nnz() + n
    try:
        Lp, Li, Up, Ui, level = native.lu_pattern(n, a.p, a.i[: a.nnz()], q, cap, cap)
    except NoPivotError:
        return None
    lnz, unz = int(Lp[n]), int(Up[n])

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

    # containment safety: U rows of front columns must stay inside the front,
    # and L rows of front columns must lie in S or below (the same
    # struct ⊆ chol(A+A') argument; a row above S would scatter negatively)
    ucols = col_ids(Up, n)
    lcols = col_ids(Lp, n)
    for r in roots:
        aa = r - sz[r] + 1
        urows = Ui[Up[aa] : Up[int(r) + 1]]
        uc = ucols[Up[aa] : Up[int(r) + 1]]
        if ((urows < aa) & (uc >= aa)).any():
            return None  # theory violated (shouldn't happen) — bail safely
        if (Li[Lp[aa] : Lp[int(r) + 1]] < aa).any():
            return None  # L containment violated — bail safely

    # A keys in k-space
    anz = a.nnz()
    acols = col_ids(a.p, n)
    if q is not None:
        qinv = np.empty(n, dtype=np.int64)
        qinv[q] = np.arange(n)
        k_of = qinv[acols]
    else:
        k_of = acols
    arows = a.i[:anz].astype(np.int64)
    akeys = k_of * np.int64(n) + arows
    aorder = np.argsort(akeys, kind="stable")
    akeys_s = akeys[aorder]

    sk_mask = ~in_front

    # ---- per-front boundaries -------------------------------------------
    fronts = []
    for r in roots:
        aa = int(r - sz[r] + 1)
        S = np.arange(aa, int(r) + 1)
        lr = Li[Lp[aa] : Lp[int(r) + 1]]
        Br = np.unique(lr[lr > r])  # skeleton rows touched by front L cols
        fronts.append([S, Br, None])
    # column boundaries: U entries with row in a front, col outside it
    fr_of = np.full(n, -1, dtype=np.int64)
    for fi, r in enumerate(roots):
        aa = int(r - sz[r] + 1)
        fr_of[aa : int(r) + 1] = fi
    u_rows_all = Ui
    u_cols_all = ucols
    m_cross = (fr_of[np.clip(u_rows_all, 0, n - 1)] >= 0) & sk_mask[u_cols_all]
    cross_f = fr_of[u_rows_all[m_cross]]
    cross_c = u_cols_all[m_cross]
    for fi in range(len(roots)):
        fronts[fi][2] = np.unique(cross_c[cross_f == fi])

    # ---- skeleton pattern: A(skel, skel) + Br x Bc cliques ---------------
    keep = sk_mask[arows] & sk_mask[k_of]
    pairs = set(zip(g[arows[keep]].tolist(), g[k_of[keep]].tolist()))
    # diagonal must exist for the static-pivot skeleton factorization
    for d in range(ns):
        pairs.add((d, d))
    for S, Br, Bc in fronts:
        gr = g[Br]
        gc = g[Bc]
        for x in gr:
            for y in gc:
                pairs.add((int(x), int(y)))
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
                         g[k_of[keep]] * np.int64(ns) + g[arows[keep]])

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
            srow[t, : len(S)] = S
            br_skel[t, : len(Br)] = g[Br]
            bc_skel[t, : len(Bc)] = g[Bc]
            aa = int(S[0])
            ls, lbr, lbc = len(S), len(Br), len(Bc)
            ass_pos[t, :ls, :ls] = _lookup(
                akeys_s, aorder,
                S[None, :] * np.int64(n) + S[:, None])  # [row, col]
            if lbr:
                abr_pos[t, :lbr, :ls] = _lookup(
                    akeys_s, aorder, S[None, :] * np.int64(n) + Br[:, None])
            if lbc:
                abc_pos[t, :ls, :lbc] = _lookup(
                    akeys_s, aorder, Bc[None, :] * np.int64(n) + S[:, None])
            for j in S:
                for p_ in range(int(Lp[j]), int(Lp[j + 1])):
                    i_ = int(Li[p_])
                    if i_ <= int(S[-1]):
                        lss[0].append(p_); lss[1].append(t)
                        lss[2].append(i_ - aa); lss[3].append(int(j) - aa)
                    else:
                        lb[0].append(p_); lb[1].append(t)
                        lb[2].append(int(np.searchsorted(Br, i_)))
                        lb[3].append(int(j) - aa)
                for p_ in range(int(Up[j]), int(Up[j + 1])):
                    i_ = int(Ui[p_])
                    uss[0].append(p_); uss[1].append(t)
                    uss[2].append(i_ - aa); uss[3].append(int(j) - aa)
            # U_B scatter: skeleton columns c with U rows in S
            for c in Bc:
                cloc = int(np.searchsorted(Bc, c))
                for p_ in range(int(Up[c]), int(Up[c + 1])):
                    i_ = int(Ui[p_])
                    if aa <= i_ <= int(S[-1]):
                        ub[0].append(p_); ub[1].append(t)
                        ub[2].append(i_ - aa); ub[3].append(cloc)
            if lbr and lbc:
                gr = g[Br]; gc = g[Bc]
                xs = np.repeat(np.arange(lbr), lbc)
                ys = np.tile(np.arange(lbc), lbr)
                dsts = _lookup(skeys, sk_order,
                               gc[ys] * np.int64(ns) + gr[xs])
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

    # ---- skeleton plan ---------------------------------------------------
    c_skel = Sprs(s_cnnz, ns, ns, sCp, srows, np.zeros(s_cnnz))
    s_sub = Symb()
    s_sub.q = None
    skel_plan = None
    if ns > RECURSE_MIN and depth < MAX_DEPTH:
        try:
            skel_plan = build_lu_mf_plan(c_skel, s_sub, smax, depth + 1)
        except Exception:
            skel_plan = None
    if skel_plan is None:
        skel_plan = build_lu_plan(c_skel, s_sub)
    if skel_plan is None or not isinstance(skel_plan, (LUPlan, LUMFPlan)):
        return None
    # position maps skeleton L/U -> global. The skeleton pattern may be a
    # strict SUPERSET of the global restricted pattern: the per-front clique
    # (∪Br)x(∪Bc) over-approximates the union of per-column cliques for
    # unsymmetric patterns — but the extra skeleton positions receive exact
    # numeric zeros (each Schur term needs r∈Br_j AND c∈Bc_j for the SAME
    # j), so mapping every GLOBAL entry into the skeleton factor by lookup
    # is exact; unmapped skeleton entries simply aren't copied back.
    skel_lcols = np.repeat(np.arange(ns, dtype=np.int64),
                           np.diff(skel_plan.Lp))
    skl_keys = skel_lcols * np.int64(ns) + skel_plan.Li
    skl_order = np.argsort(skl_keys, kind="stable")
    skl_sorted = skl_keys[skl_order]
    skel_ucols = np.repeat(np.arange(ns, dtype=np.int64),
                           np.diff(skel_plan.Up))
    sku_keys = skel_ucols * np.int64(ns) + skel_plan.Ui
    sku_order = np.argsort(sku_keys, kind="stable")
    sku_sorted = sku_keys[sku_order]
    glob_lcols = col_ids(Lp, n)
    sel_l = sk_mask[glob_lcols]  # skeleton columns' L entries (rows all skel)
    sl_dst = np.nonzero(sel_l)[0]
    sl_src = _lookup(skl_sorted, skl_order,
                     g[glob_lcols[sel_l]] * np.int64(ns) + g[Li[sel_l]])
    if (sl_src < 0).any():
        return None  # true containment violation — bail safely
    glob_ucols = ucols
    # global U skeleton-column entries at skeleton rows (front S-rows were
    # written by the front kernels' ub scatter)
    sel_u = sk_mask[glob_ucols] & sk_mask[Ui]
    su_dst = np.nonzero(sel_u)[0]
    su_src = _lookup(sku_sorted, sku_order,
                     g[glob_ucols[sel_u]] * np.int64(ns) + g[Ui[sel_u]])
    if (su_src < 0).any():
        return None
    if row_pinv is not None:
        s.q = new_q  # commit the composed ordering only on success
    return LUMFPlan(
        n=n, lnz=lnz, unz=unz, Lp=Lp, Li=Li, Up=Up, Ui=Ui, buckets=buckets,
        skel=skel, skel_plan=skel_plan, skel_cnnz=s_cnnz,
        skel_a_src=skel_a_src, skel_a_dst=skel_a_dst,
        skel_l_src=np.asarray(sl_src, np.int64),
        skel_l_dst=np.asarray(sl_dst, np.int64),
        skel_u_src=np.asarray(su_src, np.int64),
        skel_u_dst=np.asarray(su_dst, np.int64),
        row_pinv=row_pinv, vperm=vperm,
    )


def _unpivoted_lu(M, valid):
    """Batched dense LU without pivoting. M: [F, Sp, Sp]; `valid` marks real
    pivot slots (padded slots get 1.0 pivots). Returns (LU packed, margin)
    where margin applies the reference tol rule against column maxima."""
    ft = M.dtype
    spn = M.shape[-1]
    # padded slots: identity pivots
    M = M + jax.vmap(jnp.diag)(jnp.where(valid, 0.0, 1.0).astype(ft))

    def body(c, carry):
        M, worst = carry
        col = M[:, :, c]
        piv = M[:, c, c]
        rowmask = jax.lax.broadcasted_iota(jnp.int32, (spn,), 0) > c
        colmax = jnp.max(jnp.where(rowmask[None, :], jnp.abs(col), 0.0), axis=1)
        colmax = jnp.maximum(colmax, jnp.abs(piv))
        worst = jnp.minimum(worst, jnp.abs(piv) / jnp.maximum(colmax, 1e-300))
        safe = jnp.where(piv == 0, jnp.ones((), ft), piv)
        l = jnp.where(rowmask[None, :], col / safe[:, None], 0.0)
        u = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (spn,), 0) > c,
                      M[:, c, :], 0.0)
        M = M - l[:, :, None] * u[:, None, :]
        M = M.at[:, :, c].set(jnp.where(rowmask[None, :], l, col))
        return M, worst

    M, worst = jax.lax.fori_loop(0, spn, body, (M, jnp.full(M.shape[0], jnp.inf, ft)))
    return M, worst


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _lu_front_kernel(Lx, Ux, Csx, Ax, tol, ass_pos, abr_pos, abc_pos,
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
    has_diag = jnp.diagonal(ass_pos, axis1=1, axis2=2) >= 0
    LUp, worst = _unpivoted_lu(Ass, has_diag)
    spn = LUp.shape[-1]
    eye = jnp.eye(spn, dtype=ft)
    Lss = jnp.tril(LUp, -1) + eye[None]
    Uss = jnp.triu(LUp)
    Abr = g(abr_pos)
    # L_B = A(Br,S) Uss^{-1}  -> solve X Uss = Abr
    LB = jax.lax.linalg.triangular_solve(Uss, Abr, left_side=False, lower=False)
    # U_B = Lss^{-1} A(S,Bc)  (unit lower)
    Abc = g(abc_pos)
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
    return Lx, Ux, Csx, margin, bad, Lss, Uss, LB, UB


@partial(jax.jit, donate_argnums=(0,))
def _lu_fwd_front(X, Ds, Lss, LB, srow, br_skel):
    """L forward, front phase: y_S = Lss^{-1} b_S (unit lower); accumulate
    LB y_S into the skeleton delta."""
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
    else:
        p0, p1 = _lu_skel_tri_plans(plan)
        _plan_dev(p0)
        _plan_dev(p1)


def solve_lu_mf(plan: LUMFPlan, X: np.ndarray) -> np.ndarray:
    """X := U^{-1} L^{-1} X using the factors cached by the last lu_mf call.

    X is [n, B]. Front work is dense batched triangular solves; only the
    innermost skeleton runs level sweeps. The recursive solve compiles into
    a single launch per (plan, batch-shape)."""
    tree = plan.__dict__.get("_cache_tree")
    if tree is None:
        raise RuntimeError("solve_lu_mf requires a preceding lu_mf")
    _prep_lu_solve_indices(plan)
    fn = plan.__dict__.get("_solve_jit")
    if fn is None:
        fn = jax.jit(lambda Xd, cache: _solve_lu_mf_dev(plan, Xd, cache))
        plan.__dict__["_solve_jit"] = fn
    Xd = jnp.asarray(X, tree[1].dtype)
    return np.asarray(fn(Xd, tree))


def _solve_lu_mf_dev(plan: LUMFPlan, X, cache):
    """Recursive device core: X [n, B] -> U^{-1} L^{-1} X."""
    from ..solve import _plan_dev, _tri_sweep_multi

    fronts, Lxs, Uxs, sub_cache = cache
    ns = len(plan.skel)
    n = plan.n
    B = X.shape[1]
    Xd = jnp.concatenate([X, jnp.zeros((1, B), X.dtype)])
    Ds = jnp.zeros((ns + 1, B), X.dtype)
    devs = []
    for b in plan.buckets:
        d = b.__dict__.get("_sdev")
        if d is None:
            bc_glob = np.where(b.bc_skel < ns,
                               plan.skel[np.clip(b.bc_skel, 0, ns - 1)], n)
            d = (jnp.asarray(b.srow), jnp.asarray(b.br_skel),
                 jnp.asarray(bc_glob))
            b.__dict__["_sdev"] = d
        devs.append(d)
    for (Lss, Uss, LB, UB), (srow, br_skel, _) in zip(fronts, devs):
        Xd, Ds = _lu_fwd_front(Xd, Ds, Lss, LB, srow, br_skel)
    skel_idx = jnp.asarray(plan.skel)
    bs = Xd[skel_idx] - Ds[:ns]
    if isinstance(plan.skel_plan, LUMFPlan):  # recursive layer
        ys = _solve_lu_mf_dev(plan.skel_plan, bs, sub_cache)
    else:
        p0, p1 = _lu_skel_tri_plans(plan)
        ys = _tri_sweep_multi(Lxs[: plan.skel_plan.lnz], bs, *_plan_dev(p0),
                              p0.nlev, p0.emax, p0.wmax, ns, True)
        ys = _tri_sweep_multi(Uxs[: plan.skel_plan.unz], ys, *_plan_dev(p1),
                              p1.nlev, p1.emax, p1.wmax, ns, True)
    Xd = Xd.at[skel_idx].set(ys)
    for (Lss, Uss, LB, UB), (srow, _, bc_glob) in zip(reversed(fronts),
                                                      reversed(devs)):
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
    else:
        assert isinstance(sp, LUPlan)
        cache = sp.__dict__.setdefault("_dev_groups", [])
        if not cache:
            cache.extend(stack_groups(sp.levels))
        if sp.tail is not None:
            _prep_lu_tail_dev(sp.tail)


def _lu_mf_values(Ax, plan: LUMFPlan, tolv):
    """Recursive core: factor device values Ax of the plan's (permuted)
    system. Returns (Lx, Ux, margins, bads, cache tree). Requires
    _prep_lu_factor_indices(plan) to have run eagerly."""
    from ._scan import run_grouped
    from .lu_device import LUPlan, _lu_step, _lu_tail_kernel

    Lx = jnp.zeros(plan.lnz + 1, dtype=Ax.dtype)
    Ux = jnp.zeros(plan.unz + 1, dtype=Ax.dtype)
    Csx = jnp.zeros(plan.skel_cnnz + 1, dtype=Ax.dtype)
    a_src, a_dst = plan.__dict__["_asm_dev"]
    Csx = Csx.at[a_dst].add(Ax[a_src], mode="drop")
    margins, bads = [], []
    front_vals = []
    for b in plan.buckets:
        Lx, Ux, Csx, mg, bd, Lss, Uss, LB, UB = _lu_front_kernel(
            Lx, Ux, Csx, Ax, tolv, *b.__dict__["_dev"])
        margins.append(mg)
        bads.append(bd)
        front_vals.append((Lss, Uss, LB, UB))

    sp = plan.skel_plan
    if isinstance(sp, LUMFPlan):  # recursive layer (skeleton is unpermuted)
        Lxs, Uxs, m2, b2, sub_cache = _lu_mf_values(Csx[: plan.skel_cnnz], sp, tolv)
        margins += m2
        bads += b2
    else:
        assert isinstance(sp, LUPlan)
        sub_cache = None
        Lxs = jnp.zeros(sp.lnz + 1, dtype=Ax.dtype)
        Uxs = jnp.zeros(sp.unz + 1, dtype=Ax.dtype)
        (Lxs, Uxs), aux = run_grouped(
            sp.levels, _lu_step, (Lxs, Uxs),
            (Csx[: plan.skel_cnnz], tolv), sp.__dict__["_dev_groups"])
        for gq in aux:
            margins.append(jnp.min(jnp.atleast_1d(gq[0])))
            bads.append(jnp.any(jnp.atleast_1d(gq[1])))
        if sp.tail is not None:
            (*_, nlev, emax, wmax) = sp.tail.tri
            Lxs, Uxs, mgt, bdt = _lu_tail_kernel(
                Lxs, Uxs, Csx[: plan.skel_cnnz], tolv,
                *sp.tail.__dict__["_dev"],
                nlev=nlev, emax=emax, wmax=wmax, cut=sp.tail.cut)
            margins.append(mgt)
            bads.append(bdt)
    l_src, l_dst, u_src, u_dst = plan.__dict__["_map_dev"]
    Lx = Lx.at[l_dst].set(Lxs[l_src], mode="drop")
    Ux = Ux.at[u_dst].set(Uxs[u_src], mode="drop")
    cache = (tuple(front_vals), Lxs, Uxs, sub_cache)
    return Lx, Ux, margins, bads, cache


def _lu_plan_index_entries(plan: LUMFPlan) -> int:
    total = sum(b.ass_pos.size + b.abr_pos.size + b.abc_pos.size
                + b.lss_pos.size + b.uss_pos.size + b.lb_pos.size
                + b.ub_pos.size + b.schur_src.size for b in plan.buckets)
    total += plan.skel_a_src.size + plan.skel_l_src.size + plan.skel_u_src.size
    sp = plan.skel_plan
    if isinstance(sp, LUMFPlan):
        total += _lu_plan_index_entries(sp)
    else:
        total += sum(sum(t.size for t in lev) for lev in sp.levels)
    return total


def lu_mf(a: Sprs, s: Symb, plan: LUMFPlan, tol: float):
    """Run the multifrontal LU — fused into one launch when the plan is
    small enough for the compile pipeline, eagerly otherwise. Returns a
    lu_device-style tuple or None when the stability margin rejects static
    pivoting."""
    from .frontal import FUSE_ENTRY_CAP

    _prep_lu_factor_indices(plan)
    ax_host = a.x[: a.nnz()]
    if plan.vperm is not None:  # factorization runs on A(P, P)
        ax_host = ax_host[plan.vperm]
    Ax = jnp.asarray(ax_host)
    tolv = jnp.asarray(float(tol), Ax.dtype)
    fuse = plan.__dict__.setdefault(
        "_fuse_ok", _lu_plan_index_entries(plan) <= FUSE_ENTRY_CAP)
    if fuse:
        fn = plan.__dict__.get("_factor_jit")
        if fn is None:
            def run(Ax, tolv):
                Lx, Ux, margins, bads, cache = _lu_mf_values(Ax, plan, tolv)
                mg = (jnp.min(jnp.stack(margins)) if margins
                      else jnp.asarray(0.0, Ax.dtype))
                bad = jnp.any(jnp.stack(bads)) if bads else jnp.asarray(False)
                return Lx, Ux, mg, bad, cache

            fn = jax.jit(run)
            plan.__dict__["_factor_jit"] = fn
        Lx, Ux, mg, bad, cache = fn(Ax, tolv)
    else:
        Lx, Ux, margins, bads, cache = _lu_mf_values(Ax, plan, tolv)
        mg = jnp.min(jnp.stack(margins)) if margins else 0.0
        bad = jnp.any(jnp.stack(bads)) if bads else False
    if bool(bad) or not (float(mg) >= 0.0):
        # host fallback will produce different (pivoted) factors — a stale
        # cache must not serve solves for them
        plan.__dict__.pop("_cache_tree", None)
        return None
    plan.__dict__["_cache_tree"] = cache
    pinv = (plan.row_pinv if plan.row_pinv is not None
            else np.arange(plan.n, dtype=np.int64))
    return (plan.Lp, plan.Li, np.asarray(Lx[: plan.lnz]),
            plan.Up, plan.Ui, np.asarray(Ux[: plan.unz]), pinv)
