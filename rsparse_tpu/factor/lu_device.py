"""Device LU, level-scheduled tier (static pivot + margin).

The PRIMARY device LU is the pivoting multifrontal path in
factor/frontal_lu.py (row matching + in-front threshold pivoting + dense
pivoted skeleton + driver-side iterative refinement); `lu_device` routes
problems above `config.mf_min_n` there. This module keeps two pieces:

1. `build_lu_plan`/`_lu_step` — the level-scheduled static-pivot kernel
   (GESP-style): with a fixed pivot order the L/U patterns are static
   (native rt_lu_pattern), and each elimination level factors as one
   batched dense `triangular_solve` + matmul:
      For column k with static offdiag-U rows B_k and offdiag-L rows L_k:
          M z = a(B_k)          M = L(B_k,B_k) unit-lower
          u_kk = a(k) - L(k,B_k)·z
          l = (a(L_k) - L(L_k,B_k) @ z) / u_kk
   Used for mid-size problems below the multifrontal threshold and as the
   innermost skeleton fallback when recursion bottoms out too large for
   the dense pivoted block.
2. The trailing-dense tail (`LUDenseTail`) shared with the skeleton path.

The reference's tol rule (diagonal preferred iff |x[col]| >= tol·max|x|,
src/lib.rs:587-589) is evaluated on device as a stability margin: if a
static pivot violates it, this tier falls back to the host engine's
reference-exact partial pivoting (the multifrontal tier instead pivots on
device and refines).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..data import Sprs, Symb
from ..errors import NoPivotError
from ..symbolic import native


def _next_pow2(x: int) -> int:
    return 1 << max(0, (int(x) - 1).bit_length())


def _pow4(x: int) -> int:
    """Coarse shape ladder (1,4,16,64,…): keeps the set of compiled kernel
    shapes tiny (remote TPU compiles cost tens of seconds each)."""
    p = 1
    while p < x:
        p *= 4
    return p


def _lookup(keys_sorted: np.ndarray, order: np.ndarray, qkeys: np.ndarray) -> np.ndarray:
    """Positions of qkeys in a sorted key table; -1 where absent."""
    if len(keys_sorted) == 0:
        return np.full(qkeys.shape, -1, dtype=np.int64)
    pos = np.clip(np.searchsorted(keys_sorted, qkeys), 0, len(keys_sorted) - 1)
    found = keys_sorted[pos] == qkeys
    return np.where(found, order[pos], -1).astype(np.int64)


@dataclasses.dataclass
class LUDenseTail:
    """Trailing-dense block for static-pivot LU (columns [cut, n)).

    Like chol_device.DenseTail but unsymmetric, and simpler: the left-
    looking level phase computes COLUMNS < cut in full (their tail rows
    L_TN included), so only U_NT = L_NN^{-1} A(N,T) needs a batched sweep;
    L_TN gathers densely from the already-computed Lx, then
    S = A(T,T) − L_TN U_NT factors with an unpivoted dense LU whose margins
    feed the same tol rule as the level kernels."""

    cut: int
    d: int
    tri: Tuple  # L_NN lsolve schedule, positions into the FULL Lx
    ant_pos: np.ndarray  # [cut, D] A positions of A(N, T)
    att_pos: np.ndarray  # [D, D] A positions of A(T, T)
    ltn_src: np.ndarray  # [nltn] positions in Lx of L(T, N) entries
    ltn_r: np.ndarray  # row (t - cut)
    ltn_c: np.ndarray  # col (j < cut)
    unt_pos: np.ndarray  # [nunt] scatter into Ux (U(N, T) entries)
    unt_r: np.ndarray  # row (< cut)
    unt_c: np.ndarray  # col (t - cut)
    ltt_pos: np.ndarray
    ltt_r: np.ndarray
    ltt_c: np.ndarray
    utt_pos: np.ndarray
    utt_r: np.ndarray
    utt_c: np.ndarray


@dataclasses.dataclass
class LUPlan:
    n: int
    lnz: int
    unz: int
    Lp: np.ndarray
    Li: np.ndarray
    Up: np.ndarray
    Ui: np.ndarray
    q: Optional[np.ndarray]
    levels: List[Tuple[np.ndarray, ...]]
    plan_entries: int  # total gather-tensor volume (cost guard)
    tail: Optional[LUDenseTail] = None


# Beyond this many gather-tensor entries the dense-block plan is bigger than
# the problem deserves; the host engine is faster there anyway.
PLAN_ENTRY_CAP = 300_000_000


def build_lu_plan(a: Sprs, s: Symb, level_batch: int = 2048) -> Optional[LUPlan]:
    """Static per-level gather/scatter tensors; None if the plan would blow
    past PLAN_ENTRY_CAP (caller falls back to host)."""
    from ..ops.plan import col_ids

    n = a.n
    q = np.asarray(s.q, dtype=np.int64) if s.q is not None else None
    cap = 4 * a.nnz() + n
    Lp, Li, Up, Ui, level = native.lu_pattern(n, a.p, a.i[: a.nnz()], q, cap, cap)
    lnz, unz = int(Lp[n]), int(Up[n])

    # quick cost estimate: sum over columns of r^2 + lr*r
    rcnt = np.diff(Up) - 1  # offdiag U rows per column
    lcnt = np.diff(Lp) - 1  # offdiag L rows per column
    est_col = rcnt * rcnt + lcnt * rcnt

    # position lookup tables
    lcols = col_ids(Lp, n)
    lkeys = lcols * np.int64(n) + Li
    lorder = np.arange(lnz, dtype=np.int64)
    if lnz and not np.all(np.diff(lkeys) > 0):  # diag-first breaks ordering
        lorder = np.argsort(lkeys, kind="stable")
        lkeys = lkeys[lorder]

    anz = a.nnz()
    acols_logical = col_ids(a.p, n)  # columns of A
    # column k of the factorization reads A(:, q[k]); build keys in k-space
    if q is not None:
        qinv = np.empty(n, dtype=np.int64)
        qinv[q] = np.arange(n)
        k_of_entry = qinv[acols_logical]
    else:
        k_of_entry = acols_logical
    akeys = k_of_entry * np.int64(n) + a.i[:anz]
    aorder = np.argsort(akeys, kind="stable")
    akeys_s = akeys[aorder]

    from .chol_device import _choose_cut

    cut = _choose_cut(level, n)
    # plan-size guard: dense-ish systems blow up the level gather tensors —
    # push the cut down so the dense trailing block absorbs the heavy part
    # (dense LU flops are cheap on the MXU; positional gathers are not)
    while cut > 8 and int(np.sum(est_col[:cut])) > PLAN_ENTRY_CAP:
        cut = max(8, min(cut - 512, int(cut * 3 // 4)))
    if int(np.sum(est_col[:cut])) > PLAN_ENTRY_CAP or n - cut > 4096:
        return None  # still too big (or a >4096 dense block): host engine wins
    lev_n = level[:cut]
    nlev = int(lev_n.max()) + 1 if cut else 0
    order_by_level = np.argsort(lev_n, kind="stable")  # indices < cut only
    lev_off = np.zeros(nlev + 1, dtype=np.int64)
    np.cumsum(np.bincount(lev_n, minlength=nlev), out=lev_off[1:])

    levels = []
    total = 0
    for lev in range(nlev):
        lev_ks = order_by_level[lev_off[lev] : lev_off[lev + 1]]
        if len(lev_ks) == 0:
            continue
        # one batch per level, dims snapped to the pow4 ladder so that
        # consecutive levels share shapes and fuse into lax.scan groups
        # (launch count dominates level-scheduled factorization)
        # pow2 for the cubic-cost dims, pow4 only for batch width
        rmax = _next_pow2(max(int(rcnt[lev_ks].max()), 1))
        lmax = _next_pow2(max(int(lcnt[lev_ks].max()), 1))
        ks_all = lev_ks
        if True:
            for s0 in range(0, len(ks_all), level_batch):
                ks = ks_all[s0 : s0 + level_batch]
                K = len(ks)
                Kp = _pow4(K)
                B = np.full((Kp, rmax), -1, dtype=np.int64)  # offdiag U rows
                Lr = np.full((Kp, lmax), -1, dtype=np.int64)  # offdiag L rows
                for t, k in enumerate(ks):
                    B[t, : rcnt[k]] = Ui[Up[k] : Up[k + 1] - 1]
                    Lr[t, : lcnt[k]] = Li[Lp[k] + 1 : Lp[k + 1]]
                bvalid = B >= 0
                lvalid = Lr >= 0
                Bc = np.where(bvalid, B, 0)
                Lc = np.where(lvalid, Lr, 0)
                kcol = np.zeros(Kp, dtype=np.int64)
                kcol[:K] = ks

                # M(a,b) = L(B[a], B[b]) for b <= a (unit diag at a == b) —
                # lookups only on valid (unpadded) entries
                colb = np.broadcast_to(Bc[:, None, :], (Kp, rmax, rmax))
                rowa = np.broadcast_to(Bc[:, :, None], (Kp, rmax, rmax))
                tril = np.tril(np.ones((rmax, rmax), bool), -1)
                pv = bvalid[:, :, None] & bvalid[:, None, :] & tril
                Midx = np.full((Kp, rmax, rmax), -1, dtype=np.int64)
                if pv.any():
                    Midx[pv] = _lookup(lkeys, lorder,
                                       colb[pv] * np.int64(n) + rowa[pv])
                # N(a,b) = L(Lr[a], B[b])
                colb2 = np.broadcast_to(Bc[:, None, :], (Kp, lmax, rmax))
                rowl = np.broadcast_to(Lc[:, :, None], (Kp, lmax, rmax))
                pv2 = lvalid[:, :, None] & bvalid[:, None, :]
                Nidx = np.full((Kp, lmax, rmax), -1, dtype=np.int64)
                if pv2.any():
                    Nidx[pv2] = _lookup(lkeys, lorder,
                                        colb2[pv2] * np.int64(n) + rowl[pv2])
                # L(k, B[b]) row of the current pivot
                kb = kcol[:, None] * 0 + Bc  # columns
                Kidx = np.where(bvalid, _lookup(lkeys, lorder, kb * np.int64(n) + kcol[:, None]), -1)
                # A gathers (k-space keys)
                bidx_u = np.where(bvalid, _lookup(akeys_s, aorder, kcol[:, None] * np.int64(n) + Bc), -1)
                bidx_l = np.where(lvalid, _lookup(akeys_s, aorder, kcol[:, None] * np.int64(n) + Lc), -1)
                akk = _lookup(akeys_s, aorder, kcol * np.int64(n) + kcol)
                akk[K:] = -1
                # scatter positions
                upos = np.full((Kp, rmax), unz, dtype=np.int64)
                for t, k in enumerate(ks):
                    upos[t, : rcnt[k]] = np.arange(Up[k], Up[k + 1] - 1)
                dpos = np.full(Kp, unz, dtype=np.int64)
                dpos[:K] = Up[ks + 1] - 1  # U diag is last entry per column
                lpos = np.full((Kp, lmax), lnz, dtype=np.int64)
                for t, k in enumerate(ks):
                    lpos[t, : lcnt[k]] = np.arange(Lp[k] + 1, Lp[k + 1])
                ldiag = np.full(Kp, lnz, dtype=np.int64)
                ldiag[:K] = Lp[ks]
                vmask = np.zeros(Kp, dtype=bool)
                vmask[:K] = True
                levels.append(tuple(
                    x.astype(np.int32) if x.dtype != bool else x
                    for x in (Midx, Nidx, Kidx, bidx_u, bidx_l, akk, upos, dpos, lpos, ldiag)
                ) + (vmask,))
                total += Midx.size + Nidx.size
    tail = None
    if cut < n:
        tail = _build_lu_tail(n, cut, Lp, Li, Up, Ui, lnz, unz,
                              akeys_s, aorder, lcols)
    return LUPlan(n=n, lnz=lnz, unz=unz, Lp=Lp, Li=Li, Up=Up, Ui=Ui, q=q,
                  levels=levels, plan_entries=total, tail=tail)


def _build_lu_tail(n, cut, Lp, Li, Up, Ui, lnz, unz, akeys_s, aorder, lcols):
    from ..data import Sprs as _Sprs
    from ..solve import tri_plan

    D = n - cut
    # L_NN schedule (cols < cut, rows < cut), positions into full Lx
    mask_nn = (lcols < cut) & (Li < cut)
    sub = np.nonzero(mask_nn)[0]
    nn_p = np.zeros(cut + 1, dtype=np.int64)
    np.cumsum(np.bincount(lcols[sub], minlength=cut), out=nn_p[1:])
    lnn = _Sprs(len(sub), cut, cut, nn_p, Li[sub], np.zeros(len(sub)))
    tp = tri_plan(lnn, 0)
    ent_pos = sub[tp.ent_pos].astype(np.int32) if len(tp.ent_pos) else tp.ent_pos
    col_diag = sub[tp.col_diag].astype(np.int32)
    tri = (ent_pos, tp.ent_row, tp.ent_col, tp.ent_slot, tp.ent_off,
           tp.col_id, col_diag, tp.col_off, tp.nlev, tp.emax, tp.wmax)
    i_grid = np.arange(cut, dtype=np.int64)[:, None]
    t_grid = (cut + np.arange(D, dtype=np.int64))[None, :]
    ant_pos = _lookup(akeys_s, aorder, t_grid * np.int64(n) + i_grid)
    a_grid = (cut + np.arange(D, dtype=np.int64))[:, None]
    att_pos = _lookup(akeys_s, aorder, t_grid * np.int64(n) + a_grid)
    # L(T, N): entries of columns < cut with rows >= cut (already computed
    # by the level phase — gathered densely)
    m21 = (lcols < cut) & (Li >= cut)
    p21 = np.nonzero(m21)[0]
    # U(N, T): entries of columns >= cut with rows < cut (scatter targets)
    ucols = np.repeat(np.arange(n, dtype=np.int64), np.diff(Up))
    mnt = (ucols >= cut) & (Ui < cut)
    pnt = np.nonzero(mnt)[0]
    # tail-internal entries
    mtt_l = lcols >= cut
    ptt_l = np.nonzero(mtt_l)[0]
    mtt_u = (ucols >= cut) & (Ui >= cut)
    ptt_u = np.nonzero(mtt_u)[0]
    return LUDenseTail(
        cut=cut, d=D, tri=tri,
        ant_pos=ant_pos.astype(np.int32),
        att_pos=att_pos.astype(np.int32),
        ltn_src=p21.astype(np.int32),
        ltn_r=(Li[p21] - cut).astype(np.int32),
        ltn_c=lcols[p21].astype(np.int32),
        unt_pos=pnt.astype(np.int32),
        unt_r=Ui[pnt].astype(np.int32),
        unt_c=(ucols[pnt] - cut).astype(np.int32),
        ltt_pos=ptt_l.astype(np.int32),
        ltt_r=(Li[ptt_l] - cut).astype(np.int32),
        ltt_c=(lcols[ptt_l] - cut).astype(np.int32),
        utt_pos=ptt_u.astype(np.int32),
        utt_r=(Ui[ptt_u] - cut).astype(np.int32),
        utt_c=(ucols[ptt_u] - cut).astype(np.int32),
    )


def _unpivoted_lu_blocked(M, panel: int = 64):
    """Unpivoted dense LU of a single [D, D] matrix, right-looking blocked
    (panel rank-1s + MXU Schur updates — O(D³/panel) memory traffic instead
    of O(D³)). Returns (packed LU, worst |piv|/colmax ratio)."""
    ft = M.dtype
    D = M.shape[0]
    worst = jnp.asarray(jnp.inf, ft)
    for b0 in range(0, D, panel):
        pb = min(panel, D - b0)
        blk = M[b0:, b0 : b0 + pb]  # [R, pb], pivot row c is local row c
        R = blk.shape[0]

        def body(c, carry):
            blk, worst = carry
            colc = jax.lax.dynamic_index_in_dim(blk, c, axis=1, keepdims=False)
            piv = jax.lax.dynamic_index_in_dim(colc, c, axis=0, keepdims=False)
            rows = jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
            below = rows > c
            colmax = jnp.maximum(jnp.max(jnp.where(below, jnp.abs(colc), 0.0)),
                                 jnp.abs(piv))
            worst = jnp.minimum(worst, jnp.abs(piv) / jnp.maximum(colmax, jnp.finfo(piv.dtype).tiny))
            safe = jnp.where(piv == 0, jnp.ones((), ft), piv)
            l = jnp.where(below, colc / safe, 0.0)
            urow = jax.lax.dynamic_index_in_dim(blk, c, axis=0, keepdims=False)
            cols = jax.lax.broadcasted_iota(jnp.int32, (pb,), 0)
            u = jnp.where(cols > c, urow, 0.0)
            blk = blk - l[:, None] * u[None, :]
            blk = jax.lax.dynamic_update_index_in_dim(
                blk, jnp.where(below, l, colc), c, axis=1)
            return blk, worst

        blk, worst = jax.lax.fori_loop(0, pb, body, (blk, worst))
        M = M.at[b0:, b0 : b0 + pb].set(blk)
        if b0 + pb < D:
            L11 = jnp.tril(blk[:pb, :pb], -1) + jnp.eye(pb, dtype=ft)
            U12 = jax.lax.linalg.triangular_solve(
                L11, M[b0 : b0 + pb, b0 + pb :], left_side=True, lower=True,
                unit_diagonal=True)
            M = M.at[b0 : b0 + pb, b0 + pb :].set(U12)
            M = M.at[b0 + pb :, b0 + pb :].add(-blk[pb:, :pb] @ U12)
    return M, worst


@partial(jax.jit, donate_argnums=(0, 1),
         static_argnames=("nlev", "emax", "wmax", "cut"))
def _lu_tail_kernel(Lx, Ux, Ax, tol, ant_pos, att_pos,
                    ltn_src, ltn_r, ltn_c, unt_pos, unt_r, unt_c,
                    ltt_pos, ltt_r, ltt_c, utt_pos, utt_r, utt_c,
                    ent_pos, ent_row, ent_col, ent_slot, ent_off,
                    col_id, col_diag, col_off,
                    nlev: int, emax: int, wmax: int, cut: int):
    from ..solve import _tri_sweep_multi

    ft = Lx.dtype

    def g(src, idx):
        return jnp.where(idx >= 0, src[jnp.clip(idx, 0, src.shape[0] - 1)],
                         jnp.zeros((), ft))

    rhs = g(Ax, ant_pos)  # A(N, T) [cut, D]
    # U_NT = L_NN^{-1} A(N, T); L_NN is unit-lower with explicit unit diag
    Unt = _tri_sweep_multi(Lx, rhs, ent_pos, ent_row, ent_col, ent_slot,
                           ent_off, col_id, col_diag, col_off,
                           nlev, emax, wmax, cut, True)
    D = att_pos.shape[0]
    Ltn = jnp.zeros((D, cut), ft).at[ltn_r, ltn_c].set(
        Lx[jnp.clip(ltn_src, 0, Lx.shape[0] - 1)])
    S = g(Ax, att_pos) - Ltn @ Unt
    LUt, worst = _unpivoted_lu_blocked(S)
    Ltt = jnp.tril(LUt, -1) + jnp.eye(D, dtype=ft)
    Utt = jnp.triu(LUt)
    Ux = Ux.at[unt_pos].set(Unt[unt_r, unt_c], mode="drop")
    Lx = Lx.at[ltt_pos].set(Ltt[ltt_r, ltt_c], mode="drop")
    Ux = Ux.at[utt_pos].set(Utt[utt_r, utt_c], mode="drop")
    margin = jnp.min(worst) - tol
    bad = jnp.any(worst == 0.0)
    return Lx, Ux, margin, bad


def _prep_lu_tail_dev(tail: LUDenseTail):
    """Eagerly build the LU tail's device index tensors (never in a trace)."""
    (ent_pos, ent_row, ent_col, ent_slot, ent_off,
     col_id, col_diag, col_off, nlev, emax, wmax) = tail.tri
    dev = tail.__dict__.get("_dev")
    if dev is None:
        j = jnp.asarray
        dev = tuple(j(t) for t in (
            tail.ant_pos, tail.att_pos, tail.ltn_src, tail.ltn_r, tail.ltn_c,
            tail.unt_pos, tail.unt_r, tail.unt_c,
            tail.ltt_pos, tail.ltt_r, tail.ltt_c,
            tail.utt_pos, tail.utt_r, tail.utt_c,
            ent_pos, ent_row, ent_col, ent_slot, ent_off,
            col_id, col_diag, col_off))
        tail.__dict__["_dev"] = dev
    return dev


def _lu_tail_run(Lx, Ux, Ax, tol, tail: LUDenseTail):
    (*_, nlev, emax, wmax) = tail.tri
    dev = _prep_lu_tail_dev(tail)
    return _lu_tail_kernel(Lx, Ux, Ax, tol, *dev,
                           nlev=nlev, emax=emax, wmax=wmax, cut=tail.cut)


def _lu_step(carry, tensors, consts):
    """One level (scan step): dense tri solve for U, rank update for L."""
    Lx, Ux = carry
    (Midx, Nidx, Kidx, bidx_u, bidx_l, akk, upos, dpos, lpos, ldiag, vmask) = tensors
    (Ax, tol) = consts
    ft = Lx.dtype

    def g(src, idx):
        return jnp.where(idx >= 0, src[jnp.clip(idx, 0, src.shape[0] - 1)],
                         jnp.zeros((), ft))

    M = g(Lx, Midx)
    r = M.shape[-1]
    M = M + jnp.eye(r, dtype=ft)[None, :, :]  # unit diagonal
    b_u = g(Ax, bidx_u)
    z = jax.lax.linalg.triangular_solve(
        M, b_u[..., None], left_side=True, lower=True)[..., 0]
    a_kk = g(Ax, akk)
    lk = g(Lx, Kidx)
    ukk = a_kk - jnp.sum(lk * z, axis=-1)
    N = g(Lx, Nidx)
    xl = g(Ax, bidx_l) - jnp.einsum("klr,kr->kl", N, z)
    safe_ukk = jnp.where(ukk == 0, jnp.ones((), ft), ukk)
    lcol = xl / safe_ukk[:, None]
    # stability margin: reference tol rule (src/lib.rs:587-589) — the static
    # (diagonal) pivot is the one the reference would keep iff
    # |ukk| >= tol * max(|ukk|, max|xl|); margin < 0 → host fallback.
    colmax = jnp.maximum(jnp.abs(ukk), jnp.max(jnp.abs(xl), axis=-1))
    margin = jnp.abs(ukk) - tol * colmax
    margin = jnp.where(vmask, margin, jnp.zeros((), ft))
    bad = jnp.logical_and(vmask, ukk == 0)
    Ux = Ux.at[upos.reshape(-1)].set(z.reshape(-1), mode="drop")
    Ux = Ux.at[dpos].set(ukk, mode="drop")
    Lx = Lx.at[lpos.reshape(-1)].set(lcol.reshape(-1), mode="drop")
    Lx = Lx.at[ldiag].set(jnp.ones((), ft), mode="drop")
    return (Lx, Ux), (jnp.min(margin), jnp.any(bad))


def lu_device(a: Sprs, s: Symb, tol: float, mixed: bool = False):
    """Device static-pivot LU with host partial-pivot fallback.

    Returns (Lp, Li, Lx, Up, Ui, Ux, pinv) like the host engine; pinv is
    identity when the static factorization is accepted. Large systems route
    through the multifrontal path (factor/frontal_lu) first. `mixed` marks
    a caller that owns an iterative-refinement loop (the solver drivers) —
    it lets the MF factor run in f32 on TPU (config.lu_factor_dtype).
    """
    if a.n >= config.mf_min_n and not getattr(s, "_static_rejected", False):
        from .frontal_lu import build_lu_mf_plan, lu_mf

        mfp = getattr(s, "_mf_lu_plan", "unset")
        if mfp == "unset":
            try:
                mfp = build_lu_mf_plan(a, s)
            except Exception:
                mfp = None
            s._mf_lu_plan = mfp
        if mfp is not None:
            out = lu_mf(a, s, mfp, tol, mixed=mixed)
            if out is not None:
                return out
            # stability margin rejected static pivoting: remember so sym-
            # reuse callers don't pay the device attempt every solve
            s._static_rejected = True
            return native.lu_numeric(
                a.n, a.p, a.i[: a.nnz()], a.x[: a.nnz()], s.q, tol,
                s.lnz, s.unz)

    plan = getattr(s, "plan", None)
    if not isinstance(plan, LUPlan):
        try:
            plan = build_lu_plan(a, s)
        except NoPivotError:
            plan = None  # structurally singular w/o pivoting: host handles
        if plan is not None:
            s.plan = plan
    if plan is None:
        return native.lu_numeric(
            a.n, a.p, a.i[: a.nnz()], a.x[: a.nnz()], s.q, tol, s.lnz, s.unz)

    from ._scan import run_grouped

    Ax = jnp.asarray(a.x[: a.nnz()])
    Lx = jnp.zeros(plan.lnz + 1, dtype=Ax.dtype)
    Ux = jnp.zeros(plan.unz + 1, dtype=Ax.dtype)
    cache = plan.__dict__.setdefault("_dev_groups", [])
    tolv = jnp.asarray(float(tol), Ax.dtype)
    (Lx, Ux), aux = run_grouped(
        plan.levels, _lu_step, (Lx, Ux), (Ax, tolv), cache)
    mgs = [jnp.min(jnp.atleast_1d(g[0])) for g in aux]
    bds = [jnp.any(jnp.atleast_1d(g[1])) for g in aux]
    if plan.tail is not None:
        Lx, Ux, mgt, bdt = _lu_tail_run(Lx, Ux, Ax, tolv, plan.tail)
        mgs.append(mgt)
        bds.append(bdt)
    if mgs:
        mg = float(jnp.min(jnp.stack(mgs)))
        bad = bool(jnp.any(jnp.stack(bds)))
    else:
        mg, bad = 0.0, False
    if bad or not (mg >= 0.0):  # NaN-safe: NaN margin also falls back
        # the reference would have pivoted differently (or pivot hit zero):
        # reproduce its exact partial-pivoting semantics on the host engine
        return native.lu_numeric(
            a.n, a.p, a.i[: a.nnz()], a.x[: a.nnz()], s.q, tol, s.lnz, s.unz)
    pinv = np.arange(plan.n, dtype=np.int64)
    return (plan.Lp, plan.Li, np.asarray(Lx[: plan.lnz]),
            plan.Up, plan.Ui, np.asarray(Ux[: plan.unz]), pinv)
