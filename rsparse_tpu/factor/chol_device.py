"""Device Cholesky: level-scheduled, batched dense triangular solves (MXU).

The reference's up-looking Cholesky (src/lib.rs:278-337) computes row k of L
by a sparse triangular solve against finished columns — inherently
sequential in k. The TPU formulation exploits the elimination-tree structure
(SURVEY.md §7, "hard parts" #1):

  For row k with (host-precomputed, static) row pattern R_k, the up-looking
  recurrence is exactly the dense system
        L(R_k, R_k) · z = C(R_k, k),     L(k, R_k) = z',
        d = C(k,k) - z'z,                L(k,k) = sqrt(d),
  where L(R_k, R_k) is lower-triangular. Every j in R_k is a proper etree
  descendant of k, so gathering L(R_k, R_k) only reads values finalized in
  strictly earlier etree *levels*. All rows in one level are therefore
  independent and solve as ONE batched `lax.linalg.triangular_solve` — dense
  math on the MXU — with static gather/scatter indices built once per
  sparsity pattern.

Failure semantics: d <= 0 for any k poisons a device-side flag which the
host reduces once at the end and raises NotPositiveDefiniteError
(reference src/lib.rs:325-328 errors at the first such k; the observable —
the exception — is identical).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Sprs, Symb
from ..errors import NotPositiveDefiniteError
from ..symbolic import native


def _next_pow2(x: int) -> int:
    return 1 << max(0, (int(x) - 1).bit_length())


def _pow4(x: int) -> int:
    """Next power of 4 — a coarse shape ladder (1,4,16,64,256,…) so device
    kernels compile for a handful of shapes instead of one per level (each
    remote TPU compile costs tens of seconds through the runtime tunnel)."""
    p = 1
    while p < x:
        p *= 4
    return p


@dataclasses.dataclass
class DenseTail:
    """Trailing-dense supernode (columns [cut, n)).

    etree parents always exceed their children, so every contiguous index
    tail is ancestor-closed: columns >= cut have all their L rows >= cut,
    and columns < cut form a self-contained leading factor L_NN. The tail
    then computes as dense MXU work in ONE launch instead of one launch per
    (deep, narrow) elimination level:

        W  = L_NN^{-1} C(N, T)        (batched level-scheduled solve)
        S  = sym(C(T, T)) - Wᵀ W      (dense matmul)
        L_TT = cholesky(S)            (dense)
        L(T, N) = Wᵀ, scattered into the static sparse pattern.
    """

    cut: int
    d: int
    # L_NN level schedule (positions remapped into the FULL Lx array)
    tri: Tuple  # (ent_pos, ent_row, ent_col, ent_slot, ent_off, col_id, col_diag, col_off, nlev, emax, wmax)
    # C(N, T) and triu C(T, T) feed in by SCATTERING the actual entries
    # (TPU gathers are element-at-a-time; a dense [D, D] position gather
    # costs ~10 ms where the O(nnz) scatter is ~0.1 ms)
    rhs_src: np.ndarray  # [nnzNT] C value positions of C(N, T) entries
    rhs_r: np.ndarray  # [nnzNT] row (< cut)
    rhs_c: np.ndarray  # [nnzNT] col - cut
    att_src: np.ndarray  # [nnzTT] C value positions of triu C(T, T)
    att_r: np.ndarray  # [nnzTT] row - cut
    att_c: np.ndarray  # [nnzTT] col - cut
    l21_pos: np.ndarray  # [nnz21] scatter into Lx
    l21_j: np.ndarray  # [nnz21] W row (column index j < cut)
    l21_t: np.ndarray  # [nnz21] W col (t - cut)
    ltt_pos: np.ndarray  # [nnzTT] scatter into Lx
    ltt_r: np.ndarray
    ltt_c: np.ndarray
    # dense L_NN gather (cut <= DENSE_NN_MAX): materialize the leading
    # factor as a dense [cut, cut] block so W and every solve use one MXU
    # triangular op instead of a (deep, narrow) level sweep
    nn_pos: np.ndarray = None  # [nnzNN] positions into Lx
    nn_r: np.ndarray = None
    nn_c: np.ndarray = None


@dataclasses.dataclass
class CholPlan:
    n: int
    lnz: int
    Lp: np.ndarray
    Li: np.ndarray
    levels: List[Tuple[np.ndarray, ...]]  # per-level static index tensors
    tail: Optional[DenseTail] = None


def _lookup(keys_sorted: np.ndarray, order: np.ndarray, qkeys: np.ndarray) -> np.ndarray:
    """Positions of qkeys in a sorted key array; -1 where absent. LAST
    match on duplicate keys (reference last-wins assign semantics — see
    frontal._lookup)."""
    pos = np.searchsorted(keys_sorted, qkeys, side="right") - 1
    pos = np.clip(pos, 0, len(keys_sorted) - 1) if len(keys_sorted) else np.zeros_like(qkeys)
    hit = len(keys_sorted) > 0
    found = keys_sorted[pos] == qkeys if hit else np.zeros(qkeys.shape, bool)
    out = np.where(found, order[pos] if hit else 0, -1)
    return out.astype(np.int64)


# Largest leading block L_NN that gets materialized densely (one MXU
# triangular op per use instead of a deep level sweep). Also the bound
# below which the WHOLE factor goes dense-tail (cut = 0): sequential
# level stages cost ~0.1-1 ms each on TPU while a 2048^2 dense cholesky
# is ~3 ms of MXU work total.
DENSE_NN_MAX = 2048


def _choose_cut(level: np.ndarray, n: int, target_levels: int = 48,
                dense_tail_max: int = 2048) -> int:
    """Largest cut with max(level[:cut]) < target_levels, tail capped."""
    nlev = int(level.max()) + 1 if n else 0
    if nlev <= 2 * target_levels:
        return n
    if n <= dense_tail_max:
        # deep level structure, small system: all-dense tail — even at
        # n ~ 400 a dense cholesky (~0.5 ms) beats hundreds of sequential
        # level launches (round-5 fix: the old `n <= 512 -> no tail` rule
        # left a 408-column, 340-level sweep inside the recursive MF)
        return 0
    pmax = np.maximum.accumulate(level)
    ok = np.nonzero(pmax < target_levels)[0]
    cut = int(ok[-1]) + 1 if len(ok) else 0
    cut = max(cut, n - dense_tail_max)
    return cut if n - cut >= 32 else n  # tiny tails aren't worth a launch


def build_chol_plan(c: Sprs, s: Symb, level_batch: int = 4096) -> CholPlan:
    """Build the static per-level gather/scatter tensors (host, once per
    pattern; cacheable via Symb.plan)."""
    n = c.n
    Lp, Li, Rp, Rj, level = native.chol_pattern(n, c.p, c.i[: c.nnz()], s.parent, s.cp)
    lnz = int(Lp[n])
    cut = _choose_cut(level, n)

    # sorted key tables for position lookups
    from ..ops.plan import col_ids

    lcols = col_ids(Lp, n)
    lkeys = lcols * np.int64(n) + Li  # L columns have ascending rows -> sorted
    lorder = np.arange(lnz, dtype=np.int64)
    if not np.all(np.diff(lkeys) > 0):  # safety: sort if not canonical
        lorder = np.argsort(lkeys, kind="stable")
        lkeys = lkeys[lorder]

    cnz = c.nnz()
    ccols = col_ids(c.p, n)
    ckeys = ccols * np.int64(n) + c.i[:cnz]
    corder = np.argsort(ckeys, kind="stable")
    ckeys_s = ckeys[corder]

    rcnt = np.diff(Rp)
    nlev = int(level[:cut].max()) + 1 if cut else 0
    levels = []
    for lev in range(nlev):
        lev_ks = np.nonzero(level[:cut] == lev)[0]
        # ONE batch per level, both dims snapped to the pow4 ladder: padding
        # costs some dense flops, but consecutive levels then share shapes
        # and fuse into single lax.scan launches (factor/_scan.py) — launch
        # count, not arithmetic, dominates level-scheduled factorization
        if len(lev_ks) == 0:
            continue
        # r pads on the pow2 ladder (flops grow ~r^3; pow4 would 64x them in
        # the worst case), batch width on pow4 (shape fusion across levels)
        rmax = _next_pow2(max(int(rcnt[lev_ks].max()), 1))
        ks_all = lev_ks
        if True:
            for s0 in range(0, len(ks_all), level_batch):
                ks = ks_all[s0 : s0 + level_batch]
                K = len(ks)
                Kp = _pow4(K)
                r = rmax
                # padded row patterns (pad with -1)
                R = np.full((Kp, r), -1, dtype=np.int64)
                for t, k in enumerate(ks):  # ragged copy; small per batch
                    R[t, : rcnt[k]] = Rj[Rp[k] : Rp[k + 1]]
                valid_row = R >= 0
                Rc = np.where(valid_row, R, 0)
                kcol = np.zeros(Kp, dtype=np.int64)
                kcol[:K] = ks
                # M(a,b) = L(R[a], R[b]) for b <= a — lookups run only on the
                # valid (unpadded) entries: padding can dominate the tensor
                # volume, but never the true flop count
                col_b = np.broadcast_to(Rc[:, None, :], (Kp, r, r))
                row_a = np.broadcast_to(Rc[:, :, None], (Kp, r, r))
                tri = np.tril(np.ones((r, r), bool))
                pairs_valid = valid_row[:, :, None] & valid_row[:, None, :] & tri
                Midx = np.full((Kp, r, r), -1, dtype=np.int64)
                if pairs_valid.any():
                    Midx[pairs_valid] = _lookup(
                        lkeys, lorder,
                        col_b[pairs_valid] * np.int64(n) + row_a[pairs_valid])
                # rhs b = C(R[a], k)
                bidx = np.full((Kp, r), -1, dtype=np.int64)
                if valid_row.any():
                    bq = (np.broadcast_to(kcol[:, None], (Kp, r))[valid_row]
                          * np.int64(n) + Rc[valid_row])
                    bidx[valid_row] = _lookup(ckeys_s, corder, bq)
                # A(k,k)
                akk = _lookup(ckeys_s, corder, kcol * np.int64(n) + kcol)
                akk[K:] = -1
                # scatter positions of L(k, R[a]) and diag L(k,k)
                zpos = np.full((Kp, r), lnz, dtype=np.int64)
                if valid_row.any():
                    zq = (Rc[valid_row] * np.int64(n)
                          + np.broadcast_to(kcol[:, None], (Kp, r))[valid_row])
                    zpos[valid_row] = _lookup(lkeys, lorder, zq)
                zpos[K:, :] = lnz
                dpos = np.full(Kp, lnz, dtype=np.int64)
                dpos[:K] = Lp[:-1][ks]  # diag is first entry of each column
                vmask = np.zeros(Kp, dtype=bool)
                vmask[:K] = True
                levels.append(
                    (
                        Midx.astype(np.int32),
                        bidx.astype(np.int32),
                        akk.astype(np.int32),
                        zpos.astype(np.int32),
                        dpos.astype(np.int32),
                        vmask,
                    )
                )
    tail = None
    if cut < n:
        tail = _build_tail(c, Lp, Li, lnz, n, cut, ckeys_s, corder)
    return CholPlan(n=n, lnz=lnz, Lp=Lp, Li=Li, levels=levels, tail=tail)


def _build_tail(c: Sprs, Lp, Li, lnz, n, cut, ckeys_s, corder) -> DenseTail:
    from ..ops.plan import col_ids
    from ..solve import tri_plan
    from ..data import Sprs as _Sprs

    D = n - cut
    lcols = col_ids(Lp, n)
    rows = Li
    # L_NN pattern (cols < cut, rows < cut) with positions into the full Lx
    mask_nn = (lcols < cut) & (rows < cut)
    sub_pos = np.nonzero(mask_nn)[0]
    nn_cols = lcols[sub_pos]
    nn_rows = rows[sub_pos]
    dense_nn = cut <= DENSE_NN_MAX
    if dense_nn:
        # dense L_NN: no level sweep needed — placeholder empty schedule
        z = np.zeros(0, np.int32)
        tri = (z, z, z, z, z, z, z, z, 0, 1, 1)
    else:
        nn_p = np.zeros(cut + 1, dtype=np.int64)
        np.cumsum(np.bincount(nn_cols, minlength=cut), out=nn_p[1:])
        lnn = _Sprs(len(sub_pos), cut, cut, nn_p, nn_rows,
                    np.zeros(len(sub_pos)))
        tp = tri_plan(lnn, 0)
        ent_pos = (sub_pos[tp.ent_pos].astype(np.int32)
                   if len(tp.ent_pos) else tp.ent_pos)
        col_diag = sub_pos[tp.col_diag].astype(np.int32)
        tri = (ent_pos, tp.ent_row, tp.ent_col, tp.ent_slot, tp.ent_off,
               tp.col_id, col_diag, tp.col_off, tp.nlev, tp.emax, tp.wmax)
    # C feeds: rhs = C(N, T), Att = triu C(T, T) — straight from the stored
    # pattern. Only UPPER entries (row <= col) participate: with a natural
    # ordering c is A as stored and may carry strictly-lower entries, which
    # chol ignores (reference semantics, src/lib.rs:278-337).
    cnz = c.nnz()
    crows = c.i[:cnz]
    ccols = col_ids(c.p, n)
    upper = crows <= ccols
    m_nt = upper & (ccols >= cut) & (crows < cut)
    rhs_src = np.nonzero(m_nt)[0]
    m_tt = upper & (crows >= cut)  # upper => ccols >= cut too
    att_src = np.nonzero(m_tt)[0]
    # scatter maps
    mask21 = (lcols < cut) & (rows >= cut)
    p21 = np.nonzero(mask21)[0]
    maskTT = lcols >= cut
    pTT = np.nonzero(maskTT)[0]
    return DenseTail(
        cut=cut,
        d=D,
        tri=tri,
        rhs_src=rhs_src.astype(np.int32),
        rhs_r=crows[rhs_src].astype(np.int32),
        rhs_c=(ccols[rhs_src] - cut).astype(np.int32),
        att_src=att_src.astype(np.int32),
        att_r=(crows[att_src] - cut).astype(np.int32),
        att_c=(ccols[att_src] - cut).astype(np.int32),
        l21_pos=p21.astype(np.int32),
        l21_j=lcols[p21].astype(np.int32),
        l21_t=(rows[p21] - cut).astype(np.int32),
        ltt_pos=pTT.astype(np.int32),
        ltt_r=(rows[pTT] - cut).astype(np.int32),
        ltt_c=(lcols[pTT] - cut).astype(np.int32),
        nn_pos=(sub_pos.astype(np.int32) if dense_nn
                else np.zeros(0, np.int32)),
        nn_r=(nn_rows.astype(np.int32) if dense_nn
              else np.zeros(0, np.int32)),
        nn_c=(nn_cols.astype(np.int32) if dense_nn
              else np.zeros(0, np.int32)),
    )


@partial(jax.jit, donate_argnums=(0,),
         static_argnames=("nlev", "emax", "wmax", "cut", "d", "dense_nn"))
def _chol_tail_kernel(Lx, Cx, rhs_src, rhs_r, rhs_c,
                      att_src, att_r, att_c, l21_pos, l21_j, l21_t,
                      ltt_pos, ltt_r, ltt_c,
                      ent_pos, ent_row, ent_col, ent_slot, ent_off,
                      col_id, col_diag, col_off, nn_pos, nn_r, nn_c,
                      nlev: int, emax: int, wmax: int, cut: int, d: int,
                      dense_nn: bool = False):
    """Returns (Lx, dmin, W, Ls_inv, Lnn_inv). Solves against the tail use
    the PRECOMPUTED triangular inverses (one MXU matmul per application,
    zero sequential depth) instead of substitution sweeps — the f32
    accuracy loss is covered by the drivers' f64 iterative refinement.
    Lnn_inv is None when the leading block is too large to densify
    (cut > DENSE_NN_MAX); solves then keep the level sweeps for L_NN."""
    from ..solve import _tri_sweep_multi

    ft = Lx.dtype
    rhs = jnp.zeros((cut, d), ft).at[rhs_r, rhs_c].set(
        Cx[rhs_src], mode="drop")
    Lnn_inv = None
    if dense_nn and cut > 0:
        Lnn = jnp.zeros((cut, cut), ft).at[nn_r, nn_c].set(
            Lx[jnp.clip(nn_pos, 0, Lx.shape[0] - 1)], mode="drop")
        Lnn_inv = jax.lax.linalg.triangular_solve(
            Lnn, jnp.eye(cut, dtype=ft), left_side=True, lower=True)
        W = Lnn_inv @ rhs
    elif cut > 0:
        W = _tri_sweep_multi(Lx, rhs, ent_pos, ent_row, ent_col, ent_slot,
                             ent_off, col_id, col_diag, col_off,
                             nlev, emax, wmax, cut, True)
    else:
        W = rhs  # [0, D]
        Lnn_inv = jnp.zeros((0, 0), ft)
    Att = jnp.zeros((d, d), ft).at[att_r, att_c].set(
        Cx[att_src], mode="drop")
    Asym = Att + Att.T - jnp.diag(jnp.diagonal(Att))
    S = Asym - W.T @ W
    from .dense_chol import fast_chol

    Ls = fast_chol(S)
    dmin = jnp.min(jnp.diagonal(Ls))  # NaN if not SPD
    Ls_inv = jax.lax.linalg.triangular_solve(
        Ls, jnp.eye(Ls.shape[0], dtype=ft), left_side=True, lower=True)
    Lx = Lx.at[l21_pos].set(W[l21_j, l21_t], mode="drop")
    Lx = Lx.at[ltt_pos].set(Ls[ltt_r, ltt_c], mode="drop")
    return Lx, dmin, W, Ls_inv, Lnn_inv


def _prep_tail_dev(tail: DenseTail):
    """Eagerly build the tail's device index tensors (never inside a trace)."""
    (ent_pos, ent_row, ent_col, ent_slot, ent_off,
     col_id, col_diag, col_off, nlev, emax, wmax) = tail.tri
    dev = tail.__dict__.get("_dev")
    if dev is None:
        j = jnp.asarray
        dev = (j(tail.rhs_src), j(tail.rhs_r), j(tail.rhs_c),
               j(tail.att_src), j(tail.att_r), j(tail.att_c),
               j(tail.l21_pos),
               j(tail.l21_j), j(tail.l21_t), j(tail.ltt_pos), j(tail.ltt_r),
               j(tail.ltt_c), j(ent_pos), j(ent_row), j(ent_col),
               j(ent_slot), j(ent_off), j(col_id), j(col_diag), j(col_off),
               j(tail.nn_pos), j(tail.nn_r), j(tail.nn_c))
        tail.__dict__["_dev"] = dev
    return dev


def _chol_tail_run(Lx, Cx, tail: DenseTail):
    """Single-launch dense trailing-supernode factorization. Also caches the
    dense factors (W = L_TNᵀ, Ls = L_TT) on the tail for tail-aware solves.

    NOTE: the `_vals` side-cache is only valid when called EAGERLY (the
    level-path chol_device); the multifrontal path threads (W, Ls) through
    the jit boundary instead (frontal._chol_mf_values)."""
    (*_, nlev, emax, wmax) = tail.tri
    dev = _prep_tail_dev(tail)
    Lx, dmin, W, Ls_inv, Lnn_inv = _chol_tail_kernel(
        Lx, Cx, *dev, nlev=nlev, emax=emax, wmax=wmax, cut=tail.cut,
        d=tail.d, dense_nn=tail.cut <= DENSE_NN_MAX)
    tail.__dict__["_vals"] = (W, Ls_inv, Lnn_inv)
    return Lx, dmin


def _chol_step(Lx, tensors, consts):
    """One level (scan step): batched dense triangular solve + scatter."""
    (Midx, bidx, akk, zpos, dpos, vmask) = tensors
    (Cx,) = consts
    ftype = Lx.dtype
    M = jnp.where(Midx >= 0, Lx[jnp.clip(Midx, 0, Lx.shape[0] - 1)], jnp.zeros((), ftype))
    # unit diagonal where the pattern has no entry (padding rows)
    r = M.shape[-1]
    dmask = (jnp.diagonal(Midx, axis1=1, axis2=2) < 0).astype(ftype)
    M = M + dmask[:, :, None] * jnp.eye(r, dtype=ftype)[None, :, :]
    rhs = jnp.where(bidx >= 0, Cx[jnp.clip(bidx, 0, Cx.shape[0] - 1)], jnp.zeros((), ftype))
    z = jax.lax.linalg.triangular_solve(
        M, rhs[..., None], left_side=True, lower=True
    )[..., 0]
    akkv = jnp.where(akk >= 0, Cx[jnp.clip(akk, 0, Cx.shape[0] - 1)], jnp.zeros((), ftype))
    d = akkv - jnp.sum(z * z, axis=-1)
    d = jnp.where(vmask, d, jnp.ones((), ftype))
    Lx = Lx.at[zpos.reshape(-1)].set(z.reshape(-1), mode="drop")
    Lx = Lx.at[dpos].set(jnp.sqrt(d), mode="drop")
    return Lx, jnp.min(d)


def chol_device(c: Sprs, s: Symb):
    """Numeric Cholesky on device; c = triu(A(P,P)) with values.

    Levels execute as grouped lax.scan runs (factor/_scan.py) — one launch
    per run of same-shape levels instead of one per level.
    """
    from ._scan import run_grouped

    if s.plan is None or not isinstance(s.plan, CholPlan):
        s.plan = build_chol_plan(c, s)
    plan: CholPlan = s.plan
    Cx = jnp.asarray(c.x[: c.nnz()])
    Lx = jnp.zeros(plan.lnz + 1, dtype=Cx.dtype)  # +1 garbage slot
    cache = plan.__dict__.setdefault("_dev_groups", [])
    Lx, dmin_groups = run_grouped(plan.levels, _chol_step, Lx, (Cx,), cache)
    if plan.tail is not None:
        Lx, dmin_tail = _chol_tail_run(Lx, Cx, plan.tail)
        dmin_groups = list(dmin_groups) + [dmin_tail]
    if dmin_groups:
        dmin = float(jnp.min(jnp.concatenate([jnp.atleast_1d(g) for g in dmin_groups])))
        # NaN-safe: a first failure is a plain d<=0, but its sqrt poisons
        # later levels' d with NaN, and NaN would swallow the min.
        if not dmin > 0.0:
            raise NotPositiveDefiniteError()
    Lx_host = np.asarray(Lx[: plan.lnz])
    return plan.Lp, plan.Li, Lx_host
