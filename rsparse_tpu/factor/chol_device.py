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
from typing import List, Tuple

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
class CholPlan:
    n: int
    lnz: int
    Lp: np.ndarray
    Li: np.ndarray
    levels: List[Tuple[np.ndarray, ...]]  # per-level static index tensors


def _lookup(keys_sorted: np.ndarray, order: np.ndarray, qkeys: np.ndarray) -> np.ndarray:
    """Positions of qkeys in a sorted key array; -1 where absent."""
    pos = np.searchsorted(keys_sorted, qkeys)
    pos = np.clip(pos, 0, len(keys_sorted) - 1) if len(keys_sorted) else np.zeros_like(qkeys)
    hit = len(keys_sorted) > 0
    found = keys_sorted[pos] == qkeys if hit else np.zeros(qkeys.shape, bool)
    out = np.where(found, order[pos] if hit else 0, -1)
    return out.astype(np.int64)


def build_chol_plan(c: Sprs, s: Symb, level_batch: int = 4096) -> CholPlan:
    """Build the static per-level gather/scatter tensors (host, once per
    pattern; cacheable via Symb.plan)."""
    n = c.n
    Lp, Li, Rp, Rj, level = native.chol_pattern(n, c.p, c.i[: c.nnz()], s.parent, s.cp)
    lnz = int(Lp[n])

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
    nlev = int(level.max()) + 1 if n else 0
    levels = []
    for lev in range(nlev):
        lev_ks = np.nonzero(level == lev)[0]
        # bucket columns by pow4(row-pattern size): batches pad to their own
        # bucket's r, not the level max — less wasted dense work, and the
        # coarse ladder keeps the number of distinct kernel shapes tiny
        buckets = {}
        for k in lev_ks:
            buckets.setdefault(_pow4(max(int(rcnt[k]), 1)), []).append(int(k))
        for rmax, ks_list in sorted(buckets.items()):
            ks_all = np.asarray(ks_list, dtype=np.int64)
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
                # M(a,b) = L(R[a], R[b]) for b <= a
                col_b = np.broadcast_to(Rc[:, None, :], (Kp, r, r))
                row_a = np.broadcast_to(Rc[:, :, None], (Kp, r, r))
                tri = np.tril(np.ones((r, r), bool))
                pairs_valid = valid_row[:, :, None] & valid_row[:, None, :] & tri
                mq = col_b * np.int64(n) + row_a
                Midx = np.where(pairs_valid, _lookup(lkeys, lorder, mq), -1)
                # rhs b = C(R[a], k)
                bq = kcol[:, None] * np.int64(n) + Rc
                bidx = np.where(valid_row, _lookup(ckeys_s, corder, bq), -1)
                # A(k,k)
                akk = _lookup(ckeys_s, corder, kcol * np.int64(n) + kcol)
                akk[K:] = -1
                # scatter positions of L(k, R[a]) and diag L(k,k)
                zq = Rc * np.int64(n) + kcol[:, None]
                zpos = np.where(valid_row, _lookup(lkeys, lorder, zq), lnz)
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
    return CholPlan(n=n, lnz=lnz, Lp=Lp, Li=Li, levels=levels)


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
    Lx, dmin_groups = run_grouped(plan.levels, _chol_step, Lx, (Cx,))
    if dmin_groups:
        dmin = float(jnp.min(jnp.concatenate([jnp.atleast_1d(g) for g in dmin_groups])))
        # NaN-safe: a first failure is a plain d<=0, but its sqrt poisons
        # later levels' d with NaN, and NaN would swallow the min.
        if not dmin > 0.0:
            raise NotPositiveDefiniteError()
    Lx_host = np.asarray(Lx[: plan.lnz])
    return plan.Lp, plan.Li, Lx_host
