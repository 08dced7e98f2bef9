"""Device QR: level-scheduled blocked-Householder factorization.

The reference's Householder QR (src/lib.rs:788-877) applies, per column k,
the reflectors of its R-pattern ancestors one by one (happly,
src/lib.rs:2099-2111) then forms a new reflector (house,
src/lib.rs:2116-2147). Patterns of V and R are FULLY static (native
rt_qr_pattern) — so the TPU design batches whole elimination levels and
turns the sequential reflector chain into dense MXU work via compact-WY:

  Applying reflectors j1..jr (reference application order = the R-pattern
  stack order) to x equals
      y = Vᵀ x,   (diag(1/beta) + stril(VᵀV)) w = y,   x -= V w
  — one matmul, one small dense triangular solve, one matmul, all batched
  over the columns of a level. The deflation trick the reference uses
  (zeroing x[i] after extracting R(i,k)) is a no-op in exact arithmetic
  because V values at finalized rows are themselves zero, so the plain
  chain is equivalent.

The new reflector replicates house() bit-for-bit semantics (v[0] sign rule,
sigma == 0 branch). R(k,k) = ±‖v‖ with the reference's sign convention.
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


def _pow4(x: int) -> int:
    """Coarse shape ladder (1,4,16,64,…) — see chol_device._pow4."""
    p = 1
    while p < x:
        p *= 4
    return p


@dataclasses.dataclass
class QRPlan:
    m2: int
    n: int
    vnz: int
    rnz: int
    Vp: np.ndarray
    Vi: np.ndarray
    Rp: np.ndarray
    Ri: np.ndarray
    levels: List[Tuple[np.ndarray, ...]]
    plan_entries: int


# Design boundary (measured, see docs/DESIGN.md "QR export boundary"):
# the reference-exact V/R/beta export is a column-sequential reflector
# recurrence whose support sets grow with fill. On qrsol_3 (8000², the
# largest reference QR asset) the plan measures est = 7.4e9 element-ops
# across 2420 dependency levels with 2.0e9 V-entry gathers; at the
# measured ~150 ns/element TPU gather/scatter cost that is minutes of
# device time (vs ~1 s for the host engine), and the per-level batch is
# K=1 for most of the top half (pure launch overhead). Above the cap the
# EXPORT runs on the host engine; solves at that scale never touch this
# path — they run the multifrontal device tree (factor/frontal_qr), whose
# fronts batch onto the MXU but provably cannot reproduce the reference's
# V pattern (front CB rows are linear combinations of original rows).
PLAN_ENTRY_CAP = 300_000_000


def build_qr_plan(a: Sprs, s: Symb, level_batch: int = 1024) -> Optional[QRPlan]:
    m, n = a.m, a.n
    m2 = s.m2
    q = np.asarray(s.q, dtype=np.int64) if s.q is not None else None
    Vp, Vi, Rp, Ri = native.qr_pattern(
        m, n, a.p, a.i[: a.nnz()], q, s.parent, s.pinv, m2,
        s.lnz + 8, s.unz + n + 8)
    vnz, rnz = int(Vp[n]), int(Rp[n])
    pinv_rows = np.asarray(s.pinv[:m2], dtype=np.int64)

    # dependency levels: column k applies reflectors j in R(:,k) offdiag
    level = np.zeros(n, dtype=np.int64)
    for k in range(n):
        deps = Ri[Rp[k] : Rp[k + 1] - 1]
        if len(deps):
            level[k] = int(level[deps].max()) + 1
    # cost estimate: sum |S_k| * r_k
    est = 0
    for k in range(n):
        r = Rp[k + 1] - 1 - Rp[k]
        est += int((Vp[k + 1] - Vp[k] + r) * max(r, 1))
    if est > PLAN_ENTRY_CAP:
        return None

    # V position lookup: key = col * m2 + row
    from ..ops.plan import col_ids

    vcols = col_ids(Vp, n)
    vkeys = vcols * np.int64(m2) + Vi
    vorder = np.argsort(vkeys, kind="stable")
    vkeys_s = vkeys[vorder]

    def vpos(col, row):
        k_ = np.searchsorted(vkeys_s, col * m2 + row)
        if k_ < len(vkeys_s) and vkeys_s[k_] == col * m2 + row:
            return int(vorder[k_])
        return -1

    nlev = int(level.max()) + 1 if n else 0
    order_by_level = np.argsort(level, kind="stable")
    lev_off = np.zeros(nlev + 1, dtype=np.int64)
    np.cumsum(np.bincount(level, minlength=nlev), out=lev_off[1:])

    # precompute per-column supports/reflectors once, then bucket by shape
    pv = np.asarray(s.pinv)
    supports_all, refls_all, vrows_all = {}, {}, {}
    for k in range(n):
        B = list(Ri[Rp[k] : Rp[k + 1] - 1])  # application order
        vk = list(Vi[Vp[k] : Vp[k + 1]])  # reflector rows, diag first
        S = set(vk) | set(B)
        for j in B:
            S.update(Vi[Vp[j] : Vp[j + 1]].tolist())
        col = int(q[k]) if q is not None else int(k)
        S.update(int(pv[i]) for i in a.i[a.p[col] : a.p[col + 1]])
        supports_all[k] = sorted(S)
        refls_all[k] = B
        vrows_all[k] = vk

    levels = []
    total = 0
    for lev in range(nlev):
        lev_ks = order_by_level[lev_off[lev] : lev_off[lev + 1]]
        if len(lev_ks) == 0:
            continue
        # one batch per level, dims on the pow4 ladder (shape fusion — see
        # chol_device); consecutive same-shape levels merge into one scan
        # pow2 for the flop-bearing dims, pow4 batch width elsewhere
        smax = _next_pow2(max(max(len(supports_all[k]) for k in lev_ks), 1))
        rmax = _next_pow2(max(max(len(refls_all[k]) for k in lev_ks), 1))
        vmax = _next_pow2(max(max(len(vrows_all[k]) for k in lev_ks), 1))
        ks_all = np.asarray(lev_ks, dtype=np.int64)
        for s0 in range(0, len(ks_all), level_batch):
            ks = ks_all[s0 : s0 + level_batch]
            K = len(ks)
            Kp = _pow4(K)
            supports = [supports_all[k] for k in ks]
            refls = [refls_all[k] for k in ks]
            vrows = [vrows_all[k] for k in ks]
            Vmat_idx = np.full((Kp, smax, rmax), -1, dtype=np.int64)
            beta_idx = np.full((Kp, rmax), -1, dtype=np.int64)
            a_idx = np.full((Kp, smax), -1, dtype=np.int64)  # A values -> slots
            rslot = np.full((Kp, rmax), smax, dtype=np.int64)  # slot of row j in S
            rpos = np.full((Kp, rmax), rnz, dtype=np.int64)  # scatter into Rx
            vslot = np.full((Kp, vmax), smax, dtype=np.int64)  # V(:,k) slots in S
            vposk = np.full((Kp, vmax), vnz, dtype=np.int64)  # scatter into Vx
            dpos = np.full(Kp, rnz, dtype=np.int64)  # R(k,k) position
            bpos = np.full(Kp, n, dtype=np.int64)  # beta[k] position
            for t, k in enumerate(ks):
                S = supports[t]
                slot_of = {row: idx for idx, row in enumerate(S)}
                # A(:, q[k]) scatter — rows map through pinv
                col = int(q[k]) if q is not None else int(k)
                for p_ in range(int(a.p[col]), int(a.p[col + 1])):
                    i = int(pinv_rows[a.i[p_]])
                    a_idx[t, slot_of[i]] = p_
                for c_, j in enumerate(refls[t]):
                    beta_idx[t, c_] = j
                    rslot[t, c_] = slot_of[j]
                    rpos[t, c_] = Rp[k] + c_
                    for p_ in range(int(Vp[j]), int(Vp[j + 1])):
                        row = int(Vi[p_])
                        if row in slot_of:
                            Vmat_idx[t, slot_of[row], c_] = p_
                for c_, row in enumerate(vrows[t]):
                    vslot[t, c_] = slot_of[row]
                    vposk[t, c_] = Vp[k] + c_
                dpos[t] = Rp[k + 1] - 1
                bpos[t] = k
            vmask = np.zeros(Kp, dtype=bool)
            vmask[:K] = True
            levels.append(tuple(
                x.astype(np.int32) if x.dtype != bool else x
                for x in (Vmat_idx, beta_idx, a_idx, rslot, rpos,
                          vslot, vposk, dpos, bpos)
            ) + (vmask,))
            total += Vmat_idx.size
    return QRPlan(m2=m2, n=n, vnz=vnz, rnz=rnz, Vp=Vp, Vi=Vi, Rp=Rp, Ri=Ri,
                  levels=levels, plan_entries=total)


def _qr_step(carry, tensors, consts):
    """One level (scan step): compact-WY application + new reflectors."""
    Vx, Rx, Bt = carry
    (Vmat_idx, beta_idx, a_idx, rslot, rpos, vslot, vposk, dpos, bpos, vmask) = tensors
    (Ax,) = consts
    ft = Vx.dtype

    def g(src, idx, fill=0.0):
        return jnp.where(idx >= 0, src[jnp.clip(idx, 0, src.shape[0] - 1)],
                         jnp.asarray(fill, ft))

    V = g(Vx, Vmat_idx)  # [K, s, r]
    betas = g(Bt, beta_idx)  # [K, r]
    x0 = g(Ax, a_idx)  # [K, s]
    y = jnp.einsum("ksr,ks->kr", V, x0)
    G = jnp.einsum("ksr,kst->krt", V, V)  # VᵀV
    r = G.shape[-1]
    inv_b = jnp.where(betas != 0, 1.0 / jnp.where(betas != 0, betas, 1.0),
                      jnp.zeros((), ft))
    # beta == 0 means identity reflector: make the solve give w_j = 0 by
    # setting the diagonal huge (w = y/diag -> ~0) — exact: use where below.
    big = jnp.asarray(1e300 if ft == jnp.float64 else 1e30, ft)
    diag = jnp.where(betas != 0, inv_b, big)  # beta==0: identity reflector
    Tl = jnp.tril(G, -1) + jax.vmap(jnp.diag)(diag)
    w = jax.lax.linalg.triangular_solve(Tl, y[..., None], left_side=True,
                                        lower=True)[..., 0]
    x1 = x0 - jnp.einsum("ksr,kr->ks", V, w)
    # R offdiagonals
    xpad = jnp.concatenate([x1, jnp.zeros((x1.shape[0], 1), ft)], axis=1)
    rvals = jnp.take_along_axis(xpad, rslot, axis=1)
    Rx = Rx.at[rpos.reshape(-1)].set(rvals.reshape(-1), mode="drop")
    # new reflector (house, reference src/lib.rs:2116-2147)
    v = jnp.take_along_axis(xpad, vslot, axis=1)  # [K, vmax]; v[0] = pivot row
    tail = v.at[:, 0].set(0.0)
    sigma = jnp.sum(tail * tail, axis=1)
    v0 = v[:, 0]
    s_nz = jnp.sqrt(v0 * v0 + sigma)
    v0_nz = jnp.where(v0 <= 0, v0 - s_nz, -sigma / (v0 + s_nz))
    beta_nz = 1.0 / (-s_nz * v0_nz)
    s_z = jnp.abs(v0)
    beta_z = jnp.where(v0 <= 0, jnp.asarray(2.0, ft), jnp.asarray(0.0, ft))
    nz = sigma != 0
    s_out = jnp.where(nz, s_nz, s_z)
    beta_out = jnp.where(nz, beta_nz, beta_z)
    v0_out = jnp.where(nz, v0_nz, jnp.ones((), ft))
    vvals = tail.at[:, 0].set(v0_out)
    Vx = Vx.at[vposk.reshape(-1)].set(vvals.reshape(-1), mode="drop")
    Rx = Rx.at[dpos].set(jnp.where(vmask, s_out, 0.0), mode="drop")
    Bt = Bt.at[bpos].set(jnp.where(vmask, beta_out, 0.0), mode="drop")
    return (Vx, Rx, Bt), None


def qr_device(a: Sprs, s: Symb):
    """Device blocked-Householder QR; host fallback when the plan is too big."""
    plan = getattr(s, "plan", None)
    if not isinstance(plan, QRPlan):
        plan = build_qr_plan(a, s)
        if plan is not None:
            s.plan = plan
    if plan is None:
        return native.qr_numeric(
            a.m, a.n, a.p, a.i[: a.nnz()], a.x[: a.nnz()], s.q,
            s.parent, s.pinv, s.m2, s.lnz + 8, s.unz + 8)

    from ._scan import run_grouped

    Ax = jnp.asarray(a.x[: a.nnz()])
    Vx = jnp.zeros(plan.vnz + 1, dtype=Ax.dtype)
    Rx = jnp.zeros(plan.rnz + 1, dtype=Ax.dtype)
    Bt = jnp.zeros(plan.n + 1, dtype=Ax.dtype)
    cache = plan.__dict__.setdefault("_dev_groups", [])
    (Vx, Rx, Bt), _ = run_grouped(plan.levels, _qr_step, (Vx, Rx, Bt), (Ax,), cache)
    return (plan.Vp, plan.Vi, np.asarray(Vx[: plan.vnz]),
            plan.Rp, plan.Ri, np.asarray(Rx[: plan.rnz]),
            np.asarray(Bt[: plan.n]))
