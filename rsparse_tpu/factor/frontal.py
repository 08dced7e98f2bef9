"""Multifrontal device Cholesky: batched dense leaf fronts + reduced skeleton.

Why: the level-batched kernel's cost on TPU is the element-serialized XLA
gathers/scatters between the sparse value array and per-level dense blocks
(measured identical in f32/f64 — arithmetic is not the bottleneck, docs/
DESIGN.md). The classic multifrontal structure fixes this: eliminate whole
*subtrees* as dense frontal matrices (assembly gathers touch each A entry
once; all elimination flops are batched dense MXU ops), then factor the
remaining ancestor-closed *skeleton* with the level/tail machinery on a
much smaller system.

Phase structure (postordered permutation required — symbolic.schol provides
it for order >= 0):

  1. Subtree selection: maximal subtrees with size <= Smax. Postorder makes
     each subtree a contiguous column range [a, b]; the complement (the
     skeleton) is ancestor-closed.
  2. Batched fronts (one launch per pow2 shape bucket):
        Ass  = sym(C(S, S)) gathered          [F, Sp, Sp]
        Lss  = cholesky(Ass)                   (dense, padded slots = I)
        Lbs  = C(B, S) · Lss^{-T}              (dense triangular solve)
        Schur= Lbs Lbsᵀ                        [F, Bp, Bp]
     L(S,S) and L(B,S) scatter once into the static sparse pattern.
  3. Skeleton assembly: C_skel = triu C(skel, skel) + Σ extend-add(Schur)
     — one scatter-add with static positions.
  4. Skeleton factorization: the compacted system reuses build_chol_plan
     (levels + trailing-dense tail); its L values scatter back into the
     global pattern (skeleton columns' L rows are all skeleton, so the
     compacted factor IS the global factor restricted).

Reference behavior being reproduced: chol (src/lib.rs:278-337) up to the
admissible symmetric permutation; NotPositiveDefinite surfaces from either
phase via the same min-diagonal device flag (src/lib.rs:325-328).
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


def _lookup(keys_sorted, order, qkeys):
    # side="right" - 1: return the LAST matching slot — duplicate (i,j)
    # entries are legal (Trpl.to_sprs keeps them; after the reference's
    # sum_dupl the LAST slot holds the sum and the others explicit zeros),
    # and the reference's chol assigns x[Ci[p]] = Cx[p] in scan order, so
    # last-wins is the reference semantics (src/lib.rs:278-337).
    if len(keys_sorted) == 0:
        return np.full(np.shape(qkeys), -1, dtype=np.int64)
    pos = np.clip(np.searchsorted(keys_sorted, qkeys, side="right") - 1,
                  0, len(keys_sorted) - 1)
    found = keys_sorted[pos] == qkeys
    return np.where(found, order[pos], -1).astype(np.int64)


@dataclasses.dataclass
class FrontBucket:
    """Batched fronts sharing one padded shape (Sp, Bp).

    Front matrices materialize by SCATTERING the (few) actual C entries
    into zeros — never by gathering every padded slot through a dense
    [F, Sp, Sp] position tensor: TPU gathers are element-at-a-time, so an
    O(F·Sp²) gather costs ~10 ms where the O(nnz) scatter costs ~0.1 ms."""

    sp: int
    bp: int
    ass_src: np.ndarray  # [nass] C value positions of triu front entries
    ass_f: np.ndarray  # [nass] front index
    ass_r: np.ndarray  # [nass] row within S-block
    ass_c: np.ndarray  # [nass] col within S-block
    pad_f: np.ndarray  # unit-pivot slots (missing diag or padding)
    pad_r: np.ndarray
    dg_f: np.ndarray  # real diagonal slots (dmin reduction)
    dg_r: np.ndarray
    abs_src: np.ndarray  # [nabs] C value positions of C(S, B) entries
    abs_f: np.ndarray
    abs_r: np.ndarray  # row within B-block
    abs_c: np.ndarray  # col within S-block
    lss_pos: np.ndarray  # [nssz] scatter into Lx
    lss_r: np.ndarray  # [nssz] row within front S-block
    lss_c: np.ndarray  # [nssz] col within front S-block
    lss_f: np.ndarray  # [nssz] front index
    lbs_pos: np.ndarray  # [nbsz] scatter into Lx
    lbs_r: np.ndarray
    lbs_c: np.ndarray
    lbs_f: np.ndarray
    schur_src: np.ndarray  # [nupd] flat index into Schur [F, Bp, Bp]
    schur_dst: np.ndarray  # [nupd] position in skeleton value array
    srow: np.ndarray  # [F, Sp] global row of each S slot (n = pad)
    brow: np.ndarray  # [F, Bp] compact skeleton row of each B slot (ns = pad)


@dataclasses.dataclass
class MFPlan:
    n: int
    lnz: int
    Lp: np.ndarray
    Li: np.ndarray
    buckets: List[FrontBucket]
    # skeleton
    skel: np.ndarray  # global indices of skeleton columns (sorted)
    skel_plan: object  # CholPlan for the compacted skeleton system
    skel_c_pattern: Tuple[np.ndarray, np.ndarray]  # (Cp, Ci) of C_skel
    skel_a_src: np.ndarray  # positions in global Cx feeding C_skel
    skel_a_dst: np.ndarray  # positions in C_skel values
    skel_l_src: np.ndarray  # positions in skeleton Lx
    skel_l_dst: np.ndarray  # positions in global Lx
    skel_cnnz: int


SMAX_DEFAULT = 64
# Skeletons larger than this recurse into another multifrontal layer.
# Tuned round 5, PER BACKEND: on TPU a skeleton left dense costs O(ns)
# sequential column steps in the tail cholesky (~10 ms at ns=1971 on v5e)
# plus an O(ns^2) inverse, so large skeletons are worth one more peel —
# but each recursion layer adds front kernels and solve stages to the
# program (a depth-5 chain measured 2.5x SLOWER than no recursion at the
# cholsol_vals bench shape), so the TPU threshold peels once or twice and
# leaves the remainder dense. On CPU the dense tail is cheap at any of
# these sizes while XLA:CPU pays heavily to COMPILE the extra recursion
# layers (the round-5 suite wall regressed 19m -> 31m from this alone),
# so the CPU threshold keeps the old value.
RECURSE_MIN = 3000
RECURSE_MIN_TPU = 1200
MAX_DEPTH = 4


def _recurse_min() -> int:
    import jax

    return (RECURSE_MIN_TPU if jax.default_backend() == "tpu"
            else RECURSE_MIN)


def _subtree_sizes(parent: np.ndarray, n: int) -> np.ndarray:
    sz = np.ones(n, dtype=np.int64)
    for k in range(n):  # children precede parents in a postordered etree
        p = parent[k]
        if p >= 0:
            sz[p] += sz[k]
    return sz


def build_mf_plan(c: Sprs, s: Symb, smax: int = SMAX_DEFAULT,
                  depth: int = 0) -> Optional[MFPlan]:
    """Build the multifrontal plan; None when not applicable (needs a
    postordered etree, i.e. parent[k] > k and postorder == identity —
    symbolic.schol guarantees this for order >= 0). Large skeletons RECURSE
    into another multifrontal layer (the Schur-completed skeleton is itself
    an SPD system on an ancestor-closed, still-postordered subset), so the
    structure scales to arbitrary n."""
    from ..ops.plan import col_ids
    from .chol_device import build_chol_plan

    n = c.n
    parent = np.asarray(s.parent, dtype=np.int64)
    # postorder check: every node's children must be contiguous right below
    # it; sufficient condition used here: postorder(parent) == identity
    pst = native.post(n, parent)
    if not np.array_equal(pst, np.arange(n)):
        return None

    Lp, Li, Rp, Rj, level = native.chol_pattern(n, c.p, c.i[: c.nnz()], s.parent, s.cp)
    lnz = int(Lp[n])
    sz = _subtree_sizes(parent, n)
    # maximal small subtrees: root r with sz[r] <= smax and parent big/none
    is_root = (sz <= smax) & ((parent < 0) | (sz[np.clip(parent, 0, n - 1)] > smax))
    roots = np.nonzero(is_root)[0]
    in_front = np.zeros(n, dtype=bool)
    front_of = np.full(n, -1, dtype=np.int64)
    for fi, r in enumerate(roots):
        a = r - sz[r] + 1
        in_front[a : r + 1] = True
        front_of[a : r + 1] = fi
    skel = np.nonzero(~in_front)[0]
    ns = len(skel)
    if len(roots) == 0 or ns == n or ns == 0:
        return None

    lcols = col_ids(Lp, n)
    lkeys = lcols * np.int64(n) + Li
    lorder = np.arange(lnz, dtype=np.int64)
    if lnz and not np.all(np.diff(lkeys) > 0):
        lorder = np.argsort(lkeys, kind="stable")
        lkeys = lkeys[lorder]
    cnz = c.nnz()
    ccols = col_ids(c.p, n)
    ckeys = ccols * np.int64(n) + c.i[:cnz]
    corder = np.argsort(ckeys, kind="stable")
    ckeys_s = ckeys[corder]

    g = np.full(n, -1, dtype=np.int64)  # global -> compact skeleton index
    g[skel] = np.arange(ns)

    # ---- skeleton C pattern: triu C(skel,skel) + B-cliques --------------
    skel_pairs = set()
    c_rows = c.i[:cnz]
    sk_mask = ~in_front
    keep = sk_mask[c_rows] & sk_mask[ccols]
    for r_, c_ in zip(c_rows[keep], ccols[keep]):
        skel_pairs.add((int(g[r_]), int(g[c_])))

    # ---- per-front data --------------------------------------------------
    fronts = []  # (S_cols, B_rows)
    for r in roots:
        a = int(r - sz[r] + 1)
        S = np.arange(a, r + 1)
        rows = Li[Lp[a] : Lp[int(r) + 1]]  # all pattern rows of cols in S
        B = np.unique(rows[rows > r])
        fronts.append((S, B))
        gb = g[B]
        for x in range(len(B)):
            for y in range(x, len(B)):
                skel_pairs.add((int(gb[x]), int(gb[y])))

    # skeleton CSC (triu, rows ascending per column)
    if skel_pairs:
        pr = np.array(sorted(skel_pairs, key=lambda t: (t[1], t[0])), dtype=np.int64)
        srows, scols = pr[:, 0], pr[:, 1]
    else:
        srows = scols = np.zeros(0, dtype=np.int64)
    sCp = np.zeros(ns + 1, dtype=np.int64)
    np.cumsum(np.bincount(scols, minlength=ns), out=sCp[1:])
    sCi = srows
    s_cnnz = len(sCi)
    skeys = scols * np.int64(ns) + srows  # sorted by construction
    sk_order = np.arange(s_cnnz, dtype=np.int64)

    # A-value feed into C_skel
    ka = np.nonzero(keep)[0]
    skel_a_src = ka.astype(np.int64)
    skel_a_dst = _lookup(skeys, sk_order, g[ccols[keep]] * np.int64(ns) + g[c_rows[keep]])
    assert (skel_a_dst >= 0).all()

    # ---- shape buckets ---------------------------------------------------
    buckets_map = {}
    for fi, (S, B) in enumerate(fronts):
        key = (_next_pow2(max(len(S), 1)), _next_pow2(max(len(B), 1)))
        buckets_map.setdefault(key, []).append(fi)

    buckets = []
    for (sp, bp), fis in sorted(buckets_map.items()):
        F = len(fis)
        srow = np.full((F, sp), n, dtype=np.int64)
        brow = np.full((F, bp), ns, dtype=np.int64)
        for t, fi in enumerate(fis):
            S_, B_ = fronts[fi]
            srow[t, : len(S_)] = S_
            brow[t, : len(B_)] = g[B_]
        lss = ([], [], [], [])  # pos, r, c, f
        lbs = ([], [], [], [])
        s_src, s_dst = [], []
        assl = ([], [], [], [])  # src, f, r, c
        padl = ([], [])  # f, r
        dgl = ([], [])  # f, r
        absl = ([], [], [], [])
        for t, fi in enumerate(fis):
            S, B = fronts[fi]
            a = int(S[0])
            ls, lb = len(S), len(B)
            # Ass: triu C(S,S) — query (row=min, col=max) = (s1<=s2)
            s1 = S[:, None]
            s2 = S[None, :]
            q = np.where(s1 <= s2, s2 * np.int64(n) + s1, -1)
            found = np.where(q >= 0, _lookup(ckeys_s, corder,
                                             np.where(q >= 0, q, 0)), -1)
            rr, cc = np.nonzero(found >= 0)
            assl[0].extend(found[rr, cc].tolist())
            assl[1].extend([t] * len(rr))
            assl[2].extend(rr.tolist())
            assl[3].extend(cc.tolist())
            dpresent = np.diagonal(found) >= 0
            real = np.nonzero(dpresent)[0]
            dgl[0].extend([t] * len(real))
            dgl[1].extend(real.tolist())
            miss = np.nonzero(~dpresent)[0].tolist() + list(range(ls, sp))
            padl[0].extend([t] * len(miss))
            padl[1].extend(miss)
            # Abs: C(S_row, B_col)? A(B,S) stored in triu at (row=S, col=B)
            qq = (B[:, None] * np.int64(n)) + S[None, :]  # col=B, row=S
            fb = _lookup(ckeys_s, corder, qq)
            br_, bc_ = np.nonzero(fb >= 0)
            absl[0].extend(fb[br_, bc_].tolist())
            absl[1].extend([t] * len(br_))
            absl[2].extend(br_.tolist())
            absl[3].extend(bc_.tolist())
            # L(S,S) scatter: pattern entries of columns S with row <= r
            for j in S:
                for p_ in range(int(Lp[j]), int(Lp[j + 1])):
                    i_ = int(Li[p_])
                    if i_ <= int(S[-1]):
                        lss[0].append(p_)
                        lss[1].append(i_ - a)
                        lss[2].append(int(j) - a)
                        lss[3].append(t)
                    else:
                        bloc = int(np.searchsorted(B, i_))
                        lbs[0].append(p_)
                        lbs[1].append(bloc)
                        lbs[2].append(int(j) - a)
                        lbs[3].append(t)
            # Schur extend-add into C_skel (upper part b1 <= b2)
            if lb:
                gb = g[B]
                xs, ys = np.triu_indices(lb)
                dsts = _lookup(skeys, sk_order,
                               gb[ys] * np.int64(ns) + gb[xs])
                s_src.extend(((t * bp + xs) * bp + ys).tolist())
                s_dst.extend(dsts.tolist())
        buckets.append(FrontBucket(
            sp=sp, bp=bp,
            ass_src=np.asarray(assl[0], np.int64),
            ass_f=np.asarray(assl[1], np.int64),
            ass_r=np.asarray(assl[2], np.int64),
            ass_c=np.asarray(assl[3], np.int64),
            pad_f=np.asarray(padl[0], np.int64),
            pad_r=np.asarray(padl[1], np.int64),
            dg_f=np.asarray(dgl[0], np.int64),
            dg_r=np.asarray(dgl[1], np.int64),
            abs_src=np.asarray(absl[0], np.int64),
            abs_f=np.asarray(absl[1], np.int64),
            abs_r=np.asarray(absl[2], np.int64),
            abs_c=np.asarray(absl[3], np.int64),
            lss_pos=np.asarray(lss[0], np.int64), lss_r=np.asarray(lss[1], np.int64),
            lss_c=np.asarray(lss[2], np.int64), lss_f=np.asarray(lss[3], np.int64),
            lbs_pos=np.asarray(lbs[0], np.int64), lbs_r=np.asarray(lbs[1], np.int64),
            lbs_c=np.asarray(lbs[2], np.int64), lbs_f=np.asarray(lbs[3], np.int64),
            schur_src=np.asarray(s_src, np.int64), schur_dst=np.asarray(s_dst, np.int64),
            srow=srow, brow=brow,
        ))

    # ---- skeleton symbolic + plan ---------------------------------------
    sparent = np.where(parent[skel] >= 0, g[np.clip(parent[skel], 0, n - 1)], -1)
    scp = np.zeros(ns + 1, dtype=np.int64)
    scp[1:] = np.cumsum(np.diff(Lp)[skel])
    c_skel = Sprs(s_cnnz, ns, ns, sCp, sCi, np.zeros(s_cnnz))
    s_sub = Symb(parent=sparent, cp=scp)
    skel_plan = None
    if ns > _recurse_min() and depth < MAX_DEPTH:
        skel_plan = build_mf_plan(c_skel, s_sub, smax, depth + 1)
    if skel_plan is None:
        skel_plan = build_chol_plan(c_skel, s_sub)
    # map skeleton L positions -> global L positions (both diag-first asc)
    sLp, sLi = skel_plan.Lp, skel_plan.Li
    skel_l_src = []
    skel_l_dst = []
    for jloc, jglob in enumerate(skel):
        ln = sLp[jloc + 1] - sLp[jloc]
        assert ln == Lp[jglob + 1] - Lp[jglob]
        skel_l_src.extend(range(int(sLp[jloc]), int(sLp[jloc + 1])))
        skel_l_dst.extend(range(int(Lp[jglob]), int(Lp[jglob + 1])))
    return MFPlan(
        n=n, lnz=lnz, Lp=Lp, Li=Li, buckets=buckets,
        skel=skel, skel_plan=skel_plan, skel_c_pattern=(sCp, sCi),
        skel_a_src=skel_a_src, skel_a_dst=skel_a_dst,
        skel_l_src=np.asarray(skel_l_src, np.int64),
        skel_l_dst=np.asarray(skel_l_dst, np.int64),
        skel_cnnz=s_cnnz,
    )


@partial(jax.jit, donate_argnums=(0, 1),
         static_argnames=("F", "sp", "bp"))
def _front_kernel(Lx, Csx, Cx, ass_src, ass_f, ass_r, ass_c,
                  pad_f, pad_r, dg_f, dg_r,
                  abs_src, abs_f, abs_r, abs_c,
                  lss_pos, lss_r, lss_c, lss_f,
                  lbs_pos, lbs_r, lbs_c, lbs_f,
                  schur_src, schur_dst, F: int, sp: int, bp: int):
    ft = Lx.dtype
    # SCATTER the actual C entries into zeroed fronts (see FrontBucket:
    # O(nnz) scatter, not O(F·Sp²) element-at-a-time gather)
    Ass = jnp.zeros((F, sp, sp), ft).at[ass_f, ass_r, ass_c].set(
        Cx[ass_src], mode="drop")
    Ass = Ass + jnp.swapaxes(Ass, 1, 2) - jax.vmap(jnp.diag)(
        jnp.diagonal(Ass, axis1=1, axis2=2))
    # padded/missing-diag S slots: make them identity pivots
    Ass = Ass.at[pad_f, pad_r, pad_r].add(jnp.ones((), ft), mode="drop")
    from .dense_chol import fast_chol

    Lss = fast_chol(Ass)
    dmin = (jnp.min(Lss[dg_f, dg_r, dg_r]) if dg_f.shape[0]
            else jnp.ones((), ft))
    Abs = jnp.zeros((F, bp, sp), ft).at[abs_f, abs_r, abs_c].set(
        Cx[abs_src], mode="drop")
    # L_BS = A_BS Lss^{-T}
    Lbs = jax.lax.linalg.triangular_solve(
        Lss, Abs, left_side=False, lower=True, transpose_a=True)
    Schur = jnp.einsum("fbs,fcs->fbc", Lbs, Lbs)
    Lx = Lx.at[lss_pos].set(Lss[lss_f, lss_r, lss_c], mode="drop")
    Lx = Lx.at[lbs_pos].set(Lbs[lbs_f, lbs_r, lbs_c], mode="drop")
    Csx = Csx.at[schur_dst].add(-Schur.reshape(-1)[schur_src], mode="drop")
    # precompute Lss^{-1}: every solve application becomes one batched
    # einsum (MXU) instead of a sequential triangular substitution — the
    # f32 rounding difference is covered by the drivers' f64 refinement
    Lss_inv = jax.lax.linalg.triangular_solve(
        Lss, jnp.broadcast_to(jnp.eye(sp, dtype=ft), Lss.shape),
        left_side=True, lower=True)
    return Lx, Csx, dmin, Lss_inv, Lbs


@partial(jax.jit, donate_argnums=(0,))
def _skel_assemble(Csx, Cx, a_src, a_dst):
    return Csx.at[a_dst].add(Cx[a_src], mode="drop")


def _prep_factor_indices(plan: MFPlan):
    """Eagerly build every device-resident index tensor the factorization
    reads, so the whole recursive factor can run inside ONE jit without
    creating (and leaking) tracers into plan caches."""
    from ._scan import stack_groups
    from .chol_device import CholPlan, _prep_tail_dev

    j = jnp.asarray
    for b in plan.buckets:
        if b.__dict__.get("_dev") is None:
            b.__dict__["_dev"] = tuple(j(t) for t in (
                b.ass_src, b.ass_f, b.ass_r, b.ass_c,
                b.pad_f, b.pad_r, b.dg_f, b.dg_r,
                b.abs_src, b.abs_f, b.abs_r, b.abs_c,
                b.lss_pos, b.lss_r, b.lss_c, b.lss_f,
                b.lbs_pos, b.lbs_r, b.lbs_c, b.lbs_f, b.schur_src, b.schur_dst))
    if plan.__dict__.get("_asm_dev") is None:
        plan.__dict__["_asm_dev"] = (j(plan.skel_a_src), j(plan.skel_a_dst))
        plan.__dict__["_map_dev"] = (j(plan.skel_l_src), j(plan.skel_l_dst))
    sp = plan.skel_plan
    if isinstance(sp, MFPlan):
        _prep_factor_indices(sp)
    else:
        assert isinstance(sp, CholPlan)
        cache = sp.__dict__.setdefault("_dev_groups", [])
        if not cache:
            cache.extend(stack_groups(sp.levels))
        if sp.tail is not None:
            _prep_tail_dev(sp.tail)


def _collect_chol_dev(plan: MFPlan):
    """Nested pytree of the factor-side index tensors (passed as jit args —
    closure-captured jnp arrays are baked into executables as constants)."""
    from .chol_device import CholPlan

    dev = {
        "buckets": [b.__dict__["_dev"] for b in plan.buckets],
        "asm": plan.__dict__["_asm_dev"],
        "map": plan.__dict__["_map_dev"],
    }
    sp = plan.skel_plan
    if isinstance(sp, MFPlan):
        dev["skel"] = _collect_chol_dev(sp)
    else:
        assert isinstance(sp, CholPlan)
        dev["skel"] = {
            "groups": list(sp.__dict__["_dev_groups"]),
            "tail": (sp.tail.__dict__["_dev"] if sp.tail is not None
                     else None),
        }
    return dev


def _chol_mf_values(Cx, plan: MFPlan, dev):
    """Recursive core: factor given device values Cx of the plan's system.
    Returns (Lx_dev, dmins list, cache tree) — the cache tree carries the
    dense factors through the jit boundary for the zero-gather solves.
    Requires _prep_factor_indices(plan) to have run (eagerly); `dev` is the
    matching _collect_chol_dev tree."""
    from ._scan import run_grouped
    from .chol_device import CholPlan, _chol_step, _chol_tail_kernel

    Lx = jnp.zeros(plan.lnz + 1, dtype=Cx.dtype)
    Csx = jnp.zeros(plan.skel_cnnz + 1, dtype=Cx.dtype)
    a_src, a_dst = dev["asm"]
    Csx = _skel_assemble(Csx, Cx, a_src, a_dst)
    dmins = []
    front_vals = []
    for b, bdev in zip(plan.buckets, dev["buckets"]):
        Lx, Csx, dmin, Lss_inv, Lbs = _front_kernel(
            Lx, Csx, Cx, *bdev, F=b.srow.shape[0], sp=b.sp, bp=b.bp)
        dmins.append(dmin)
        front_vals.append((Lss_inv, Lbs))

    # skeleton factorization on the assembled values
    sp = plan.skel_plan
    tail_vals = None
    if isinstance(sp, MFPlan):  # recursive multifrontal layer
        Lxs, dsub, sub_cache = _chol_mf_values(
            Csx[: plan.skel_cnnz], sp, dev["skel"])
        dmins += dsub
    else:
        assert isinstance(sp, CholPlan)
        sub_cache = None
        Lxs = jnp.zeros(sp.lnz + 1, dtype=Cx.dtype)
        Lxs, dgroups = run_grouped(sp.levels, _chol_step, Lxs,
                                   (Csx[: plan.skel_cnnz],),
                                   dev["skel"]["groups"])
        if sp.tail is not None:
            from .chol_device import DENSE_NN_MAX

            (*_, nlev, emax, wmax) = sp.tail.tri
            Lxs, dt, W, Ls_inv, Lnn_inv = _chol_tail_kernel(
                Lxs, Csx[: plan.skel_cnnz], *dev["skel"]["tail"],
                nlev=nlev, emax=emax, wmax=wmax, cut=sp.tail.cut,
                d=sp.tail.d, dense_nn=sp.tail.cut <= DENSE_NN_MAX)
            tail_vals = (W, Ls_inv, Lnn_inv)
            dgroups = list(dgroups) + [dt]
        dmins += [jnp.min(jnp.atleast_1d(gq)) for gq in dgroups]
    l_src, l_dst = dev["map"]
    Lx = Lx.at[l_dst].set(Lxs[l_src], mode="drop")
    cache = (tuple(front_vals), Lxs, tail_vals, sub_cache)
    return Lx, dmins, cache


# Above this many index-tensor entries, fusing the whole factorization into
# one launch stops paying off and the eager per-kernel path takes over. The
# trade is backend-dependent, so FUSE_ENTRY_CAP is resolved per call:
#
# - TPU (high launch latency, persistent compile cache): re-measured in
#   round 4 on lusol_6 (13.8M entries) after the one-shot refinement/
#   compose work landed — fused warm 0.17 s vs eager warm 0.30 s, fused
#   cold start 25-46 s (trace 3.7 s + MLIR 2.0 s + compile, persistent-
#   cacheable) vs eager cold start 70-155 s (thousands of small-op
#   dispatches through the tunnel, each a ~25 ms RPC, plus ~99 sub-second
#   compiles). Fused wins on BOTH axes, so the TPU cap is 48M.
# - CPU (tests, virtual mesh): local launches are ~free and XLA:CPU takes
#   minutes to compile the giant program (measured 305 s on the same
#   lusol_6 plan), so the eager path keeps the old 8M cap.
#
# Index tensors flow in as jit arguments either way, so compiled programs
# stay persistent-cacheable across processes.
FUSE_ENTRY_CAP = 8_000_000
FUSE_ENTRY_CAP_TPU = 48_000_000


def fuse_entry_cap() -> int:
    import jax

    return (FUSE_ENTRY_CAP if jax.default_backend() == "cpu"
            else FUSE_ENTRY_CAP_TPU)


def _plan_index_entries(plan: MFPlan) -> int:
    total = sum(b.ass_src.size + b.abs_src.size + b.lss_pos.size
                + b.lbs_pos.size + b.schur_src.size for b in plan.buckets)
    total += plan.skel_a_src.size + plan.skel_l_src.size
    sp = plan.skel_plan
    if isinstance(sp, MFPlan):
        total += _plan_index_entries(sp)
    else:
        total += sum(sum(t.size for t in lev) for lev in sp.levels)
    return total


def _chol_factor_dtype(mixed: bool):
    """Factor-value dtype: f32 on TPU when the caller owns a refinement
    loop (config.chol_factor_dtype="auto") — TPU f64 is software-emulated
    and MXU-ineligible; see frontal_lu._lu_factor_dtype."""
    from ..config import config

    if not mixed:
        return None
    cd = config.chol_factor_dtype
    if cd == "auto":
        return jnp.float32 if jax.default_backend() == "tpu" else None
    if cd in ("", "float64", None):
        return None
    return jnp.dtype(cd)


def chol_mf(c: Sprs, s: Symb, plan: MFPlan, mixed: bool = False):
    """Run the multifrontal factorization — as ONE fused launch when the
    plan is small enough for the compile pipeline, eagerly otherwise.
    Returns (Lp, Li, Lx_host) and caches the solve tree on the plan."""
    from ..config import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    _prep_factor_indices(plan)
    fuse = plan.__dict__.setdefault(
        "_fuse_ok", _plan_index_entries(plan) <= fuse_entry_cap())
    dev = _collect_chol_dev(plan)
    fdt = _chol_factor_dtype(mixed)
    cx_host = c.x[: c.nnz()]
    Cx = jnp.asarray(cx_host) if fdt is None else jnp.asarray(cx_host, fdt)
    if fuse:
        fn = plan.__dict__.get("_factor_jit")
        if fn is None:
            def run(Cx, dev):
                Lx, dmins, cache = _chol_mf_values(Cx, plan, dev)
                dmin = (jnp.min(jnp.stack(dmins)) if dmins
                        else jnp.asarray(1.0, Cx.dtype))
                return Lx, dmin, cache

            fn = jax.jit(run)
            plan.__dict__["_factor_jit"] = fn
        Lx, dmin, cache = fn(Cx, dev)
    else:
        Lx, dmins, cache = _chol_mf_values(Cx, plan, dev)
        dmin = jnp.min(jnp.stack(dmins)) if dmins else 1.0
    if not float(dmin) > 0.0:
        # do NOT cache the garbage tree (mirrors lu_mf's invalidation): a
        # future sym-reuse solve must not dispatch on a stale '_cache_tree'
        plan.__dict__.pop("_cache_tree", None)
        raise NotPositiveDefiniteError()
    plan.__dict__["_cache_tree"] = cache
    # device slice — the MF solve path never reads factor values on host,
    # so the (tens-of-MB) transfer is deferred until someone actually does
    return plan.Lp, plan.Li, Lx[: plan.lnz]


# ---------------------------------------------------------------------------
# Multifrontal solves: dense front ops + small skeleton sweep, zero gathers
# ---------------------------------------------------------------------------


@partial(jax.jit, donate_argnums=(0,), static_argnames=("ns",))
def _fwd_front(X, Ds, Lss_inv, Lbs, srow, brow, ns: int):
    """Forward front phase: z_S = Lss^{-1} b_S (precomputed inverse — one
    batched MXU einsum, no sequential substitution); accumulate Lbs z into
    the skeleton delta Ds. X: [n+1, B] (garbage row n); Ds: [ns+1, B]."""
    xs = X[srow]  # [F, Sp, B]
    zs = jnp.einsum("fsr,frk->fsk", Lss_inv, xs)
    X = X.at[srow].set(zs)  # padded slots write row n (garbage)
    Ds = Ds.at[brow].add(jnp.einsum("fbs,fsk->fbk", Lbs, zs))
    return X, Ds


@partial(jax.jit, donate_argnums=(0,))
def _bwd_front(X, Lss_inv, Lbs, srow, browg):
    """Backward front phase: x_S = Lss^{-T} (b_S - Lbsᵀ x_B). `browg` holds
    GLOBAL row indices of B slots (n = pad)."""
    xb = X[browg]  # [F, Bp, B]
    bs = X[srow] - jnp.einsum("fbs,fbk->fsk", Lbs, xb)
    xs = jnp.einsum("fsr,fsk->frk", Lss_inv, bs)  # (Lss_inv)^T @ bs
    return X.at[srow].set(xs)


def _skel_tri_plans(plan: MFPlan):
    """Lazy pattern-only sweep schedules for the compacted skeleton L.

    When the skeleton factor has a dense tail, the schedules cover only its
    leading L_NN block (columns < cut) with value positions remapped into
    the full skeleton Lxs; the tail solves run densely with the cached
    (W, Ls) factors. Returns (p0, p2, cut) — cut == ns when no tail."""
    from ..ops.plan import col_ids
    from ..solve import tri_plan

    tp = plan.__dict__.get("_skel_tri")
    if tp is None:
        sp = plan.skel_plan
        ns = len(plan.skel)
        cut = sp.tail.cut if sp.tail is not None else ns
        lcols = col_ids(sp.Lp, ns)
        mask = (lcols < cut) & (sp.Li < cut)
        sub = np.nonzero(mask)[0]
        nn_p = np.zeros(cut + 1, dtype=np.int64)
        np.cumsum(np.bincount(lcols[sub], minlength=cut), out=nn_p[1:])
        lnn = Sprs(len(sub), cut, cut, nn_p, sp.Li[sub], np.zeros(len(sub)))
        p0 = tri_plan(lnn, 0)
        p2 = tri_plan(lnn, 2)
        # remap value positions into the full skeleton Lxs array
        for p_ in (p0, p2):
            object.__setattr__(p_, "ent_pos",
                               sub[p_.ent_pos].astype(np.int32)
                               if len(p_.ent_pos) else p_.ent_pos)
            object.__setattr__(p_, "col_diag", sub[p_.col_diag].astype(np.int32))
        tp = (p0, p2, cut)
        plan.__dict__["_skel_tri"] = tp
    return tp


def _prep_solve_indices(plan: MFPlan):
    """Eagerly build all device-resident index caches used by the solve —
    they must NOT be created inside the jit trace (tracer leak)."""
    from ..solve import _plan_dev

    ns = len(plan.skel)
    n = plan.n
    for b in plan.buckets:
        if b.__dict__.get("_sdev") is None:
            b.__dict__["_sdev"] = (
                jnp.asarray(b.srow), jnp.asarray(b.brow),
                jnp.asarray(np.where(b.brow < ns,
                                     plan.skel[np.clip(b.brow, 0, ns - 1)], n)))
    if isinstance(plan.skel_plan, MFPlan):
        _prep_solve_indices(plan.skel_plan)
    else:
        from .chol_device import DENSE_NN_MAX

        tail = plan.skel_plan.tail
        if tail is not None and tail.cut <= DENSE_NN_MAX:
            return  # dense L_NN: solves use cached inverses, no sweep plans
        p0, p2, _ = _skel_tri_plans(plan)
        _plan_dev(p0)
        _plan_dev(p2)


def solve_mf(plan: MFPlan, X: np.ndarray) -> np.ndarray:
    """X := L'^{-1} L^{-1} X for the factor cached by the last chol_mf call.

    X is [n, B] (batched RHS). All bulk work is dense batched front ops;
    sweeps touch only the innermost skeleton's L_NN block. The complete
    recursive solve compiles into a single launch per (plan, batch-shape)."""
    tree = plan.__dict__.get("_cache_tree")
    if tree is None:
        raise RuntimeError("solve_mf requires a preceding chol_mf on this plan")
    _prep_solve_indices(plan)
    fn = plan.__dict__.get("_solve_jit")
    if fn is None:
        fn = jax.jit(lambda Xd, cache: _solve_mf_dev(plan, Xd, cache))
        plan.__dict__["_solve_jit"] = fn
    Xd = jnp.asarray(X, tree[1].dtype)
    return np.asarray(fn(Xd, tree))


def _solve_mf_dev(plan: MFPlan, X, cache):
    """Recursive device core: X [n, B] -> L'^{-1} L^{-1} X.

    `cache` = (fronts, Lxs, tail_vals, sub_cache) from _collect_cache."""
    from ..solve import _plan_dev, _tri_sweep_multi

    fronts, Lxs, tail_vals, sub_cache = cache
    ns = len(plan.skel)
    n = plan.n
    B = X.shape[1]
    Xd = jnp.concatenate([X, jnp.zeros((1, B), X.dtype)])
    Ds = jnp.zeros((ns + 1, B), X.dtype)
    devs = []
    for b in plan.buckets:
        d = b.__dict__.get("_sdev")
        if d is None:
            d = (jnp.asarray(b.srow), jnp.asarray(b.brow),
                 jnp.asarray(np.where(b.brow < ns, plan.skel[np.clip(b.brow, 0, ns - 1)], n)))
            b.__dict__["_sdev"] = d
        devs.append(d)
    # forward: fronts then skeleton
    for (Lss, Lbs), (srow, brow, _) in zip(fronts, devs):
        Xd, Ds = _fwd_front(Xd, Ds, Lss, Lbs, srow, brow, ns=ns)
    skel_idx = jnp.asarray(plan.skel)
    bs = Xd[skel_idx] - Ds[:ns]
    if isinstance(plan.skel_plan, MFPlan):  # recursive layer
        ys = _solve_mf_dev(plan.skel_plan, bs, sub_cache)
        Xd = Xd.at[skel_idx].set(ys)
        for (Lss, Lbs), (srow, _, browg) in zip(reversed(fronts),
                                                reversed(devs)):
            Xd = _bwd_front(Xd, Lss, Lbs, srow, browg)
        return Xd[:n]
    tv = tail_vals
    if tv is not None:
        # tail-aware split: the dense trailing block (and, when cached, the
        # dense leading block) solves with PRECOMPUTED triangular inverses —
        # pure MXU matmuls, zero sequential depth. Sweeps remain only for an
        # L_NN too large to densify (Lnn_inv is None).
        W, Ls_inv, Lnn_inv = tv
        cut = plan.skel_plan.tail.cut
        if Lnn_inv is not None:
            y_n = Lnn_inv @ bs[:cut]
            y_t = Ls_inv @ (bs[cut:] - W.T @ y_n)
            z_t = Ls_inv.T @ y_t
            z_n = Lnn_inv.T @ (y_n - W @ z_t)
        else:
            p0, p2, _ = _skel_tri_plans(plan)
            y_n = _tri_sweep_multi(Lxs, bs[:cut], *_plan_dev(p0),
                                   p0.nlev, p0.emax, p0.wmax, cut, True)
            y_t = Ls_inv @ (bs[cut:] - W.T @ y_n)
            z_t = Ls_inv.T @ y_t
            z_n = _tri_sweep_multi(Lxs, y_n - W @ z_t, *_plan_dev(p2),
                                   p2.nlev, p2.emax, p2.wmax, cut, False)
        ys = jnp.concatenate([z_n, z_t])
    else:
        p0, p2, cut = _skel_tri_plans(plan)
        ys = _tri_sweep_multi(Lxs[: plan.skel_plan.lnz], bs, *_plan_dev(p0),
                              p0.nlev, p0.emax, p0.wmax, p0.n, True)
        # backward: skeleton then fronts
        ys = _tri_sweep_multi(Lxs[: plan.skel_plan.lnz], ys, *_plan_dev(p2),
                              p2.nlev, p2.emax, p2.wmax, p2.n, False)
    Xd = Xd.at[skel_idx].set(ys)
    for (Lss, Lbs), (srow, _, browg) in zip(reversed(fronts),
                                            reversed(devs)):
        Xd = _bwd_front(Xd, Lss, Lbs, srow, browg)
    return Xd[:n]
