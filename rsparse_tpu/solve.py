"""L5' solvers: dense-RHS triangular solves + the cholsol/lusol/qrsol drivers.

Triangular solves are the north-star SpTRSV workload (BASELINE.json). The
reference versions are strictly sequential column sweeps
(lsolve/ltsolve/usolve/utsolve, reference src/lib.rs:464-471, 505-512,
1230-1237, 1271-1278). The TPU design converts the column DAG into *level
sets* (host, native C++) and sweeps one level per step on device — all
columns within a level proceed in parallel as fused gather/scatter ops, with
a single `lax.fori_loop` over levels and O(nnz) flattened static schedule
arrays (no per-column padding blow-up).

Conventions preserved from the reference:
  - L: the diagonal is the FIRST entry of each column (src/lib.rs:425-427).
  - U: the diagonal is the LAST entry of each column (src/lib.rs:1232).
  - x := solution in place; our Python API also returns x.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

from .config import config
from .data import Sprs, Symb
from . import ops
from .ops.plan import col_ids
from .symbolic import native

__all__ = [
    "lsolve", "ltsolve", "usolve", "utsolve",
    "lsolve_multi", "ltsolve_multi", "usolve_multi", "utsolve_multi",
    "cholsol", "lusol", "qrsol", "qrsol_ls", "cholsol_multi", "lusol_multi",
    "qrsol_multi",
    "cholsol_ir", "cholsol_serve", "lusol_serve", "qrsol_serve",
    "happly_dense",
]


# ---------------------------------------------------------------------------
# Level-scheduled SpTRSV plans
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TriPlan:
    """Flattened level schedule for one triangular matrix + solve kind."""

    n: int
    nlev: int
    emax: int  # max off-diagonal entries in any level
    wmax: int  # max columns in any level
    # flattened, sorted by level (host int32 -> device on first use)
    ent_pos: np.ndarray  # position of entry in T.x
    ent_row: np.ndarray  # row index of entry
    ent_col: np.ndarray  # column of entry
    ent_slot: np.ndarray  # column slot within its level (gather kinds)
    ent_off: np.ndarray  # [nlev+1] level offsets into ent_*
    col_id: np.ndarray  # columns sorted by level
    col_diag: np.ndarray  # diag position in T.x per sorted column
    col_off: np.ndarray  # [nlev+1] level offsets into col_*


def tri_plan(t: Sprs, kind: int) -> TriPlan:
    """kind: 0=lsolve, 1=usolve (scatter form), 2=ltsolve, 3=utsolve (gather)."""
    n = t.n
    nz = t.nnz()
    lev = native.tri_levels(n, t.p, t.i[:nz], kind)
    nlev = int(lev.max()) + 1 if n else 1
    corder = np.argsort(lev, kind="stable")
    col_off = np.zeros(nlev + 1, dtype=np.int64)
    np.cumsum(np.bincount(lev, minlength=nlev), out=col_off[1:])
    lower_diag = kind in (0, 2)  # diag first for L, last for U
    diag_pos = t.p[:-1] if lower_diag else t.p[1:] - 1
    col_diag = diag_pos[corder]
    # off-diagonal entries, grouped by the level of their column
    cols = col_ids(t.p, n)
    pos = np.arange(nz, dtype=np.int64)
    offd = np.ones(nz, dtype=bool)
    offd[diag_pos] = False
    pos = pos[offd]
    ecols = cols[offd]
    erows = t.i[:nz][offd]
    elev = lev[ecols]
    eorder = np.argsort(elev, kind="stable")
    ent_off = np.zeros(nlev + 1, dtype=np.int64)
    np.cumsum(np.bincount(elev, minlength=nlev), out=ent_off[1:])
    # slot of each entry's column within its level (for gather-form kinds)
    slot_of_col = np.empty(n, dtype=np.int64)
    slot_of_col[corder] = np.arange(n) - np.repeat(col_off[:-1], np.diff(col_off))
    emax = int(np.diff(ent_off).max()) if nlev and nz > n else 0
    wmax = int(np.diff(col_off).max()) if n else 0
    return TriPlan(
        n=n,
        nlev=nlev,
        emax=max(emax, 1),
        wmax=max(wmax, 1),
        ent_pos=pos[eorder].astype(np.int32),
        ent_row=erows[eorder].astype(np.int32),
        ent_col=ecols[eorder].astype(np.int32),
        ent_slot=slot_of_col[ecols[eorder]].astype(np.int32),
        ent_off=ent_off.astype(np.int32),
        col_id=corder.astype(np.int32),
        col_diag=col_diag.astype(np.int32),
        col_off=col_off.astype(np.int32),
    )


# ---------------------------------------------------------------------------
# Device sweeps
# ---------------------------------------------------------------------------


def _window(flat, off, size, fill):
    """Gather a fixed-size masked window [off, off+count) from a flat array."""
    import jax.numpy as jnp
    import jax

    idx = jax.lax.iota(jnp.int32, size)
    take = jnp.clip(off + idx, 0, max(flat.shape[0] - 1, 0))
    vals = flat[take] if flat.shape[0] else jnp.full((size,), fill, flat.dtype)
    return vals, idx


@partial(
    __import__("jax").jit,
    static_argnames=("nlev", "emax", "wmax", "n", "scatter_form"),
)
def _tri_sweep(
    tx,
    x,
    ent_pos,
    ent_row,
    ent_col,
    ent_slot,
    ent_off,
    col_id,
    col_diag,
    col_off,
    nlev: int,
    emax: int,
    wmax: int,
    n: int,
    scatter_form: bool,
):
    import jax
    import jax.numpy as jnp

    xpad = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])  # garbage slot n

    def body(lev, xp):
        co = col_off[lev]
        ccnt = col_off[lev + 1] - co
        cidx = jax.lax.iota(jnp.int32, wmax)
        cvalid = cidx < ccnt
        csafe = jnp.clip(co + cidx, 0, col_id.shape[0] - 1)
        jcols = jnp.where(cvalid, col_id[csafe], n)
        dpos = jnp.clip(col_diag[csafe], 0, tx.shape[0] - 1)
        dvals = jnp.where(cvalid, tx[dpos], jnp.ones((), tx.dtype))

        eo = ent_off[lev]
        ecnt = ent_off[lev + 1] - eo
        eidx = jax.lax.iota(jnp.int32, emax)
        evalid = eidx < ecnt
        esafe = jnp.clip(eo + eidx, 0, max(ent_pos.shape[0] - 1, 0))
        if ent_pos.shape[0] == 0:
            evals = jnp.zeros((emax,), tx.dtype)
            erows = jnp.full((emax,), n, jnp.int32)
            ecols = jnp.full((emax,), n, jnp.int32)
            eslot = jnp.zeros((emax,), jnp.int32)
        else:
            evals = jnp.where(evalid, tx[ent_pos[esafe]], jnp.zeros((), tx.dtype))
            erows = jnp.where(evalid, ent_row[esafe], n)
            ecols = jnp.where(evalid, ent_col[esafe], n)
            eslot = jnp.where(evalid, ent_slot[esafe], 0)

        if scatter_form:
            # x[j] /= diag, then x[rows] -= val * x[j]
            xj = xp[jcols] / dvals
            xp = xp.at[jcols].set(jnp.where(cvalid, xj, xp[jcols]))
            upd = evals * xp[ecols]
            xp = xp.at[erows].add(-upd)
        else:
            # x[j] = (x[j] - sum(val * x[rows])) / diag
            contrib = jax.ops.segment_sum(evals * xp[erows], eslot, num_segments=wmax)
            xj = (xp[jcols] - contrib) / dvals
            xp = xp.at[jcols].set(jnp.where(cvalid, xj, xp[jcols]))
        return xp

    xpad = jax.lax.fori_loop(0, nlev, body, xpad)
    return xpad[:n]


@partial(
    __import__("jax").jit,
    static_argnames=("nlev", "emax", "wmax", "n", "scatter_form"),
)
def _tri_sweep_multi(
    tx,
    X,  # [n, B] — RHS batch in the lane dimension (TPU-efficient: every
    # gather/scatter moves a full 128-lane row instead of a scalar)
    ent_pos,
    ent_row,
    ent_col,
    ent_slot,
    ent_off,
    col_id,
    col_diag,
    col_off,
    nlev: int,
    emax: int,
    wmax: int,
    n: int,
    scatter_form: bool,
):
    import jax
    import jax.numpy as jnp

    B = X.shape[1]
    xpad = jnp.concatenate([X, jnp.zeros((1, B), X.dtype)])  # garbage row n

    def body(lev, xp):
        co = col_off[lev]
        ccnt = col_off[lev + 1] - co
        cidx = jax.lax.iota(jnp.int32, wmax)
        cvalid = cidx < ccnt
        csafe = jnp.clip(co + cidx, 0, col_id.shape[0] - 1)
        jcols = jnp.where(cvalid, col_id[csafe], n)
        dpos = jnp.clip(col_diag[csafe], 0, tx.shape[0] - 1)
        dvals = jnp.where(cvalid, tx[dpos], jnp.ones((), tx.dtype))

        eo = ent_off[lev]
        ecnt = ent_off[lev + 1] - eo
        eidx = jax.lax.iota(jnp.int32, emax)
        evalid = eidx < ecnt
        esafe = jnp.clip(eo + eidx, 0, max(ent_pos.shape[0] - 1, 0))
        if ent_pos.shape[0] == 0:
            evals = jnp.zeros((emax,), tx.dtype)
            erows = jnp.full((emax,), n, jnp.int32)
            ecols = jnp.full((emax,), n, jnp.int32)
            eslot = jnp.zeros((emax,), jnp.int32)
        else:
            evals = jnp.where(evalid, tx[ent_pos[esafe]], jnp.zeros((), tx.dtype))
            erows = jnp.where(evalid, ent_row[esafe], n)
            ecols = jnp.where(evalid, ent_col[esafe], n)
            eslot = jnp.where(evalid, ent_slot[esafe], 0)

        if scatter_form:
            xj = xp[jcols] / dvals[:, None]
            xp = xp.at[jcols].set(jnp.where(cvalid[:, None], xj, xp[jcols]))
            upd = evals[:, None] * xp[ecols]
            xp = xp.at[erows].add(-upd)
        else:
            contrib = jax.ops.segment_sum(
                evals[:, None] * xp[erows], eslot, num_segments=wmax)
            xj = (xp[jcols] - contrib) / dvals[:, None]
            xp = xp.at[jcols].set(jnp.where(cvalid[:, None], xj, xp[jcols]))
        return xp

    xpad = __import__("jax").lax.fori_loop(0, nlev, body, xpad)
    return xpad[:n]


def _plan_dev(p: TriPlan):
    """Device-resident schedule arrays, cached on the plan across calls."""
    import jax.numpy as jnp

    dev = p.__dict__.get("_dev")
    if dev is None:
        j = jnp.asarray
        dev = (j(p.ent_pos), j(p.ent_row), j(p.ent_col), j(p.ent_slot),
               j(p.ent_off), j(p.col_id), j(p.col_diag), j(p.col_off))
        p.__dict__["_dev"] = dev
    return dev


def _tri_solve_multi(t: Sprs, X, kind: int, plan: Optional[TriPlan] = None):
    """Batched dense-RHS triangular solve: X is [n, B] (or [B, n] via .T by
    the caller). Returns the solved [n, B] matrix."""
    import jax
    import jax.numpy as jnp

    p = plan or tri_plan(t, kind)
    Xa = np.asarray(X)
    if (config.use_pallas and config.serve_mixed != "off"
            and (jax.default_backend() == "tpu"
                 or config.serve_mixed == "force")
            and np.dtype(t.x.dtype) == np.float32 and Xa.ndim == 2):
        from .ops.sptrsv_pallas import (pallas_sweep_available,
                                        sptrsv_pallas_multi)

        if pallas_sweep_available(p.n, Xa.shape[1], np.float32):
            # single-kernel VMEM-resident sweep (measured ~50x the padded
            # XLA level loop on deep schedules); f32 factors only — the
            # f64 path keeps the exact XLA sweep below
            return np.array(sptrsv_pallas_multi(t.x[: t.nnz()], Xa, p, kind))
    out = _tri_sweep_multi(
        jnp.asarray(t.x[: t.nnz()]),
        jnp.asarray(np.asarray(X, dtype=t.x.dtype)),
        *_plan_dev(p),
        p.nlev,
        p.emax,
        p.wmax,
        p.n,
        kind in (0, 1),
    )
    return np.array(out)


def lsolve_multi(l: Sprs, X, plan: Optional[TriPlan] = None):
    """Batched Lx=b over RHS columns of X [n, B] (TPU serving shape)."""
    return _tri_solve_multi(l, X, 0, plan)


def ltsolve_multi(l: Sprs, X, plan: Optional[TriPlan] = None):
    return _tri_solve_multi(l, X, 2, plan)


def usolve_multi(u: Sprs, X, plan: Optional[TriPlan] = None):
    return _tri_solve_multi(u, X, 1, plan)


def utsolve_multi(u: Sprs, X, plan: Optional[TriPlan] = None):
    return _tri_solve_multi(u, X, 3, plan)


def cholsol_multi(a: Sprs, B, order: int = 0, *, sym: Optional[Symb] = None):
    """Batched SPD solve: B is [n, nrhs]; returns X with A@X = B.

    No reference counterpart (the reference is single-RHS only); this is the
    TPU-first serving path — one symbolic analysis + factorization amortized
    over a lane-aligned RHS batch. Pass `sym` to reuse the analysis/plans
    across calls with the same pattern.
    """
    from .factor import chol
    from .symbolic import schol

    n = a.n
    s = sym if sym is not None else schol(a, order)
    nm = chol(a, s)
    Bm = np.asarray(B, dtype=np.float64)
    X = np.zeros_like(Bm)
    if s.pinv is not None:
        X[np.asarray(s.pinv, dtype=np.int64)] = Bm
    else:
        X[:] = Bm
    mfp = getattr(s, "_mf_plan", None)
    if (mfp is not None and "_cache_tree" in mfp.__dict__
            and config.backend != "host"):
        from .factor.frontal import solve_mf

        X = solve_mf(mfp, X)
    else:
        out = _serve_sweeps_mixed(a, s, nm, Bm)
        if out is not None:
            return out
        # sweep schedules cached on the Symb: the factor pattern is fixed
        # per analysis, so repeated solves (sym= reuse) skip plan building
        tc = getattr(s, "_tri_cache", None)
        if tc is None:
            tc = {}
            s._tri_cache = tc
        p0 = tc.get(0) or tc.setdefault(0, tri_plan(nm.l, 0))
        p2 = tc.get(2) or tc.setdefault(2, tri_plan(nm.l, 2))
        X = lsolve_multi(nm.l, X, p0)
        X = ltsolve_multi(nm.l, X, p2)
    out = np.zeros_like(X)
    if s.pinv is not None:
        out[:] = X[np.asarray(s.pinv, dtype=np.int64)]
    else:
        out[:] = X
    return out


def _chol_vals_setup(a: Sprs, Ax, B, order: int, sym: Optional[Symb]):
    """Shared validation + analysis + MF-plan resolution for the batched-
    values SPD drivers (cholsol_vals / parallel.dist_cholsol_vals).

    Returns (s, mfp_or_None, AxK, Bm, pv); mfp is None when the batch must
    run the per-instance tier (small problem, host backend, plan beyond
    the fuse cap)."""
    from .factor.frontal import (fuse_entry_cap, _plan_index_entries,
                                 build_mf_plan)
    from .symbolic import schol, _symperm_host

    n = a.n
    if a.m != n:
        raise ValueError(f"cholsol_vals needs a square matrix, got "
                         f"{a.m}x{n}")
    nz = a.nnz()
    AxK = np.asarray(Ax, dtype=np.float64)
    if AxK.ndim != 2 or AxK.shape[1] != nz:
        raise ValueError(f"Ax must be [K, nnz(a)] = [K, {nz}], got "
                         f"{AxK.shape}")
    K = AxK.shape[0]
    Bm = np.asarray(B, dtype=np.float64)
    if Bm.ndim == 1:
        Bm = np.broadcast_to(Bm, (K, n))
    if Bm.shape != (K, n):
        raise ValueError(f"B must be [K, n] = [{K}, {n}] or [n], got "
                         f"{Bm.shape}")
    s = sym if sym is not None else schol(a, order)
    mfp = getattr(s, "_mf_plan", "unset")
    if mfp == "unset":
        c0 = _symperm_host(a, s.pinv)
        mfp = build_mf_plan(c0, s) if n >= config.mf_min_n else None
        s._mf_plan = mfp
    pv = (np.asarray(s.pinv, dtype=np.int64) if s.pinv is not None
          else np.arange(n))
    fuse_ok = (mfp is not None and mfp.__dict__.setdefault(
        "_fuse_ok", _plan_index_entries(mfp) <= fuse_entry_cap()))
    if not fuse_ok or config.backend == "host":
        mfp = None
    return s, mfp, AxK, Bm, pv


def _chol_vals_fallback(a: Sprs, s, AxK, Bm, order: int):
    """Per-instance tier preserving the batched NPD contract: collect ALL
    failing instances, then raise naming them."""
    from .errors import NotPositiveDefiniteError

    n, nz = a.n, a.nnz()
    K = AxK.shape[0]
    out = np.empty((K, n), dtype=np.float64)
    bad = []
    for k in range(K):
        ak = Sprs(nz, n, n, a.p, a.i[:nz], AxK[k])
        try:
            out[k] = cholsol(ak, Bm[k].copy(), order, sym=s)
        except NotPositiveDefiniteError:
            bad.append(k)
    if bad:
        raise NotPositiveDefiniteError(
            f"instances {bad} are not positive definite")
    return out


def _chol_vals_static(mfp, a: Sprs, s):
    """Pattern-static tensors for the batched-values program, cached on the
    plan: the symperm value gather `src`, the symmetrized-COO residual
    pattern in ORIGINAL row order (mirrors `_sym_coo`: Mi/Mj index rows/
    cols, per-instance values are concat(cx, cx[offd_idx])), and — when the
    max row degree allows — a PADDED row-gather form of the same matrix
    (pad_src [n, K] indexing the concat value stream, col_pad [n, K]): on
    TPU the refinement residual then runs as one einsum-gather instead of
    a COO scatter-add, which costs ~160 ns/element and dominated the whole
    vals program (measured ~440 of 520 ms at the K=16, n=10^4 bench
    shape)."""
    st = mfp.__dict__.get("_vals_static")
    if st is None:
        import jax.numpy as jnp

        from .ops.plan import symperm_plan

        n = a.n
        cp = symperm_plan(a, s.pinv)
        ci = cp.out_i.astype(np.int64)
        cj = col_ids(cp.out_p, n)
        offd = ci != cj
        Mi = np.concatenate([ci, cj[offd]])
        Mj = np.concatenate([cj, ci[offd]])
        if s.pinv is not None:
            porder = np.argsort(np.asarray(s.pinv, np.int64))
            Mi = porder[Mi]
            Mj = porder[Mj]
        cnt = np.bincount(Mi, minlength=n) if len(Mi) else np.zeros(n, int)
        Kp = int(cnt.max()) if len(Mi) else 1
        pad = None
        if Kp <= 64:
            rord = np.argsort(Mi, kind="stable")
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(cnt, out=offs[1:])
            pad_src = np.full((n, max(Kp, 1)), -1, np.int64)
            ar = np.arange(len(Mi))
            pad_src[Mi[rord], ar - offs[Mi[rord]]] = rord
            col_pad = np.where(pad_src >= 0,
                               Mj[np.clip(pad_src, 0, None)], n - 1)
            pad = (jnp.asarray(pad_src.astype(np.int32)),
                   jnp.asarray(col_pad.astype(np.int32)))
        st = (cp.perm,
              jnp.asarray(Mi.astype(np.int32)),
              jnp.asarray(Mj.astype(np.int32)),
              jnp.asarray(np.nonzero(offd)[0].astype(np.int32)),
              pad)
        mfp.__dict__["_vals_static"] = st
    return st


def _chol_vals_one(mfp, n, fdt, dev, pv_, Mi_, Mj_, offd_, cx64, b64,
                   steps: int = 4, pad=None):
    """Traced per-instance core shared by cholsol_vals and
    parallel.dist_cholsol_vals: factor in `fdt` (f32 on TPU — MXU-eligible
    dense fronts), MF solve, then up to `steps` keep-best f64 refinement
    iterations against the symmetrized residual (the matrix chol actually
    factored — see `_sym_coo`), run EARLY-EXIT under a while_loop (under
    vmap the batch iterates until every instance converges or stagnates;
    keep-best makes the extra masked iterations harmless). Up to 4 steps:
    each contracts the error by ~kappa*eps32, and the 1e-10*scale accept
    gate must clear at kappa ~ 1e4-1e5 without falling back. `pad` is the
    padded-gather residual form from `_chol_vals_static` (einsum, no TPU
    scatter); None falls back to the COO scatter-add. cx64: [cnnz]
    symperm'd f64 values; b64: [n, 1] RHS in original row order. Returns
    (dmin, X [n,1] f64, max|r|, max|X|)."""
    import jax
    import jax.numpy as jnp

    from .factor.frontal import _chol_mf_values, _solve_mf_dev

    cx = cx64 if fdt is None else cx64.astype(fdt)
    _, dmins, cache = _chol_mf_values(cx, mfp, dev)
    dmin = (jnp.min(jnp.stack(dmins)) if dmins
            else jnp.asarray(1.0, cx.dtype))
    ft = cache[1].dtype
    mx = jnp.concatenate([cx64, cx64[offd_]])

    def solve_once(R):  # original row order -> original row order
        Z = jnp.zeros((n, 1), jnp.float64).at[pv_].set(R)  # ipvec
        Y = _solve_mf_dev(mfp, Z.astype(ft), cache).astype(jnp.float64)
        return Y[pv_]  # pvec

    if pad is not None:
        pad_src, col_pad = pad
        mxp = jnp.where(pad_src >= 0,
                        mx[jnp.clip(pad_src, 0, None)],
                        jnp.zeros((), mx.dtype))

        def amul(X):
            return jnp.einsum("nk,nkr->nr", mxp, X[col_pad])
    else:
        def amul(X):
            return jnp.zeros((n, 1), jnp.float64).at[Mi_].add(
                mx[:, None] * X[Mj_])

    X = solve_once(b64)
    r = b64 - amul(X)
    rmax0 = jnp.max(jnp.abs(r))
    scale = jnp.maximum(jnp.max(jnp.abs(b64)), 1.0)

    def cond(st):
        _, _, k, rmax, prev = st
        return (k < steps) & (rmax > 1e-13 * scale) & (rmax < prev)

    def body(st):
        X, r, k, rmax, _ = st
        X2 = X + solve_once(r)
        r2 = b64 - amul(X2)
        rmax2 = jnp.max(jnp.abs(r2))
        better = rmax2 < rmax
        X = jnp.where(better, X2, X)
        r = jnp.where(better, r2, r)
        return (X, r, k + 1, jnp.minimum(rmax2, rmax), rmax)

    X, r, _, rmax, _ = jax.lax.while_loop(
        cond, body, (X, r, 0, rmax0, jnp.inf))
    return dmin, X, rmax, jnp.max(jnp.abs(X))


def _writable(a: np.ndarray) -> np.ndarray:
    """`a` itself if it's a writable ndarray, else a copy.

    `np.asarray` on a dtype-matching JAX array (and `jax.device_get`
    output) returns the runtime's cached host buffer as a zero-copy
    READ-ONLY view; mutating it raises "assignment destination is
    read-only" (this exact hazard voided BENCH_r02 on real TPU). Every
    batched-values driver funnels its device result through here before
    any per-instance fallback writeback — lazily, so the common
    all-accepted path stays zero-copy."""
    return a if a.flags.writeable else a.copy()


def _chol_vals_finish(a: Sprs, s, AxK, Bm, out, dmin_h, rmax_h, xmax_h,
                      order: int):
    """Accept/fallback pass shared by the batched-values SPD drivers.

    dmin <= 0 under an f32 factor can be spurious for a genuinely PD
    instance (see factor.chol's f64 retry), and refinement may fall short
    of 1e-10·scale — both cases re-solve that instance through the exact f64
    `cholsol`, which raises true NPD itself. Raises naming ALL truly NPD
    instances."""
    from .errors import NotPositiveDefiniteError

    n, nz = a.n, a.nnz()
    scale = np.maximum(np.abs(Bm).max(axis=1), np.maximum(xmax_h, 1.0))
    redo = (~(dmin_h > 0.0)) | (rmax_h > 1e-10 * scale)
    if not redo.any():
        return out
    out = _writable(out)
    bad = []
    for k in np.nonzero(redo)[0]:
        ak = Sprs(nz, n, n, a.p, a.i[:nz], AxK[k])
        try:
            out[k] = cholsol(ak, Bm[k].copy(), order, sym=s)
        except NotPositiveDefiniteError:
            bad.append(int(k))
    if bad:
        raise NotPositiveDefiniteError(
            f"instances {bad} are not positive definite")
    return out


def cholsol_vals(a: Sprs, Ax, B, order: int = 0, *,
                 sym: Optional[Symb] = None):
    """Batched-VALUES SPD solve: K systems A_k x_k = b_k where every A_k
    shares `a`'s sparsity pattern and differs only in values.

    No reference counterpart — this is the orthogonal batching axis to
    `cholsol_multi` (one matrix, many RHS) and a TPU-native consequence of
    the plan/value split: the symbolic analysis, multifrontal plan, and
    compiled executable are shared across the batch, and `jax.vmap` turns
    the K factorizations + solves into ONE device program. On TPU the
    factor runs in f32 (K-batched MXU dense fronts) and the same program
    refines each instance in f64 against the symmetrized residual, so
    per-instance accuracy matches `cholsol` (reference src/lib.rs:377-389);
    instances refinement cannot recover re-solve exactly one-by-one.

    Ax: [K, nnz(a)] value rows (`a.x` is ignored); B: [K, n] per-system
    RHS, or [n] broadcast to all K. Returns X [K, n]. Raises
    NotPositiveDefiniteError naming the failing instances if any A_k is
    not SPD.
    """
    import jax
    import jax.numpy as jnp

    from .factor.frontal import (_chol_factor_dtype, _collect_chol_dev,
                                 _prep_factor_indices, _prep_solve_indices)

    n = a.n
    s, mfp, AxK, Bm, pv = _chol_vals_setup(a, Ax, B, order, sym)
    if mfp is None:
        return _chol_vals_fallback(a, s, AxK, Bm, order)
    src, Mi, Mj, offd, pad = _chol_vals_static(mfp, a, s)
    _prep_factor_indices(mfp)
    _prep_solve_indices(mfp)
    dev = _collect_chol_dev(mfp)
    fdt = _chol_factor_dtype(True)  # f32 on TPU; in-program f64 refinement
    cached = mfp.__dict__.get("_vals_jit")
    if cached is not None and cached[1] == fdt:
        fn = cached[0]
    else:  # (re)build — the traced program bakes the factor dtype
        def run(CxK, BK, dev, pv_, Mi_, Mj_, offd_, *padargs):
            pad_ = padargs if padargs else None

            def one(cx64, b64):
                return _chol_vals_one(mfp, n, fdt, dev, pv_, Mi_, Mj_,
                                      offd_, cx64, b64, pad=pad_)

            # NOTE: packing these into one [K, n+3] array (concat/stack,
            # inside or outside the vmap) reproducibly crashed the v5e
            # TPU worker with a kernel fault — keep the 4-leaf output.
            return jax.vmap(one)(CxK, BK)

        fn = jax.jit(run)
        mfp.__dict__["_vals_jit"] = (fn, fdt)
    # warm-call upload cache: the [K, cnnz] f64 value batch is the dominant
    # per-call transfer (6+ MB at the bench shape); repeated solves with
    # unchanged values (parameter sweeps re-solved under new RHS, serving)
    # skip it entirely
    fpk = (AxK.shape, hash(np.ascontiguousarray(AxK).tobytes()))
    vc = mfp.__dict__.get("_vals_upload")
    if vc is not None and vc[0] == fpk:
        CxKd = vc[1]
    else:
        CxKd = jnp.asarray(AxK[:, src])
        mfp.__dict__["_vals_upload"] = (fpk, CxKd)
    dmin_k, Y, rmaxK, xmaxK = jax.device_get(fn(
        CxKd, jnp.asarray(Bm[..., None]),
        dev, jnp.asarray(pv), Mi, Mj, offd,
        *(pad if pad is not None else ())))
    return _chol_vals_finish(a, s, AxK, Bm,
                             np.asarray(Y[..., 0], np.float64),
                             np.asarray(dmin_k), np.asarray(rmaxK),
                             np.asarray(xmaxK), order)


def _lu_vals_setup(a: Sprs, Ax, B, order: int, sym: Optional[Symb]):
    """Shared validation + analysis + MF-plan resolution for the batched-
    values LU drivers. Returns (s, plan_or_None, AxK, Bm); plan is None
    when the per-instance tier must run."""
    from .factor.frontal import fuse_entry_cap
    from .factor.frontal_lu import _lu_plan_index_entries
    from .symbolic import sqr

    n = a.n
    if a.m != n:
        raise ValueError(f"lusol_vals needs a square matrix, got {a.m}x{n}")
    nz = a.nnz()
    AxK = np.asarray(Ax, dtype=np.float64)
    if AxK.ndim != 2 or AxK.shape[1] != nz:
        raise ValueError(f"Ax must be [K, nnz(a)] = [K, {nz}], got "
                         f"{AxK.shape}")
    K = AxK.shape[0]
    Bm = np.asarray(B, dtype=np.float64)
    if Bm.ndim == 1:
        Bm = np.broadcast_to(Bm, (K, n))
    if Bm.shape != (K, n):
        raise ValueError(f"B must be [K, n] or [n], got {Bm.shape}")
    s = sym if sym is not None else sqr(a, order, False)
    plan = getattr(s, "_mf_lu_plan", "unset")
    if plan == "unset" and n >= config.mf_min_n:
        from .factor.frontal_lu import build_lu_mf_plan

        a0 = Sprs(nz, n, n, a.p, a.i[:nz], AxK[0])  # plan from instance 0
        try:
            plan = build_lu_mf_plan(a0, s)
        except Exception:
            plan = None
        s._mf_lu_plan = plan
    fuse_ok = (plan is not None and plan != "unset"
               and plan.__dict__.setdefault(
                   "_fuse_ok", _lu_plan_index_entries(plan)
                   <= fuse_entry_cap()))
    if plan == "unset" or not fuse_ok or config.backend == "host":
        plan = None
    return s, plan, AxK, Bm


def _lu_vals_loop(a: Sprs, s, AxK, Bm, order: int, tol: float, idx):
    """Per-instance driver pass (handles eager MF / host dispatch itself)."""
    n, nz = a.n, a.nnz()
    out_h = np.empty((len(idx), n), dtype=np.float64)
    for j, k in enumerate(idx):
        ak = Sprs(nz, n, n, a.p, a.i[:nz], AxK[k])
        out_h[j] = lusol(ak, list(Bm[k]), order, tol, sym=s)
    return out_h


def _lu_vals_factor_one(plan, cx, tolv, dev):
    """Per-instance traced factor body (shared by lusol_vals and
    parallel.dist_lusol_vals): returns (stats [2] = [min margin, bad],
    cache tree, concatenated pivot perms)."""
    import jax.numpy as jnp

    from .factor.frontal_lu import _lu_mf_values

    _, _, margins, bads, cache, perms = _lu_mf_values(cx, plan, tolv, dev)
    mg = (jnp.min(jnp.stack(margins)) if margins
          else jnp.asarray(0.0, cx.dtype))
    bad = jnp.any(jnp.stack(bads)) if bads else jnp.asarray(False)
    pc = (jnp.concatenate(perms) if perms
          else jnp.zeros((0,), jnp.int32))
    return jnp.stack([mg, bad.astype(cx.dtype)]), cache, pc


def _lu_vals_compose(plan, stats_h, perm_h, n: int, tol: float):
    """Host integer pass after the batched factor: per-instance accept
    flags, composed row pinv, and the stacked inner-elimination leaves
    (numpy [K, ...] per nesting level, `_attach_inners` order)."""
    from .factor.frontal_lu import _compose_elim

    K = stats_h.shape[0]
    ok = np.empty(K, dtype=bool)
    pinK = np.empty((K, n), dtype=np.int64)
    inners_K = None
    for k in range(K):
        ok[k] = (not bool(stats_h[k, 1])
                 and float(stats_h[k, 0]) + float(tol) >= 1e-10)
        inners: list = []
        elim, _ = _compose_elim(plan, np.asarray(perm_h[k]), 0, inners)
        if inners_K is None:
            inners_K = [[] for _ in inners]
        for lv, v in enumerate(inners):
            inners_K[lv].append(v.astype(np.int32))
        einv = np.empty(n, dtype=np.int64)
        einv[elim] = np.arange(n)
        pinK[k] = (einv[plan.row_pinv] if plan.row_pinv is not None
                   else einv)
    return ok, pinK, [np.stack(v) for v in inners_K]


def _lu_vals_pattern(plan, a: Sprs):
    """Device-resident COO pattern of A (original order) for the batched
    refinement, cached on the plan."""
    import jax.numpy as jnp

    pat = plan.__dict__.get("_vals_solve_pattern")
    if pat is None:
        nz = a.nnz()
        pat = (jnp.asarray(a.i[:nz].astype(np.int32)),
               jnp.asarray(col_ids(a.p, a.n).astype(np.int32)))
        plan.__dict__["_vals_solve_pattern"] = pat
    return pat


def lusol_vals(a: Sprs, Ax, B, order: int = 1, tol: float = 1e-6, *,
               sym: Optional[Symb] = None):
    """Batched-VALUES LU solve: K square systems sharing `a`'s sparsity
    pattern, factored and solved in TWO vmapped device programs (factor;
    fused solve + f64 refinement) over the multifrontal pivoting tree.

    The CSC factor EXPORT cannot batch — pivoting gives each instance its
    own elimination labels — but the MF solve tree is structure-static
    (pivot perms live inside dense fronts / the dense skeleton), so only
    per-instance host integer bookkeeping separates the instances. The
    static-pivot prep (MC64 row matching) comes from the PLAN's build
    values; instances whose refinement cannot reach 1e-10·scale fall back
    one-by-one to the reference-exact host engine, so per-instance
    accuracy matches `lusol`.

    Ax: [K, nnz(a)]; B: [K, n] or [n] broadcast. Returns X [K, n].
    """
    import jax
    import jax.numpy as jnp

    from .factor.frontal_lu import (_attach_inners, _collect_lu_dev,
                                    _collect_lu_sdev, _lu_factor_dtype,
                                    _prep_lu_factor_indices,
                                    _prep_lu_solve_indices)

    n = a.n
    s, plan, AxK, Bm = _lu_vals_setup(a, Ax, B, order, sym)
    K = AxK.shape[0]
    if plan is None:
        return _lu_vals_loop(a, s, AxK, Bm, order, tol, range(K))
    _prep_lu_factor_indices(plan)
    _prep_lu_solve_indices(plan)
    dev = _collect_lu_dev(plan)
    sdev = _collect_lu_sdev(plan)
    fdt = _lu_factor_dtype(True)  # f32 on TPU; program B refines in f64
    CxK = AxK[:, plan.vperm] if plan.vperm is not None else AxK
    CxKd = (jnp.asarray(CxK) if fdt is None else jnp.asarray(CxK, fdt))
    tolv = jnp.asarray(float(tol), CxKd.dtype)
    fA = plan.__dict__.get("_vals_factor_jit")
    if fA is None:
        def runA(CxK, tolv, dev):
            return jax.vmap(
                lambda cx: _lu_vals_factor_one(plan, cx, tolv, dev))(CxK)

        fA = jax.jit(runA)
        plan.__dict__["_vals_factor_jit"] = fA
    statsK, cacheK, permK = fA(CxKd, tolv, dev)
    stats_h, perm_h = jax.device_get((statsK, permK))
    ok, pinK, inners = _lu_vals_compose(plan, stats_h, perm_h, n, tol)
    cacheK, _ = _attach_inners(plan, cacheK,
                               [jnp.asarray(v) for v in inners])
    Mi, Mj = _lu_vals_pattern(plan, a)
    qv = (jnp.asarray(np.asarray(s.q, np.int64)) if s.q is not None
          else None)
    fB = plan.__dict__.get("_vals_solve_jit")
    if fB is None:
        def runB(BK, cacheK, pinK, MxK, sdev, Mi_, Mj_, *qopt):
            q_ = qopt[0] if qopt else None

            def one(b, cache, pin_k, mx):
                return _lu_refine_body(plan, n, b.astype(jnp.float64),
                                       cache, sdev, Mi_, Mj_, mx, pin_k, q_)

            return jax.vmap(one)(BK, cacheK, pinK, MxK)

        fB = jax.jit(runB)
        plan.__dict__["_vals_solve_jit"] = fB
    args = [jnp.asarray(Bm[..., None]), cacheK, jnp.asarray(pinK),
            jnp.asarray(AxK), sdev, Mi, Mj]
    if qv is not None:
        args.append(qv)
    Xk, rmaxK, xmaxK = jax.device_get(fB(*args))
    out = np.asarray(Xk[..., 0], np.float64)
    scale = np.maximum(np.abs(Bm).max(axis=1),
                       np.maximum(np.asarray(xmaxK), 1.0))
    ok &= np.asarray(rmaxK) <= 1e-10 * scale
    if not ok.all():  # per-instance exact fallback (rare)
        bad_idx = np.nonzero(~ok)[0]
        out = _writable(out)
        out[bad_idx] = _lu_vals_loop(a, s, AxK, Bm, order, tol, bad_idx)
    return out


def _qr_vals_batched_ok() -> bool:
    """Whether the K-batched (vmapped whole-tree) QR vals program may run
    on the current backend.

    On TPU v5e the compiled vmapped program kernel-faults the worker at
    execution time (round-5 bisect: fronts-only, fronts+Qᵀ-apply, and
    fronts+R-sweep all pass; EVERY refinement-bearing form — f64
    segment-sum grad, padded-einsum grad, single step without any loop,
    and a two-program split with no lax.linalg.qr in the refining
    program — reproducibly crashes the worker, taking the whole process's
    PJRT client with it). Until the platform bug is fixed, TPU routes the
    per-instance tier (the chunked qr_mf path `qrsol` itself uses, which
    is stable at every bench scale); CPU keeps the vmapped program.
    """
    import jax

    return jax.default_backend() != "tpu"


def _qr_vals_one(plan, ls, tp_, devs_in, sdevs_in, tridev, ax, z,
                 fdt=None, refine=None):
    """Per-instance traced body shared by qrsol_vals and
    parallel.dist_qrsol_vals: MF QR fronts on this instance's values, then
    the branch solve (Qᵀz + R sweep for least-squares; Rᵀ sweep + reverse
    Q-apply for minimum-norm).

    `fdt` (advisor r4: the batched f64 lax.linalg.qr is 56x slower to run
    / 9x to compile on TPU) factors the fronts in f32 with in-program f64
    refinement; `refine` = (nref, tpt_, tridev_t, ai, colseg, qd, b64)
    supplies the CSNE (ls) / residual (mn) machinery. Returns Y [n_or_m, 1]
    plus the best achieved f64 quality scalar (LS gradient max / residual
    max; None-equivalent when refine is None — f64 exact path)."""
    import jax
    import jax.numpy as jnp

    from .factor.frontal_qr import (_plan_dims, _q_apply, _qr_front_body,
                                    _qt_apply)

    axf = ax if fdt is None else ax.astype(fdt)
    Rx = jnp.zeros(plan.rnz + 1, dtype=axf.dtype)
    cbx = jnp.zeros(plan.cb_total + 1, dtype=axf.dtype)
    qs = []
    for dev, dims in zip(devs_in, _plan_dims(plan)):
        Rx, cbx, Q = _qr_front_body(Rx, cbx, axf, dev, dims)
        qs.append(Q)
    qs = tuple(qs)
    Rv = Rx[: plan.rnz]
    ft = axf.dtype

    if ls:
        def usolve(c):
            return _tri_sweep_multi(Rv, c.astype(ft), *tridev,
                                    tp_.nlev, tp_.emax, tp_.wmax,
                                    plan.n, True)

        c = _qt_apply(plan, z.astype(ft), qs, sdevs_in)
        X = usolve(c)
        if refine is None:
            return X, jnp.zeros((), jnp.float64)
        nref, tpt_, tridev_t, ai_, colseg_, qd_ = refine
        b64 = z[:, 0].astype(jnp.float64)  # ls feeds the unpermuted rhs

        def utsolve(g):
            return _tri_sweep_multi(Rv, g.astype(ft), *tridev_t,
                                    tpt_.nlev, tpt_.emax, tpt_.wmax,
                                    plan.n, False)

        # entries: value k belongs to (row ai_[k], original col
        # colseg_[k]); xp is permuted — per-entry permuted col = jq[col]
        jq = jnp.zeros(plan.n, jnp.int32).at[qd_].set(
            jnp.arange(plan.n, dtype=jnp.int32))
        acol_lookup = jq[colseg_]

        def grad(xp):  # f64 LS gradient A'(b - A xp), permuted cols
            r = b64 - jax.ops.segment_sum(
                ax * xp[acol_lookup], ai_, num_segments=plan.m)
            gq = jax.ops.segment_sum(ax * r[ai_], colseg_,
                                     num_segments=plan.n,
                                     indices_are_sorted=True)
            return gq[qd_]

        xp = X[:, 0].astype(jnp.float64)
        g = grad(xp)
        gmax0 = jnp.max(jnp.abs(g))
        scale = jnp.maximum(jnp.max(jnp.abs(g)), 1.0)

        def cond(st):
            _, _, k, gmax, prev = st
            return (k < nref) & (gmax > 1e-14 * scale) & (gmax < prev)

        def body(st):
            xp, g, k, gmax, _ = st
            dx = usolve(utsolve(g[:, None]))[:, 0]
            x2 = xp + dx.astype(jnp.float64)
            g2 = grad(x2)
            g2max = jnp.max(jnp.abs(g2))
            better = g2max < gmax
            xp = jnp.where(better, x2, xp)
            g = jnp.where(better, g2, g)
            return (xp, g, k + 1, jnp.minimum(g2max, gmax), gmax)

        xp, g, _, gmax, _ = jax.lax.while_loop(
            cond, body, (xp, g, 0, gmax0, jnp.inf))
        return xp[:, None], gmax

    def utsolve(c):
        return _tri_sweep_multi(Rv, c.astype(ft), *tridev,
                                tp_.nlev, tp_.emax, tp_.wmax,
                                plan.n, False)

    def S(zq):
        y = utsolve(zq)
        return _q_apply(plan, y, qs, sdevs_in)

    X = S(z)
    if refine is None:
        return X, jnp.zeros((), jnp.float64)
    nref, _, _, ati_, acol_, qd_ = refine
    # at's entries: (row ati_[k] in x-space, original col acol_[k] in
    # b-space); z = b64[qd_] with qd_ a permutation, so b64 recovers by
    # scattering z back
    b64 = (jnp.zeros(plan.n, jnp.float64)
           .at[qd_].set(z[:, 0].astype(jnp.float64)))
    x = X[:, 0].astype(jnp.float64)

    def resid(x):
        y = jax.ops.segment_sum(ax * x[ati_], acol_,
                                num_segments=plan.n,
                                indices_are_sorted=True)
        return b64 - y

    r = resid(x)
    rmax0 = jnp.max(jnp.abs(r))
    scale = jnp.maximum(jnp.max(jnp.abs(b64)), 1.0)

    def cond(st):
        _, _, k, rmax, prev = st
        return (k < nref) & (rmax > 1e-14 * scale) & (rmax < prev)

    def body(st):
        x, r, k, rmax, _ = st
        x2 = x + S(r[qd_][:, None])[:, 0].astype(jnp.float64)
        r2 = resid(x2)
        r2max = jnp.max(jnp.abs(r2))
        better = r2max < rmax
        x = jnp.where(better, x2, x)
        r = jnp.where(better, r2, r)
        return (x, r, k + 1, jnp.minimum(r2max, rmax), rmax)

    x, r, _, rmax, _ = jax.lax.while_loop(
        cond, body, (x, r, 0, rmax0, jnp.inf))
    return x[:, None], rmax


def _qr_vals_rtri(plan, ls):
    """The cached R-sweep plan for the vals drivers (usolve for the
    least-squares branch, utsolve-on-Rᵀ for minimum-norm)."""
    key = "_rtri" if ls else "_rtri_t"
    tp_ = plan.__dict__.get(key)
    if tp_ is None:
        rmat = Sprs(plan.rnz, plan.n, plan.n, plan.Rp, plan.Ri,
                    np.zeros(plan.rnz))
        tp_ = tri_plan(rmat, 1 if ls else 3)
        _plan_dev(tp_)
        plan.__dict__[key] = tp_
    return tp_


def qrsol_vals(a: Sprs, Ax, B, order: int = 2, *,
               sym: Optional[Symb] = None):
    """Batched-VALUES QR solve: K systems sharing `a`'s sparsity pattern,
    least-squares (m >= n) or minimum-norm (m < n, via QR of A' — reference
    src/lib.rs:943-955), factored and solved in ONE vmapped device program
    over the multifrontal QR tree (see `cholsol_vals` for the design; the
    K dense front QRs batch onto the MXU). See `lusol_vals` for the LU
    member of the family.

    Ax: [K, nnz(a)] value rows (`a.x` is ignored); B: [K, m] per-system
    RHS, or [m] broadcast. Returns X [K, n]. `sym`: a `sqr(a, order, True)`
    analysis when m >= n, or `sqr(transpose(a), order, True)` when m < n.
    """
    import jax
    import jax.numpy as jnp

    from .factor.frontal_qr import _prep_qr_indices
    from .ops.plan import transpose_plan
    from .symbolic import sqr

    m, n = a.m, a.n
    nz = a.nnz()
    AxK = np.asarray(Ax, dtype=np.float64)
    if AxK.ndim != 2 or AxK.shape[1] != nz:
        raise ValueError(f"Ax must be [K, nnz(a)] = [K, {nz}], got "
                         f"{AxK.shape}")
    K = AxK.shape[0]
    Bm = np.asarray(B, dtype=np.float64)
    if Bm.ndim == 1:
        Bm = np.broadcast_to(Bm, (K, m))
    if Bm.shape != (K, m):
        raise ValueError(f"B must be [K, m] = [{K}, {m}] or [m], got "
                         f"{Bm.shape}")
    ls = m >= n
    host_a = a if ls else None  # A' materialized lazily (warm calls skip it)

    def _get_host_a():
        nonlocal host_a
        if host_a is None:
            host_a = ops.transpose(a)  # factor A' (minimum-norm branch)
        return host_a

    s = sym if sym is not None else sqr(_get_host_a(), order, True)
    plan = getattr(s, "_mf_qr_plan", "unset")
    if plan == "unset" and (n if ls else m) >= config.mf_min_n:
        from .factor.frontal_qr import build_qr_mf_plan

        try:
            plan = build_qr_mf_plan(_get_host_a(), s)
        except Exception:
            plan = None
        s._mf_qr_plan = plan
    # the vmapped variant fuses the whole tree in one program, so it gets
    # the same entry-cap gate as the chol/lu vals drivers — beyond it the
    # K-batched trace compiles for too long even chunked, and the
    # per-instance tier (which runs the chunked qr_mf path) takes over
    if plan is not None and plan != "unset":
        from .factor.frontal import fuse_entry_cap
        from .factor.frontal_qr import _qr_plan_index_entries

        if not plan.__dict__.setdefault(
                "_vals_fuse_ok",
                _qr_plan_index_entries(plan) <= fuse_entry_cap()):
            plan = None
    if plan is not None and plan != "unset" and not _qr_vals_batched_ok():
        plan = None
    if plan is None or plan == "unset" or config.backend == "host":
        # per-instance reference-shaped solves (small / inapplicable tier)
        out = np.empty((K, n), dtype=np.float64)
        for k in range(K):
            ak = Sprs(nz, m, n, a.p, a.i[:nz], AxK[k])
            out[k] = qrsol(ak, list(Bm[k]), order, sym=s)
        return out
    vmap_ax = AxK if ls else AxK[:, transpose_plan(a).perm]
    _prep_qr_indices(plan)
    devs = [b.__dict__["_dev"] for lev in plan.levels for b in lev]
    sdevs = [b.__dict__["_sdev"] for lev in plan.levels for b in lev]
    tp_ = _qr_vals_rtri(plan, ls)
    tridev = _plan_dev(tp_)
    # f32 fronts + in-program f64 refinement on TPU (advisor r4: batched
    # f64 lax.linalg.qr is 56x slower to run / 9x to compile); exact f64
    # on CPU. Gate failures fall back per instance below.
    from .factor.frontal_qr import _qr_factor_dtype

    fdt = _qr_factor_dtype()
    nref = 0 if fdt == jnp.float64 else max(0, int(config.qr_refine))
    refargs = ()
    tpt_ = None
    if nref:
        tpt_ = _qr_vals_rtri(plan, False)  # kind-3 R' sweep (CSNE half)
        ridx = plan.__dict__.get("_vals_refine_idx")
        if ridx is None:
            fa = a if ls else _get_host_a()  # the factored matrix
            nzf = fa.nnz()
            qh = (np.asarray(plan.q, np.int64) if plan.q is not None
                  else np.arange(plan.n, dtype=np.int64))
            ridx = (jnp.asarray(np.asarray(fa.i[:nzf], np.int32)),
                    jnp.asarray(col_ids(fa.p, fa.n).astype(np.int32)),
                    jnp.asarray(qh))
            plan.__dict__["_vals_refine_idx"] = ridx
        refargs = (_plan_dev(tpt_),) + ridx
    cached = plan.__dict__.get("_vals_jit" if ls else "_vals_mn_jit")
    if cached is not None and cached[1] == (fdt, nref):
        fn = cached[0]
    else:
        # index trees flow in as jit ARGUMENTS (compile-size discipline,
        # see frontal.chol_mf); the vmapped body closes over run's args
        def run(AxK, ZK, devs_in, sdevs_in, tridev, *ref_in):
            def one(ax, z):
                refine = ((nref, tpt_, ref_in[0], ref_in[1], ref_in[2],
                           ref_in[3]) if ref_in else None)
                return _qr_vals_one(plan, ls, tp_, devs_in, sdevs_in,
                                    tridev, ax, z, fdt=fdt, refine=refine)

            return jax.vmap(one)(AxK, ZK)

        fn = jax.jit(run)
        plan.__dict__["_vals_jit" if ls else "_vals_mn_jit"] = (
            fn, (fdt, nref))
    if ls:
        Z = Bm[..., None]  # row perm is embedded in the front plan
    else:
        bq = Bm
        if plan.q is not None:
            bq = Bm[:, np.asarray(plan.q, dtype=np.int64)]
        Z = bq[..., None]
    Yd, quality = fn(jnp.asarray(vmap_ax), jnp.asarray(Z), devs, sdevs,
                     tridev, *refargs)
    Y = np.asarray(Yd)[:, :, 0]
    if ls:
        out = np.zeros((K, n), dtype=np.float64)
        out[:, (np.asarray(s.q, np.int64) if s.q is not None
                else np.arange(n))] = Y  # ipvec(q) per instance
    else:
        # _q_apply returns original row order; _writable: never hand the
        # caller a read-only view of the runtime's cached device buffer
        out = _writable(Y)
    if nref:
        # acceptance gate (mirrors qrsol's): instances whose f32+refine
        # quality misses f64 levels re-solve exactly one-by-one
        qh = np.asarray(quality, np.float64)
        if ls:
            gscale = np.maximum(
                1.0, np.abs(_host_spmm_t(a, Bm.T)).max(axis=0))
        else:
            gscale = np.maximum(1.0, np.abs(Bm).max(axis=1))
        bad = np.nonzero(qh > 1e-8 * gscale)[0]
        if len(bad):
            out = _writable(out)
            for k in bad:
                ak = Sprs(nz, m, n, a.p, a.i[:nz], AxK[k])
                out[k] = qrsol(ak, list(Bm[k]), order, sym=s)
    return out


def _serve_enabled():
    import jax

    on_tpu = jax.default_backend() == "tpu"
    return (config.use_pallas
            and (config.serve_mixed == "force"
                 or (config.serve_mixed == "auto" and on_tpu)))


def _chain_prep(chain):
    """Static specs + device consts for a sequence of f32 Pallas sweeps.

    chain: [(TriPlan, vals_f64, kind), ...]. Returns (specs, flat) where
    specs holds one (nlev, wmax_pad, scatter_form) triple per sweep and
    flat holds seven device-resident const arrays per sweep, in the
    argument order `ops.sptrsv_pallas._sweep_call` expects."""
    import jax
    import jax.numpy as jnp

    from .ops.sptrsv_pallas import _streams

    specs = []  # (nlev, wmax_pad, scatter_form) per sweep, static
    flat = []  # device const arrays, 7 per sweep
    with jax.enable_x64(False):
        for plan, vals, kind in chain:
            st = _streams(plan)
            v32 = jnp.asarray(np.asarray(vals, np.float32))
            ev = v32[jnp.asarray(st["epos"])]
            dv = v32[jnp.asarray(st["cdiag"])]
            eb = st["ecol"] if kind in (0, 1) else st["eslot"]
            flat += [jnp.asarray(st["eoff"]), jnp.asarray(st["coff"]), ev,
                     jnp.asarray(st["erow"]), jnp.asarray(eb), dv,
                     jnp.asarray(st["cid"])]
            specs.append((plan.nlev, max(-(-plan.wmax // 8) * 8, 8),
                          kind in (0, 1)))
    return specs, flat


def _make_serve_handle(n: int, chain, pin, pout, Mi, Mj, Mx,
                       refine: int):
    """Build a device-resident batched solve handle `h(B[n, nrhs]) -> X`.

    chain: [(TriPlan, vals_f64, kind), ...] — f32 Pallas SpTRSV sweeps run
    in order. pin/pout: row permutations (Bp[pin[i]] = B[i] on the way in,
    X[i] = Xs[pout[i]] on the way out; None = identity). (Mi, Mj, Mx): COO
    of the f64 residual matrix in ORIGINAL row order — `refine` iterative-
    refinement steps run on device against it. The whole solve (permute,
    sweeps, refinement) is ONE jitted device program; consts stay resident
    on device across calls."""
    import jax
    import jax.numpy as jnp

    from .config import maybe_enable_compilation_cache
    from .ops.sptrsv_pallas import _sweep_call, pallas_sweep_available

    maybe_enable_compilation_cache()
    n_pad = -(-(n + 1) // 8) * 8
    interpret = jax.default_backend() != "tpu"
    specs, flat = _chain_prep(chain)
    pin_d = jnp.asarray(pin) if pin is not None else None
    pout_d = jnp.asarray(pout) if pout is not None else None
    Mi_d, Mj_d = jnp.asarray(Mi), jnp.asarray(Mj)
    Mx_d = jnp.asarray(np.asarray(Mx, np.float64))

    @partial(jax.jit, static_argnames=("nrhs",))
    def run(B, Mi_, Mj_, Mx_, *consts, nrhs):
        perm = consts[7 * len(specs):]
        with jax.enable_x64(False):
            calls = [_sweep_call(nl, n_pad, nrhs, wp, sf, interpret)
                     for nl, wp, sf in specs]

        def solve_full(R):
            Rp = R if pin_d is None else jnp.zeros(
                (n, nrhs), jnp.float64).at[perm[0]].set(R)
            Z = jnp.zeros((n_pad, nrhs), jnp.float32).at[:n].set(
                Rp.astype(jnp.float32))
            with jax.enable_x64(False):
                for k, call in enumerate(calls):
                    Z = call(*consts[7 * k: 7 * k + 7], Z)
            Xs = Z[:n].astype(jnp.float64)
            return Xs if pout_d is None else Xs[perm[-1]]

        def amul(X):
            return jnp.zeros((n, nrhs), jnp.float64).at[Mi_].add(
                Mx_[:, None] * X[Mj_])

        B64 = B.astype(jnp.float64)
        X = solve_full(B64)
        r = B64 - amul(X)
        rmax0 = jnp.max(jnp.abs(r))
        scale = jnp.maximum(jnp.max(jnp.abs(B64)), 1.0)

        # early-exit refinement: up to `refine` steps, keep the best
        # iterate, stop once converged or stagnant — well-conditioned
        # systems exit after one cheap check, weak static-pivot factors
        # (element growth) get the extra contractions they need
        def cond(st):
            _, _, k, rmax, prev = st
            return (k < refine) & (rmax > 1e-13 * scale) & (rmax < prev)

        def body(st):
            X, r, k, rmax, _ = st
            X2 = X + solve_full(r)
            r2 = B64 - amul(X2)
            rmax2 = jnp.max(jnp.abs(r2))
            better = rmax2 < rmax
            X = jnp.where(better, X2, X)
            r = jnp.where(better, r2, r)
            return (X, r, k + 1, jnp.minimum(rmax2, rmax), rmax)

        X, r, _, rmax, _ = jax.lax.while_loop(
            cond, body, (X, r, 0, rmax0, jnp.inf))
        return X, rmax

    pargs = ([pin_d] if pin_d is not None else []) + (
        [pout_d] if pout_d is not None else [])

    def handle(B):
        nrhs = int(np.shape(B)[1])  # budget check BEFORE any device transfer
        if not pallas_sweep_available(n, nrhs, np.float32):
            raise ValueError(
                f"serve handle unavailable for n={n}, nrhs={nrhs}: the "
                "factor exceeds the Pallas VMEM budget — use the *_multi "
                "drivers (XLA sweeps) for this problem size")
        X, rmax = run(jnp.asarray(B), Mi_d, Mj_d, Mx_d, *flat, *pargs,
                      nrhs=nrhs)
        # device scalar, read lazily: float(handle.last_residual) gates
        # accuracy without forcing a sync on the serving hot path
        handle.last_residual = rmax
        return X

    handle.available = pallas_sweep_available(n, 128, np.float32)
    handle.last_residual = None
    return handle


def cholsol_serve(a: Sprs, order: int = 0, *, sym: Optional[Symb] = None,
                  refine: int = 8):
    """Device-resident batched SPD solve handle: `h(B[n, nrhs]) -> X` with
    chol semantics (the factorization — and hence the refinement — uses the
    symmetrized upper triangle of PAP', exactly like the reference's
    cholsol, src/lib.rs:377-389; for symmetric A that IS A).

    One symbolic analysis + one factorization, then every `h(B)` call is a
    single fused device program: f32 Pallas SpTRSV sweeps
    (ops/sptrsv_pallas.py — the whole level schedule in one kernel) plus
    up to `refine` early-exit steps of f64 iterative refinement against
    the symmetrized matrix, all on device (converged systems stop after
    one residual check). `h.last_residual` holds the final residual max as
    a lazy device scalar — serving pipelines can gate accuracy without
    forcing a sync. B may be a numpy or jnp array; the result is a
    jnp f64 array (keep it on device to avoid tunnel transfers — serving
    pipelines should produce/consume device arrays).

    No reference counterpart (the reference is single-RHS, host-only); this
    is the TPU-first serving shape (SURVEY.md §7 perf-pass 10)."""
    from .factor import chol
    from .symbolic import schol

    n = a.n
    s = sym if sym is not None else schol(a, order)
    nm = chol(a, s)
    lx = np.asarray(nm.l.x, np.float64)
    tc = getattr(s, "_tri_cache", None)
    if tc is None:
        tc = {}
        s._tri_cache = tc
    p0 = tc.get(0) or tc.setdefault(0, tri_plan(nm.l, 0))
    p2 = tc.get(2) or tc.setdefault(2, tri_plan(nm.l, 2))
    pinv = (np.asarray(s.pinv, np.int64) if s.pinv is not None
            else None)
    Mi, Mj, Mx = _sym_coo(a, s.pinv)
    h = _make_serve_handle(
        n, [(p0, lx, 0), (p2, lx, 2)], pinv, pinv,
        Mi.astype(np.int32), Mj.astype(np.int32), Mx, refine)
    h.sym = s
    return h


def lusol_serve(a: Sprs, order: int = 1, tol: float = 1e-6, *,
                sym: Optional[Symb] = None, refine: int = 8):
    """Device-resident batched LU solve handle: `h(B[n, nrhs]) -> X` with
    lusol semantics (reference src/lib.rs:672-683: P from partial pivoting,
    Q from the fill-reducing column ordering).

    Same serving design as `cholsol_serve` (early-exit refinement,
    `h.last_residual` gating): f32 Pallas SpTRSV sweeps (L then U) fused
    with on-device f64 iterative refinement against A."""
    from .factor import lu
    from .symbolic import sqr

    n = a.n
    s = sym if sym is not None else sqr(a, order, False)
    nm = lu(a, s, tol)
    lmat, umat = nm.l, nm.u
    lmat.x = np.asarray(lmat.x)
    umat.x = np.asarray(umat.x)
    pin = np.asarray(nm.pinv, np.int64) if nm.pinv is not None else None
    nz = a.nnz()
    # Factor-quality probe: static-pivot element growth can leave the MF
    # factors too weak for the handle's refinement to contract (it stalls
    # at ~growth*eps). One f64 sweep pair on a probe RHS measures the
    # factor's actual solve accuracy; if it misses, rebuild the chain from
    # the host engine's exact partial-pivoting factors (same escape hatch
    # the lusol driver uses, moved to build time so every h(B) call is
    # accurate).
    rngp = np.random.default_rng(0)
    bp = rngp.standard_normal((n, 2))
    zp = np.zeros_like(bp)
    if pin is not None:
        zp[pin] = bp
    else:
        zp[:] = bp
    zp = np.asarray(_tri_solve_multi(lmat, zp, 0))
    zp = np.asarray(_tri_solve_multi(umat, zp, 1))
    xp = np.zeros_like(zp)
    if s.q is not None:
        xp[np.asarray(s.q, np.int64)] = zp
    else:
        xp[:] = zp
    probe_res = float(np.abs(_host_spmm(a, xp) - bp).max())
    if probe_res > 1e-8 * max(1.0, float(np.abs(bp).max())):
        Lp2, Li2, Lx2, Up2, Ui2, Ux2, pv = native.lu_numeric(
            n, a.p, a.i[:nz], a.x[:nz], s.q, tol, s.lnz, s.unz)
        lmat = Sprs(len(Lx2), n, n, Lp2, Li2, np.asarray(Lx2))
        umat = Sprs(len(Ux2), n, n, Up2, Ui2, np.asarray(Ux2))
        pin = np.asarray(pv, np.int64)
    lx = np.asarray(lmat.x[: lmat.nnz()], np.float64)
    ux = np.asarray(umat.x[: umat.nnz()], np.float64)
    p0 = tri_plan(lmat, 0)
    p1 = tri_plan(umat, 1)
    # out[q[i]] = xs[i]  <=>  out[j] = xs[qinv[j]]
    pout = (np.argsort(np.asarray(s.q, np.int64))
            if s.q is not None else None)
    Mi = a.i[:nz].astype(np.int32)
    Mj = col_ids(a.p, n).astype(np.int32)
    Mx = np.asarray(a.x[:nz], np.float64)
    h = _make_serve_handle(
        n, [(p0, lx, 0), (p1, ux, 1)], pin, pout, Mi, Mj, Mx, refine)
    h.sym = s
    return h


def qrsol_serve(a: Sprs, order: int = 2, *, sym: Optional[Symb] = None,
                refine: int = 8):
    """Device-resident batched least-squares / minimum-norm solve handle:
    `h(B[m, nrhs]) -> X[n, nrhs]` with `qrsol_ls` (CSNE) semantics —
    min ||AX-B|| for m >= n, the minimum-norm solution for m < n.

    One Cholesky of the Gram matrix (A'A, or AA' when m < n), then every
    `h(B)` call is a single fused device program: the Gram solve runs as
    f32 Pallas SpTRSV sweeps (ops/sptrsv_pallas.py) and `refine` steps of
    corrected-seminormal-equation refinement (Björck: r = B - AX on the
    ORIGINAL f64 A, correction = G^{-1} A'r) recover f64 accuracy and undo
    the squared conditioning. Same serving design as `cholsol_serve` /
    `lusol_serve`; the reference's qrsol (src/lib.rs:927-956) is the
    single-RHS exact-Householder counterpart."""
    import jax
    import jax.numpy as jnp

    from .factor import chol
    from .symbolic import schol
    from .ops.sptrsv_pallas import _sweep_call, pallas_sweep_available

    m, n = a.m, a.n
    at = ops.transpose(a)
    g = ops.multiply(at, a) if m >= n else ops.multiply(a, at)
    k = g.n
    s = sym if sym is not None else schol(g, order)
    if sym is not None and s.parent is not None and len(s.parent) != k:
        raise ValueError(
            f"sym analyzes a {len(s.parent)}-dim system but the Gram "
            f"matrix here is {k}x{k} (A'A for m>=n, AA' for m<n) — pass "
            "schol of the matching Gram")
    nm = chol(g, s)
    lx = np.asarray(nm.l.x, np.float64)
    tc = getattr(s, "_tri_cache", None)
    if tc is None:
        tc = {}
        s._tri_cache = tc
    p0 = tc.get(0) or tc.setdefault(0, tri_plan(nm.l, 0))
    p2 = tc.get(2) or tc.setdefault(2, tri_plan(nm.l, 2))
    pinv = (np.asarray(s.pinv, np.int64) if s.pinv is not None else None)
    nz = a.nnz()
    Mi_d = jnp.asarray(a.i[:nz].astype(np.int32))
    Mj_d = jnp.asarray(col_ids(a.p, n).astype(np.int32))
    Mx_d = jnp.asarray(np.asarray(a.x[:nz], np.float64))
    pin_d = jnp.asarray(pinv) if pinv is not None else None

    k_pad = -(-(k + 1) // 8) * 8
    interpret = jax.default_backend() != "tpu"
    specs, flat = _chain_prep([(p0, lx, 0), (p2, lx, 2)])
    tall = m >= n

    @partial(jax.jit, static_argnames=("nrhs",))
    def run(B, Mi_, Mj_, Mx_, *consts, nrhs):
        perm = consts[7 * len(specs):]
        with jax.enable_x64(False):
            calls = [_sweep_call(nl, k_pad, nrhs, wp, sf, interpret)
                     for nl, wp, sf in specs]

        def solve_gram(R):  # [k, nrhs] f64 -> G^{-1} R, f32 sweeps inside
            Rp = R if pin_d is None else jnp.zeros(
                (k, nrhs), jnp.float64).at[perm[0]].set(R)
            Z = jnp.zeros((k_pad, nrhs), jnp.float32).at[:k].set(
                Rp.astype(jnp.float32))
            with jax.enable_x64(False):
                for c, call in enumerate(calls):
                    Z = call(*consts[7 * c: 7 * c + 7], Z)
            Zs = Z[:k].astype(jnp.float64)
            return Zs if pin_d is None else Zs[perm[0]]

        def ax(X):  # A @ X: [n, nrhs] -> [m, nrhs]
            return jnp.zeros((m, nrhs), jnp.float64).at[Mi_].add(
                Mx_[:, None] * X[Mj_])

        def atr(R):  # A' @ R: [m, nrhs] -> [n, nrhs]
            return jnp.zeros((n, nrhs), jnp.float64).at[Mj_].add(
                Mx_[:, None] * R[Mi_])

        B64 = B.astype(jnp.float64)

        # CSNE correction from the current residual; convergence tracks the
        # LS-optimality residual A'(B-AX) (tall) / the plain residual (wide)
        def resid(X):
            return atr(B64 - ax(X)) if tall else B64 - ax(X)

        def correct(r):
            return solve_gram(r) if tall else atr(solve_gram(r))

        X = correct(atr(B64) if tall else B64)
        r = resid(X)
        rmax0 = jnp.max(jnp.abs(r))
        scale = jnp.maximum(jnp.max(jnp.abs(B64)), 1.0)

        def cond(st):
            _, _, k, rmax, prev = st
            return (k < refine) & (rmax > 1e-13 * scale) & (rmax < prev)

        def body(st):
            X, r, k, rmax, _ = st
            X2 = X + correct(r)
            r2 = resid(X2)
            rmax2 = jnp.max(jnp.abs(r2))
            better = rmax2 < rmax
            X = jnp.where(better, X2, X)
            r = jnp.where(better, r2, r)
            return (X, r, k + 1, jnp.minimum(rmax2, rmax), rmax)

        X, r, _, rmax, _ = jax.lax.while_loop(
            cond, body, (X, r, 0, rmax0, jnp.inf))
        return X, rmax

    pargs = [pin_d] if pin_d is not None else []

    def handle(B):
        nrhs = int(np.shape(B)[1])  # budget check BEFORE any device transfer
        if not pallas_sweep_available(k, nrhs, np.float32):
            raise ValueError(
                f"qrsol_serve handle unavailable for k={k}, nrhs={nrhs}: "
                "the Gram factor exceeds the Pallas VMEM budget — use "
                "qrsol_multi (XLA sweeps) for this problem size")
        X, rmax = run(jnp.asarray(B), Mi_d, Mj_d, Mx_d, *flat, *pargs,
                      nrhs=nrhs)
        handle.last_residual = rmax  # device scalar, read lazily
        return X

    handle.available = pallas_sweep_available(k, 128, np.float32)
    handle.last_residual = None
    handle.sym = s
    return handle


def _serve_sweeps_mixed(a: Sprs, s, nm, Bm: np.ndarray):
    """cholsol_multi's serving branch: the device-resident cholsol_serve
    handle (f32 Pallas sweeps + on-device f64 refinement against the
    SYMMETRIZED matrix — chol semantics) with numpy in/out. Returns the
    solved [n, B] in original row order, or None when the path does not
    apply / refinement fell short (caller falls back to exact f64 XLA
    sweeps)."""
    from .ops.sptrsv_pallas import pallas_sweep_available

    n = a.n
    nrhs = Bm.shape[1] if Bm.ndim == 2 else 0
    if (not _serve_enabled() or nrhs < 8
            or not isinstance(nm.l.x, np.ndarray)
            or not pallas_sweep_available(n, nrhs, np.float32)):
        return None
    fp = _values_fp(a)
    handles = s.__dict__.setdefault("_serve_handles", {})
    h = handles.get("chol")
    if h is None or getattr(h, "_values_fp", None) != fp:
        h = cholsol_serve(a, sym=s)
        h._values_fp = fp
        handles["chol"] = h
    X = np.asarray(h(Bm), np.float64)
    # verify against the matrix chol actually factored (symmetrized triu
    # of PAP' — for symmetric inputs that is A itself)
    scale = max(1.0, float(np.abs(Bm).max()))
    pv = (np.asarray(s.pinv, np.int64) if s.pinv is not None
          else np.arange(n))
    Xp = np.zeros_like(X)
    Xp[pv] = X
    Bp = np.zeros_like(Bm)
    Bp[pv] = Bm
    c = ops.symperm(a, s.pinv) if s.pinv is not None else ops.symperm(a, None)
    nzc = c.nnz()
    ci = c.i[:nzc]
    cj = col_ids(c.p, n)
    cx = np.asarray(c.x[:nzc], np.float64)
    R = Bp.copy()
    np.add.at(R, ci, -cx[:, None] * Xp[cj])
    offd = ci != cj
    np.add.at(R, cj[offd], -cx[offd][:, None] * Xp[ci[offd]])
    if float(np.abs(R).max()) < 1e-9 * scale:
        return X
    return None  # conditioning beyond f32 refinement: exact path instead


def lusol_multi(a: Sprs, B, order: int = 1, tol: float = 1e-6,
                *, sym: Optional[Symb] = None):
    """Batched LU solve: B is [n, nrhs]; returns X with A@X = B.

    No reference counterpart (single-RHS only there); the TPU serving path —
    one symbolic analysis + factorization amortized over a lane-aligned RHS
    batch, with multifrontal front solves when the device plan is active.
    """
    from .factor import lu
    from .symbolic import sqr

    n = a.n
    s = sym if sym is not None else sqr(a, order, False)
    Bm = np.asarray(B, dtype=np.float64)
    if config.backend != "host":
        # one-shot: factor + device perm compose + batched solve + refine
        # in a single program (see _lu_one_shot)
        shot = _lu_one_shot(a, s, Bm, tol)
        if shot is not None:
            Xf, rmax, xmax, mfp, pinv_h = shot
            scale = max(float(np.abs(Bm).max()), xmax, 1.0)
            if rmax <= 1e-10 * scale:
                return _writable(Xf)
            from .data import Nmrc

            nm_shim = Nmrc()
            nm_shim.pinv = pinv_h
            return _lu_mf_refine(a, s, nm_shim, mfp, Bm, _writable(Xf))
    nm = lu(a, s, tol, mixed=True)
    mfp = getattr(s, "_mf_lu_plan", None)
    if (mfp is not None and "_cache_tree" in mfp.__dict__
            and config.backend != "host"):
        fused = _lu_mf_solve_fused(a, s, nm, mfp, Bm)
        if fused is not None:
            Xf, rmax, xmax = fused
            scale = max(float(np.abs(Bm).max()), xmax, 1.0)
            if rmax <= 1e-10 * scale:
                return Xf
        from .factor.frontal_lu import solve_lu_mf

        X = np.zeros_like(Bm)
        if nm.pinv is not None:
            X[np.asarray(nm.pinv, dtype=np.int64)] = Bm
        else:
            X[:] = Bm
        X = solve_lu_mf(mfp, X)
        out = np.zeros_like(X)
        if s.q is not None:
            out[np.asarray(s.q, dtype=np.int64)] = X
        else:
            out[:] = X
        return _lu_mf_refine(a, s, nm, mfp, Bm, out)
    X = np.zeros_like(Bm)
    if nm.pinv is not None:
        X[np.asarray(nm.pinv, dtype=np.int64)] = Bm
    else:
        X[:] = Bm
    X = lsolve_multi(nm.l, X)
    X = usolve_multi(nm.u, X)
    out = np.zeros_like(X)
    if s.q is not None:
        out[np.asarray(s.q, dtype=np.int64)] = X
    else:
        out[:] = X
    return out


def qrsol_ls(a: Sprs, b, order: int = 2, refine: int = 2,
             *, sym: Optional[Symb] = None):
    """Least-squares / minimum-norm solve via corrected seminormal equations
    (CSNE, Björck): R from the multifrontal Cholesky of A'A (R'R = A'A),
    then x = R^{-1} R^{-T} A'b with `refine` f64 refinement steps
    x += (A'A)^{-1} A'(b - Ax).

    TPU fast path — same solutions as `qrsol` (which keeps the reference's
    exact Householder semantics) at multifrontal speed; CSNE squares the
    condition number, which the refinement recovers for all but severely
    ill-conditioned systems. Handles m >= n (least squares) and m < n
    (minimum norm via AA'). `sym` reuses the A'A / AA' analysis.
    """
    from .factor import chol as _chol
    from .symbolic import schol as _schol

    m, n = a.m, a.n
    bb = np.asarray(b, dtype=np.float64)
    at = ops.transpose(a)
    g = ops.multiply(at, a) if m >= n else ops.multiply(a, at)
    k = g.n
    s = sym if sym is not None else _schol(g, order)
    nm = _chol(g, s)  # factor ONCE; solves below reuse the cached factors
    mfp = getattr(s, "_mf_plan", None)
    use_mf = (mfp is not None and "_cache_tree" in mfp.__dict__
              and config.backend != "host")
    pinv = np.asarray(s.pinv, dtype=np.int64) if s.pinv is not None else None
    tp0 = tri_plan(nm.l, 0) if not use_mf else None
    tp2 = tri_plan(nm.l, 2) if not use_mf else None

    def spd_solve(r):
        z = np.zeros(k)
        if pinv is not None:
            z[pinv] = r
        else:
            z[:] = r
        if use_mf:
            from .factor.frontal import solve_mf

            z = solve_mf(mfp, z[:, None])[:, 0]
        else:
            z = _tri_solve(nm.l, z, 0, tp0)
            z = _tri_solve(nm.l, z, 2, tp2)
        out = np.zeros(k)
        if pinv is not None:
            out[:] = np.asarray(z)[pinv]
        else:
            out[:] = np.asarray(z)
        return out

    if m >= n:
        atb = np.asarray(ops.gaxpy(at, list(bb), [0.0] * n))
        x = spd_solve(atb)
        for _ in range(max(0, refine)):
            r = bb - np.asarray(ops.gaxpy(a, list(x), [0.0] * m))
            x = x + spd_solve(np.asarray(ops.gaxpy(at, list(r), [0.0] * n)))
        return x
    # underdetermined: minimum-norm x = A'(AA')^{-1} b
    y = spd_solve(bb)
    x = np.asarray(ops.gaxpy(at, list(y), [0.0] * n))
    for _ in range(max(0, refine)):
        r = bb - np.asarray(ops.gaxpy(a, list(x), [0.0] * m))
        x = x + np.asarray(ops.gaxpy(at, list(spd_solve(r)), [0.0] * n))
    return x


def qrsol_multi(a: Sprs, B, order: int = 2, refine: int = 2,
                *, sym: Optional[Symb] = None):
    """Batched least-squares / minimum-norm solve: B is [m, nrhs]; returns
    X [n, nrhs] minimizing ||A@X - B|| columnwise (minimum-norm when m < n).

    No reference counterpart (the reference qrsol is single-RHS,
    src/lib.rs:927-956); this is the TPU serving shape for rectangular
    systems — CSNE like `qrsol_ls`, amortizing one Gram-matrix Cholesky
    over a lane-aligned RHS batch. When the serving path is enabled
    (config.serve_mixed + Pallas), the batch runs through a cached
    `qrsol_serve` handle (single fused device program); otherwise batched
    XLA sweeps with host f64 refinement. `sym` reuses the A'A (or AA')
    analysis across calls."""
    from .factor import chol as _chol
    from .symbolic import schol as _schol

    m, n = a.m, a.n
    Bm = np.asarray(B, dtype=np.float64)
    k = n if m >= n else m  # Gram dimension, without building the Gram
    s = sym
    at = g = None
    if s is None:
        at = ops.transpose(a)
        g = ops.multiply(at, a) if m >= n else ops.multiply(a, at)
        s = _schol(g, order)

    if Bm.ndim == 2 and Bm.shape[1] >= 8 and _serve_enabled():
        from .ops.sptrsv_pallas import pallas_sweep_available

        if pallas_sweep_available(k, Bm.shape[1], np.float32):
            # serving hot path: cached handle keyed by refine depth,
            # invalidated when A's values change under sym reuse
            fp = _values_fp(a)
            handles = s.__dict__.setdefault("_serve_handles", {})
            h = handles.get(("qr", refine))
            if h is None or getattr(h, "_values_fp", None) != fp:
                h = qrsol_serve(a, sym=s, refine=refine)
                h._values_fp = fp
                handles[("qr", refine)] = h
            X = np.asarray(h(Bm), np.float64)
            # LS optimality oracle: A'(B - AX) ~ 0 (or B - AX ~ 0 for m<n)
            opt = _host_spmm_t(a, Bm - _host_spmm(a, X))
            scale = max(1.0, float(np.abs(Bm).max()))
            if float(np.abs(opt).max()) < 1e-8 * scale:
                return X
            # conditioning beyond f32 refinement: exact path below

    if g is None:
        at = ops.transpose(a)
        g = ops.multiply(at, a) if m >= n else ops.multiply(a, at)
    nm = _chol(g, s)
    mfp = getattr(s, "_mf_plan", None)
    use_mf = (mfp is not None and "_cache_tree" in mfp.__dict__
              and config.backend != "host")
    pinv = np.asarray(s.pinv, dtype=np.int64) if s.pinv is not None else None
    tc = getattr(s, "_tri_cache", None)
    if tc is None:
        tc = {}
        s._tri_cache = tc
    p0 = None if use_mf else (tc.get(0)
                              or tc.setdefault(0, tri_plan(nm.l, 0)))
    p2 = None if use_mf else (tc.get(2)
                              or tc.setdefault(2, tri_plan(nm.l, 2)))

    def spd_solve(R):  # [k, nrhs] -> G^{-1} R
        Z = np.zeros_like(R)
        if pinv is not None:
            Z[pinv] = R
        else:
            Z[:] = R
        if use_mf:
            from .factor.frontal import solve_mf

            Z = solve_mf(mfp, Z)
        else:
            Z = lsolve_multi(nm.l, Z, p0)
            Z = ltsolve_multi(nm.l, Z, p2)
        out = np.zeros_like(Z)
        if pinv is not None:
            out[:] = np.asarray(Z)[pinv]
        else:
            out[:] = np.asarray(Z)
        return out

    if m >= n:
        X = spd_solve(_host_spmm(at, Bm))
        for _ in range(max(0, refine)):
            X = X + spd_solve(_host_spmm(at, Bm - _host_spmm(a, X)))
    else:
        X = _host_spmm(at, spd_solve(Bm))
        for _ in range(max(0, refine)):
            X = X + _host_spmm(at, spd_solve(Bm - _host_spmm(a, X)))
    return X


def cholsol_ir(a: Sprs, b, order: int = 0, factor_dtype: str = "float32",
               refine: int = 2):
    """Mixed-precision SPD solve: factor in `factor_dtype` (MXU-friendly
    f32/bf16), then recover f64 accuracy with `refine` iterative-refinement
    steps against the f64 matrix (SURVEY.md §7 perf-pass 10).

    No reference counterpart (the reference factors at the solve dtype);
    this is the TPU-first path — the factorization runs at MXU speed while
    the cheap SpMV residual restores double-precision solutions.
    """
    import numpy as _np

    from .factor import chol
    from .symbolic import schol

    n = a.n
    a_lo = a.copy()
    a_lo.x = a_lo.x.astype(factor_dtype)
    s = schol(a_lo, order)
    nm = chol(a_lo, s)
    p0 = tri_plan(nm.l, 0)
    p2 = tri_plan(nm.l, 2)
    pinv = _np.asarray(s.pinv, dtype=_np.int64) if s.pinv is not None else None

    def precond_solve(r):
        x = _np.zeros(n)
        if pinv is not None:
            x[pinv] = r
        else:
            x[:] = r
        x = _tri_solve(nm.l, x.astype(factor_dtype), 0, p0)
        x = _tri_solve(nm.l, x, 2, p2)
        out = _np.zeros(n)
        if pinv is not None:
            out[:] = _np.asarray(x, _np.float64)[pinv]
        else:
            out[:] = _np.asarray(x, _np.float64)
        return out

    bb = _np.asarray(b, dtype=_np.float64)
    x = precond_solve(bb)
    for _ in range(max(0, refine)):
        r = bb - _np.asarray(ops.gaxpy(a, list(x), [0.0] * n))  # f64 residual
        x = x + precond_solve(r)
    _writeback(b, x)
    return x


def _tri_solve(t: Sprs, x, kind: int, plan: Optional[TriPlan] = None):
    import jax.numpy as jnp

    host = config.backend == "host"
    if not host and config.latency_host_lnz > 0 and isinstance(t.x, np.ndarray):
        # latency tier (see factor.chol): host-resident small factors solve
        # fastest on the host engine when the device is a tunneled TPU
        import jax as _jax

        host = (_jax.default_backend() == "tpu"
                and t.nnz() < config.latency_host_lnz)
    if host:
        xv = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        nz = t.nnz()
        fn = [native.lsolve_host, native.usolve_host, native.ltsolve_host, native.utsolve_host][kind]
        fn(t.n, t.p, t.i[:nz], t.x[:nz], xv)
        return xv
    p = plan or tri_plan(t, kind)
    out = _tri_sweep(
        jnp.asarray(t.x[: t.nnz()]),
        jnp.asarray(np.asarray(x, dtype=t.x.dtype)),
        *_plan_dev(p),
        p.nlev,
        p.emax,
        p.wmax,
        p.n,
        kind in (0, 1),
    )
    return np.array(out)  # writable host copy


def _writeback(x_obj, sol: np.ndarray):
    """Mirror the reference's in-place overwrite of b where possible."""
    if isinstance(x_obj, list):
        # list slice-assign GROWS when sol is longer — the reference's
        # Vec resize semantics (underdetermined qrsol returns n > m values)
        x_obj[: len(sol)] = [float(v) for v in sol]
    elif (isinstance(x_obj, np.ndarray) and x_obj.flags.writeable
          and len(sol) <= len(x_obj)):
        # a fixed-size ndarray cannot grow; when the solution is longer
        # (underdetermined qrsol) the caller gets it from the return value
        x_obj[: len(sol)] = sol
    return x_obj if isinstance(x_obj, (list, np.ndarray)) else sol


def lsolve(l: Sprs, x):
    """Solve Lx=b, diag first entry per column (reference src/lib.rs:464-471).

    >>> from rsparse_tpu import Sprs, lsolve
    >>> l = Sprs.new_from_vec([[2.0, 0.0], [1.0, 4.0]])
    >>> [round(float(v), 6) for v in lsolve(l, [2.0, 5.0])]
    [1.0, 1.0]
    """
    sol = _tri_solve(l, x, 0)
    _writeback(x, sol)
    return sol


def ltsolve(l: Sprs, x):
    """Solve L'x=b (reference src/lib.rs:505-512).

    >>> from rsparse_tpu import Sprs, ltsolve
    >>> l = Sprs.new_from_vec([[2.0, 0.0], [1.0, 4.0]])
    >>> [round(float(v), 6) for v in ltsolve(l, [3.0, 4.0])]
    [1.0, 1.0]
    """
    sol = _tri_solve(l, x, 2)
    _writeback(x, sol)
    return sol


def usolve(u: Sprs, x):
    """Solve Ux=b, diag last entry per column (reference src/lib.rs:1230-1237).

    >>> from rsparse_tpu import Sprs, usolve
    >>> u = Sprs.new_from_vec([[2.0, 1.0], [0.0, 4.0]])
    >>> [round(float(v), 6) for v in usolve(u, [3.0, 4.0])]
    [1.0, 1.0]
    """
    sol = _tri_solve(u, x, 1)
    _writeback(x, sol)
    return sol


def utsolve(u: Sprs, x):
    """Solve U'x=b (reference src/lib.rs:1271-1278).

    >>> from rsparse_tpu import Sprs, utsolve
    >>> u = Sprs.new_from_vec([[2.0, 1.0], [0.0, 4.0]])
    >>> [round(float(v), 6) for v in utsolve(u, [2.0, 5.0])]
    [1.0, 1.0]
    """
    sol = _tri_solve(u, x, 3)
    _writeback(x, sol)
    return sol


# ---------------------------------------------------------------------------
# Householder application (dense RHS) — used by qrsol
# ---------------------------------------------------------------------------


def happly_dense(v: Sprs, k: int, beta: float, x: np.ndarray) -> None:
    """x -= v * (beta * v'x) for the k-th sparse Householder vector
    (reference src/lib.rs:2099-2111). Host version; the device chain lives in
    factor.qr."""
    lo, hi = int(v.p[k]), int(v.p[k + 1])
    rows = v.i[lo:hi]
    tau = beta * float(np.dot(v.x[lo:hi], x[rows]))
    x[rows] -= v.x[lo:hi] * tau


# ---------------------------------------------------------------------------
# A\b drivers (reference src/lib.rs:377-389, 672-683, 927-956)
# ---------------------------------------------------------------------------


def cholsol(a: Sprs, b, order: int = 0, *, sym: Optional[Symb] = None):
    """x = A\\b for SPD A via Cholesky; b overwritten with the solution.

    `sym` (TPU extension, not in the reference API): pass a Symb from a
    previous `schol(a, order)` to reuse the ordering, level schedule and
    compiled device plans across solves with the same sparsity pattern.

    >>> from rsparse_tpu import Sprs, cholsol
    >>> a = Sprs.new_from_vec([[4.0, 1.0], [1.0, 3.0]])
    >>> b = [6.0, 5.0]
    >>> [round(float(v), 6) for v in cholsol(a, b, 0)]
    [1.181818, 1.272727]
    >>> [round(v, 6) for v in b]  # b overwritten, reference semantics
    [1.181818, 1.272727]
    """
    from .factor import chol
    from .symbolic import schol
    from .utils.profiling import phase_timer

    n = a.n
    with phase_timer("cholsol.symbolic", nnz=a.nnz()):
        s = sym if sym is not None else schol(a, order)
    # Latency tier (mirrors factor.chol): through a tunneled TPU runtime
    # the per-launch floor (~25 ms measured) exceeds the host engine's
    # ENTIRE wall for small factors — route the one-shot only when the
    # device can actually win. factor.chol applies the same rule, so the
    # fall-through below lands on the native engine for this tier.
    host_tier = False
    if config.backend != "host" and config.latency_host_lnz > 0:
        import jax as _jax

        host_tier = (_jax.default_backend() == "tpu"
                     and int(s.lnz) < config.latency_host_lnz)
    if config.backend != "host" and not host_tier:
        with phase_timer("cholsol.oneshot", nnz=s.lnz):
            shot = _chol_one_shot(a, s, np.asarray(b, np.float64)[:, None])
        if shot is not None:
            Xf, rmax, xmax, mfp = shot
            bb = np.asarray(b, dtype=np.float64)
            scale = max(float(np.abs(bb).max()), xmax, 1.0)
            if rmax <= 1e-10 * scale:
                out = _writable(Xf[:, 0])
            else:  # in-program refinement fell short: continue step-by-step
                out = _chol_mf_refine(a, s, mfp, bb, _writable(Xf[:, 0]))
            _writeback(b, out)
            return out
    with phase_timer("cholsol.factor", nnz=s.lnz):
        nm = chol(a, s, mixed=True)
    x = np.zeros(n, dtype=np.float64)
    bb = np.asarray(b, dtype=np.float64)
    with phase_timer("cholsol.solve", nnz=2 * s.lnz):
        ops.ipvec(n, s.pinv, bb, x)  # x = P*b
        mfp = getattr(s, "_mf_plan", None)
        mf_active = (mfp is not None and "_cache_tree" in mfp.__dict__
                     and config.backend != "host")
        if mf_active:
            if mfp.__dict__["_cache_tree"][1].dtype == np.float32:
                # mixed precision: fuse solve + f64 refinement into one
                # device program (single readback — see _lu_mf_solve_fused)
                fused = _chol_mf_solve_fused(a, s, mfp, bb[:, None])
                if fused is not None:
                    Xf, rmax, xmax = fused
                    scale = max(float(np.abs(bb).max()), xmax, 1.0)
                    if rmax <= 1e-10 * scale:
                        out = _writable(Xf[:, 0])
                        _writeback(b, out)
                        return out
            from .factor.frontal import solve_mf

            x = solve_mf(mfp, x[:, None])[:, 0]
        else:
            x = lsolve(nm.l, x)  # x = L\x
            x = ltsolve(nm.l, x)  # x = L'\x
    out = np.zeros(n, dtype=np.float64)
    ops.pvec(n, s.pinv, x, out)  # b = P'*x
    if mf_active and mfp.__dict__["_cache_tree"][1].dtype == np.float32:
        out = _chol_mf_refine(a, s, mfp, bb, out)
    _writeback(b, out)
    return out


def lusol(a: Sprs, b, order: int = 1, tol: float = 1e-6,
          *, sym: Optional[Symb] = None):
    """x = A\\b via LU with partial pivoting; b overwritten with the solution.

    `sym` (TPU extension): reuse a previous `sqr(a, order, False)` analysis
    (and its device plans) across solves with the same sparsity pattern.

    >>> from rsparse_tpu import Sprs, lusol
    >>> a = Sprs.new_from_vec([[2.0, 1.0], [4.0, 5.0]])
    >>> [round(float(v), 6) for v in lusol(a, [3.0, 9.0], 1, 1e-6)]
    [1.0, 1.0]
    """
    from .factor import lu
    from .symbolic import sqr
    from .utils.profiling import phase_timer

    n = a.n
    with phase_timer("lusol.symbolic", nnz=a.nnz()):
        s = sym if sym is not None else sqr(a, order, False)
    if config.backend != "host":
        with phase_timer("lusol.oneshot", nnz=a.nnz()):
            shot = _lu_one_shot(a, s, np.asarray(b, np.float64)[:, None], tol)
        if shot is not None:
            Xf, rmax, xmax, mfp, pinv_h = shot
            bb = np.asarray(b, dtype=np.float64)
            scale = max(float(np.abs(bb).max()), xmax, 1.0)
            if rmax <= 1e-10 * scale:
                out = _writable(Xf[:, 0])
            else:  # in-program refinement fell short: continue step-by-step
                from .data import Nmrc

                nm_shim = Nmrc()
                nm_shim.pinv = pinv_h
                out = _lu_mf_refine(a, s, nm_shim, mfp, bb,
                                    _writable(Xf[:, 0]))
            _writeback(b, out)
            return out
    with phase_timer("lusol.factor", nnz=a.nnz()):
        nm = lu(a, s, tol, mixed=True)
    x = np.zeros(n, dtype=np.float64)
    bb = np.asarray(b, dtype=np.float64)
    with phase_timer("lusol.solve", nnz=s.lnz + s.unz):
        ops.ipvec(n, nm.pinv, bb, x)  # x = P*b
        mfp = getattr(s, "_mf_lu_plan", None)
        if (mfp is not None and "_cache_tree" in mfp.__dict__
                and config.backend != "host"):
            fused = _lu_mf_solve_fused(a, s, nm, mfp, bb[:, None])
            if fused is not None:
                Xf, rmax, xmax = fused
                scale = max(float(np.abs(bb).max()), xmax, 1.0)
                if rmax <= 1e-10 * scale:
                    out = _writable(Xf[:, 0])
                    _writeback(b, out)
                    return out
            from .factor.frontal_lu import solve_lu_mf

            x = solve_lu_mf(mfp, x[:, None])[:, 0]
            out = np.zeros(n, dtype=np.float64)
            ops.ipvec(n, s.q, x, out)  # b = Q*x
            out = _lu_mf_refine(a, s, nm, mfp, bb, out)
            _writeback(b, out)
            return out
        x = lsolve(nm.l, x)  # x = L\x
        x = usolve(nm.u, x)  # x = U\x
    out = np.zeros(n, dtype=np.float64)
    ops.ipvec(n, s.q, x, out)  # b = Q*x
    _writeback(b, out)
    return out


def _host_spmm(a: Sprs, X: np.ndarray) -> np.ndarray:
    """R = A @ X for X [n, B], vectorized host numpy (IR residuals)."""
    nz = a.nnz()
    cols = col_ids(a.p, a.n)
    R = np.zeros((a.m, X.shape[1]), dtype=np.float64)
    np.add.at(R, a.i[:nz], a.x[:nz][:, None] * X[cols])
    return R


def _host_spmm_t(a: Sprs, R: np.ndarray) -> np.ndarray:
    """Z = A' @ R for R [m, B] via A's own entry stream (no transpose)."""
    nz = a.nnz()
    cols = col_ids(a.p, a.n)
    Z = np.zeros((a.n, R.shape[1]), dtype=np.float64)
    np.add.at(Z, cols, a.x[:nz][:, None] * R[a.i[:nz]])
    return Z


def _sym_coo(a: Sprs, pinv):
    """COO (original row order) of the SYMMETRIZED matrix chol actually
    factored — triu(PAP') mirrored below the diagonal (reference cholsol
    semantics: symperm keeps triu, src/lib.rs:2369-2408). Every
    chol-family refinement residual must target this matrix, not the full
    stored A (which may differ below the diagonal)."""
    n = a.n
    c = ops.symperm(a, pinv) if pinv is not None else ops.symperm(a, None)
    nzc = c.nnz()
    ci = c.i[:nzc].astype(np.int64)
    cj = col_ids(c.p, n)
    cx = np.asarray(c.x[:nzc], np.float64)
    offd = ci != cj
    Mi = np.concatenate([ci, cj[offd]])
    Mj = np.concatenate([cj, ci[offd]])
    Mx = np.concatenate([cx, cx[offd]])
    if pinv is not None:
        porder = np.argsort(np.asarray(pinv, np.int64))
        Mi = porder[Mi]
        Mj = porder[Mj]
    return Mi, Mj, Mx


def _values_fp(a: Sprs):
    """Cheap value fingerprint for serve-handle invalidation: a cached
    handle bakes A's values and factor at build time, so sym-reuse with
    refreshed values must rebuild it (O(nnz) hash per call)."""
    nz = a.nnz()
    return (nz, hash(np.ascontiguousarray(a.x[:nz]).tobytes()))


def _lu_refine_body(plan, n, B64, cache, sdev, Mi_, Mj_, mx, pin_, q_,
                    steps: int = 2, early: bool = False):
    """Traced core shared by `_lu_mf_solve_fused` (one cache, [n, nrhs]
    batch), `lusol_vals` (vmapped per instance) and `_lu_one_shot`: MF-LU
    solve + `steps` keep-best f64 refinement iterations against the COO
    residual. All index tensors arrive as arguments (compile-size
    discipline); `pin_` may be a TRACED perm (the one-shot composes it on
    device). `early=True` runs the steps under a while_loop with
    convergence/stagnation exit (converged systems stop after one residual
    check). Returns (X [n, nrhs] f64, max|r|, max|X|)."""
    import jax
    import jax.numpy as jnp

    from .factor.frontal_lu import _solve_lu_mf_dev

    ft = cache[1].dtype
    nrhs = B64.shape[1]

    def solve_once(R):  # original row order -> original col order
        Z = jnp.zeros((n, nrhs), jnp.float64).at[pin_].set(R)
        Y = _solve_lu_mf_dev(plan, Z.astype(ft), cache, sdev)
        Y = Y.astype(jnp.float64)
        if q_ is None:
            return Y
        return jnp.zeros((n, nrhs), jnp.float64).at[q_].set(Y)

    def amul(X):
        return jnp.zeros((n, nrhs), jnp.float64).at[Mi_].add(
            mx[:, None] * X[Mj_])

    X = solve_once(B64)
    r = B64 - amul(X)
    if early:
        rmax0 = jnp.max(jnp.abs(r))
        scale = jnp.maximum(jnp.max(jnp.abs(B64)), 1.0)

        def cond(st):
            _, _, k, rmax, prev = st
            return (k < steps) & (rmax > 1e-13 * scale) & (rmax < prev)

        def body(st):
            X, r, k, rmax, _ = st
            X2 = X + solve_once(r)
            r2 = B64 - amul(X2)
            rmax2 = jnp.max(jnp.abs(r2))
            better = rmax2 < rmax
            X = jnp.where(better, X2, X)
            r = jnp.where(better, r2, r)
            return (X, r, k + 1, jnp.minimum(rmax2, rmax), rmax)

        X, r, _, rmax, _ = jax.lax.while_loop(
            cond, body, (X, r, 0, rmax0, jnp.inf))
        return X, rmax, jnp.max(jnp.abs(X))
    for _ in range(steps):
        X2 = X + solve_once(r)
        r2 = B64 - amul(X2)
        better = jnp.max(jnp.abs(r2)) < jnp.max(jnp.abs(r))
        X = jnp.where(better, X2, X)
        r = jnp.where(better, r2, r)
    return X, jnp.max(jnp.abs(r)), jnp.max(jnp.abs(X))


def _lu_mf_solve_fused(a: Sprs, s, nm, mfp, Bm: np.ndarray,
                       steps: int = 2):
    """ONE fused device program for the MF-LU solve + `steps` f64
    refinement iterations: row permute, tree solves, COO residual SpMVs
    and the keep-best-iterate guard all run on device, ending in a single
    batched readback — instead of one tunnel round-trip per refinement
    step (solve_lu_mf + host residuals). Returns (X[n, nrhs], final
    residual max, |X| max) or None when no device tree is cached; the
    caller verifies the residual and falls back to the step-by-step
    `_lu_mf_refine` (and ultimately the host-exact engine) if refinement
    fell short."""
    import jax
    import jax.numpy as jnp

    from .factor.frontal_lu import (_collect_lu_sdev,
                                    _prep_lu_solve_indices)

    tree = mfp.__dict__.get("_cache_tree")
    if tree is None:
        return None
    _prep_lu_solve_indices(mfp)
    n = a.n
    nz = a.nnz()
    pat = mfp.__dict__.get("_fused_solve_pattern")
    if pat is None:
        pat = (jnp.asarray(a.i[:nz].astype(np.int32)),
               jnp.asarray(col_ids(a.p, n).astype(np.int32)))
        mfp.__dict__["_fused_solve_pattern"] = pat
    Mi, Mj = pat
    # values and permutations refresh per call (sym reuse changes values;
    # pivoting can change pinv); the pattern tensors above stay resident
    Mx = jnp.asarray(np.asarray(a.x[:nz], np.float64))
    pin = jnp.asarray(np.asarray(nm.pinv, np.int64))
    qv = jnp.asarray(np.asarray(s.q, np.int64)) if s.q is not None else None
    fn = mfp.__dict__.get("_fused_solve_jit")
    if fn is None:
        def run(B, cache, sdev, Mi_, Mj_, Mx_, pin_, *qopt):
            q_ = qopt[0] if qopt else None
            return _lu_refine_body(mfp, n, B.astype(jnp.float64), cache,
                                   sdev, Mi_, Mj_, Mx_, pin_, q_, steps)

        fn = jax.jit(run)
        mfp.__dict__["_fused_solve_jit"] = fn
    args = [jnp.asarray(Bm), tree, _collect_lu_sdev(mfp), Mi, Mj, Mx, pin]
    if qv is not None:
        args.append(qv)
    X, rmax, xmax = jax.device_get(fn(*args))
    return np.asarray(X, np.float64), float(rmax), float(xmax)


def _lu_one_shot(a: Sprs, s, Bm: np.ndarray, tol: float, steps: int = 4):
    """ONE device program for the ENTIRE pivoting-LU solve: multifrontal
    factorization (threshold pivoting inside fronts), IN-PROGRAM pivot-perm
    compose (`_compose_elim_dev` — the host finalize pass of lu_mf moved
    into the trace), row permute, tree solves and keep-best f64 refinement,
    ending in a single small readback (X, accept stats, rmax, xmax, pinv).
    LU mirror of `_chol_one_shot` — through a tunneled runtime this
    collapses the factor-launch + stats-readback + solve-launch round trips
    of the split lu()+solve path into one.

    Factors in f32 on TPU (config.lu_factor_dtype="auto"); the reference
    tol rule (src/lib.rs:587-589) is enforced via the same margin stats as
    lu_mf — a reject sets `s._static_rejected` (exactly the condition under
    which lu_mf would have rejected) and returns None so the caller falls
    through to the host engine's exact global pivoting. Returns
    (X [n, nrhs] f64, rmax, xmax, mfp, pinv) on acceptance, with the device
    factor tree cached on the plan for follow-up refinement/solves."""
    import jax
    import jax.numpy as jnp

    from .factor.frontal import fuse_entry_cap
    from .factor.frontal_lu import (
        _attach_inners, _collect_compose_dev, _collect_lu_dev,
        _collect_lu_sdev, _compose_elim_dev, _lu_factor_dtype,
        _lu_mf_values, _lu_plan_index_entries, _prep_lu_factor_indices,
        _prep_lu_solve_indices, build_lu_mf_plan)

    from .config import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    n = a.n
    if n < config.mf_min_n or getattr(s, "_static_rejected", False):
        return None
    mfp = getattr(s, "_mf_lu_plan", "unset")
    if isinstance(mfp, str):
        try:
            mfp = build_lu_mf_plan(a, s)
        except Exception:
            mfp = None
        s._mf_lu_plan = mfp
    if mfp is None:
        return None
    if not mfp.__dict__.setdefault(
            "_fuse_ok", _lu_plan_index_entries(mfp) <= fuse_entry_cap()):
        return None
    _prep_lu_factor_indices(mfp)
    _prep_lu_solve_indices(mfp)
    dev = _collect_lu_dev(mfp)
    sdev = _collect_lu_sdev(mfp)
    cdev = _collect_compose_dev(mfp)
    nz = a.nnz()
    pat = mfp.__dict__.get("_fused_solve_pattern")
    if pat is None:
        pat = (jnp.asarray(a.i[:nz].astype(np.int32)),
               jnp.asarray(col_ids(a.p, n).astype(np.int32)))
        mfp.__dict__["_fused_solve_pattern"] = pat
    Mi, Mj = pat
    Mx = jnp.asarray(np.asarray(a.x[:nz], np.float64))
    ax_host = a.x[:nz]
    if mfp.vperm is not None:  # factorization runs on A(P, P)
        ax_host = ax_host[mfp.vperm]
    fdt = _lu_factor_dtype(True)
    Ax = jnp.asarray(ax_host) if fdt is None else jnp.asarray(ax_host, fdt)
    tolv = jnp.asarray(float(tol), Ax.dtype)
    qv = jnp.asarray(np.asarray(s.q, np.int64)) if s.q is not None else None
    # keyed on `steps`: it is baked into the trace (refinement loop length),
    # so a handle cached for steps=4 must not serve a steps=6 call
    fn = mfp.__dict__.get(f"_oneshot_jit_{steps}")
    if fn is None:
        def run(Ax, tolv, B, dev, sdev, cdev, Mi_, Mj_, Mx_, *qopt):
            q_ = qopt[0] if qopt else None
            Lx, Ux, margins, bads, cache, perms = _lu_mf_values(
                Ax, mfp, tolv, dev)
            mg = (jnp.min(jnp.stack(margins)) if margins
                  else jnp.asarray(0.0, Ax.dtype))
            bad = jnp.any(jnp.stack(bads)) if bads else jnp.asarray(False)
            inners: list = []
            elim, _ = _compose_elim_dev(mfp, perms, 0, cdev, inners)
            cache, _ = _attach_inners(mfp, cache, inners)
            einv = jnp.zeros(n, jnp.int32).at[elim].set(
                jnp.arange(n, dtype=jnp.int32))
            rp = cdev["row_pinv"]
            pinv = einv if rp is None else einv[rp]
            X, rmax, xmax = _lu_refine_body(
                mfp, n, B.astype(jnp.float64), cache, sdev,
                Mi_, Mj_, Mx_, pinv, q_, steps, early=True)
            stats = jnp.stack([mg.astype(jnp.float64),
                               bad.astype(jnp.float64)])
            return X, stats, rmax, xmax, pinv, cache

        fn = jax.jit(run)
        mfp.__dict__[f"_oneshot_jit_{steps}"] = fn
    args = [Ax, tolv, jnp.asarray(Bm), dev, sdev, cdev, Mi, Mj, Mx]
    if qv is not None:
        args.append(qv)
    X, stats, rmax, xmax, pinv, cache = fn(*args)
    Xh, stats_h, rmax_h, xmax_h, pinv_h = jax.device_get(
        (X, stats, rmax, xmax, pinv))
    # accept rule == lu_mf's: zero pivot or boundary-row growth beyond what
    # refinement can contract degrades to the host engine's exact pivoting
    worst_min = float(stats_h[0]) + float(tol)
    if bool(stats_h[1]) or not (worst_min >= 1e-10):
        mfp.__dict__.pop("_cache_tree", None)
        s._static_rejected = True
        return None
    mfp.__dict__["_cache_tree"] = cache
    return (np.asarray(Xh, np.float64), float(rmax_h), float(xmax_h),
            mfp, np.asarray(pinv_h, np.int64))


def _lu_mf_refine(a: Sprs, s, nm, mfp, B: np.ndarray, X: np.ndarray,
                  steps: int = 6):
    """Iterative refinement against the f64 matrix for the device MF-LU.

    The device path pivots within fronts (threshold 0.1) instead of
    reproducing the reference's exact global pivot sequence, and on TPU the
    factor itself may be f32 (mixed precision — config.lu_factor_dtype), so
    the first residual can sit near kappa*eps32. Refinement with the cached
    factor tree contracts it to f64 levels (each step multiplies the error
    by ~kappa*eps32); the loop exits early once converged or stagnant. If
    refinement cannot reach 1e-10*scale (extreme growth or conditioning the
    margin did not catch), recompute through the host engine's exact
    partial pivoting."""
    from .factor.frontal_lu import solve_lu_mf

    n = a.n
    single = X.ndim == 1
    Xm = X[:, None] if single else X
    Bm = B[:, None] if single else B
    r = Bm - _host_spmm(a, Xm)
    scale = max(np.abs(Bm).max(), np.abs(Xm).max(), 1.0)
    rmax = np.abs(r).max()
    for _ in range(max(0, steps)):
        if rmax <= 1e-14 * scale:
            break
        z = np.zeros_like(Xm)
        z[np.asarray(nm.pinv, dtype=np.int64)] = r
        dz = solve_lu_mf(mfp, z)
        upd = np.zeros_like(Xm)
        if s.q is not None:
            upd[np.asarray(s.q, dtype=np.int64)] = dz
        else:
            upd[:] = dz
        X2 = Xm + upd
        r2 = Bm - _host_spmm(a, X2)
        r2max = np.abs(r2).max()
        if r2max >= rmax:  # stagnated/diverging: keep the better iterate
            break
        Xm, r, rmax = X2, r2, r2max
    if rmax > 1e-10 * scale:
        # refinement failed to converge: exact host fallback
        from .symbolic import native as _native

        nz = a.nnz()
        Lp, Li, Lx, Up, Ui, Ux, pinv = _native.lu_numeric(
            n, a.p, a.i[:nz], a.x[:nz], s.q, 1e-6, s.lnz, s.unz)
        lmat = Sprs(len(Lx), n, n, Lp, Li, Lx)
        umat = Sprs(len(Ux), n, n, Up, Ui, Ux)
        cols_out = np.zeros_like(Xm)
        for k in range(Xm.shape[1]):
            xx = np.zeros(n)
            ops.ipvec(n, pinv, Bm[:, k], xx)
            xx = _tri_solve(lmat, xx, 0)
            xx = _tri_solve(umat, xx, 1)
            o = np.zeros(n)
            ops.ipvec(n, s.q, xx, o)
            cols_out[:, k] = o
        Xm = cols_out
    return Xm[:, 0] if single else Xm


def _chol_mf_solve_fused(a: Sprs, s, mfp, Bm: np.ndarray, steps: int = 2):
    """Cholesky mirror of `_lu_mf_solve_fused`: ipvec, MF tree solves,
    COO residual SpMVs (against the SYMMETRIZED matrix chol factored —
    see _sym_coo) and the keep-best guard in ONE device program with a
    single batched readback. Returns (X, rmax, xmax) or None when no
    device tree is cached."""
    import jax
    import jax.numpy as jnp

    from .factor.frontal import _prep_solve_indices, _solve_mf_dev

    tree = mfp.__dict__.get("_cache_tree")
    if tree is None:
        return None
    _prep_solve_indices(mfp)
    n = a.n
    Mi_h, Mj_h, Mx_h = _sym_coo(a, s.pinv)
    Mi = jnp.asarray(Mi_h.astype(np.int32))
    Mj = jnp.asarray(Mj_h.astype(np.int32))
    Mx = jnp.asarray(Mx_h)
    pv = jnp.asarray(np.asarray(s.pinv, np.int64)) if s.pinv is not None \
        else None
    fn = mfp.__dict__.get("_fused_solve_jit")
    if fn is None:
        def run(B, cache, Mi_, Mj_, Mx_, *popt):
            p_ = popt[0] if popt else None
            ft = cache[1].dtype
            nrhs = B.shape[1]

            def solve_once(R):  # original order in and out
                Z = (R if p_ is None else
                     jnp.zeros((n, nrhs), jnp.float64).at[p_].set(R))
                Y = _solve_mf_dev(mfp, Z.astype(ft), cache)
                Y = Y.astype(jnp.float64)
                return Y if p_ is None else Y[p_]

            def amul(X):
                return jnp.zeros((n, nrhs), jnp.float64).at[Mi_].add(
                    Mx_[:, None] * X[Mj_])

            B64 = B.astype(jnp.float64)
            X = solve_once(B64)
            r = B64 - amul(X)
            for _ in range(steps):
                X2 = X + solve_once(r)
                r2 = B64 - amul(X2)
                better = jnp.max(jnp.abs(r2)) < jnp.max(jnp.abs(r))
                X = jnp.where(better, X2, X)
                r = jnp.where(better, r2, r)
            return X, jnp.max(jnp.abs(r)), jnp.max(jnp.abs(X))

        fn = jax.jit(run)
        mfp.__dict__["_fused_solve_jit"] = fn
    args = [jnp.asarray(Bm), tree, Mi, Mj, Mx]
    if pv is not None:
        args.append(pv)
    X, rmax, xmax = jax.device_get(fn(*args))
    return np.asarray(X, np.float64), float(rmax), float(xmax)


def _chol_oneshot_maps(a: Sprs, s):
    """Cached host gather maps for the one-shot SPD solve: `perm` maps A's
    values onto the symmetric-permuted upper triangle C = triu(PAP') the
    factorization consumes (ops.plan.symperm_plan, reference
    src/lib.rs:2369-2408), and (Mi, Mj, mxmap) give the symmetrized COO
    residual matrix in ORIGINAL row order with values gathered straight
    from A.x (pattern work done once per Symb; per call only two numpy
    gathers remain)."""
    maps = s.__dict__.get("_oneshot_maps")
    if maps is None:
        from .ops.plan import symperm_plan

        n = a.n
        sp_ = symperm_plan(a, s.pinv)
        # factor-input values: the MF plan is built on c = symperm(A, pinv)
        # when an ordering is in play, but on A AS STORED for natural order
        # (factor.chol mirrors the reference: chol reads only triu entries,
        # so the extra stored-lower values are inert) — the gather must
        # match the pattern the plan was built on
        sperm = np.asarray(sp_.perm, np.int64)
        perm = sperm if s.pinv is not None else np.arange(a.nnz(),
                                                          dtype=np.int64)
        ci = np.asarray(sp_.out_i, np.int64)
        cj = col_ids(sp_.out_p, n)
        offd = ci != cj
        Mi = np.concatenate([ci, cj[offd]])
        Mj = np.concatenate([cj, ci[offd]])
        mxmap = np.concatenate([sperm, sperm[offd]])
        if s.pinv is not None:
            porder = np.argsort(np.asarray(s.pinv, np.int64))
            Mi = porder[Mi]
            Mj = porder[Mj]
        import jax.numpy as jnp

        # padded row-segment form of the residual matvec: r[i] =
        # sum_k vals[i,k] * x[cols[i,k]] — a GATHER of n*K elements, where
        # the COO scatter-add costs ~160 ns/element on TPU (measured: 5 ms
        # vs 1 ms for this 25k-nnz matrix). K = max row degree; rows padded
        # with col n-1 / value 0. Falls back to COO form when K blows up
        # (a near-dense row) — pad_idx is None then.
        cnt = np.bincount(Mi, minlength=n)
        K = int(cnt.max()) if len(Mi) else 1
        if K <= 64:
            rord = np.argsort(Mi, kind="stable")
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(cnt, out=offs[1:])
            pad_idx = np.full((n, K), -1, np.int64)
            ar = np.arange(len(Mi))
            pad_idx[Mi[rord], ar - offs[Mi[rord]]] = rord
            col_pad = np.where(pad_idx >= 0,
                               Mj[np.clip(pad_idx, 0, None)], n - 1)
            mx_padmap = np.where(pad_idx >= 0,
                                 mxmap[np.clip(pad_idx, 0, None)], -1)
            pad = (mx_padmap, jnp.asarray(col_pad.astype(np.int32)))
        else:
            pad = (None, None)
        maps = (perm, mxmap, jnp.asarray(Mi.astype(np.int32)),
                jnp.asarray(Mj.astype(np.int32)), pad)
        s.__dict__["_oneshot_maps"] = maps
    return maps


def _chol_one_shot(a: Sprs, s, Bm: np.ndarray, steps: int = 4):
    """ONE device program for the ENTIRE SPD solve: permuted-value scatter,
    multifrontal factorization, tree solves and `steps` keep-best f64
    refinement iterations — a single launch ending in a single small
    readback (X, dmin, rmax, xmax). This is what makes the device path win
    latency-bound problems (cholsol_7-class, BASELINE.md anchors) through
    a tunneled runtime: the previous chol()+solve split paid one tunnel
    round trip per phase plus a dmin sync between them.

    Factors in f32 on TPU (config.chol_factor_dtype="auto") with the f64
    residual recovered by the in-program refinement; a dmin <= 0 retries in
    f64 before raising NotPositiveDefiniteError (mirrors factor.chol).
    Returns (X[n, nrhs] f64, rmax, xmax, mfp) with the device factor tree
    cached on the plan (so step-by-step refinement can continue if the
    in-program steps fell short), or None when no fusable MF plan exists."""
    import jax
    import jax.numpy as jnp

    from .errors import NotPositiveDefiniteError
    from .factor.frontal import (fuse_entry_cap, _chol_factor_dtype,
                                 _chol_mf_values, _collect_chol_dev,
                                 _plan_index_entries, _prep_factor_indices,
                                 _prep_solve_indices, _solve_mf_dev,
                                 build_mf_plan)
    from .symbolic import _symperm_host

    n = a.n
    if n < config.mf_min_n:
        return None
    mfp = getattr(s, "_mf_plan", "unset")
    if mfp == "unset" or isinstance(mfp, str):
        c = _symperm_host(a, s.pinv) if s.pinv is not None else a
        mfp = build_mf_plan(c, s)
        s._mf_plan = mfp
    if mfp is None:
        return None
    if not mfp.__dict__.setdefault(
            "_fuse_ok", _plan_index_entries(mfp) <= fuse_entry_cap()):
        return None
    from .config import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    _prep_factor_indices(mfp)
    _prep_solve_indices(mfp)
    dev = _collect_chol_dev(mfp)
    perm, mxmap, Mi, Mj, (mx_padmap, col_pad) = _chol_oneshot_maps(a, s)
    padded = mx_padmap is not None
    # warm-call value-upload cache: repeated solves with unchanged values
    # (the serving/bench pattern) skip the host gathers AND the host->device
    # transfers — through a tunneled runtime each upload costs an RPC
    fp = _values_fp(a)
    vcache = mfp.__dict__.get("_oneshot_vals")
    if vcache is None or vcache[0] != fp:
        ax = np.asarray(a.x[: a.nnz()], np.float64)
        cx_h = ax[perm]
        if padded:
            mx_h = np.where(mx_padmap >= 0,
                            ax[np.clip(mx_padmap, 0, None)], 0.0)
        else:
            mx_h = ax[mxmap]
        vcache = (fp, cx_h, jnp.asarray(mx_h), {})
        mfp.__dict__["_oneshot_vals"] = vcache
    _, cx_h, Mx, cx_dev_by_dt = vcache
    pv = (jnp.asarray(np.asarray(s.pinv, np.int64))
          if s.pinv is not None else None)
    # keyed on `steps` (baked into the trace) — see _lu_one_shot
    fn = mfp.__dict__.get(f"_oneshot_jit_{steps}")
    if fn is None:
        def run(Cx, B, dev, Mi_, Mj_, Mx_, *popt):
            p_ = popt[0] if popt else None
            Lx, dmins, cache = _chol_mf_values(Cx, mfp, dev)
            dmin = (jnp.min(jnp.stack(dmins)).astype(jnp.float64) if dmins
                    else jnp.asarray(1.0, jnp.float64))
            ft = Cx.dtype
            nrhs = B.shape[1]

            def solve_once(R):  # original order in and out
                Z = (R if p_ is None else
                     jnp.zeros((n, nrhs), jnp.float64).at[p_].set(R))
                Y = _solve_mf_dev(mfp, Z.astype(ft), cache)
                Y = Y.astype(jnp.float64)
                return Y if p_ is None else Y[p_]

            def amul(X):
                if padded:  # [n, K] gather form — no TPU scatter
                    return jnp.einsum("nk,nkr->nr", Mx_, X[Mj_])
                return jnp.zeros((n, nrhs), jnp.float64).at[Mi_].add(
                    Mx_[:, None] * X[Mj_])

            B64 = B.astype(jnp.float64)
            X = solve_once(B64)
            r = B64 - amul(X)
            rmax0 = jnp.max(jnp.abs(r))
            scale = jnp.maximum(jnp.max(jnp.abs(B64)), 1.0)

            # early-exit keep-best refinement (mirrors _make_serve_handle):
            # converged systems stop after one residual check instead of
            # paying all `steps` solves
            def cond(st):
                _, _, k, rmax, prev = st
                return (k < steps) & (rmax > 1e-13 * scale) & (rmax < prev)

            def body(st):
                X, r, k, rmax, _ = st
                X2 = X + solve_once(r)
                r2 = B64 - amul(X2)
                rmax2 = jnp.max(jnp.abs(r2))
                better = rmax2 < rmax
                X = jnp.where(better, X2, X)
                r = jnp.where(better, r2, r)
                return (X, r, k + 1, jnp.minimum(rmax2, rmax), rmax)

            X, r, _, rmax, _ = jax.lax.while_loop(
                cond, body, (X, r, 0, rmax0, jnp.inf))
            # PACKED result: X plus a stats row [dmin, rmax, max|X|, ...] as
            # one f64 array — a single transfer instead of four through the
            # tunneled runtime (each device_get leaf costs an RPC)
            xmaxv = jnp.max(jnp.abs(X))
            if nrhs >= 3:
                stats = jnp.stack([dmin, rmax, xmaxv]
                                  + [dmin] * (nrhs - 3))
                packed = jnp.concatenate([X, stats[None, :]], axis=0)
            else:
                stats = jnp.stack([dmin, rmax, xmaxv])
                packed = jnp.concatenate(
                    [X.T.reshape(-1), stats]).reshape(1, -1)
            return packed, cache

        fn = jax.jit(run)
        mfp.__dict__[f"_oneshot_jit_{steps}"] = fn

    Bd = jnp.asarray(Bm)
    Mj_arg = col_pad if padded else Mj
    nrhs = Bm.shape[1]
    for fdt in (_chol_factor_dtype(True), None):
        key = jnp.dtype(fdt).name if fdt is not None else "f64"
        Cx = cx_dev_by_dt.get(key)
        if Cx is None:
            Cx = (jnp.asarray(cx_h) if fdt is None
                  else jnp.asarray(cx_h, fdt))
            cx_dev_by_dt[key] = Cx
        args = [Cx, Bd, dev, Mi, Mj_arg, Mx]
        if pv is not None:
            args.append(pv)
        packed, cache = fn(*args)
        ph = np.asarray(jax.device_get(packed), np.float64)
        if nrhs >= 3:
            Xh, (dmin_h, rmax_h, xmax_h) = ph[:-1], ph[-1, :3]
        else:
            flat = ph.reshape(-1)
            Xh = flat[: n * nrhs].reshape(nrhs, n).T
            dmin_h, rmax_h, xmax_h = flat[n * nrhs: n * nrhs + 3]
        if dmin_h > 0.0:
            mfp.__dict__["_cache_tree"] = cache
            return (np.ascontiguousarray(Xh), float(rmax_h),
                    float(xmax_h), mfp)
        if fdt is None:  # genuine NPD (f64 pivot <= 0)
            break
        # f32 rounding can push a near-zero pivot of a PD matrix negative —
        # retry in full precision before raising (mirrors factor.chol)
    mfp.__dict__.pop("_cache_tree", None)
    raise NotPositiveDefiniteError()


def _chol_mf_refine(a: Sprs, s, mfp, B: np.ndarray, X: np.ndarray,
                    steps: int = 6):
    """Iterative refinement for the mixed-precision (f32) MF Cholesky —
    mirror of _lu_mf_refine with the cholsol permutation chain (x = P b,
    solve, out = P' x). Residuals target the SYMMETRIZED matrix chol
    actually factored (_sym_coo) — the reference's cholsol ignores the
    strictly-lower stored triangle, so refining against full A would
    silently change the answer for nonsymmetric-stored input. Falls back
    to the host engine's f64 factorization if the f32 tree cannot reach
    an f64-level residual."""
    from .factor.frontal import solve_mf

    n = a.n
    single = X.ndim == 1
    Xm = X[:, None] if single else X
    Bm = B[:, None] if single else B
    pinv = np.asarray(s.pinv, dtype=np.int64) if s.pinv is not None else None
    Mi, Mj, Mx = _sym_coo(a, s.pinv)

    def spmm_sym(Z):
        R = np.zeros_like(Z)
        np.add.at(R, Mi, Mx[:, None] * Z[Mj])
        return R

    r = Bm - spmm_sym(Xm)
    scale = max(np.abs(Bm).max(), np.abs(Xm).max(), 1.0)
    rmax = np.abs(r).max()
    for _ in range(max(0, steps)):
        if rmax <= 1e-14 * scale:
            break
        z = np.zeros_like(Xm)
        if pinv is not None:
            z[pinv] = r  # ipvec
        else:
            z[:] = r
        dz = solve_mf(mfp, z)
        upd = dz[pinv] if pinv is not None else dz  # pvec
        X2 = Xm + upd
        r2 = Bm - spmm_sym(X2)
        r2max = np.abs(r2).max()
        if r2max >= rmax:
            break
        Xm, r, rmax = X2, r2, r2max
    if rmax > 1e-10 * scale:
        # f32 factor cannot recover this system: host-exact f64 fallback
        from .symbolic import native as _native

        c = ops.symperm(a, s.pinv) if s.pinv is not None else a
        Lp, Li, Lx = _native.chol_numeric(
            n, c.p, c.i[: c.nnz()], c.x[: c.nnz()], s.parent, s.cp)
        lmat = Sprs(len(Lx), n, n, Lp, Li, Lx)
        for k in range(Xm.shape[1]):
            xx = np.zeros(n)
            ops.ipvec(n, s.pinv, Bm[:, k], xx)
            xx = _tri_solve(lmat, xx, 0)
            xx = _tri_solve(lmat, xx, 2)
            o = np.zeros(n)
            ops.pvec(n, s.pinv, xx, o)
            Xm[:, k] = o
    return Xm[:, 0] if single else Xm


def _qr_ls_host_exact(a: Sprs, s: Symb, bb: np.ndarray,
                      q=None) -> np.ndarray:
    """Reference-exact least-squares solve through the host engine
    (qr + ipvec/happly/usolve apply, src/lib.rs:931-942): the fallback when
    the f32 MF tree's CSNE refinement cannot reach f64 optimality. Returns
    x in PERMUTED column order (caller applies the SAME `q`).

    `q`: the column ordering consistent with s.parent/pinv/cp/m2 — after an
    MF plan build this is plan.q_host (s.q holds the postorder-composed
    ordering the host symbolic fields do NOT describe; mixing them
    overruns the C++ engine's buffers)."""
    nz = a.nnz()
    qh = s.q if q is None else q
    Vp, Vi, Vx, Rp, Ri, Rx, beta = native.qr_numeric(
        a.m, a.n, a.p, a.i[:nz], a.x[:nz], qh, s.parent, s.pinv,
        s.m2, s.lnz + 8, s.unz + 8)
    xx = np.zeros(s.m2)
    xx[np.asarray(s.pinv[: a.m], np.int64)] = bb[: a.m]
    native.qr_ls_apply(a.n, Vp, Vi, Vx, beta, Rp, Ri, Rx, xx)
    return xx[: a.n]


def _qr_mn_host_exact(at: Sprs, s: Symb, bb: np.ndarray,
                      q=None) -> np.ndarray:
    """Reference-exact minimum-norm solve through the host engine (QR of
    A', pvec/utsolve/happly-reversed/pvec — src/lib.rs:943-955): the
    fallback when the f32 MF refinement cannot reach f64 residuals.
    Returns x [n] in original row order. `q`: see _qr_ls_host_exact."""
    nz = at.nnz()
    qh = s.q if q is None else q
    Vp, Vi, Vx, Rp, Ri, Rx, beta = native.qr_numeric(
        at.m, at.n, at.p, at.i[:nz], at.x[:nz], qh, s.parent, s.pinv,
        s.m2, s.lnz + 8, s.unz + 8)
    m, n = at.n, at.m  # original dims of A
    x = np.zeros(s.m2)
    ops.pvec(m, qh, bb, x)
    xv = np.ascontiguousarray(x[:m])
    native.utsolve_host(m, Rp, Ri, Rx, xv)
    x[:m] = xv
    vmat = Sprs(len(Vx), s.m2, at.n, Vp, Vi, Vx)
    for k in range(m - 1, -1, -1):
        happly_dense(vmat, k, float(beta[k]), x)
    out = np.zeros(n, dtype=np.float64)
    ops.pvec(n, s.pinv, x, out)
    return out


def _qr_mf_try(a: Sprs, s: Symb):
    """Build+factor the multifrontal QR tree when the problem is device-
    scale; returns the plan or None (small problems / inapplicable)."""
    if a.n < config.mf_min_n or config.backend == "host":
        return None
    from .factor.frontal_qr import build_qr_mf_plan, qr_mf

    plan = getattr(s, "_mf_qr_plan", "unset")
    if plan == "unset":
        try:
            plan = build_qr_mf_plan(a, s)
        except Exception:
            plan = None
        s._mf_qr_plan = plan
    if plan is not None:
        # the cached factor bakes A's VALUES — sym reuse with refreshed
        # values must refactor (fingerprint check, like the serve handles)
        fp = _values_fp(a)
        if (plan.__dict__.get("_cache_q") is None
                or plan.__dict__.get("_cache_fp") != fp):
            qr_mf(a, s, plan)
            plan.__dict__["_cache_fp"] = fp
    return plan


def qrsol(a: Sprs, b, order: int = 2, *, sym: Optional[Symb] = None):
    """x = A\\b via QR; handles overdetermined (least-squares) and
    underdetermined (minimum-norm via QR of A') systems
    (reference src/lib.rs:927-956). At scale both branches run through the
    multifrontal device tree (factor/frontal_qr.py).

    `sym` (TPU extension, matching lusol/cholsol): reuse a previous
    analysis across solves with the same sparsity pattern — pass
    `sqr(a, order, True)` when m >= n, or `sqr(transpose(a), order, True)`
    for the underdetermined branch (the analysis is of A' there).

    >>> from rsparse_tpu import Sprs, qrsol
    >>> a = Sprs.new_from_vec([[1.0, 0.0], [0.0, 2.0], [1.0, 1.0]])
    >>> x = qrsol(a, [1.0, 4.0, 3.0], 2)  # overdetermined: least squares
    >>> [round(float(v), 6) for v in x[:2]]
    [1.0, 2.0]
    """
    from .factor import qr
    from .symbolic import sqr

    n, m = a.n, a.m
    bb = np.asarray(b, dtype=np.float64)
    if m >= n:
        s = sym if sym is not None else sqr(a, order, True)
        mfq = _qr_mf_try(a, s)
        if mfq is not None:
            from .factor.frontal_qr import qrsol_mf_ls

            xp, gmax = qrsol_mf_ls(a, s, mfq, bb[:m])
            qcols = s.q  # == mfq.q, the composed ordering xp lives in
            if gmax is not None:
                # acceptance gate on the f64 LS-optimality gradient the
                # program already computed (advisor r4 high): the f32
                # CSNE contraction is ~kappa^2*eps32 per step and diverges
                # for kappa >~ 4e3 — fall back to the host engine's exact
                # f64 Householder instead of silently returning a worse-
                # than-f32 iterate.
                g0 = _host_spmm_t(a, bb[:m, None])
                gscale = max(1.0, float(np.abs(g0).max()))
                if gmax > 1e-8 * gscale:
                    # the host engine needs the PRE-commit ordering (the
                    # tuple s.parent/pinv/... describe); its xp comes back
                    # in that same ordering
                    qcols = getattr(mfq, "q_host", s.q)
                    xp = _qr_ls_host_exact(a, s, bb[:m], q=qcols)
            out = np.zeros(n, dtype=np.float64)
            ops.ipvec(n, qcols, xp, out)
            _writeback(b, out)
            return out
        nm = qr(a, s)
        x = np.zeros(s.m2, dtype=np.float64)
        ops.ipvec(m, s.pinv, bb[:m], x)  # x(0:m-1) = P*b
        for k in range(n):
            happly_dense(nm.l, k, float(nm.b[k]), x)
        x[:n] = usolve(nm.u, x[:n])  # x = R\x
        out = np.zeros(n, dtype=np.float64)
        ops.ipvec(n, s.q, x, out)  # b(0:n-1) = Q*x
    else:
        at = ops.transpose(a)  # underdetermined: QR of A'
        s = sym if sym is not None else sqr(at, order, True)
        mfq = _qr_mf_try(at, s)
        if mfq is not None:
            from .factor.frontal_qr import qrsol_mf_mn

            out, rmax = qrsol_mf_mn(at, s, mfq, bb[:m])
            if rmax is not None:
                # same acceptance gate, on the consistent-system residual
                scale = max(1.0, float(np.abs(bb[:m]).max()))
                if rmax > 1e-8 * scale:
                    out = _qr_mn_host_exact(at, s, bb[:m],
                                            q=getattr(mfq, "q_host", s.q))
            _writeback(b, out)
            return out
        nm = qr(at, s)
        x = np.zeros(s.m2, dtype=np.float64)
        ops.pvec(m, s.q, bb, x)  # x = Q'*b
        x[:m] = utsolve(nm.u, x[:m])  # x = R'\x
        for k in range(m - 1, -1, -1):
            happly_dense(nm.l, k, float(nm.b[k]), x)
        out = np.zeros(n, dtype=np.float64)
        ops.pvec(n, s.pinv, x, out)  # b = P'*x
    _writeback(b, out)
    return out
