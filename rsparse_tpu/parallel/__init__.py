"""L6' distributed layer: SPMD sparse kernels over a `jax.sharding.Mesh`.

The reference (RLado/rsparse) has **no parallelism of any kind** — SURVEY.md
§2.5 documents the exhaustive grep. This layer is therefore a new, TPU-first
design rather than a translation: the CSC entry stream is partitioned across
the model axis of a ("data", "model") device mesh, each chip reduces its
slice with `segment_sum` (VPU-friendly, no dense workspace), and cross-chip
combination rides ICI via XLA collectives (`psum`) issued from
`shard_map`-ed kernels. Independent RHS batches shard over the data axis
with zero communication.

Components:
  - `make_mesh`            — ("data","model") mesh construction.
  - `partition_entries`    — pad + flatten CSC into per-device entry chunks.
  - `dist_gaxpy`           — SPMD r = A@x + y (entry-partitioned, psum).
  - `dist_norm`            — SPMD 1-norm (max column abs-sum).
  - `dist_tri_plan` / `dist_tri_solve` — level-scheduled SpTRSV with each
                             level's entry window split across the model axis
                             and the per-level dense update psum-combined.
  - `make_refine_step` / `refine_step` — one iterative-refinement step
                             (SpMV residual + L and L' SpTRSV sweeps) batched
                             over RHS: the framework's composite "training
                             step", used by `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..data import Sprs
from ..ops.plan import col_ids

__all__ = [
    "init_distributed",
    "make_mesh",
    "partition_entries",
    "dist_gaxpy",
    "dist_norm",
    "dist_spgemm",
    "DistTriPlan",
    "dist_tri_plan",
    "dist_tri_solve",
    "dist_cholsol",
    "make_refine_step",
    "refine_step",
]


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host pod-slice runtime init (SURVEY.md §2.5 mesh/runtime layer).

    Thin wrapper over `jax.distributed.initialize` — one process per host;
    after this, `jax.devices()` spans the slice and `make_mesh` builds the
    global ("data","model") mesh. No-op when already initialized or when
    running single-process (the common single-host case)."""
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized / single-process


def make_mesh(
    n_devices: Optional[int] = None,
    data: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a ("data", "model") mesh from the first `n_devices` devices."""
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    nd = len(devs)
    if nd % data != 0:
        raise ValueError(f"{nd} devices not divisible by data={data}")
    arr = np.array(devs).reshape(data, nd // data)
    return Mesh(arr, axis_names)


def _pad_to(a: np.ndarray, size: int, fill) -> np.ndarray:
    out = np.full(size, fill, dtype=a.dtype)
    out[: len(a)] = a
    return out


@dataclasses.dataclass(frozen=True)
class EntryPartition:
    """Flattened CSC entry stream padded to D equal chunks.

    Padding entries carry val=0 scattered to row 0 — additive identity, so
    the psum-reduced SpMV is exact.
    """

    vals: np.ndarray  # [D*chunk] float
    rows: np.ndarray  # [D*chunk] int32
    cols: np.ndarray  # [D*chunk] int32
    chunk: int
    m: int
    n: int


def partition_entries(a: Sprs, n_shards: int) -> EntryPartition:
    nz = a.nnz()
    chunk = max(1, -(-nz // n_shards))
    E = chunk * n_shards
    return EntryPartition(
        vals=_pad_to(a.x[:nz], E, 0.0),
        rows=_pad_to(a.i[:nz].astype(np.int32), E, 0),
        cols=_pad_to(col_ids(a.p, a.n).astype(np.int32), E, 0),
        chunk=chunk,
        m=a.m,
        n=a.n,
    )


def _spmv_shard(vals, rows, cols, x, m: int, axis: str):
    """Per-device partial SpMV + psum over the model axis."""
    return jax.lax.psum(
        jax.ops.segment_sum(vals * x[cols], rows, num_segments=m), axis
    )


def make_gaxpy(ep: EntryPartition, mesh: Mesh, axis: str = "model"):
    """Build the jitted SPMD r = A@x + y once per (partition, mesh).

    Returns `f(vals, rows, cols, x, y) -> r`; reuse it across iterations —
    rebuilding the shard_map/jit wrapper per call retraces every time.
    """
    fn = shard_map(
        lambda v, r, c, xx, yy: _spmv_shard(v, r, c, xx, ep.m, axis) + yy,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def dist_gaxpy(ep: EntryPartition, x, y, mesh: Mesh, axis: str = "model"):
    """SPMD r = A@x + y (reference semantics: src/lib.rs:411-421).

    x, y replicated; entries sharded over `axis`. One-shot convenience
    wrapper over `make_gaxpy` (cached per partition+mesh on `ep.__dict__`
    is impossible — EntryPartition is frozen — so loops should call
    `make_gaxpy` once and reuse the returned function).
    """
    fn = _gaxpy_cache_get(ep, mesh, axis)
    return fn(
        jnp.asarray(ep.vals),
        jnp.asarray(ep.rows),
        jnp.asarray(ep.cols),
        jnp.asarray(np.asarray(x, dtype=ep.vals.dtype)),
        jnp.asarray(np.asarray(y, dtype=ep.vals.dtype)),
    )


_GAXPY_CACHE: dict = {}


def _gaxpy_cache_get(ep: EntryPartition, mesh: Mesh, axis: str):
    # entries pin ep/mesh: an id()-only key could serve a stale fn after
    # the originals are GC'd and a new allocation reuses the address
    key = (id(ep), id(mesh), axis, ep.m)
    cached = _GAXPY_CACHE.get(key)
    if cached is not None and (cached[0] is not ep or cached[1] is not mesh):
        cached = None
    if cached is None:
        if len(_GAXPY_CACHE) > 64:
            _GAXPY_CACHE.clear()
        cached = _GAXPY_CACHE.setdefault(
            key, (ep, mesh, make_gaxpy(ep, mesh, axis)))
    return cached[2]


def dist_norm(ep: EntryPartition, mesh: Mesh, axis: str = "model") -> float:
    """SPMD 1-norm: max column abs-sum (reference src/lib.rs:771-782)."""

    def shard(vals, cols):
        return jax.lax.psum(
            jax.ops.segment_sum(jnp.abs(vals), cols, num_segments=ep.n), axis
        )

    fn = shard_map(shard, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P())
    col_sums = jax.jit(fn)(jnp.asarray(ep.vals), jnp.asarray(ep.cols))
    return float(jnp.max(col_sums)) if ep.n else 0.0


def dist_spgemm(a: Sprs, b: Sprs, mesh: Mesh, axis: str = "model") -> Sprs:
    """SPMD C = A @ B (reference Gustavson multiply, src/lib.rs:713-748).

    TPU formulation: the host ESC planner (ops.plan.spgemm_plan) fixes the
    static output pattern and the expanded product stream; the stream is
    split into equal per-device chunks, each chip segment-sums its partial
    products into the (static-nnz) output value vector, and one `psum`
    combines them. Output pattern/pointers are identical to the single-chip
    `ops.multiply`.
    """
    from ..ops.plan import spgemm_plan

    p = spgemm_plan(a, b)
    D = mesh.shape[axis]
    nz = max(p.nnz, 1)
    E = len(p.seg)
    chunk = max(1, -(-E // D))
    Ep = chunk * D
    # expansion stream sharded as STATIC INDEX tensors; the value gathers,
    # products, and partial segment-sums all run on device (the host's only
    # O(E) work is the cached pattern plan) — each chip touches E/D products.
    # Cache entries PIN the plan and mesh objects (an id()-only key could
    # silently serve stale tensors after the plan LRU evicts and the id is
    # reused by a new allocation).
    key = (id(p), id(mesh), axis)
    cached = _SPGEMM_CACHE.get(key)
    if cached is not None and (cached[0] is not p or cached[1] is not mesh):
        cached = None  # id reuse after eviction: rebuild
    if cached is None:
        aiv = np.zeros(Ep, dtype=np.int64)
        biv = np.zeros(Ep, dtype=np.int64)
        seg = np.full(Ep, nz, dtype=np.int64)  # pad -> dropped garbage slot
        aiv[:E] = p.a_idx
        biv[:E] = p.b_idx
        seg[:E] = p.seg

        def shard(ax, bx, ai, bi, sv):
            pv = ax[ai] * bx[bi]
            part = jax.ops.segment_sum(pv, sv, num_segments=nz + 1)
            return jax.lax.psum(part, axis)

        fn = jax.jit(shard_map(
            shard, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis)), out_specs=P()))
        if len(_SPGEMM_CACHE) > 64:
            _SPGEMM_CACHE.clear()
        cached = _SPGEMM_CACHE.setdefault(
            key, (p, mesh, fn, jnp.asarray(aiv), jnp.asarray(biv),
                  jnp.asarray(seg)))
    _, _, fn, aiv_d, biv_d, seg_d = cached
    ax_h = a.x[: a.nnz()] if a.nnz() else np.zeros(1, np.float64)
    bx_h = b.x[: b.nnz()] if b.nnz() else np.zeros(1, np.float64)
    cx = np.asarray(fn(jnp.asarray(ax_h), jnp.asarray(bx_h),
                       aiv_d, biv_d, seg_d))[: p.nnz]
    return Sprs(p.nnz, p.m, p.n, p.out_p, p.out_i, cx)


_SPGEMM_CACHE: dict = {}


# ---------------------------------------------------------------------------
# Distributed level-scheduled SpTRSV
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DistTriPlan:
    """Level schedule with each level's entry window padded and split into D
    equal slices: entry tensors are [D, nlev, chunk] (leading dim shards over
    the model axis), column tables [nlev, wmax] replicated. Static shapes
    throughout — no dynamic windows inside the sharded loop."""

    n: int
    nlev: int
    wmax: int
    ent_val_idx: np.ndarray  # [D, nlev, chunk] gather into T.x (-1 pad)
    ent_row: np.ndarray  # [D, nlev, chunk]
    ent_col: np.ndarray  # [D, nlev, chunk]
    ent_slot: np.ndarray  # [D, nlev, chunk]
    col_id: np.ndarray  # [nlev, wmax] columns per level (pad n)
    col_diag: np.ndarray  # [nlev, wmax] diag position in T.x (-1 pad)
    scatter_form: bool


def dist_tri_plan(t: Sprs, kind: int, n_shards: int) -> DistTriPlan:
    """kind: 0=lsolve, 1=usolve (scatter form), 2=ltsolve, 3=utsolve (gather)."""
    from ..solve import tri_plan

    p = tri_plan(t, kind)
    D = n_shards
    ecnts = np.diff(p.ent_off)
    emax = int(ecnts.max()) if len(ecnts) else 0
    chunk = max(1, -(-emax // D))
    nlev = p.nlev
    vi = np.full((nlev, D * chunk), -1, dtype=np.int32)
    er = np.zeros((nlev, D * chunk), dtype=np.int32)
    ec = np.zeros((nlev, D * chunk), dtype=np.int32)
    es = np.zeros((nlev, D * chunk), dtype=np.int32)
    for v in range(nlev):
        lo, hi = int(p.ent_off[v]), int(p.ent_off[v + 1])
        cnt = hi - lo
        vi[v, :cnt] = p.ent_pos[lo:hi]
        er[v, :cnt] = p.ent_row[lo:hi]
        ec[v, :cnt] = p.ent_col[lo:hi]
        es[v, :cnt] = p.ent_slot[lo:hi]
    # [nlev, D*chunk] -> [D, nlev, chunk]
    resh = lambda a: np.transpose(a.reshape(nlev, D, chunk), (1, 0, 2)).copy()
    cid = np.full((nlev, p.wmax), p.n, dtype=np.int32)
    cdg = np.full((nlev, p.wmax), -1, dtype=np.int32)
    for v in range(nlev):
        lo, hi = int(p.col_off[v]), int(p.col_off[v + 1])
        cid[v, : hi - lo] = p.col_id[lo:hi]
        cdg[v, : hi - lo] = p.col_diag[lo:hi]
    return DistTriPlan(
        n=p.n,
        nlev=nlev,
        wmax=p.wmax,
        ent_val_idx=resh(vi),
        ent_row=resh(er),
        ent_col=resh(ec),
        ent_slot=resh(es),
        col_id=cid,
        col_diag=cdg,
        scatter_form=kind in (0, 1),
    )


def _tri_sweep_local(tx, x, evi, erow, ecol, eslot, col_id, col_diag,
                     n: int, nlev: int, wmax: int, scatter_form: bool, axis: str):
    """Per-device level sweep. `evi/erow/ecol/eslot` are this device's
    [1, nlev, chunk] slices; x is replicated across the model axis and every
    level's dense update is psum-combined so all replicas stay identical."""
    xpad = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])  # garbage slot n

    def body(lev, xp):
        cid = col_id[lev]
        cdg = col_diag[lev]
        cvalid = cdg >= 0
        dvals = jnp.where(cvalid, tx[jnp.clip(cdg, 0, tx.shape[0] - 1)],
                          jnp.ones((), tx.dtype))
        vi = evi[0, lev]
        ev = jnp.where(vi >= 0, tx[jnp.clip(vi, 0, tx.shape[0] - 1)],
                       jnp.zeros((), tx.dtype))
        er = erow[0, lev]
        ec = ecol[0, lev]
        es = eslot[0, lev]
        if scatter_form:
            # x[j] /= diag (all replicas identically), then the off-diagonal
            # scatter x[rows] -= val * x[col] is reduced across devices.
            xj = xp[cid] / dvals
            xp = xp.at[jnp.where(cvalid, cid, n)].set(
                jnp.where(cvalid, xj, 0.0), mode="drop")
            delta = jax.ops.segment_sum(ev * xp[ec], er, num_segments=n + 1)
            delta = jax.lax.psum(delta, axis)
            xp = xp - delta.at[n].set(0.0)
        else:
            # gather form: contributions per column slot, reduced, then divide
            contrib = jax.ops.segment_sum(ev * xp[er], es, num_segments=wmax)
            contrib = jax.lax.psum(contrib, axis)
            xj = (xp[cid] - contrib) / dvals
            xp = xp.at[jnp.where(cvalid, cid, n)].set(
                jnp.where(cvalid, xj, 0.0), mode="drop")
        return xp

    xpad = jax.lax.fori_loop(0, nlev, body, xpad)
    return xpad[:n]


def dist_tri_solve(t: Sprs, x, kind: int, mesh: Mesh, axis: str = "model",
                   plan: Optional[DistTriPlan] = None):
    """Distributed level-scheduled triangular solve (same kinds as
    solve._tri_solve; reference sequential loops src/lib.rs:464-471 etc.)."""
    D = mesh.shape[axis]
    p = plan or dist_tri_plan(t, kind, D)
    nz = t.nnz()
    fn = shard_map(
        partial(
            _tri_sweep_local,
            n=p.n, nlev=p.nlev, wmax=p.wmax,
            scatter_form=p.scatter_form, axis=axis,
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)(
        jnp.asarray(t.x[:nz]),
        jnp.asarray(np.asarray(x, dtype=t.x.dtype)),
        jnp.asarray(p.ent_val_idx),
        jnp.asarray(p.ent_row),
        jnp.asarray(p.ent_col),
        jnp.asarray(p.ent_slot),
        jnp.asarray(p.col_id),
        jnp.asarray(p.col_diag),
    )


def dist_cholsol(a: Sprs, b, mesh: Mesh, order: int = 0, axis: str = "model"):
    """Distributed A\\b for SPD A: host symbolic + factorization once, then
    both triangular sweeps as SPMD level-scheduled solves over the mesh
    (SURVEY.md §7 step 9: partitioned SpTRSV -> multi-host cholsol).

    The sweeps run through the halo-sharded design (x sharded n/D per
    device, ppermute boundary exchange — parallel/halo.py), matching
    `dist_lusol`/`dist_qrsol`; patterns the row-block partition cannot
    cover fall back to the replicated dist_tri_solve automatically.
    Semantics match single-chip `solve.cholsol` (reference
    src/lib.rs:377-389)."""
    import rsparse_tpu as _rs

    from .halo import dist_tri_solve_halo

    n = a.n
    s = _rs.schol(a, order)
    nm = _rs.chol(a, s)
    bb = np.asarray(b, dtype=np.float64)
    x = np.zeros(n)
    if s.pinv is not None:
        x[np.asarray(s.pinv, dtype=np.int64)] = bb
    else:
        x[:] = bb
    x = np.asarray(dist_tri_solve_halo(nm.l, x, 0, mesh, axis))
    x = np.asarray(dist_tri_solve_halo(nm.l, x, 2, mesh, axis))
    out = np.zeros(n)
    if s.pinv is not None:
        out[:] = x[np.asarray(s.pinv, dtype=np.int64)]
    else:
        out[:] = x
    return out


# ---------------------------------------------------------------------------
# Composite step: iterative refinement over a batch of RHS
# ---------------------------------------------------------------------------


def make_refine_step(ep: EntryPartition, lp: DistTriPlan, ltp: DistTriPlan,
                     lx_len: int, mesh: Mesh,
                     data_axis: str = "data", model_axis: str = "model"):
    """Build the jitted SPMD iterative-refinement step.

    Given the Cholesky factor L of SPD A, one step refines a batch of
    solutions X [B, n] toward A\\B:  R = B - A@X;  Z = L'\\(L\\R);  X += Z.
    The batch shards over `data_axis` (embarrassingly parallel); SpMV and
    both triangular sweeps shard entries over `model_axis` (psum over ICI).
    """
    n = ep.n
    m = ep.m

    def step(lx, vals, rows, cols,
             l_evi, l_erow, l_ecol, l_eslot,
             lt_evi, lt_erow, lt_ecol, lt_eslot,
             l_cid, l_cdg, lt_cid, lt_cdg, X, B):
        def one(x, b):
            r = b - _spmv_shard(vals, rows, cols, x, m, model_axis)
            z = _tri_sweep_local(
                lx, r[:n], l_evi, l_erow, l_ecol, l_eslot, l_cid, l_cdg,
                n, lp.nlev, lp.wmax, True, model_axis)
            z = _tri_sweep_local(
                lx, z, lt_evi, lt_erow, lt_ecol, lt_eslot, lt_cid, lt_cdg,
                n, ltp.nlev, ltp.wmax, False, model_axis)
            return x + z

        return jax.vmap(one)(X, B)

    ax = model_axis
    return jax.jit(shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P(),  # L values (replicated)
            P(ax), P(ax), P(ax),  # SpMV entry stream
            P(ax), P(ax), P(ax), P(ax),  # L sweep entry tensors [D,...]
            P(ax), P(ax), P(ax), P(ax),  # L' sweep entry tensors
            P(), P(), P(), P(),  # column tables
            P(data_axis), P(data_axis),  # X, B batches
        ),
        out_specs=P(data_axis),
    ))


def refine_step(a: Sprs, l: Sprs, X, B, mesh: Mesh,
                data_axis: str = "data", model_axis: str = "model"):
    """One distributed iterative-refinement step for a batch of RHS.

    Convenience wrapper building the plans on the fly; production use should
    cache `make_refine_step` + plan tensors per sparsity pattern.
    """
    D = mesh.shape[model_axis]
    ep = partition_entries(a, D)
    lp = dist_tri_plan(l, 0, D)
    ltp = dist_tri_plan(l, 2, D)
    nzl = l.nnz()
    fn = make_refine_step(ep, lp, ltp, nzl, mesh, data_axis, model_axis)
    j = jnp.asarray
    return fn(
        j(l.x[:nzl]),
        j(ep.vals), j(ep.rows), j(ep.cols),
        j(lp.ent_val_idx), j(lp.ent_row), j(lp.ent_col), j(lp.ent_slot),
        j(ltp.ent_val_idx), j(ltp.ent_row), j(ltp.ent_col), j(ltp.ent_slot),
        j(lp.col_id), j(lp.col_diag), j(ltp.col_id), j(ltp.col_diag),
        j(np.asarray(X, dtype=a.x.dtype)),
        j(np.asarray(B, dtype=a.x.dtype)),
    )


def dist_cholsol_vals(a: Sprs, Ax, B, mesh: Mesh, order: int = 0, *,
                      sym=None, axis: str = "data"):
    """Distributed batched-VALUES SPD solve: K systems sharing `a`'s
    sparsity pattern, instances sharded over the mesh `axis` — each device
    factors+solves+refines its K/D chunk through the same per-instance
    core as solve.cholsol_vals (f32 MF factor on TPU + in-program f64
    refinement), embarrassingly parallel scale-out of the parameter-sweep
    / time-stepping shape. One symbolic analysis and one compiled
    executable are shared by every device.

    Ax: [K, nnz(a)]; B: [K, n] or [n] broadcast. Returns X [K, n]. Raises
    NotPositiveDefiniteError naming the failing instances."""
    from ..factor.frontal import (_chol_factor_dtype, _collect_chol_dev,
                                  _prep_factor_indices, _prep_solve_indices)
    from ..solve import (_chol_vals_fallback, _chol_vals_finish,
                         _chol_vals_one, _chol_vals_setup,
                         _chol_vals_static)

    n = a.n
    s, mfp, AxK, Bm, pv = _chol_vals_setup(a, Ax, B, order, sym)
    if mfp is None:
        # below the MF/fuse tier (or host backend) distribution buys
        # nothing; per-instance path preserves the batched NPD contract
        return _chol_vals_fallback(a, s, AxK, Bm, order)
    src, Mi, Mj, offd, pad = _chol_vals_static(mfp, a, s)
    _prep_factor_indices(mfp)
    _prep_solve_indices(mfp)
    dev = _collect_chol_dev(mfp)
    fdt = _chol_factor_dtype(True)
    K = AxK.shape[0]
    D = mesh.shape[axis]
    Kp = -(-K // D) * D  # pad the batch to a multiple of the shard count
    CxK = AxK[:, src]
    BK = Bm[..., None]
    if Kp != K:  # pad with copies of instance 0 (valid SPD, result dropped)
        CxK = np.concatenate([CxK, np.repeat(CxK[:1], Kp - K, axis=0)])
        BK = np.concatenate([BK, np.repeat(BK[:1], Kp - K, axis=0)])
    padargs = tuple(pad) if pad is not None else ()
    fn = mfp.__dict__.get("_dist_vals_jit")
    if fn is None or fn[1] is not mesh or fn[2] != axis or fn[3] != fdt:
        def run(CxL, BL, dev, pv_, Mi_, Mj_, offd_, *pad_in):
            pad_ = pad_in if pad_in else None

            def one(cx64, b64):
                return _chol_vals_one(mfp, n, fdt, dev, pv_, Mi_, Mj_,
                                      offd_, cx64, b64, pad=pad_)

            return jax.vmap(one)(CxL, BL)

        # check_vma off: the body is embarrassingly parallel (no collectives)
        # and its scan carries start from replicated zeros, which the
        # varying-axes checker rejects despite being sound here.
        jfn = jax.jit(shard_map(
            run, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(), P(), P(), P())
            + tuple(P() for _ in padargs),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
            check_vma=False))
        fn = (jfn, mesh, axis, fdt)  # traced program bakes the factor dtype
        mfp.__dict__["_dist_vals_jit"] = fn
    dmin_k, Y, rmaxK, xmaxK = fn[0](
        jnp.asarray(CxK), jnp.asarray(BK), dev, jnp.asarray(pv),
        Mi, Mj, offd, *padargs)
    out = np.asarray(Y[:K, :, 0], np.float64)
    return _chol_vals_finish(
        a, s, AxK, Bm, out, np.asarray(dmin_k)[:K],
        np.asarray(rmaxK)[:K], np.asarray(xmaxK)[:K], order)


def dist_lusol_vals(a: Sprs, Ax, B, mesh: Mesh, order: int = 1,
                    tol: float = 1e-6, *, sym=None, axis: str = "data"):
    """Distributed batched-VALUES LU solve: K same-pattern square systems
    with instances sharded over the mesh `axis` — the two vmapped programs
    of solve.lusol_vals (pivoting MF factor; fused solve+f64 refinement)
    run shard_map'ed on each device's K/D chunk, with the host perm
    composition (`_lu_vals_compose`) between them. Per-instance exact
    fallback on refinement divergence preserves lusol accuracy."""
    from ..factor.frontal_lu import (_attach_inners, _collect_lu_dev,
                                     _collect_lu_sdev, _lu_factor_dtype,
                                     _prep_lu_factor_indices,
                                     _prep_lu_solve_indices)
    from ..solve import (_lu_refine_body, _lu_vals_compose,
                         _lu_vals_factor_one, _lu_vals_loop,
                         _lu_vals_pattern, _lu_vals_setup, _writable)

    n = a.n
    s, plan, AxK, Bm = _lu_vals_setup(a, Ax, B, order, sym)
    K = AxK.shape[0]
    if plan is None:
        return _lu_vals_loop(a, s, AxK, Bm, order, tol, range(K))
    _prep_lu_factor_indices(plan)
    _prep_lu_solve_indices(plan)
    dev = _collect_lu_dev(plan)
    sdev = _collect_lu_sdev(plan)
    fdt = _lu_factor_dtype(True)
    D = mesh.shape[axis]
    Kp = -(-K // D) * D
    CxK = AxK[:, plan.vperm] if plan.vperm is not None else AxK
    BK = Bm[..., None]
    AxR = AxK  # raw values for the refinement residual
    if Kp != K:  # pad with instance-0 copies (valid, results dropped)
        pad = Kp - K
        CxK = np.concatenate([CxK, np.repeat(CxK[:1], pad, axis=0)])
        BK = np.concatenate([BK, np.repeat(BK[:1], pad, axis=0)])
        AxR = np.concatenate([AxR, np.repeat(AxR[:1], pad, axis=0)])
    CxKd = (jnp.asarray(CxK) if fdt is None else jnp.asarray(CxK, fdt))
    tolv = jnp.asarray(float(tol), CxKd.dtype)
    fA = plan.__dict__.get("_dist_vals_factor_jit")
    if fA is None or fA[1] is not mesh or fA[2] != axis or fA[3] != fdt:
        def runA(CxL, tolv, dev):
            return jax.vmap(
                lambda cx: _lu_vals_factor_one(plan, cx, tolv, dev))(CxL)

        jA = jax.jit(shard_map(
            runA, mesh=mesh, in_specs=(P(axis), P(), P()),
            out_specs=(P(axis), P(axis), P(axis)), check_vma=False))
        fA = (jA, mesh, axis, fdt)
        plan.__dict__["_dist_vals_factor_jit"] = fA
    statsK, cacheK, permK = fA[0](CxKd, tolv, dev)
    stats_h, perm_h = jax.device_get((statsK, permK))
    ok, pinK, inners = _lu_vals_compose(plan, stats_h, perm_h, n, tol)
    cacheK, _ = _attach_inners(plan, cacheK,
                               [jnp.asarray(v) for v in inners])
    Mi, Mj = _lu_vals_pattern(plan, a)
    qv = (jnp.asarray(np.asarray(s.q, np.int64)) if s.q is not None
          else None)
    fB = plan.__dict__.get("_dist_vals_solve_jit")
    if fB is None or fB[1] is not mesh or fB[2] != axis:
        def runB(BL, cacheL, pinL, MxL, sdev, Mi_, Mj_, *qopt):
            q_ = qopt[0] if qopt else None

            def one(b, cache, pin_k, mx):
                return _lu_refine_body(plan, n, b.astype(jnp.float64),
                                       cache, sdev, Mi_, Mj_, mx, pin_k, q_)

            return jax.vmap(one)(BL, cacheL, pinL, MxL)

        nq = 1 if qv is not None else 0
        jB = jax.jit(shard_map(
            runB, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(), P())
            + (P(),) * nq,
            out_specs=(P(axis), P(axis), P(axis)), check_vma=False))
        fB = (jB, mesh, axis)
        plan.__dict__["_dist_vals_solve_jit"] = fB
    args = [jnp.asarray(BK), cacheK, jnp.asarray(pinK),
            jnp.asarray(AxR), sdev, Mi, Mj]
    if qv is not None:
        args.append(qv)
    Xk, rmaxK, xmaxK = jax.device_get(fB[0](*args))
    out = np.asarray(Xk[:K, :, 0], np.float64)
    ok = ok[:K]
    scale = np.maximum(np.abs(Bm).max(axis=1),
                       np.maximum(np.asarray(xmaxK)[:K], 1.0))
    ok &= np.asarray(rmaxK)[:K] <= 1e-10 * scale
    if not ok.all():
        bad_idx = np.nonzero(~ok)[0]
        out = _writable(out)
        out[bad_idx] = _lu_vals_loop(a, s, AxK, Bm, order, tol, bad_idx)
    return out


def dist_qrsol_vals(a: Sprs, Ax, B, mesh: Mesh, order: int = 2, *,
                    sym=None, axis: str = "data"):
    """Distributed batched-VALUES QR solve: K same-pattern rectangular
    systems (least-squares m>=n, minimum-norm m<n) with instances sharded
    over the mesh `axis` — solve.qrsol_vals's per-instance body shard_map'd
    on each device's K/D chunk. One analysis + one executable shared."""
    import rsparse_tpu as _rs

    from ..config import config
    from ..factor.frontal_qr import _prep_qr_indices
    from ..ops.plan import transpose_plan
    from ..solve import (_plan_dev, _qr_vals_one, _qr_vals_rtri, _writable,
                         qrsol)

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
        raise ValueError(f"B must be [K, m] or [m], got {Bm.shape}")
    ls = m >= n
    host_a = a if ls else _rs.transpose(a)
    s = sym if sym is not None else _rs.sqr(host_a, order, True)
    plan = getattr(s, "_mf_qr_plan", "unset")
    if plan == "unset" and (n if ls else m) >= config.mf_min_n:
        from ..factor.frontal_qr import build_qr_mf_plan

        try:
            plan = build_qr_mf_plan(host_a, s)
        except Exception:
            plan = None
        s._mf_qr_plan = plan
    # same entry-cap gate as qrsol_vals (advisor r4 medium): the K-batched
    # whole-tree trace beyond fuse_entry_cap compiles for >30 min through
    # the remote tunnel — the per-instance tier (chunked qr_mf) takes over
    if plan is not None and plan != "unset":
        from ..factor.frontal import fuse_entry_cap
        from ..factor.frontal_qr import _qr_plan_index_entries

        if not plan.__dict__.setdefault(
                "_vals_fuse_ok",
                _qr_plan_index_entries(plan) <= fuse_entry_cap()):
            plan = None
    from ..solve import _qr_vals_batched_ok

    if plan is not None and plan != "unset" and not _qr_vals_batched_ok():
        plan = None  # TPU v5e worker fault — see _qr_vals_batched_ok
    if plan is None or plan == "unset" or config.backend == "host":
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
    if ls:
        Z = Bm[..., None]  # row perm is embedded in the front plan
    else:
        bq = Bm
        if plan.q is not None:
            bq = Bm[:, np.asarray(plan.q, dtype=np.int64)]
        Z = bq[..., None]
    D = mesh.shape[axis]
    Kp = -(-K // D) * D
    if Kp != K:  # pad with instance-0 copies (results dropped)
        pad = Kp - K
        vmap_ax = np.concatenate(
            [vmap_ax, np.repeat(vmap_ax[:1], pad, axis=0)])
        Z = np.concatenate([Z, np.repeat(Z[:1], pad, axis=0)])
    key = "_dist_vals_jit" if ls else "_dist_vals_mn_jit"
    fn = plan.__dict__.get(key)
    if fn is None or fn[1] is not mesh or fn[2] != axis:
        def run(AxL, ZL, devs_in, sdevs_in, tridev):
            # exact f64 per-instance body (dist runs on the virtual CPU
            # mesh in this environment; the f32+refine tier lives in the
            # single-process qrsol_vals)
            def one(ax, z):
                Y, _ = _qr_vals_one(plan, ls, tp_, devs_in, sdevs_in,
                                    tridev, ax, z)
                return Y

            return jax.vmap(one)(AxL, ZL)

        jfn = jax.jit(shard_map(
            run, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(), P()),
            out_specs=P(axis), check_vma=False))
        fn = (jfn, mesh, axis)
        plan.__dict__[key] = fn
    Y = np.asarray(fn[0](jnp.asarray(vmap_ax), jnp.asarray(Z), devs, sdevs,
                         _plan_dev(tp_)))[:K, :, 0]
    if ls:
        out = np.zeros((K, n), dtype=np.float64)
        out[:, (np.asarray(s.q, np.int64) if s.q is not None
                else np.arange(n))] = Y  # ipvec(q) per instance
        return out
    return _writable(Y)  # _q_apply returns original row order


__all__ += ["dist_cholsol_vals", "dist_lusol_vals", "dist_qrsol_vals"]


# Halo-sharded layer (x sharded n/D, ppermute boundary exchange) — the
# SURVEY §2.5 partition+halo design; see parallel/halo.py.
from .halo import (  # noqa: E402,F401
    RowPartition, partition_rows, make_gaxpy_halo, dist_gaxpy_halo,
    HaloTriPlan, halo_tri_plan, dist_tri_solve_halo, dist_lusol, dist_qrsol,
)

__all__ += [
    "RowPartition", "partition_rows", "make_gaxpy_halo", "dist_gaxpy_halo",
    "HaloTriPlan", "halo_tri_plan", "dist_tri_solve_halo", "dist_lusol",
    "dist_qrsol",
]
