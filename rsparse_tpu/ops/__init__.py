"""L2 sparse primitive ops: add, multiply (SpGEMM), transpose, gaxpy, norm,
scalar ops, permute/symperm, ipvec/pvec, fkeep, sprs_print.

Public API parity with the reference crate root (src/lib.rs) — same names,
same semantics — but implemented TPU-first: host symbolic plan (ops.plan) +
device numeric kernel (ops.device). See SURVEY.md §2.2.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..config import config
from ..data import Sprs
from . import device as dev
from . import plan as _plan

__all__ = [
    "add",
    "multiply",
    "transpose",
    "gaxpy",
    "gaxpy_multi",
    "norm",
    "scpmat",
    "scxmat",
    "permute",
    "symperm",
    "ipvec",
    "pvec",
    "pinvert",
    "fkeep",
    "sprs_print",
    "chain",
    "ChainExpr",
]


def _jnp():
    import jax.numpy as jnp

    return jnp


def _numeric_on_host(nnz: int) -> bool:
    """Adaptive numeric dispatch: the L2 ops pair a host symbolic plan with
    a device value kernel, but on a real TPU the per-dispatch latency (tens
    of ms through the runtime tunnel) dwarfs the arithmetic for small
    operands — so value passes below `config.device_ops_min_nnz` apply with
    numpy on host. The CPU backend keeps the device path (tests exercise the
    kernels there); `config.backend == "host"` forces host everywhere."""
    if config.backend == "host":
        return True
    import jax

    from ..config import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()  # backend resolved here anyway
    return jax.default_backend() == "tpu" and nnz < config.device_ops_min_nnz


def add(a: Sprs, b: Sprs, alpha: float = 1.0, beta: float = 1.0) -> Sprs:
    """C = alpha*A + beta*B (reference src/lib.rs:247-271).

    Output pattern is the structural union; rows within each column are
    sorted ascending (canonical form — the reference leaves scatter order).

    >>> from rsparse_tpu import Sprs, add
    >>> a = Sprs.new_from_vec([[2.0, 2.0], [1.0, 4.0]])
    >>> b = Sprs.new_from_vec([[2.0, 4.0], [3.0, 4.0]])
    >>> add(a, b, 1.0, 1.0).to_dense()
    [[4.0, 6.0], [4.0, 8.0]]
    """
    p = _plan.add_plan(a, b)
    anz, bnz = a.nnz(), b.nnz()
    if _numeric_on_host(anz + bnz):
        cx = np.zeros(p.nnz, dtype=a.x.dtype)
        np.add.at(cx, p.seg, np.concatenate([alpha * a.x[:anz], beta * b.x[:bnz]]))
        return Sprs(p.nnz, p.m, p.n, p.out_p, p.out_i, cx)
    jnp = _jnp()
    ax = jnp.asarray(a.x[:anz])
    bx = jnp.asarray(b.x[:bnz])
    cx = dev.add_values(ax, bx, jnp.asarray(alpha, ax.dtype), jnp.asarray(beta, ax.dtype), jnp.asarray(p.seg), p.nnz)
    return Sprs(p.nnz, p.m, p.n, p.out_p, p.out_i, np.asarray(cx))


def multiply(a: Sprs, b: Sprs) -> Sprs:
    """C = A*B, ESC SpGEMM (reference Gustavson: src/lib.rs:713-748).

    Latency tier (TPU backend): a COLD one-shot product is round-trip
    bound — ESC plan build + operand upload + value readback cost ~40x the
    device kernel through a tunneled runtime (BENCH_r04: 5.5 Mnnz/s e2e vs
    1.3 Gnnz/s kernel-resident) — so it runs the native C++ Gustavson
    engine (the reference's exact algorithm AND entry order,
    src/lib.rs:713-748). Device-resident pipelines (`ops.chain`,
    `spgemm_dia(materialize=False)`, spgemm_general) remain the TPU path
    where operands/products stay in HBM. On CPU/host backends the ESC
    plan + kernel path is kept (canonical sorted output, exercised by the
    test suite).

    >>> from rsparse_tpu import Sprs, multiply
    >>> a = Sprs.new_from_vec([[1.0, 2.0], [3.0, 4.0]])
    >>> b = Sprs.eye(2)
    >>> multiply(a, b).to_dense()
    [[1.0, 2.0], [3.0, 4.0]]
    """
    if a.n != b.m:
        raise ValueError(
            f"dimension mismatch: A is {a.m}x{a.n}, B is {b.m}x{b.n}")
    if config.backend != "host":
        import jax

        if jax.default_backend() == "tpu":
            from ..symbolic import native as _native

            anz, bnz = a.nnz(), b.nnz()
            Cp, Ci, Cx = _native.multiply_host(
                a.m, a.n, a.p, a.i[:anz], a.x[:anz],
                b.n, b.p, b.i[:bnz], b.x[:bnz])
            return Sprs(len(Cx), a.m, b.n, Cp, Ci,
                        np.asarray(Cx, dtype=a.x.dtype))
    p = _plan.spgemm_plan(a, b)
    if _numeric_on_host(len(p.seg)):
        cx = np.zeros(p.nnz, dtype=a.x.dtype)
        if len(p.seg):
            np.add.at(cx, p.seg, a.x[p.a_idx] * b.x[p.b_idx])
        return Sprs(p.nnz, p.m, p.n, p.out_p, p.out_i, cx)
    jnp = _jnp()
    ax = jnp.asarray(a.x[: a.nnz()])
    bx = jnp.asarray(b.x[: b.nnz()])
    cx = dev.spgemm_values(ax, bx, jnp.asarray(p.a_idx), jnp.asarray(p.b_idx), jnp.asarray(p.seg), p.nnz)
    return Sprs(p.nnz, p.m, p.n, p.out_p, p.out_i, np.asarray(cx))


def transpose(a: Sprs) -> Sprs:
    """C = A' by stable counting sort (reference src/lib.rs:1178-1197).

    >>> from rsparse_tpu import Sprs, transpose
    >>> transpose(Sprs.new_from_vec([[1.0, 2.0], [0.0, 3.0]])).to_dense()
    [[1.0, 0.0], [2.0, 3.0]]
    """
    p = _plan.transpose_plan(a)
    if _numeric_on_host(a.nnz()):
        return Sprs(len(p.out_i), p.m, p.n, p.out_p, p.out_i, a.x[: a.nnz()][p.perm])
    jnp = _jnp()
    cx = dev.gather_values(jnp.asarray(a.x[: a.nnz()]), jnp.asarray(p.perm))
    return Sprs(len(p.out_i), p.m, p.n, p.out_p, p.out_i, np.asarray(cx))


def gaxpy(a: Sprs, x, y) -> list:
    """r = A*x + y (reference src/lib.rs:411-421).

    >>> from rsparse_tpu import Sprs, gaxpy
    >>> a = Sprs.new_from_vec([[1.0, 2.0], [3.0, 4.0]])
    >>> [float(v) for v in gaxpy(a, [1.0, 1.0], [0.0, 0.0])]
    [3.0, 7.0]
    """
    nz = a.nnz()
    cols = _plan.col_ids(a.p, a.n)
    if _numeric_on_host(nz):
        r = np.asarray(y, dtype=a.x.dtype).copy()
        np.add.at(r, a.i[:nz], a.x[:nz] * np.asarray(x, dtype=a.x.dtype)[cols])
        return list(r)
    jnp = _jnp()
    r = dev.gaxpy(
        jnp.asarray(a.x[:nz]),
        jnp.asarray(a.i[:nz]),
        jnp.asarray(cols),
        jnp.asarray(np.asarray(x, dtype=a.x.dtype)),
        jnp.asarray(np.asarray(y, dtype=a.x.dtype)),
        a.m,
    )
    return list(np.asarray(r))


def gaxpy_multi(a: Sprs, X, Y=None) -> np.ndarray:
    """R = A@X (+ Y) for a dense RHS batch X [n, B] — the TPU serving shape
    (the reference gaxpy is single-RHS, src/lib.rs:411-421; this is its
    lane-aligned batched extension, matching the *_multi solver APIs).

    f32 matrices within the VMEM budget run the Pallas streaming SpMM
    kernel on TPU (ops/spmm_pallas.py — entry stream HBM->SMEM, one
    [1, B] row FMA per entry; ~50x the XLA scatter lowering on arbitrary
    patterns); everything else uses a vectorized host scatter."""
    nz = a.nnz()
    Xa = np.asarray(X)
    if Xa.ndim != 2 or Xa.shape[0] != a.n:
        raise ValueError(f"X must be [n={a.n}, B], got {Xa.shape}")
    nrhs = Xa.shape[1]
    Ya = None
    if Y is not None:
        Ya = np.asarray(Y)
        if Ya.ndim == 1 and Ya.shape[0] == a.m:
            Ya = Ya[:, None]  # per-row addend (gaxpy-style), every column
        elif Ya.shape != (a.m, nrhs):
            raise ValueError(
                f"Y must be [m={a.m}, {nrhs}] or [m], got {Ya.shape}")
    if config.use_pallas and np.dtype(a.x.dtype) == np.float32:
        import jax

        from .spmm_pallas import spmm_pallas, spmm_pallas_available

        if ((jax.default_backend() == "tpu" or config.serve_mixed == "force")
                and spmm_pallas_available(a.m, a.n, nrhs, np.float32)):
            R = np.asarray(spmm_pallas(a, Xa))
            if Ya is not None:
                R = R + Ya.astype(R.dtype)
            return R
    R = (np.zeros((a.m, nrhs), dtype=a.x.dtype) if Ya is None
         else np.array(np.broadcast_to(Ya.astype(a.x.dtype), (a.m, nrhs))))
    cols = _plan.col_ids(a.p, a.n)
    np.add.at(R, a.i[:nz], a.x[:nz][:, None] * Xa[cols].astype(a.x.dtype))
    return R


def norm(a: Sprs) -> float:
    """1-norm (max column abs-sum), reference src/lib.rs:771-782.

    >>> from rsparse_tpu import Sprs, norm
    >>> norm(Sprs.new_from_vec([[1.0, -5.0], [2.0, 1.0]]))
    6.0
    """
    if a.n == 0 or a.nnz() == 0:
        return 0.0
    cols = _plan.col_ids(a.p, a.n)
    if _numeric_on_host(a.nnz()):
        return float(np.bincount(cols, weights=np.abs(a.x[: a.nnz()]), minlength=a.n).max())
    jnp = _jnp()
    return float(dev.norm1(jnp.asarray(a.x[: a.nnz()]), jnp.asarray(cols), a.n))


def scpmat(alpha: float, a: Sprs) -> Sprs:
    """C = alpha + A on stored entries (reference src/lib.rs:1019-1029)."""
    if _numeric_on_host(a.nnz()):
        return Sprs(a.nzmax, a.m, a.n, a.p.copy(), a.i.copy(), alpha + a.x)
    jnp = _jnp()
    cx = dev.scpmat_values(jnp.asarray(alpha, a.x.dtype), jnp.asarray(a.x))
    return Sprs(a.nzmax, a.m, a.n, a.p.copy(), a.i.copy(), np.asarray(cx))


def scxmat(alpha: float, a: Sprs) -> Sprs:
    """C = alpha * A on stored entries (reference src/lib.rs:1062-1072)."""
    if _numeric_on_host(a.nnz()):
        return Sprs(a.nzmax, a.m, a.n, a.p.copy(), a.i.copy(), alpha * a.x)
    jnp = _jnp()
    cx = dev.scxmat_values(jnp.asarray(alpha, a.x.dtype), jnp.asarray(a.x))
    return Sprs(a.nzmax, a.m, a.n, a.p.copy(), a.i.copy(), np.asarray(cx))


def permute(a: Sprs, pinv: Optional[np.ndarray], q: Optional[np.ndarray]) -> Sprs:
    """C = A(P,Q) (reference src/lib.rs:2163-2192)."""
    p = _plan.permute_plan(a, pinv, q)
    if _numeric_on_host(a.nnz()):
        return Sprs(len(p.out_i), p.m, p.n, p.out_p, p.out_i, a.x[: a.nnz()][p.perm])
    jnp = _jnp()
    cx = dev.gather_values(jnp.asarray(a.x[: a.nnz()]), jnp.asarray(p.perm))
    return Sprs(len(p.out_i), p.m, p.n, p.out_p, p.out_i, np.asarray(cx))


def symperm(a: Sprs, pinv: Optional[np.ndarray]) -> Sprs:
    """C = A(p,p) of the upper-triangular part (reference src/lib.rs:2369-2408)."""
    p = _plan.symperm_plan(a, pinv)
    if _numeric_on_host(a.nnz()):
        return Sprs(len(p.out_i), p.m, p.n, p.out_p, p.out_i, a.x[: a.nnz()][p.perm])
    jnp = _jnp()
    cx = dev.gather_values(jnp.asarray(a.x[: a.nnz()]), jnp.asarray(p.perm))
    return Sprs(len(p.out_i), p.m, p.n, p.out_p, p.out_i, np.asarray(cx))


def ipvec(n: int, p: Optional[np.ndarray], b, x) -> None:
    """x(P) = b (reference src/lib.rs:2151-2159); writes into x in place."""
    b = np.asarray(b)
    if p is not None:
        x[np.asarray(p[:n], dtype=np.int64)] = b[:n]
    else:
        x[:n] = b[:n]


def pvec(n: int, p: Optional[np.ndarray], b, x) -> None:
    """x = b(P) (reference src/lib.rs:2244-2251); writes into x in place."""
    b = np.asarray(b)
    if p is not None:
        x[:n] = b[np.asarray(p[:n], dtype=np.int64)]
    else:
        x[:n] = b[:n]


def pinvert(p: Optional[np.ndarray], n: int) -> Optional[np.ndarray]:
    """Pinv = P' (reference src/lib.rs:2196-2209); None = identity."""
    if p is None:
        return None
    pinv = np.zeros(n, dtype=np.int64)
    pinv[np.asarray(p[:n], dtype=np.int64)] = np.arange(n)
    return pinv


def fkeep(a: Sprs, f: Callable[[int, int, float], bool]) -> int:
    """In-place filter of entries by predicate (reference src/lib.rs:2075-2095)."""
    nz = a.nnz()
    rows = a.i[:nz]
    cols = _plan.col_ids(a.p, a.n)
    keep = np.fromiter(
        (f(int(rows[k]), int(cols[k]), float(a.x[k])) for k in range(nz)),
        dtype=bool,
        count=nz,
    )
    kept_before = np.concatenate([[0], np.cumsum(keep)])
    a.p = kept_before[a.p[: a.n + 1]].astype(np.int64)
    a.i = a.i[:nz][keep]
    a.x = a.x[:nz][keep]
    a.nzmax = int(a.x.size)
    return int(a.p[a.n])


def sprs_print(a: Sprs, brief: bool = False) -> None:
    """Debug pretty-printer (reference src/lib.rs:1076-1104)."""
    print(f"{a.m}-by-{a.n}, nzmax: {a.nzmax} nnz: {a.p[a.n]}, 1-norm: {norm(a)}")
    for j in range(a.n):
        print(f"      col {j} : locations {a.p[j]} to {a.p[j + 1] - 1}")
        for q in range(int(a.p[j]), int(a.p[j + 1])):
            print(f"            {a.i[q]} : {a.x[q]}")
            if brief and q > 20:
                print("  ...")
                return


from .chain import ChainExpr, chain  # noqa: E402  (device op chaining)
