"""Device-side numeric kernels for the L2 sparse ops.

Each kernel is a jitted function of value arrays plus static int32 index
arrays produced by ops.plan. Shapes are static per plan, so XLA compiles one
fused program per sparsity pattern and caches it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("nnz",))
def spgemm_values(ax, bx, a_idx, b_idx, seg, nnz: int):
    """C.x = segment_sum(A.x[a_idx] * B.x[b_idx], seg)."""
    prods = ax[a_idx] * bx[b_idx]
    return jax.ops.segment_sum(prods, seg, num_segments=nnz)


@partial(jax.jit, static_argnames=("nnz",))
def add_values(ax, bx, alpha, beta, seg, nnz: int):
    vals = jnp.concatenate([alpha * ax, beta * bx])
    return jax.ops.segment_sum(vals, seg, num_segments=nnz)


@jax.jit
def gather_values(x, perm):
    return x[perm]


@partial(jax.jit, static_argnames=("m",))
def gaxpy(ax, rows, cols, x, y, m: int):
    """r = A*x + y via per-entry gather + segment-sum over rows.

    Reference semantics: src/lib.rs:411-421.
    """
    vals = ax * x[cols]
    return y + jax.ops.segment_sum(vals, rows, num_segments=m)


@partial(jax.jit, static_argnames=("n",))
def norm1(ax, cols, n: int):
    """1-norm = max column abs-sum (reference src/lib.rs:771-782)."""
    sums = jax.ops.segment_sum(jnp.abs(ax), cols, num_segments=n)
    return jnp.max(sums) if n > 0 else jnp.zeros((), ax.dtype)


@jax.jit
def spmv_csc(a, x, y=None):
    """r = A@x (+ y) consuming a `data.CSCDevice` pytree directly under jit.

    The per-entry column ids are recovered from the pointer array with a
    searchsorted (static shapes: nnz is a pytree aux dim), so a CSCDevice can
    flow through user jit/grad code without host round-trips. Reference
    semantics: gaxpy, src/lib.rs:411-421.
    """
    e = jnp.arange(a.i.shape[0])
    cols = jnp.searchsorted(a.p, e, side="right") - 1
    r = jax.ops.segment_sum(a.x * x[cols], a.i, num_segments=a.m)
    return r if y is None else r + y


@jax.jit
def scpmat_values(alpha, ax):
    return ax + alpha


@jax.jit
def scxmat_values(alpha, ax):
    return ax * alpha
