"""Batched dense Cholesky tuned for the multifrontal front shapes.

XLA's `jnp.linalg.cholesky` on TPU runs an O(n)-step column loop whose per
-step cost scales with the WHOLE batch tensor — measured 17 ms for a
[2304, 64, 64] f32 batch (the vmapped K=16 x F=144 front bucket of the
cholsol_vals bench) where the arithmetic is microseconds. This module
replaces it with a recursive 2x2 block factorization

    A = [[A11, .  ],      L = [[L11,  0 ],     L11 = chol(A11)
         [A21, A22]]           [L21, L22]]     L21 = A21 L11^-T
                                               L22 = chol(A22 - L21 L21')

whose off-diagonal work is batched `triangular_solve` + matmul (MXU-
friendly, measured ~0.2 ms at the same shape) and whose sequential depth
is n/BASE unrolled base-case factorizations instead of n column steps.
The base case (n <= BASE) is a fully unrolled outer-product elimination -
XLA fuses the unrolled steps into a handful of kernels.

Numerical behavior matches the textbook right-looking algorithm (same
operation order as `jnp.linalg.cholesky` up to blocking); the MF drivers'
f64 refinement covers the f32 rounding either way. Like lax's version, a
non-SPD input produces NaNs (from sqrt of a negative pivot) that the
callers' dmin/NaN checks already detect.

No reference counterpart: the reference factors column-by-column on the
host (chol, /root/reference/src/lib.rs:278-337); this is the TPU shape of
the same elimination.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["block_chol", "fast_chol"]

BASE = 16

# Above this order, XLA's own blocked cholesky wins (the recursion's
# per-level concatenates rewrite the whole tensor log(n) times, which
# dominates once n is large enough that lax's column loop is no longer
# latency-bound): measured crossover between 512 and 1024 on v5e.
BLOCK_MAX = 512


def fast_chol(A):
    """Batched lower Cholesky with the per-shape-fastest algorithm:
    the recursive block factorization below for small orders (where XLA's
    column loop is latency-bound — 15 ms -> ~0 ms at [2304, 64, 64]),
    `jnp.linalg.cholesky` for large ones (where its blocking wins)."""
    return (block_chol(A) if A.shape[-1] <= BLOCK_MAX
            else jnp.linalg.cholesky(A))


def _chol_unrolled(A):
    """Unrolled right-looking Cholesky for [..., b, b] with b <= BASE."""
    b = A.shape[-1]
    ft = A.dtype
    cols = []
    for k in range(b):
        dk = jnp.sqrt(A[..., k, k])
        col = A[..., :, k] / dk[..., None]  # [..., b]; rows < k hold garbage
        # zero the strictly-upper part of the column so the outer-product
        # update and the assembled L are exact
        mask = jnp.arange(b) >= k
        col = jnp.where(mask, col, jnp.zeros((), ft))
        cols.append(col)
        A = A - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def block_chol(A):
    """Cholesky of a batched SPD tensor [..., n, n] (lower factor).

    n need not be a power of two; odd splits just produce uneven blocks.
    """
    n = A.shape[-1]
    if n <= BASE:
        return _chol_unrolled(A)
    h = n // 2
    A11 = A[..., :h, :h]
    A21 = A[..., h:, :h]
    A22 = A[..., h:, h:]
    L11 = block_chol(A11)
    # L21 = A21 L11^-T
    L21 = jax.lax.linalg.triangular_solve(
        L11, A21, left_side=False, lower=True, transpose_a=True)
    S = A22 - L21 @ jnp.swapaxes(L21, -1, -2)
    L22 = block_chol(S)
    z = jnp.zeros(A11.shape[:-2] + (h, n - h), A.dtype)
    top = jnp.concatenate([L11, z], axis=-1)
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
