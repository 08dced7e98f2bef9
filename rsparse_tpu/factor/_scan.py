"""Grouped level execution: fuse per-level kernel launches into lax.scan.

The device factorizations sweep elimination levels sequentially. Dispatching
one jitted call per level pays a host->device round trip per level — on a
tunneled TPU runtime that latency dominates for factors with hundreds of
levels. Because the pow2 padding makes runs of consecutive levels share
tensor shapes (especially in the long small-level tail), we stack each
same-shape run on a leading axis and drive it with ONE `lax.scan` — the
scan's sequential semantics preserve the level order, and launches drop from
#levels to #shape-groups.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["run_grouped"]


@lru_cache(maxsize=128)
def _scan_fn(step: Callable, n_consts: int):
    """Build (and cache) the jitted scan driver for a step function."""

    @jax.jit
    def run(carry, stacked, consts):
        def body(c, xs):
            return step(c, xs, consts)

        return jax.lax.scan(body, carry, stacked)

    return run


def stack_groups(levels: Sequence[Tuple[np.ndarray, ...]]) -> List[Tuple]:
    """Stack runs of identically-shaped levels into device-resident tensors.

    The result should be CACHED on the plan object: re-uploading the plan's
    index tensors every factorization call costs more than the launches on a
    tunneled runtime."""
    groups: List[Tuple] = []
    i = 0
    nlev = len(levels)
    while i < nlev:
        shapes = tuple(t.shape for t in levels[i])
        j = i + 1
        while j < nlev and tuple(t.shape for t in levels[j]) == shapes:
            j += 1
        groups.append(tuple(
            jnp.asarray(np.stack([levels[g][t_] for g in range(i, j)]))
            for t_ in range(len(levels[i]))
        ))
        i = j
    return groups


def run_grouped(
    levels: Sequence[Tuple[np.ndarray, ...]],
    step: Callable,
    carry,
    consts: Tuple = (),
    cache: List = None,
) -> Tuple[object, List]:
    """Run `step(carry, level_tensors, consts) -> (carry, aux)` over every
    level, scanning over runs of identically-shaped levels.

    `cache` (a plain list attached to the plan) holds the device-resident
    stacked tensors across calls; pass the same list to amortize transfers.
    Returns (final_carry, [aux arrays — one stacked array per group]).
    """
    run = _scan_fn(step, len(consts))
    if cache is not None and len(cache):
        groups = cache
    else:
        groups = stack_groups(levels)
        if cache is not None:
            cache.extend(groups)
    aux_groups: List = []
    for stacked in groups:
        carry, aux = run(carry, stacked, consts)
        if aux is not None:
            aux_groups.append(aux)
    return carry, aux_groups
