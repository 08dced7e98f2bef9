"""Device-resident op chaining: one program for a whole L2-op pipeline.

The eager L2 ops (ops.add/multiply/transpose/...) pair a host symbolic
plan with a device value kernel, but each call is its own dispatch and
its result round-trips to host numpy. On a real TPU the per-dispatch
latency (~15-25 ms through the tunnel runtime) dwarfs the arithmetic for
small operands, which is why value passes below
`config.device_ops_min_nnz` run on host (`ops._numeric_on_host`).

`chain` removes the per-op dispatch instead of avoiding the device: it
builds the expression DAG lazily, computes every intermediate PATTERN on
the host at build time (patterns are static — the same plan machinery
the eager ops use), and compiles ONE jitted program that applies all the
value kernels back to back. Intermediates never leave HBM, XLA fuses
across ops, and a pipeline pays ONE dispatch regardless of length — so
the device path is profitable far below the single-op carve-out, and a
serving loop re-applying the chain to fresh values amortizes even that.

    e = chain(A).transpose().multiply(A).add(I, beta=mu)   # (AᵀA + muI)
    C = e.run()                 # one dispatch, Sprs out
    f = e.values_fn()           # jit-compatible f(*leaf values) -> Cx
                                # for serving loops / outer jit

Multiply inside a chain uses the one-hot-MXU ESC kernel on TPU
(`spgemm_general_fn`; every address stream rides the MXU — see
DESIGN.md) and the plain gather/segment-sum lowering elsewhere (exact,
and CPU tests exercise it). Reference semantics per op are unchanged:
multiply src/lib.rs:713-748, add src/lib.rs:247-271, transpose
src/lib.rs:1178-1197, scpmat src/lib.rs:1019-1029 (stored entries),
scxmat src/lib.rs:1062-1072.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..data import Sprs
from . import plan as _plan

__all__ = ["chain", "ChainExpr"]


def _pattern_sprs(m: int, n: int, p: np.ndarray, i: np.ndarray) -> Sprs:
    """Pattern-only Sprs (zero values) for feeding the plan cache."""
    nnz = len(i)
    return Sprs(nnz, m, n, np.asarray(p), np.asarray(i), np.zeros(nnz))


@dataclasses.dataclass(frozen=True)
class ChainExpr:
    """Lazy L2-op expression; immutable — every method returns a new node.

    `pattern` is the host-computed (m, n, p, i) of this node's result;
    building a node costs only symbolic work (cached per input pattern).
    """

    kind: str  # leaf | multiply | add | transpose | scale | add_scalar
    pattern: Tuple[int, int, np.ndarray, np.ndarray]
    operands: tuple = ()
    params: tuple = ()
    leaf: Optional[Sprs] = None

    # -- builders ---------------------------------------------------------
    def _lift(self, other) -> "ChainExpr":
        return other if isinstance(other, ChainExpr) else chain(other)

    def multiply(self, other) -> "ChainExpr":
        o = self._lift(other)
        pl = _plan.spgemm_plan(self._psprs(), o._psprs())
        return ChainExpr("multiply", (pl.m, pl.n, pl.out_p, pl.out_i),
                         (self, o))

    def add(self, other, alpha: float = 1.0,
            beta: float = 1.0) -> "ChainExpr":
        o = self._lift(other)
        pl = _plan.add_plan(self._psprs(), o._psprs())
        return ChainExpr("add", (pl.m, pl.n, pl.out_p, pl.out_i),
                         (self, o), (float(alpha), float(beta)))

    def transpose(self) -> "ChainExpr":
        pl = _plan.transpose_plan(self._psprs())
        return ChainExpr("transpose", (pl.m, pl.n, pl.out_p, pl.out_i),
                         (self,))

    def scale(self, alpha: float) -> "ChainExpr":
        return ChainExpr("scale", self.pattern, (self,), (float(alpha),))

    def add_scalar(self, alpha: float) -> "ChainExpr":
        return ChainExpr("add_scalar", self.pattern, (self,),
                         (float(alpha),))

    # -- compilation ------------------------------------------------------
    def _psprs(self) -> Sprs:
        m, n, p, i = self.pattern
        if self.leaf is not None:
            return self.leaf
        return _pattern_sprs(m, n, p, i)

    def _topo(self):
        seen = {}
        order = []

        def visit(node):
            if id(node) in seen:
                return
            seen[id(node)] = True
            for op in node.operands:
                visit(op)
            order.append(node)

        visit(self)
        return order

    def leaves(self):
        """Distinct leaf matrices in first-use order — the argument order
        of `values_fn()` (the same Sprs appearing twice gets ONE slot)."""
        out, seen = [], set()
        for nd in self._topo():
            if nd.kind == "leaf" and id(nd.leaf) not in seen:
                seen.add(id(nd.leaf))
                out.append(nd)
        return out

    def values_fn(self, dtype: str = "float64",
                  multiply_kernel: str = "auto"):
        """One jitted `f(*leaf_value_arrays) -> result values` program.

        multiply_kernel: "mxu" routes every multiply through the
        one-hot-MXU ESC kernel (TPU fast path), "esc" uses the plain
        gather/segment-sum lowering (exact; best off-TPU), "auto" picks
        by backend. Index tensors ride as jit arguments via the usual
        f.run/f.consts split so outer-jit callers don't bake them into
        HLO constants."""
        import jax
        import jax.numpy as jnp

        if multiply_kernel == "auto":
            multiply_kernel = ("mxu" if jax.default_backend() == "tpu"
                               else "esc")
        dt = jnp.dtype(dtype)
        topo = self._topo()
        leaves = self.leaves()
        leaf_slot = {id(nd.leaf): k for k, nd in enumerate(leaves)}

        # per-node static index tensors (threaded as jit arguments)
        consts = []
        steps = []  # (kind, operand slots, const slots, params, aux)
        slot_of = {}
        mxu_fns = {}
        for nd in topo:
            if nd.kind == "leaf":
                slot_of[id(nd)] = ("leaf", leaf_slot[id(nd.leaf)])
                continue
            ops_slots = tuple(slot_of[id(o)] for o in nd.operands)
            if nd.kind == "multiply":
                a_s, b_s = (o._psprs() for o in nd.operands)
                if multiply_kernel == "mxu":
                    from .spgemm_general import (mxu_spgemm_plan,
                                                 spgemm_general_fn)

                    mp = mxu_spgemm_plan(a_s, b_s)
                    f = spgemm_general_fn(mp, dtype)
                    c0 = len(consts)
                    consts.extend(f.consts)
                    mxu_fns[len(steps)] = (f.run, len(f.consts))
                    steps.append(("multiply_mxu", ops_slots,
                                  (c0,), (), None))
                else:
                    pl = _plan.spgemm_plan(a_s, b_s)
                    c0 = len(consts)
                    consts.extend([jnp.asarray(pl.a_idx),
                                   jnp.asarray(pl.b_idx),
                                   jnp.asarray(pl.seg)])
                    steps.append(("multiply_esc", ops_slots, (c0,),
                                  (), pl.nnz))
            elif nd.kind == "add":
                pl = _plan.add_plan(*(o._psprs() for o in nd.operands))
                c0 = len(consts)
                consts.append(jnp.asarray(pl.seg))
                steps.append(("add", ops_slots, (c0,), nd.params, pl.nnz))
            elif nd.kind == "transpose":
                pl = _plan.transpose_plan(nd.operands[0]._psprs())
                c0 = len(consts)
                consts.append(jnp.asarray(pl.perm))
                steps.append(("transpose", ops_slots, (c0,), (), None))
            else:  # scale / add_scalar
                steps.append((nd.kind, ops_slots, (), nd.params, None))
            slot_of[id(nd)] = ("step", len(steps) - 1)

        nleaf = len(leaves)

        @jax.jit
        def run(*args):
            vals = [a.astype(dt) for a in args[:nleaf]]
            cn = args[nleaf:]
            out = []

            def get(slot):
                return vals[slot[1]] if slot[0] == "leaf" else out[slot[1]]

            for k, (kind, ops_slots, cs, params, aux) in enumerate(steps):
                if kind == "multiply_mxu":
                    fr, ncons = mxu_fns[k]
                    out.append(fr(get(ops_slots[0]), get(ops_slots[1]),
                                  *cn[cs[0]: cs[0] + ncons]))
                elif kind == "multiply_esc":
                    ax, bx = get(ops_slots[0]), get(ops_slots[1])
                    ai, bi, seg = cn[cs[0]: cs[0] + 3]
                    out.append(jax.ops.segment_sum(
                        ax[ai] * bx[bi], seg, num_segments=aux))
                elif kind == "add":
                    ax, bx = get(ops_slots[0]), get(ops_slots[1])
                    alpha, beta = params
                    out.append(jax.ops.segment_sum(
                        jnp.concatenate([alpha * ax, beta * bx]),
                        cn[cs[0]], num_segments=aux))
                elif kind == "transpose":
                    out.append(get(ops_slots[0])[cn[cs[0]]])
                elif kind == "scale":
                    out.append(get(ops_slots[0]) * params[0])
                else:  # add_scalar (reference scpmat: dense-offset values)
                    out.append(get(ops_slots[0]) + params[0])
            return out[-1]

        consts = tuple(consts)

        def f(*leaf_vals):
            return run(*leaf_vals, *consts)

        f.run = run
        f.consts = consts
        return f

    def run(self, dtype: str = "float64",
            multiply_kernel: str = "auto") -> Sprs:
        """Evaluate the chain: ONE device dispatch, Sprs result."""
        import jax.numpy as jnp

        f = self.values_fn(dtype, multiply_kernel)
        feeds = [jnp.asarray(nd.leaf.x[: nd.leaf.nnz()])
                 for nd in self.leaves()]
        cx = f(*feeds)
        m, n, p, i = self.pattern
        return Sprs(len(i), m, n, p, i, np.asarray(cx, np.float64))


def chain(a: Sprs) -> ChainExpr:
    """Start a device-resident op chain at `a` (values read at run)."""
    nz = a.nnz()
    return ChainExpr("leaf", (a.m, a.n, np.asarray(a.p),
                              np.asarray(a.i[:nz])), leaf=a)
