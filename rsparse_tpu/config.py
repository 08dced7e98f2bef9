"""Global configuration for rsparse_tpu.

The reference library (rsparse, /root/reference/src/lib.rs) exposes exactly two
behavioral knobs — `order: i8` and `tol` — as positional parameters. We keep
those on the public solver APIs and add a small config layer for device
options (dtype, backend selection, level-batch sizing), per SURVEY.md §5
("Config / flag system").
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class Config:
    # Value dtype used on device. float64 matches the reference's f64 test
    # tolerances (down to 1e-12 in allsol_1); float32 is offered for
    # MXU-speed paths (factor in f32 + iterative refinement).
    dtype: str = "float64"
    # Index dtype on device. int32 suffices for n, nnz < 2**31.
    index_dtype: str = "int32"
    # Numeric backend: "device" runs factorization/solves as JAX/XLA/Pallas
    # kernels; "host" runs the native C++ fast path (useful as an oracle and
    # for tiny latency-bound problems). "auto" picks device.
    backend: str = os.environ.get("RSPARSE_TPU_BACKEND", "device")
    # Use Pallas kernels where available (TPU only); set False (or env
    # RSPARSE_TPU_PALLAS=0) to force the portable XLA lowering — the
    # "sanitizer" path for kernel debugging (SURVEY.md §5).
    use_pallas: bool = os.environ.get("RSPARSE_TPU_PALLAS", "1") == "1"
    # Maximum padded batch width for level-scheduled factorization kernels.
    level_batch: int = 1024
    # Below this operand nnz, L2 op value passes run on host numpy when the
    # default backend is a (tunneled) TPU — per-dispatch latency dominates
    # the arithmetic there (see ops._numeric_on_host).
    device_ops_min_nnz: int = 2_000_000
    # Minimum n for the multifrontal device Cholesky path (factor/frontal);
    # below it, the plain level-batched kernel wins.
    mf_min_n: int = 1500
    # Factor-value dtype for the multifrontal LU inside the refining solver
    # drivers (lusol / lusol_multi). "auto" = float32 on TPU (native MXU/VPU
    # speed — f64 is software-emulated on TPU), float64 elsewhere; the f64
    # residual is recovered by the drivers' iterative refinement (classic
    # mixed-precision direct solve, LAPACK dsgesv-style). Direct `lu()`
    # calls always factor in the value dtype (f64) — only the drivers,
    # which own a refinement loop, opt into f32.
    lu_factor_dtype: str = "auto"
    # Same mixed-precision knob for the multifrontal Cholesky inside the
    # refining `cholsol` driver. A spurious f32 NotPositiveDefinite (PD
    # matrix whose f32 rounding turns a pivot negative) retries in f64
    # before surfacing the error.
    chol_factor_dtype: str = "auto"
    # Batched-solve serving path (cholsol_multi): "auto" uses f32 Pallas
    # sweeps + f64 iterative refinement on TPU backends, exact f64 XLA
    # sweeps elsewhere; "force" takes the mixed path on any backend (the
    # CPU test backend runs the kernel through the Pallas interpreter);
    # "off" disables it.
    serve_mixed: str = "auto"
    # Factor-value dtype for the multifrontal QR front kernels. "auto" =
    # float32 on TPU (batched lax.linalg.qr in f64 measured 56x slower to
    # RUN and 9x slower to COMPILE than f32 on v5e — f64 is emulated),
    # float64 on CPU (exact parity for tests). The MF qrsol drivers append
    # fused f64 refinement steps when the factor is f32.
    qr_factor_dtype: str = "auto"
    # Refinement steps appended inside the MF qrsol device program when the
    # factor dtype is f32. Least-squares branch: CSNE steps (f64 gradient
    # SpMVs + two f32 R sweeps each — no eps32·‖r*‖ floor, ~κ²·eps32
    # contraction); minimum-norm branch: Qᵀ/sweep re-solve steps (the
    # system is consistent, so plain residual refinement converges).
    qr_refine: int = 3
    # Latency tier (tunneled TPU only): Cholesky factors below this lnz run
    # the native host engine — through a remote-runtime tunnel the per-launch
    # latency (~15-20 ms) dwarfs the flops of small factors, and the
    # framework's contract is "the fastest engine for the problem". Device
    # kernels remain the path for larger factors, for serving batches, and
    # on directly-attached TPUs (set 0 to disable the tier).
    latency_host_lnz: int = 4_000_000


config = Config()


def enable_x64() -> None:
    """Enable 64-bit values in JAX (required for f64 parity with rsparse)."""
    import jax

    jax.config.update("jax_enable_x64", True)


_cache_state = {"done": False}


def maybe_enable_compilation_cache() -> None:
    """Enable the persistent AOT cache once, keyed on the RESOLVED backend.

    Called from the device-path chokepoints (ops dispatch, factor/solve
    drivers) right before device work, where initializing the backend is
    free — never at import time, where `jax.default_backend()` would spin
    up the (possibly tunneled) runtime for host-only flows, and never from
    the JAX_PLATFORMS env string alone: a TPU-less host with the env unset
    still resolves to "cpu" and must not read/write AOT entries (loading
    entries written under different host-CPU feature sets trips XLA's
    machine-feature mismatch check — the `cpu_aot_loader` SIGILL-warning
    spew)."""
    if _cache_state["done"]:
        return
    import jax

    _cache_state["done"] = True
    if jax.default_backend() == "cpu":
        return
    _enable_compilation_cache(jax)


def _enable_compilation_cache(jax) -> None:
    """Persistent XLA compilation cache. Remote TPU compiles through the
    runtime tunnel cost tens of seconds each; the level-scheduled factor
    kernels compile a small ladder of shapes that this cache makes a
    one-time cost per machine."""
    import os
    cache = os.environ.get(
        "RSPARSE_TPU_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        # Persist EVERY compile, including sub-second ones: through a
        # remote-compile tunnel even a scalar convert_element_type costs
        # ~0.5 s of RPC, and plan building dispatches dozens of distinct
        # tiny programs — below the default 1.0 s threshold they were
        # recompiled every process (measured: ~48 s of a lusol_6 cold
        # start was 99 sub-second compiles).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # older jax without the knobs
        pass
