"""Test harness configuration.

Runs the whole suite on a virtual 8-device CPU mesh (SURVEY.md §4: the
reference has no multi-node story; we validate multi-chip sharding on
`xla_force_host_platform_device_count=8` per the build contract). Bench runs
separately on real TPU hardware (bench.py).
"""

import os

# Must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU plugin (sitecustomize) force-registers itself; override here.
jax.config.update("jax_platforms", "cpu")

ASSETS = "/root/reference/tests/assets"
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.local_device_count()}"


def pytest_sessionfinish(session, exitstatus):
    """Unregister jax's gc callback before interpreter teardown.

    Round-2 CI wedge: with pytest-xdist, a worker could hang after [100%]
    with an unraisable KeyboardInterrupt inside `_xla_gc_callback` — jax
    registers the callback in `gc.callbacks`, and a late collection during
    interpreter shutdown raced the worker's exit. Tests are done at this
    point; dropping the callback (and any other gc hooks) is safe and
    makes shutdown deterministic."""
    import gc

    gc.callbacks.clear()


def laplacian_sprs(g):
    """g x g 5-point-Laplacian Sprs (SPD) — shared MF-scale test fixture."""
    from bench import laplacian_5pt
    from rsparse_tpu.data import Sprs

    n, p, i, x = laplacian_5pt(g)
    return Sprs(len(x), n, n, p, i, x)
