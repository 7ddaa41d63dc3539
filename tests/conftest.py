"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session so the
platform and device count take effect.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU via config
# (the env vars above still control the virtual device count).
jax.config.update("jax_platforms", "cpu")

# The reference computes everything in f32; low-precision matmul accumulation
# (the backend default) perturbs kNN distances and attention enough to break
# numeric parity, so tests pin f32.
jax.config.update("jax_default_matmul_precision", "highest")

# Most of the smoke tier's wall-clock is XLA re-compiling the same tiny CPU
# programs every run; the persistent compilation cache (keyed on the full
# HLO + compile options, so it can never serve stale code) cuts warm-run
# time roughly in half.  Programs with host callbacks (interpret-mode
# Pallas) skip the cache automatically.  NSDP_NO_COMPILE_CACHE=1 opts out
# (e.g. for cold-run timing).
if not os.environ.get("NSDP_NO_COMPILE_CACHE"):
    _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy tests (interpret-mode fused training, torch "
        "trajectory parity, flagship-scale rehearsals, multi-process "
        "launches) excluded from the smoke tier — run the smoke tier "
        "with `pytest -m 'not slow'` (~3.5 min warm / ~5.5 min on a "
        "cold compile cache, 1-core box), the full suite plain.",
    )


@pytest.fixture(autouse=True)
def _pin_matmul_precision():
    """The CLIs set ``jax_default_matmul_precision`` from their own flag
    (default 'default' since round 3); entry-point tests run the CLI mains
    in-process, which would leak the lower precision into later parity
    tests.  Restore the suite's 'highest' pin after every test."""
    yield
    if jax.config.jax_default_matmul_precision != "highest":
        jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
