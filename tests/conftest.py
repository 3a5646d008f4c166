"""Test configuration: force CPU with 8 virtual devices and 64-bit mode.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count), the same strategy the
driver uses for its multi-chip dry-run.
"""

import os

# NOTE: in this environment jax may already be imported by an interpreter
# startup hook, so plain env vars are too late; jax.config still works as
# long as the backend has not been initialised yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: do not enable jax_compilation_cache_dir here — in this environment
# CPU AOT cache entries are compiled with mismatched machine features and
# reload with SIGILL-risk warnings.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def small_mesh(ny=9, nz=7, rng=None, graded=True):
    """A small graded tensor mesh with 2 'air' rows for operator tests."""
    rng = rng or np.random.default_rng(42)
    if graded:
        dy = 100.0 * 2.0 ** rng.integers(0, 3, size=ny)
        dz = 80.0 * 2.0 ** rng.integers(0, 3, size=nz)
    else:
        dy = 100.0 * np.ones(ny)
        dz = 80.0 * np.ones(nz)
    return dy.astype(float), dz.astype(float)


@pytest.fixture
def examples_dir():
    return "/root/reference/HMCMT/examples"
