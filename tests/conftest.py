"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no TPU pod needed, mirroring the
strategy in SURVEY.md §4) with x64 enabled so the engine can be checked
tightly against the C MuJoCo oracle.

Note: the session environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon (single tunneled TPU chip), so the env var is already
captured; we must override through jax.config instead.  XLA_FLAGS is read at
backend-init time, which has not happened yet when conftest runs.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
        # single-threaded LLVM codegen: the parallel split path segfaults
        # nondeterministically in backend_compile_and_load (jax 0.9.0,
        # ~once/15min of compiles; observed across 4 suite runs)
        + " --xla_cpu_parallel_codegen_split_count=1"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent XLA compile cache: robot-scale step programs are minutes of
# XLA:CPU compile each; re-runs of the suite hit the cache instead
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
