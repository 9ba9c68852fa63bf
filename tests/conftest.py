"""Test configuration: force an 8-device virtual CPU mesh.

The sandbox pre-registers a remote TPU backend ("axon") from
sitecustomize and pins ``jax_platforms`` via the config API, so an env
var alone does not switch tests to CPU. We set the XLA host-device
flag before any backend initialization and then override the platform
through ``jax.config`` (which wins over the environment).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: XLA:CPU compiles cost 10-40s each on this
# single-core host and tests re-jit the same programs every run; cached
# re-runs are milliseconds. (Safe to share the dir with TPU runs — the
# cache key includes the platform.)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
