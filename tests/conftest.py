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
# Do NOT enable the persistent compile cache for CPU tests: XLA:CPU AOT
# deserialization on this host loads executables whose recorded machine
# features (+prefer-no-scatter/+prefer-no-gather, AMX set) mismatch the
# host feature list and can SIGILL/segfault (observed: segv inside
# compilation_cache.get_executable_and_time). The cache stays TPU-only
# (bench.py / __graft_entry__.entry), where it is load-bearing.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
