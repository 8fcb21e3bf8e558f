"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual 8-device CPU mesh (the standard
JAX answer to testing meshes without a pod) — see SURVEY.md §4.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) imports jax at interpreter start and
# pins jax_platforms before env vars are consulted — override via config.
# GRASP_TPU_TESTS=1 skips the override so the TPU-marked kernel tests run on
# the real chip (scripts/run_tpu_tests.sh).
if os.environ.get("GRASP_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
