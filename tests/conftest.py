"""Test configuration: run every test on a virtual 8-device CPU mesh so the
multi-chip sharding paths compile and execute without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin can override JAX_PLATFORMS from the environment; force
# the CPU backend explicitly so tests run on the virtual 8-device mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def examples_dir():
    return os.path.join(REFERENCE_DIR, "examples")
