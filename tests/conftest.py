"""Test configuration: run every test on a virtual 8-device CPU mesh so the
multi-chip sharding paths compile and execute without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA-compile-bound (dozens of real-model compiles on a 1-CPU
# box).  Backend optimization buys runtime the tests don't need: level 0
# halves compile time (measured 220 s -> 108 s on the FG train step) and
# changes no semantics -- equivalence tests compare paths compiled under the
# same flags, and goldens carry tolerances.  Opt out: SUITE_FULL_OPT=1.
if "xla_backend_optimization_level" not in _flags \
        and os.environ.get("SUITE_FULL_OPT") != "1":
    _flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = _flags
# Persistent compilation cache: dedupes identical compiles across test
# modules within one run (the serving tests rebuild the same small-config
# engines) and makes re-runs compile-free.  ~tens of MB; delete freely.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "sketchyscene_tpu_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

# The axon TPU plugin can override JAX_PLATFORMS from the environment; force
# the CPU backend explicitly so tests run on the virtual 8-device mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"

# Modules dominated by XLA compiles of real models (minutes each on the
# single-CPU test box).  `-m "not heavy"` is the documented fast gate: the
# pure-Python/oracle/small-op modules complete in a couple of minutes.
HEAVY_MODULES = {
    "test_pipeline", "test_pipeline_serving", "test_e2e_reference_examples",
    "test_dtype_policy", "test_backbones", "test_inception", "test_train",
    "test_rmi", "test_fg_gan", "test_fg_gan_variants", "test_bg_gan",
    "test_goldens", "test_procedures", "test_converter_and_viz",
    "test_pallas_mlstm", "test_data_and_harness", "test_bench_resilience",
    "test_real_weight_parity",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "heavy: compile-bound model tests (fast gate: -m 'not heavy')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in HEAVY_MODULES:
            item.add_marker(pytest.mark.heavy)


@pytest.fixture(scope="session")
def reference_dir():
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def examples_dir():
    return os.path.join(REFERENCE_DIR, "examples")
