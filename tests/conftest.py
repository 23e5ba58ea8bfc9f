"""Test configuration.

Tests run on CPU with 8 virtual devices (the standard JAX recipe for
multi-chip testing without a pod, SURVEY.md §4.4) and with x64 enabled
so op unit tests can compare against the reference's double-precision
oracles at ~1e-12.  Library code always derives dtypes from its inputs,
so enabling x64 here does not change f32 behavior.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# TPU lane: `TPUFLOW_TEST_TPU=1 pytest -m tpu` compiles and runs the
# Pallas kernels on the real chip (tests/test_tpu_kernels.py) — the
# round-1/2 regression class (Mosaic-only miscompiles/crashes) that
# interpret-mode CPU tests cannot catch
TPU_MODE = bool(os.environ.get("TPUFLOW_TEST_TPU"))

if not TPU_MODE:
    # force CPU via jax.config: this container's sitecustomize registers
    # the axon TPU plugin and pins jax_platforms=axon, so the env var
    # alone is not enough
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: repeat test runs skip XLA compilation
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache-cpu")
else:
    from tpuflow.utils.cache import default_cache_dir

    jax.config.update("jax_compilation_cache_dir", default_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: compiled-on-TPU kernel tests (need a real chip; "
        "run with TPUFLOW_TEST_TPU=1 pytest -m tpu)")


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        skip_cpu = pytest.mark.skip(
            reason="TPU lane runs only tpu-marked tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip_cpu)
    else:
        skip_tpu = pytest.mark.skip(
            reason="needs a TPU (TPUFLOW_TEST_TPU=1 pytest -m tpu)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip_tpu)

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


@pytest.fixture(scope="session")
def ops_goldens():
    return {
        tag: dict(np.load(os.path.join(GOLDENS, f"ops_{tag}.npz")))
        for tag in ("a", "b")
    }


@pytest.fixture(scope="session")
def solver_goldens():
    return dict(np.load(os.path.join(GOLDENS, "solvers.npz")))
