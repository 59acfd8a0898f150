"""Test env: force a pure-CPU jax with 8 virtual devices so sharding /
collective tests run without TPU hardware (SURVEY.md §4 "multi-node tests on
CPU simulation").

On this machine a sitecustomize registers an 'axon' TPU PJRT plugin in every
python process and force-sets jax_platforms to "axon,cpu" — so the env var
JAX_PLATFORMS alone is not honored.  Overriding the jax config *after* import
(but before first backend use) reliably pins tests to CPU.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

# background bucket pre-warming (utils.prewarm) would contend with the
# 2-core CI hosts and add nondeterministic compile threads; CPU compiles
# are cheap enough that tests never need it
os.environ.setdefault("OPENVSLAM_TPU_PREWARM", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The suite compiles hundreds of large XLA:CPU programs in one process;
    past ~130 tests the accumulated JIT state makes the NEXT compilation
    segfault inside backend_compile_and_load (reproducible at
    test_solvers.py::test_pnp_epnp_exact_and_minimal, which passes in
    isolation).  Dropping the caches at module boundaries keeps the
    process under the limit; cross-module executable reuse is minimal, so
    the wall-time cost is small."""
    yield
    jax.clear_caches()
