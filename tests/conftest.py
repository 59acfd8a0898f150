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

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7)
