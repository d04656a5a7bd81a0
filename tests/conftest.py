"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Mirrors the multi-host test strategy recommended for JAX codebases (SURVEY.md §4):
real TPU pods are replaced by `--xla_force_host_platform_device_count=N` fake
devices so sharding/collective code paths compile and execute in CI.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(2023)
