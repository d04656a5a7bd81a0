"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the multi-host test strategy recommended for JAX codebases (SURVEY.md
§4): real TPU pods are replaced by `--xla_force_host_platform_device_count=N`
fake devices so sharding/collective code paths compile and execute in CI.

NOTE: the session environment registers a TPU platform plugin that wins over
the JAX_PLATFORMS env var, so we must force CPU through jax.config before the
backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(2023)
