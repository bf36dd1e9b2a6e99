"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip sharding is validated without a TPU pod by forcing the XLA host
platform to expose 8 devices ("multi-node without a cluster", SURVEY.md §4).
The axon TPU site hook re-forces JAX_PLATFORMS at interpreter start, so env
vars alone are not enough — we also update jax.config after import (wins over
the env) and set XLA_FLAGS before the backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
