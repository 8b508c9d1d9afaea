"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-device sharding is exercised locally via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4) — strictly
better than the reference, whose sharding (Milvus num_shards=4) is never
tested.  Must run before the first ``import jax`` anywhere.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend unconditionally;
# jax.config (not the env var) is the override that sticks.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
