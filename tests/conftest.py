"""Test config: run everything on CPU with 8 virtual devices so sharding
tests exercise real multi-device SPMD without TPU hardware (the 'multi-node
without a cluster' capability the reference lacks — SURVEY.md §4)."""

import os

# The TPU image pre-sets JAX_PLATFORMS and a sitecustomize that registers the
# hardware backend, so the env var alone is not enough — override the jax
# config directly before any backend is initialized.  Set EVSTORE_TEST_TPU=1
# to opt back in to hardware.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
if not os.environ.get("EVSTORE_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
