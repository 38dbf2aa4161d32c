"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; shardings are validated on
XLA's host-platform virtual devices instead.  The sandbox preloads jax via
sitecustomize with JAX_PLATFORMS=axon, so the platform must be overridden
through jax.config (env vars are read before conftest runs).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="upstream reference data not mounted"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
