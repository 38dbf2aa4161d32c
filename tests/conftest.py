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


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="also run tests marked slow (e2e / NBV / batch-train)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running e2e/NBV/batch tests, deselected by default so the "
        "1-core sandbox suite stays under ~5 min; run with --slow or -m slow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or config.getoption("-m"):
        return  # explicit opt-in (--slow) or an explicit -m expression
    skip = pytest.mark.skip(reason="slow: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
