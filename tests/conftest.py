"""Test environment: force the CPU backend with 8 virtual devices so
sharding/collective tests run without TPU hardware (SURVEY.md §4's
distributed-testing stand-in). Must run before jax is imported anywhere.
"""

import os
import sys

# Force-override: the ambient environment exports JAX_PLATFORMS=axon (the
# TPU tunnel); tests must run on the virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The ambient axon TPU plugin forces itself regardless of JAX_PLATFORMS;
# jax.config.update is the override that sticks.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: reference-scale soak tests (30k-iteration fuzz, ~100MB "
        "corpus gates); run with -m slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m"):
        return
    import pytest
    skip = pytest.mark.skip(reason="slow soak; run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
