"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; per the build plan, sharding
logic is exercised on a virtual CPU mesh (jax.sharding.Mesh over 8 host
devices). The real-TPU path is exercised by bench.py instead.

Note: the environment may pin JAX_PLATFORMS to a TPU plugin via a site
module that reads it before conftest runs, so we must use
jax.config.update rather than the env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "long: reference-scale property runs (dpf_test.go's 1000 trials); "
        "skipped unless PIR_LONG_TESTS=1",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("PIR_LONG_TESTS"):
        return
    skip = pytest.mark.skip(reason="long property run; set PIR_LONG_TESTS=1")
    for item in items:
        if "long" in item.keywords:
            item.add_marker(skip)
