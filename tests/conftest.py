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


# The quick tier (`pytest -m quick`, ~70 s on the 1-core rig): every
# frozen golden vector, the host golden model, the native C++ engines,
# Paillier/cPIR/ASPIR, and the wire/service shell — i.e. all the
# bit-exactness and protocol checks that need neither the virtual mesh
# nor interpret-mode Pallas. The full suite (~20 min) stays the gate for
# device-path and mesh changes.
QUICK_FILES = {
    "test_golden_vectors",
    "test_slot",
    "test_dpf_host",
    "test_native",
    "test_wire_fuzz",
    "test_wire_service",
    "test_aspir",
    "test_encrypted",
    "test_paillier",
    "test_keyword",
    # 2-device virtual-mesh smoke: one batch through every MeshPirServer
    # fast/compat path at the serving-default key geometry, so a
    # serving-default flip can never ship with the mesh tier unrun
    # (the r4 regression class)
    "test_mesh_smoke",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "long: reference-scale property runs (dpf_test.go's 1000 trials); "
        "skipped unless PIR_LONG_TESTS=1",
    )
    config.addinivalue_line(
        "markers",
        "quick: fast bit-exactness tier (golden vectors + host/native "
        "engines + wire shell, no mesh/Pallas); run with -m quick",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in QUICK_FILES:
            item.add_marker(pytest.mark.quick)
    if os.environ.get("PIR_LONG_TESTS"):
        return
    skip = pytest.mark.skip(reason="long property run; set PIR_LONG_TESTS=1")
    for item in items:
        if "long" in item.keywords:
            item.add_marker(skip)
