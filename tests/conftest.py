"""Test configuration: force CPU backend with 8 virtual devices and x64.

Multi-device sharding tests run on a simulated 8-device CPU mesh
(``xla_force_host_platform_device_count``), mirroring how the driver
validates the multi-chip path.  float64 is enabled because the SHT and C_l
accuracy contracts are defined in double precision.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_ENABLE_X64"] = "1"

# A pytest plugin may have imported jax before this file ran, locking in the
# wrong settings — update the live config as well.
import jax

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass


# --- test tiers -----------------------------------------------------------
# Default tier: fast (~3 min on one otherwise-idle core; the heavyweight
# validation tests are marked `slow`).  The slow tier runs with --runslow
# (or CORA_TPU_RUN_SLOW=1) — CI runs both tiers.

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (long end-to-end tier)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test (opt in via --runslow)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("CORA_TPU_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
