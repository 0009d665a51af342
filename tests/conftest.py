"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding logic is exercised on host CPU devices
(SURVEY.md section 4 "Implication for the build"); the real-chip path is
covered by bench.py and __graft_entry__.py.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon sitecustomize claims the TPU tunnel for every python process when
# PALLAS_AXON_POOL_IPS is set; tests must stay off the chip (and concurrent
# claims deadlock), so clear it for any python subprocesses tests may spawn.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(0)
