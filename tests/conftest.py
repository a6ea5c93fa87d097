import os

# Force a deterministic CPU platform with 8 virtual devices for sharding tests.
# The real-TPU benchmarks live in bench.py, not the test suite.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xA1E0_7E57)
