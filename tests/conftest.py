import os

# The ambient environment pins JAX_PLATFORMS=axon (one real TPU chip through a
# tunnel) via a sitecustomize that imports jax at interpreter startup, so env
# vars are too late — override through jax.config instead. Tests run on a
# virtual 8-device CPU mesh; real-TPU benchmarks live in bench.py.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic graphs are expensive for
# XLA CPU to compile; cache them across processes/runs.
os.makedirs(os.path.expanduser("~/.cache/aleo_tpu_xla"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/aleo_tpu_xla"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xA1E0_7E57)
