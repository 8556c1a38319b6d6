"""Test env: force CPU with 8 virtual devices BEFORE jax import.

SURVEY §4.5: distributed code paths are CI-tested on the JAX-standard fake
CPU device farm; the single real TPU chip is exercised by bench.py and the
scripts under tests_tpu/ (run manually), never by this suite.
"""

import os

# Force-override: the ambient environment sets JAX_PLATFORMS=axon (the real
# TPU tunnel); running the eager-heavy unit suite over that tunnel is one RPC
# per op and ~100x slower. The TPU is exercised by bench.py and tests_tpu/.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
