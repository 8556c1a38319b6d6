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

# The environment's sitecustomize (axon TPU plugin) sets jax_platforms to
# "axon,cpu" in jax.config at interpreter start — BEFORE this conftest — and
# config beats the env var, so the env assignment above is not enough.
# Override the CONFIG before anything initializes a backend (verified
# 2026-08-16: without this the "CPU" suite silently runs on the remote TPU,
# where default-precision conv noise breaks the float-exact golden tests).
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
