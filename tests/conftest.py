"""Test env: force CPU with 8 virtual devices BEFORE jax import.

SURVEY §4.5: distributed code paths are CI-tested on the JAX-standard fake
CPU device farm; the single real TPU chip is exercised by bench.py and the
scripts under tests_tpu/ (run manually), never by this suite.
"""

import os
from pathlib import Path

# Force-override: the ambient environment sets JAX_PLATFORMS=axon (the real
# TPU tunnel); running the eager-heavy unit suite over that tunnel is one RPC
# per op and ~100x slower. The TPU is exercised by bench.py and tests_tpu/.
os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent XLA compilation cache, shared with subprocess tests (fault
# injection, multihost) via the env var the library reads. The jit'd
# WGAN-GP step takes ~14 s to compile on this 1-core box and ~1.5 s to
# reload from cache; the suite compiles dozens of step variants, so a warm
# cache is the difference between ~25 min and <5 min of wall time.
os.environ.setdefault(
    "AUDIOGAN_XLA_CACHE",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"))
# Hush XLA:CPU AOT-loader feature-mismatch spam on cache loads (the
# "prefer-no-scatter/gather" pseudo-features; benign — same machine).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
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

from audiogan_tpu.utils.xla_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
