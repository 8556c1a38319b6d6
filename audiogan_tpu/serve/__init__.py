"""Serving subsystem: AOT-exported sampler artifacts + a local HTTP server.

The reference repo has no serving story ([R]: research code, sampling via a
script); this framework is built for production deployment (task brief), so
generation ships two ways:

- `audiogan export` (serve/export.py): bake trained G weights into a
  self-contained StableHLO artifact via jax.export — serving needs NO model
  code, NO checkpoint, NO flax; just jax + the artifact.
- `audiogan serve` (serve/server.py): a minimal HTTP inference server over
  an artifact (or a workdir, exported on the fly).
"""

from audiogan_tpu.serve.export import (ServedSampler, export_sampler,
                                       load_sampler)
from audiogan_tpu.serve.server import make_server

__all__ = ["export_sampler", "load_sampler", "ServedSampler", "make_server"]
