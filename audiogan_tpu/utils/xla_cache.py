"""Persistent XLA compilation cache (A5 runtime; SURVEY §1.2).

TPU (and CPU-farm test) compiles of the single-graph WGAN-GP step take
10-40 s; a persistent on-disk cache makes every re-launch (resume after
preemption, CLI re-runs, CI) hit warm. Enabled by default for CLI
entrypoints; tests point it at a repo-local dir via AUDIOGAN_XLA_CACHE.

Env contract:
  AUDIOGAN_XLA_CACHE=<dir>  use <dir>
  AUDIOGAN_XLA_CACHE=       (empty) disable
  unset                     default ~/.cache/audiogan_tpu/xla
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently enable jax's persistent compilation cache.

    Returns the cache dir in use, or None if disabled.
    """
    if path is None:
        path = os.environ.get("AUDIOGAN_XLA_CACHE")
    if path is None:
        path = str(Path.home() / ".cache" / "audiogan_tpu" / "xla")
    if not path:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache every graph that took real compile time; entry size is
    # irrelevant on local disk
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
