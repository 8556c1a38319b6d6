"""AOT sampler export (SURVEY C16 taken to deployment).

`export_sampler` traces the full generation graph — z = normal(key) -> G ->
inverse mu-law — with the trained params CLOSED OVER, so they are baked into
the StableHLO as constants: the artifact is self-contained (weights + graph
+ platform checks in one file). `load_sampler` needs only jax; no flax, no
model code, no checkpoint tree.

Artifacts are per-platform (jax.export records the lowering platform) and
per-batch (static shapes): choose `num` for the serving batch. Fidelity:
calling the artifact equals calling the live jit'd sampler with the same
key on the same backend within float tolerance (separately-compiled graphs
may fuse differently), and repeated artifact calls are bit-identical
(tests/serve/test_export.py).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from audiogan_tpu.config import Config

_ARTIFACT = "sampler.stablehlo"
_META = "meta.json"


def _build_closed_sampler(cfg: Config, params_g, num: int):
    """fn(key_data[, labels]) -> waves [num, clip_len] with params baked in."""
    from audiogan_tpu.models import build_generator
    from audiogan_tpu.ops.mulaw import mu_law_expand

    g = build_generator(cfg)
    conditional = cfg.data.num_classes > 0

    def sampler(key_data, labels=None):
        key = jax.random.wrap_key_data(key_data)
        z = jax.random.normal(key, (num, cfg.model.latent_dim))
        y = (g.apply(params_g, z, labels) if conditional
             else g.apply(params_g, z))[..., 0]
        if cfg.data.mu_law:
            y = mu_law_expand(y, cfg.data.mu)
        return y

    return sampler, conditional


def export_sampler(cfg: Config, params_g, num: int,
                   out_dir: str | Path) -> Path:
    """Serialize the seeded sampler for the CURRENT backend into out_dir."""
    from jax import export as jax_export

    sampler, conditional = _build_closed_sampler(cfg, params_g, num)
    kd = jax.random.key_data(jax.random.key(0))
    if conditional:
        exp = jax_export.export(jax.jit(sampler))(
            kd, np.zeros((num,), np.int32))
    else:
        exp = jax_export.export(jax.jit(sampler))(kd)

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / _ARTIFACT).write_bytes(exp.serialize())
    (out_dir / _META).write_text(json.dumps({
        "num": num,
        "clip_len": cfg.data.clip_len,
        "sample_rate": cfg.data.sample_rate,
        "num_classes": cfg.data.num_classes,
        "platforms": list(exp.platforms),
        "model": cfg.name,
        "config": json.loads(cfg.to_json()),
    }, indent=1))
    return out_dir


class ServedSampler:
    """A loaded artifact: seeded, deterministic generation, no model code."""

    def __init__(self, art_dir: str | Path):
        from jax import export as jax_export

        d = Path(art_dir)
        self.meta = json.loads((d / _META).read_text())
        self._exp = jax_export.deserialize((d / _ARTIFACT).read_bytes())
        self._call = jax.jit(self._exp.call)

    @property
    def num(self) -> int:
        return self.meta["num"]

    @property
    def sample_rate(self) -> int:
        return self.meta["sample_rate"]

    @property
    def conditional(self) -> bool:
        return self.meta["num_classes"] > 0

    def generate(self, seed: int,
                 labels: np.ndarray | None = None) -> np.ndarray:
        """float32 [num, clip_len]; same (seed, labels) -> same bytes."""
        kd = jax.random.key_data(jax.random.key(seed))
        if self.conditional:
            if labels is None:
                labels = np.arange(self.num, dtype=np.int32) \
                    % self.meta["num_classes"]
            lab = np.asarray(labels, np.int32)
            if lab.shape != (self.num,):
                raise ValueError(
                    f"labels must have shape ({self.num},), got {lab.shape}")
            return np.asarray(self._call(kd, lab))
        if labels is not None:
            raise ValueError("labels passed to an unconditional artifact")
        return np.asarray(self._call(kd))


def load_sampler(art_dir: str | Path) -> ServedSampler:
    return ServedSampler(art_dir)
