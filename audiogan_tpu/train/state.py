"""TrainState: the single pytree holding everything a step mutates.

Reference equivalent: G/D nn.Modules + two torch.optim.Adam instances +
manual seed state (SURVEY C14, C17). Here it is one flax PyTreeNode so the
whole training state checkpoints/restores/shards as a unit, and the jit'd
step is a pure (state, batch) -> (state, metrics) function with donated
state buffers.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from audiogan_tpu.config import Config
from audiogan_tpu.models import build_discriminator, build_generator


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array                 # int32 scalar
    params_g: Any
    params_d: Any
    opt_g: Any                      # optax state for G
    opt_d: Any                      # optax state for D
    base_key: jax.Array             # PRNG key DATA (uint32, via key_data) so
                                    # the whole state is a plain-array pytree
                                    # for orbax; wrap_key_data at use site


def make_optimizers(cfg: Config) -> tuple[optax.GradientTransformation,
                                          optax.GradientTransformation]:
    t = cfg.train
    # Adam(lr=1e-4, betas=(0.5, 0.9)) per WGAN-GP (SURVEY C14)
    return (optax.adam(t.lr_g, b1=t.beta1, b2=t.beta2),
            optax.adam(t.lr_d, b1=t.beta1, b2=t.beta2))


def create_train_state(cfg: Config, seed: int | None = None) -> TrainState:
    """Initialize both nets + both optimizers. Deterministic in the seed."""
    seed = cfg.train.seed if seed is None else seed
    g, d = build_generator(cfg), build_discriminator(cfg)
    opt_g, opt_d = make_optimizers(cfg)

    root = jax.random.key(seed)
    kg, kd, kshuf, kbase = jax.random.split(root, 4)
    b = 2  # init batch size is irrelevant to param shapes
    z = jnp.zeros((b, cfg.model.latent_dim), jnp.float32)
    x = jnp.zeros((b, cfg.data.clip_len, 1), jnp.float32)
    labels = (jnp.zeros((b,), jnp.int32) if cfg.data.num_classes else None)

    # jit the inits: on the tunneled TPU platform eager execution is one RPC
    # per op, making un-jitted flax init minutes-slow (verified 2026-08-16).
    if cfg.data.num_classes:
        params_g = jax.jit(g.init)(kg, z, labels)
        params_d = jax.jit(
            lambda k, v, lab: d.init({"params": k, "phase_shuffle": kshuf},
                                     v, lab))(kd, x, labels)
    else:
        params_g = jax.jit(g.init)(kg, z)
        params_d = jax.jit(
            lambda k, v: d.init({"params": k, "phase_shuffle": kshuf}, v)
        )(kd, x)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        opt_g=opt_g.init(params_g),
        opt_d=opt_d.init(params_d),
        base_key=jax.random.key_data(kbase),
    )


def param_count(tree: Any) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
