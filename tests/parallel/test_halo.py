"""Context-parallel halo-exchange correctness (SURVEY §4.5, §5): time-sharded
ops over a 4-way 'cp' mesh must equal the unsharded ops exactly."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from audiogan_tpu.ops.conv import conv1d, conv_transpose1d
from audiogan_tpu.ops.phase_shuffle import phase_shuffle
from audiogan_tpu.parallel.halo import (cp_conv1d, cp_conv_transpose1d,
                                        cp_phase_shuffle)

CP = 4


@pytest.fixture
def mesh():
    devs = np.asarray(jax.devices()[:CP]).reshape(CP)
    return Mesh(devs, ("cp",))


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("k,s", [(25, 4), (9, 2), (25, 1), (5, 5)])
def test_cp_conv1d_matches_global(rng, mesh, k, s):
    b, t, cin, cout = 2, 640, 16, 8
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1

    want = conv1d(x, w, stride=s, padding="SAME", impl="xla")

    fn = shard_map(
        functools.partial(cp_conv1d, stride=s, axis="cp"),
        mesh=mesh, in_specs=(P(None, "cp", None), P()),
        out_specs=P(None, "cp", None))
    got = jax.jit(fn)(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,s", [(25, 4), (9, 2), (5, 5)])
def test_cp_convt_matches_global(rng, mesh, k, s):
    b, t, cin, cout = 2, 64, 16, 8
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1

    want = conv_transpose1d(x, w, stride=s, impl="xla")

    fn = shard_map(
        functools.partial(cp_conv_transpose1d, stride=s, axis="cp"),
        mesh=mesh, in_specs=(P(None, "cp", None), P()),
        out_specs=P(None, "cp", None))
    got = jax.jit(fn)(x, w)
    assert got.shape == want.shape == (b, t * s, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_cp_phase_shuffle_matches_global(rng, mesh):
    b, t, c, rad = 4, 256, 3, 2
    x = _rand(rng, b, t, c)
    key = jax.random.key(3)

    want = phase_shuffle(x, key, rad)

    fn = shard_map(
        functools.partial(cp_phase_shuffle, rad=rad, axis="cp"),
        mesh=mesh, in_specs=(P(None, "cp", None), P()),
        out_specs=P(None, "cp", None))
    got = jax.jit(fn)(x, key)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cp_conv_stack_end_to_end(rng, mesh):
    """A D-like stack (conv s4 + conv s4) sharded over cp equals global."""
    b, t = 2, 1024
    x = _rand(rng, b, t, 8)
    w1 = _rand(rng, 25, 8, 16) * 0.1
    w2 = _rand(rng, 25, 16, 32) * 0.1

    def global_stack(x):
        h = jax.nn.leaky_relu(conv1d(x, w1, stride=4, impl="xla"), 0.2)
        return jax.nn.leaky_relu(conv1d(h, w2, stride=4, impl="xla"), 0.2)

    def local_stack(x, w1, w2):
        h = jax.nn.leaky_relu(cp_conv1d(x, w1, 4, "cp"), 0.2)
        return jax.nn.leaky_relu(cp_conv1d(h, w2, 4, "cp"), 0.2)

    fn = shard_map(local_stack, mesh=mesh,
                   in_specs=(P(None, "cp", None), P(), P()),
                   out_specs=P(None, "cp", None))
    np.testing.assert_allclose(np.asarray(jax.jit(fn)(x, w1, w2)),
                               np.asarray(global_stack(x)),
                               atol=1e-5, rtol=1e-5)
