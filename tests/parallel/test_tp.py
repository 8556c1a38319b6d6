"""Tensor-parallel conv pair == unsharded stack (SURVEY §2.3 TP)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from audiogan_tpu.ops.conv import conv1d
from audiogan_tpu.parallel.tp import tp_conv1d_col, tp_conv1d_row

TP = 4


def test_col_row_pair_matches_global(rng):
    b, t, cin, mid, cout, k, s = 2, 256, 8, 32, 16, 9, 2
    r = lambda *sh: jnp.asarray(rng.standard_normal(sh).astype(np.float32))
    x = r(b, t, cin)
    w1 = r(k, cin, mid) * 0.1      # col-parallel: shard on Cout
    w2 = r(k, mid, cout) * 0.1     # row-parallel: shard on Cin

    def global_stack(x):
        h = jax.nn.relu(conv1d(x, w1, stride=s, impl="xla"))
        return conv1d(h, w2, stride=1, impl="xla")

    def local_stack(x, w1s, w2s):
        h = tp_conv1d_col(x, w1s, s, "model")
        h = jax.nn.relu(h)                      # elementwise on shards
        return tp_conv1d_row(h, w2s, 1, "model")

    mesh = Mesh(np.asarray(jax.devices()[:TP]), ("model",))
    fn = shard_map(local_stack, mesh=mesh,
                   in_specs=(P(), P(None, None, "model"),
                             P(None, "model", None)),
                   out_specs=P())
    got = jax.jit(fn)(x, w1, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(global_stack(x)),
                               atol=1e-5, rtol=1e-5)
