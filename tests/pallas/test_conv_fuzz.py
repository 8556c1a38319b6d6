"""Seeded random-geometry fuzz over the conv primitives: Pallas tier ==
XLA tier for values AND both first-order gradients at every sampled
(b, t, cin, cout, k, s). The fixed-geometry tests pin the known routing
bands; this sweep guards the tile/blocking edge cases in between
(SURVEY §4.2 equivalence strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogan_tpu.ops.conv import conv1d as xconv1d
from audiogan_tpu.ops.conv import conv_transpose1d as xconvt1d


def _geometries(seed, n):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        k = int(rng.choice([5, 9, 25]))
        s = int(rng.choice([1, 2, 3, 4, 5, 7]))
        cin = int(rng.choice([8, 16, 32, 64, 128]))
        cout = int(rng.choice([8, 16, 32, 64, 128]))
        b = int(rng.integers(1, 5))
        t = int(rng.integers(max(k, 16), 192))
        out.append((b, t, cin, cout, k, s))
    return out


def _check(fn_args, fn):
    got = fn("pallas", *fn_args)
    want = fn("xla", *fn_args)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=2e-4, rtol=2e-4, err_msg="value")
    for name, g, w in zip(("dx", "dw"), got[1], want[1]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


@pytest.mark.parametrize("geom", _geometries(0, 8))
def test_conv1d_fuzz(rng, geom):
    b, t, cin, cout, k, s = geom
    x = jnp.asarray(rng.standard_normal((b, t, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, cin, cout)).astype(np.float32)
                    ) * 0.1

    def run(impl, x, w):
        f = lambda x_, w_: jnp.sum(
            xconv1d(x_, w_, stride=s, padding="SAME", impl=impl) ** 2)
        return (xconv1d(x, w, stride=s, padding="SAME", impl=impl),
                jax.grad(f, argnums=(0, 1))(x, w))

    _check((x, w), run)


@pytest.mark.parametrize("geom", _geometries(1, 8))
def test_convt1d_fuzz(rng, geom):
    b, t, cin, cout, k, s = geom
    t = max(4, t // 8)                   # convT input is pre-upsample
    x = jnp.asarray(rng.standard_normal((b, t, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, cin, cout)).astype(np.float32)
                    ) * 0.1

    def run(impl, x, w):
        f = lambda x_, w_: jnp.sum(
            xconvt1d(x_, w_, stride=s, impl=impl) ** 2)
        return (xconvt1d(x, w, stride=s, impl=impl),
                jax.grad(f, argnums=(0, 1))(x, w))

    _check((x, w), run)
