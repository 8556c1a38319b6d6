"""Fused bias+activation conv epilogue (VERDICT r2 #1a).

conv1d_ba / conv_transpose1d_ba must equal the unfused composition
act(conv + b) on both tiers (pallas via interpreter mode, xla), and stay
arbitrary-order differentiable — the WGAN-GP double-backprop runs through
the critic's fused leaky_relu layers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from audiogan_tpu.kernels.conv import conv1d_ba, conv_transpose1d_ba
from audiogan_tpu.ops.conv import conv1d as xconv1d
from audiogan_tpu.ops.conv import conv_transpose1d as xconvt1d


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def _act(y, act):
    return {"none": lambda v: v,
            "relu": jax.nn.relu,
            "leaky_relu": lambda v: jax.nn.leaky_relu(v, 0.2),
            "tanh": jnp.tanh}[act](y)


ACTS = ["none", "relu", "leaky_relu", "tanh"]


@pytest.mark.parametrize("act", ACTS)
@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_conv1d_ba_matches_unfused(rng, act, impl):
    b, t, cin, cout, k, s = 2, 256, 64, 96, 25, 4
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1
    bias = _rand(rng, cout) * 0.5
    got = conv1d_ba(x, w, bias, stride=s, padding="SAME", act=act,
                    slope=0.2, impl=impl)
    want = _act(xconv1d(x, w, stride=s, padding="SAME", impl="xla") + bias,
                act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("act", ACTS)
@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_convt1d_ba_matches_unfused(rng, act, impl):
    b, t, cin, cout, k, s = 2, 16, 64, 48, 25, 4
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1
    bias = _rand(rng, cout) * 0.5
    got = conv_transpose1d_ba(x, w, bias, stride=s, act=act, slope=0.2,
                              impl=impl)
    want = _act(xconvt1d(x, w, stride=s, impl="xla") + bias, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv1d_ba_collapse_path(rng):
    """batch-collapsed small-T geometry with epilogue (bias rows must land
    on the stacked layout correctly)."""
    b, t, cin, cout, k, s = 4, 64, 512, 128, 25, 4
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1
    bias = _rand(rng, cout)
    got = conv1d_ba(x, w, bias, stride=s, padding="SAME",
                    act="leaky_relu", impl="pallas")
    want = jax.nn.leaky_relu(
        xconv1d(x, w, stride=s, padding="SAME", impl="xla") + bias, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv1d_ba_grads_order1_numerical(rng):
    """Numerical check_grads through the fused primitive (order 1; mean
    keeps the scalar output O(1) so f32 central differences resolve —
    eps=1e-4 on a sum-of-256 output drowns in rounding noise). Order-2
    correctness is pinned analytically below against the unfused
    composition."""
    b, t, cin, cout, k, s = 2, 32, 8, 8, 9, 2
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1
    bias = _rand(rng, cout) * 0.1

    def f(x_, w_, b_):
        return jnp.mean(conv1d_ba(x_, w_, b_, stride=s, padding="SAME",
                                  act="tanh", impl="xla") ** 2)

    check_grads(f, (x, w, bias), order=1, modes=("fwd", "rev"),
                atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("act", ACTS)
@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_conv1d_ba_jvp_and_grad2_match_unfused(rng, act, impl):
    """Analytic JVP and reverse-over-reverse (GP-shaped) equivalence of the
    fused primitive vs the unfused composition, both tiers. The unfused
    composition's own 2nd-order correctness is pinned by
    tests/models/test_grad2.py and tests/pallas/test_conv_kernels.py."""
    b, t, cin, cout, k, s = 2, 32, 8, 8, 9, 2
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1
    bias = _rand(rng, cout) * 0.1
    dx, dw, db = _rand(rng, b, t, cin), _rand(rng, k, cin, cout), \
        _rand(rng, cout)

    fused = lambda x_, w_, b_: conv1d_ba(
        x_, w_, b_, stride=s, padding="SAME", act=act, slope=0.2,
        impl=impl)
    unfused = lambda x_, w_, b_: _act(
        xconv1d(x_, w_, stride=s, padding="SAME", impl="xla") + b_, act)

    yf, tf = jax.jvp(fused, (x, w, bias), (dx, dw, db))
    yu, tu = jax.jvp(unfused, (x, w, bias), (dx, dw, db))
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tf), np.asarray(tu),
                               atol=1e-5, rtol=1e-4)

    def rr(f):  # d/dw of || d/dx sum(f^2) ||^2 — the GP shape
        inner = lambda x_, w_: jnp.sum(f(x_, w_, bias) ** 2)
        outer = lambda w_: jnp.sum(jax.grad(inner)(x, w_) ** 2)
        return jax.grad(outer)(w)

    np.testing.assert_allclose(np.asarray(rr(fused)),
                               np.asarray(rr(unfused)),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_convt1d_ba_grad2_matches_unfused(rng, impl):
    b, t, cin, cout, k, s = 2, 8, 8, 8, 9, 2
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1
    bias = _rand(rng, cout) * 0.1

    fused = lambda x_, w_: conv_transpose1d_ba(
        x_, w_, bias, stride=s, act="tanh", impl=impl)
    unfused = lambda x_, w_: jnp.tanh(
        xconvt1d(x_, w_, stride=s, impl="xla") + bias)

    def rr(f):
        inner = lambda x_, w_: jnp.sum(f(x_, w_) ** 2)
        outer = lambda w_: jnp.sum(jax.grad(inner)(x, w_) ** 2)
        return jax.grad(outer)(w)

    np.testing.assert_allclose(np.asarray(rr(fused)),
                               np.asarray(rr(unfused)),
                               atol=1e-4, rtol=1e-3)


def test_gp_style_double_backprop_matches_unfused(rng):
    """grad-of-grad-norm (the exact WGAN-GP composition) through the fused
    primitive equals the unfused composition."""
    b, t, cin, cout, k, s = 2, 64, 8, 16, 25, 4
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1
    bias = _rand(rng, cout) * 0.1

    def gp(score_fn, w_):
        def critic(x_):
            return jnp.sum(score_fn(x_, w_))
        g = jax.grad(critic)(x)
        return jnp.sum((jnp.sqrt(jnp.sum(g ** 2) + 1e-12) - 1.0) ** 2)

    fused = lambda x_, w_: conv1d_ba(x_, w_, bias, stride=s,
                                     padding="SAME", act="leaky_relu",
                                     impl="xla")
    unfused = lambda x_, w_: jax.nn.leaky_relu(
        xconv1d(x_, w_, stride=s, padding="SAME", impl="xla") + bias, 0.2)
    gf = jax.grad(lambda w_: gp(fused, w_))(w)
    gu = jax.grad(lambda w_: gp(unfused, w_))(w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gu),
                               atol=1e-5, rtol=1e-4)


def test_ba_vmap(rng):
    b, t, cin, cout, k, s = 2, 32, 8, 8, 9, 2
    xs = _rand(rng, 3, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1
    bias = _rand(rng, cout)
    f = lambda x_: conv1d_ba(x_, w, bias, stride=s, padding="SAME",
                             act="relu", impl="xla")
    got = jax.vmap(f)(xs)
    want = jnp.stack([f(xs[i]) for i in range(3)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
