"""Pallas weight-grad kernel (VERDICT r2 #1b): the stacked-row dW kernel
vs the phase-grouped einsum tier, directly and through jax.grad, plus the
GP-shaped reverse-over-reverse composition (whose outer step differentiates
THROUGH the wgrad primitive's transposes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogan_tpu.kernels.conv import (conv1d_wgrad_lowered,
                                       convt1d_wgrad_lowered, _same_pads)
from audiogan_tpu.ops.conv import conv1d as xconv1d
from audiogan_tpu.ops.conv import conv_transpose1d as xconvt1d


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


CASES = [
    # (B, T, Cin, Cout, K, s)
    (2, 256, 64, 128, 25, 4),
    (4, 64, 512, 128, 25, 4),   # n_ci blocking
    (2, 48, 256, 256, 25, 4),
    (1, 64, 32, 64, 9, 2),
    (3, 100, 64, 32, 25, 4),    # T % s != 0
]


@pytest.mark.parametrize("b,t,cin,cout,k,s", CASES)
def test_conv1d_wgrad_pallas_matches_xla(rng, b, t, cin, cout, k, s):
    x = _rand(rng, b, t, cin)
    t_out, lo, hi = _same_pads(t, k, s)
    ct = _rand(rng, b, t_out, cout)
    got = conv1d_wgrad_lowered(x, ct, s, lo, hi, k, "pallas")
    want = conv1d_wgrad_lowered(x, ct, s, lo, hi, k, "xla")
    assert got.shape == want.shape == (k, cin, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-4)


@pytest.mark.parametrize("b,t,cin,cout,k,s", [
    (2, 16, 64, 32, 25, 4),
    (4, 16, 512, 64, 25, 4),
    (2, 64, 64, 64, 9, 2),
    (2, 12, 32, 64, 25, 7),
])
def test_convt1d_wgrad_pallas_matches_xla(rng, b, t, cin, cout, k, s):
    x = _rand(rng, b, t, cin)
    out_len = t * s
    ct = _rand(rng, b, out_len, cout)
    lo = (k - 1) // 2
    got = convt1d_wgrad_lowered(x, ct, s, lo, out_len, k, "pallas")
    want = convt1d_wgrad_lowered(x, ct, s, lo, out_len, k, "xla")
    assert got.shape == want.shape == (k, cin, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-4)


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_grad_through_conv_uses_wgrad(rng, impl):
    """jax.grad wrt w routes through the wgrad primitive on both tiers and
    agrees across them."""
    b, t, cin, cout, k, s = 2, 128, 64, 64, 25, 4
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1
    ct = _rand(rng, b, t // s, cout)

    def loss(w_, impl_):
        y = xconv1d(x, w_, stride=s, padding="SAME", impl=impl_)
        return jnp.sum(y * ct)

    gp = jax.grad(lambda w_: loss(w_, impl))(w)
    gx = jax.grad(lambda w_: loss(w_, "xla"))(w)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=2e-3, rtol=2e-4)


def test_gp_double_backprop_through_wgrad(rng):
    """The D-update gradient: d/dw of ||d/dx D(x)||^2 — the outer grad
    differentiates THROUGH transpose_x, then emits wgrad nodes; with
    impl=pallas those lower to the stacked-row kernel. Must match xla."""
    b, t, cin, cout, k, s = 2, 64, 32, 32, 9, 2
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1

    def gp(w_, impl_):
        def score(x_):
            y = xconv1d(x_, w_, stride=s, padding="SAME", impl=impl_)
            return jnp.sum(jnp.tanh(y))
        g = jax.grad(score)(x)
        return jnp.sum(g ** 2)

    gp_p = jax.grad(lambda w_: gp(w_, "pallas"))(w)
    gp_x = jax.grad(lambda w_: gp(w_, "xla"))(w)
    np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_x),
                               atol=2e-3, rtol=2e-3)


def test_wgrad_vmem_evicts_wide_accumulator(rng):
    """The 512->1024 flagship D layer's dW accumulator (q=7, lanes 1024x256
    f32) blew Mosaic's 16M scoped-vmem limit once padding + revisit
    double-buffering are counted (2026-08-18 compile OOM); the budget model
    must evict it to the XLA tier, and the lowered call must still be
    correct through the fallback."""
    from audiogan_tpu.kernels.conv import _conv1d_wgrad_pallas

    b, t, cin, cout, k, s = 2, 256, 512, 1024, 25, 4
    x = _rand(rng, b, t, cin)
    t_out, lo, hi = _same_pads(t, k, s)
    ct = _rand(rng, b, t_out, cout)
    assert _conv1d_wgrad_pallas(x, ct, s, lo, k) is None
    got = conv1d_wgrad_lowered(x, ct, s, lo, hi, k, "pallas")
    want = conv1d_wgrad_lowered(x, ct, s, lo, hi, k, "xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-4)


def test_wgrad_vmap_defensive(rng):
    b, t, cin, cout, k, s = 2, 32, 32, 32, 9, 2
    xs = _rand(rng, 3, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1

    def g(x_):
        return jax.grad(
            lambda w_: jnp.sum(xconv1d(x_, w_, stride=s, padding="SAME",
                                       impl="xla") ** 2))(w)

    got = jax.vmap(g)(xs)
    want = jnp.stack([g(xs[i]) for i in range(3)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
