"""Equivalence of Pallas conv kernels vs the pure-XLA reference path
(SURVEY §4.2) — values, 1st-order grads, and the GP-critical 2nd-order
composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogan_tpu.kernels import conv1d as pconv1d
from audiogan_tpu.kernels import conv_transpose1d as pconvt1d
from audiogan_tpu.ops.conv import conv1d as xconv1d
from audiogan_tpu.ops.conv import conv_transpose1d as xconvt1d


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


CASES = [
    # (B, T, Cin, Cout, K, s)
    (2, 256, 64, 128, 25, 4),
    (1, 64, 16, 16, 9, 2),
    (2, 100, 32, 8, 7, 4),    # T not divisible by stride
    (1, 512, 8, 256, 25, 1),  # stride 1
    (2, 48, 256, 256, 25, 4), # channel blocking path (cin=cout=256)
    (4, 64, 512, 128, 25, 4), # batch-collapsed rows + n_ci=2 blocking
    (3, 100, 64, 32, 25, 4),  # batch-collapsed, T % s != 0
]


@pytest.mark.parametrize("b,t,cin,cout,k,s", CASES)
def test_conv1d_matches_xla(rng, b, t, cin, cout, k, s):
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1
    got = pconv1d(x, w, s, "SAME")
    want = xconv1d(x, w, stride=s, padding="SAME", impl="xla")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("b,t,cin,cout,k,s", [
    (2, 16, 64, 32, 25, 4),
    (1, 32, 16, 16, 9, 2),
    (2, 12, 32, 8, 25, 7),
    (1, 20, 8, 8, 5, 3),
    (4, 16, 512, 64, 25, 4),  # batch-collapsed rows + n_ci=2 blocking
])
def test_convt_matches_xla(rng, b, t, cin, cout, k, s):
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1
    got = pconvt1d(x, w, s)
    want = xconvt1d(x, w, stride=s, impl="xla")
    assert got.shape == want.shape == (b, t * s, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_auto_impl_matches_xla(rng):
    """impl='auto' routes per-geometry (kernels/conv.py _auto_*); values
    must agree with the xla tier on both routing outcomes."""
    for b, t, cin, cout, k, s in [(4, 64, 512, 128, 25, 4),    # -> pallas
                                  (2, 4096, 64, 128, 25, 4)]:  # -> xla
        x = _rand(rng, b, t, cin)
        w = _rand(rng, k, cin, cout) * 0.1
        got = xconv1d(x, w, stride=s, padding="SAME", impl="auto")
        want = xconv1d(x, w, stride=s, padding="SAME", impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
    for b, t, cin, cout, k, s in [(2, 512, 64, 32, 25, 4),   # -> pallas
                                  (2, 16, 64, 32, 25, 4)]:   # -> xla
        x = _rand(rng, b, t, cin)
        w = _rand(rng, k, cin, cout) * 0.1
        got = xconvt1d(x, w, stride=s, impl="auto")
        want = xconvt1d(x, w, stride=s, impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_conv1d_small_cin_falls_back(rng):
    # Cin=1 (waveform input layer) takes the XLA path but same API/result
    x = _rand(rng, 2, 64, 1)
    w = _rand(rng, 9, 1, 16)
    np.testing.assert_allclose(
        np.asarray(pconv1d(x, w, 4, "SAME")),
        np.asarray(xconv1d(x, w, stride=4, padding="SAME", impl="xla")),
        atol=1e-5)


def test_conv1d_grads_match_xla(rng):
    b, t, cin, cout, k, s = 1, 64, 16, 16, 9, 4
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1

    def loss_p(x, w):
        return jnp.sum(pconv1d(x, w, s, "SAME") ** 2)

    def loss_x(x, w):
        return jnp.sum(xconv1d(x, w, stride=s, impl="xla") ** 2)

    gx_p, gw_p = jax.grad(loss_p, argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss_x, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               atol=1e-3, rtol=1e-3)


def test_convt_grads_match_xla(rng):
    b, t, cin, cout, k, s = 1, 16, 16, 16, 9, 4
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.1

    gx_p, gw_p = jax.grad(lambda x, w: jnp.sum(pconvt1d(x, w, s) ** 2),
                          argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(
        lambda x, w: jnp.sum(xconvt1d(x, w, stride=s, impl="xla") ** 2),
        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               atol=1e-3, rtol=1e-3)


def test_second_order_gp_composition_matches_xla(rng):
    """THE SURVEY R2 test: d/dw of ||d/dx D(x)|| through the Pallas conv."""
    b, t, cin, cout, k, s = 1, 32, 16, 16, 9, 2
    x = _rand(rng, b, t, cin)
    w = _rand(rng, k, cin, cout) * 0.3

    def make_gp(conv):
        def d_of_x(x, w):
            h = conv(x, w)
            return jnp.sum(jnp.tanh(h))

        def gp(w):
            g = jax.grad(d_of_x, argnums=0)(x, w)
            return jnp.sum(jnp.square(g))

        return gp

    gp_p = make_gp(lambda x, w: pconv1d(x, w, s, "SAME"))
    gp_x = make_gp(lambda x, w: xconv1d(x, w, stride=s, impl="xla"))
    v_p, v_x = gp_p(w), gp_x(w)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-4)
    g_p = jax.grad(gp_p)(w)
    g_x = jax.grad(gp_x)(w)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=1e-3, rtol=1e-3)


def test_auto_router_bands():
    """The measured routing tables (BASELINE.md r3s6 step-level band
    ablations): conv1d fwd band EMPTY (old 128<=t_out<=512 band cost 1.6%
    at step level), convt m_out>=64 band kept (+9.1%); off-stride-4
    geometries and the wgrad contraction stay XLA."""
    import audiogan_tpu.kernels.conv as kc
    assert kc._auto_conv1d_impl(64, 256, 128, 256, 4) == "xla"   # band empty
    assert kc._auto_conv1d_impl(64, 1024, 64, 128, 4) == "xla"   # off-band
    assert kc._auto_conv1d_impl(64, 256, 128, 256, 7) == "xla"   # off-stride
    # the band globals stay overridable for step-level A/Bs
    old = kc._AUTO_CONV_BAND_LO, kc._AUTO_CONV_BAND_HI
    kc._AUTO_CONV_BAND_LO, kc._AUTO_CONV_BAND_HI = 128, 512
    try:
        assert kc._auto_conv1d_impl(64, 256, 128, 256, 4) == "pallas"
    finally:
        kc._AUTO_CONV_BAND_LO, kc._AUTO_CONV_BAND_HI = old
    assert kc._auto_convt1d_impl(64, 256, 256, 128, 4) == "pallas"
    assert kc._auto_convt1d_impl(64, 16, 1024, 512, 4) == "xla"  # tiny grid
    assert kc._auto_convt1d_impl(64, 2352, 256, 128, 5) == "xla"  # music
    # generation-regime batches (sampler A/B 2026-08-17: xla wins every
    # layer at b >= 512) -> XLA even in the otherwise-pallas bands
    assert kc._auto_conv1d_impl(4096, 256, 128, 256, 4) == "xla"
    assert kc._auto_convt1d_impl(512, 256, 256, 128, 4) == "xla"
    assert kc._auto_convt1d_impl(511, 256, 256, 128, 4) == "pallas"


@pytest.mark.parametrize("cap,collapse", [(1024, True), (2048, True),
                                          (1024, False)])
def test_tile_cap_and_collapse_knobs(rng, monkeypatch, cap, collapse):
    """The roof-hunt knobs (AUDIOGAN_T_TILE_CAP / universal batch-collapse)
    change tiling only, never values — pinned so whatever defaults the
    on-HW sweep picks stay covered."""
    import audiogan_tpu.kernels.conv as kc
    monkeypatch.setattr(kc, "_T_TILE_CAP", cap)
    if collapse:
        monkeypatch.setattr(kc, "_COLLAPSE_MAX_CONV", 10 ** 9)
        monkeypatch.setattr(kc, "_COLLAPSE_MAX_CONVT", 10 ** 9)
    x = _rand(rng, 3, 1024, 64)
    w = _rand(rng, 25, 64, 128) * 0.1
    got = pconv1d(x, w, 4, "SAME")
    want = xconv1d(x, w, stride=4, padding="SAME", impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    xt = _rand(rng, 3, 256, 128)
    wt = _rand(rng, 25, 128, 64) * 0.1
    got_t = pconvt1d(xt, wt, 4)
    want_t = xconvt1d(xt, wt, stride=4, impl="xla")
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               atol=1e-4, rtol=1e-4)
