"""Shuffled-input conv primitives (kernels/sconv.py, VERDICT r3 #1): the
fused phase_shuffle->conv must equal the unfused composition EXACTLY —
values, 1st/2nd-order gradients, through the critic and the full WGAN-GP
training step — because both draw the same shift stream and the XLA
lowering is literally window-select + the plain conv primitive."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogan_tpu.kernels import sconv
from audiogan_tpu.kernels.conv import _same_pads
from audiogan_tpu.kernels.primitives import (sconv1d_ba_prim, sconv1d_prim,
                                             sconvt1d_prim)
from audiogan_tpu.ops.conv import conv1d_ba
from audiogan_tpu.ops.phase_shuffle import phase_shuffle

from helpers_train import tiny_config


def _mk(rng, shape, dtype=np.float32):
    return jnp.asarray(rng.standard_normal(shape).astype(dtype))


GEOS = [(9, 4, 2), (25, 4, 2), (7, 7, 2), (9, 4, 1), (25, 1, 2)]


@pytest.mark.parametrize("k,s,rad", GEOS)
def test_sconv1d_matches_select_then_conv(rng, k, s, rad):
    b, t, cin, cout = 3, 8 * s, 8, 16
    xp = _mk(rng, (b, t + 2 * rad, cin))
    w = _mk(rng, (k, cin, cout))
    offs = jnp.asarray(np.random.default_rng(1).integers(
        0, 2 * rad + 1, b).astype(np.int32))
    _, lo, hi = _same_pads(t, k, s)
    z = sconv.window_select(xp, offs, t, rad)
    from audiogan_tpu.kernels.conv import conv1d_lowered
    want = conv1d_lowered(z, w, s, lo, hi, impl="xla")
    got = sconv1d_prim(xp, w, offs, stride=s, pad_lo=lo, pad_hi=hi,
                       rad=rad, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_window_place_is_select_transpose(rng):
    b, t, c, rad = 4, 12, 3, 2
    xp = _mk(rng, (b, t + 2 * rad, c))
    u = _mk(rng, (b, t, c))
    offs = jnp.asarray([0, 1, 3, 4], jnp.int32)
    lhs = jnp.vdot(sconv.window_select(xp, offs, t, rad), u)
    rhs = jnp.vdot(xp, sconv.window_place(u, offs, rad))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-6)


@pytest.mark.parametrize("k,s,rad", [(9, 4, 2), (25, 4, 2)])
def test_sconv_first_and_second_order_grads(rng, k, s, rad):
    """grads and GP-style grad-of-grad equal the unfused composition."""
    b, t, cin, cout = 2, 8 * s, 6, 10
    y = _mk(rng, (b, t, cin))
    w = _mk(rng, (k, cin, cout))
    bb = _mk(rng, (cout,))
    key = jax.random.key(3)

    def f_ref(y, w):
        return jnp.sum(conv1d_ba(phase_shuffle(y, key, rad), w, bb,
                                 stride=s, act="leaky_relu", impl="xla"))

    def f_fus(y, w):
        return jnp.sum(sconv.sconv1d_ba(y, w, bb, key, rad, stride=s,
                                        act="leaky_relu", impl="xla"))

    np.testing.assert_allclose(float(f_fus(y, w)), float(f_ref(y, w)),
                               rtol=1e-6)
    for a, c in zip(jax.grad(f_ref, (0, 1))(y, w),
                    jax.grad(f_fus, (0, 1))(y, w)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-5)

    def gp(f):
        def inner(w):
            g = jax.grad(lambda v: f(v, w))(y)
            return jnp.sum(jnp.square(g))
        return inner

    np.testing.assert_allclose(float(gp(f_fus)(w)), float(gp(f_ref)(w)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jax.grad(gp(f_fus))(w)),
                               np.asarray(jax.grad(gp(f_ref))(w)),
                               atol=2e-4, rtol=2e-5)


def test_sconvt1d_transpose_consistency(rng):
    """check_grads-style: sconvt1d's own transposes close the family
    (reverse-mode through place∘convT equals the jnp composition)."""
    b, t, cin, cout, k, s, rad = 2, 24, 6, 8, 9, 4, 2
    _, lo, hi = _same_pads(t, k, s)
    t_out = (t + lo + hi - k) // s + 1
    ct = _mk(rng, (b, t_out, cout))
    wf = _mk(rng, (k, cout, cin))
    offs = jnp.asarray([1, 4], jnp.int32)

    def f_prim(ct, wf):
        return jnp.sum(jnp.square(sconvt1d_prim(
            ct, wf, offs, stride=s, pad_lo_t=k - 1 - lo, t=t, rad=rad,
            impl="xla")))

    def f_ref(ct, wf):
        from audiogan_tpu.kernels.conv import convt1d_lowered
        u = convt1d_lowered(ct, wf, s, k - 1 - lo, t, impl="xla")
        return jnp.sum(jnp.square(sconv.window_place(u, offs, rad)))

    np.testing.assert_allclose(float(f_prim(ct, wf)), float(f_ref(ct, wf)),
                               rtol=1e-6)
    for a, c in zip(jax.grad(f_ref, (0, 1))(ct, wf),
                    jax.grad(f_prim, (0, 1))(ct, wf)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-5)


def test_fused_critic_matches_unfused(rng):
    """WaveGANDiscriminator with fused_shuffle_sites=-1 == unfused, same
    params and rng — values and WGAN-GP-style gradients."""
    from audiogan_tpu.models.wavegan import WaveGANDiscriminator

    kw = dict(model_dim=4, kernel_size=9, strides=(4, 4, 4),
              max_channels=16, kernels="xla")
    d0 = WaveGANDiscriminator(fused_shuffle_sites=0, **kw)
    d2 = WaveGANDiscriminator(fused_shuffle_sites=-1, **kw)
    x = _mk(rng, (2, 64, 1))
    params = d0.init({"params": jax.random.key(0),
                      "phase_shuffle": jax.random.key(1)}, x)

    def score(d, p, x):
        return d.apply(p, x, train=True,
                       rngs={"phase_shuffle": jax.random.key(7)})

    s0 = score(d0, params, x)
    s2 = score(d2, params, x)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s0), atol=1e-5)

    def gp(d):
        def f(p):
            g = jax.grad(lambda v: jnp.sum(score(d, p, v)))(x)
            return jnp.sum(jnp.square(g))
        return f

    np.testing.assert_allclose(float(gp(d2)(params)), float(gp(d0)(params)),
                               rtol=1e-5)
    ga = jax.grad(gp(d0))(params)
    gb = jax.grad(gp(d2))(params)
    flat_a = jax.tree.leaves(ga)
    flat_b = jax.tree.leaves(gb)
    for a, c in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=2e-4,
                                   rtol=1e-4)


def test_fused_step_matches_unfused_step(rng):
    """Full WGAN-GP train step: fused critic == unfused critic metrics."""
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step, num_views

    cfg = tiny_config()
    cfg_f = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fused_shuffle_sites=-1))
    n = num_views(cfg)
    raw = jnp.asarray((np.random.default_rng(0).standard_normal(
        (n, cfg.train.batch_size, cfg.data.store_len)) * 8000
        ).clip(-32768, 32767).astype(np.int16))
    labels = jnp.zeros((n, cfg.train.batch_size), jnp.int32)

    s_a, m_a = jax.jit(build_train_step(cfg))(
        create_train_state(cfg), raw, labels)
    s_b, m_b = jax.jit(build_train_step(cfg_f))(
        create_train_state(cfg_f), raw, labels)
    for k in m_a:
        np.testing.assert_allclose(np.asarray(m_b[k]), np.asarray(m_a[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


PALLAS_GEOS = [
    # k, s, rad, cin, cout, t      (t*s etc. kept small: interpret mode)
    (25, 4, 2, 32, 64, 128),       # flagship-shaped (r_row 0/1, r_sub 0-3)
    (9, 4, 2, 64, 32, 64),
    (25, 2, 2, 32, 32, 64),        # r_row up to 2
    (7, 7, 3, 32, 32, 49),         # music stride; rad 3
    (25, 3, 2, 32, 32, 66),        # music s=3: 2*rad > s (shift spills a
                                   # row past m_out+1 — aligned-DMA tail)
    (9, 1, 2, 32, 32, 48),         # s=1: pure row shift
]


@pytest.mark.parametrize("k,s,rad,cin,cout,t", PALLAS_GEOS)
@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_sconv1d_pallas_matches_xla(rng, k, s, rad, cin, cout, t, dtype):
    """Pallas fused fwd (row-offset DMA + funnel) == select+conv, every
    offset value exercised across the batch."""
    b = 2 * rad + 2
    xp = _mk(rng, (b, t + 2 * rad, cin), dtype)
    w = _mk(rng, (k, cin, cout), dtype)
    offs = jnp.asarray((np.arange(b) % (2 * rad + 1)).astype(np.int32))
    _, lo, hi = _same_pads(t, k, s)
    want = sconv.sconv1d_lowered(xp, w, offs, s, lo, hi, rad, impl="xla")
    got = sconv._sconv1d_pallas(xp, w, offs, s, lo, hi, rad)
    tol = 5e-2 if dtype == jnp.bfloat16 else 1e-4  # bf16 accumulates f32,
    np.testing.assert_allclose(                    # but inputs are bf16
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol)


def test_sconv1d_pallas_bias_act(rng):
    k, s, rad, cin, cout, t = 25, 4, 2, 32, 64, 128
    b = 6
    xp = _mk(rng, (b, t + 2 * rad, cin))
    w = _mk(rng, (k, cin, cout))
    bb = _mk(rng, (cout,))
    offs = jnp.asarray((np.arange(b) % (2 * rad + 1)).astype(np.int32))
    _, lo, hi = _same_pads(t, k, s)
    want = sconv.sconv1d_ba_lowered(xp, w, bb, offs, s, lo, hi, rad,
                                    "leaky_relu", 0.2, impl="xla")
    got = sconv._sconv1d_pallas(xp, w, offs, s, lo, hi, rad, bias=bb,
                                act="leaky_relu", slope=0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("k,s,rad,cc,co,t", [
    (25, 4, 2, 64, 32, 128),       # flagship-shaped transpose
    (9, 4, 2, 32, 32, 64),
    (25, 2, 2, 32, 32, 64),
    (7, 7, 3, 32, 32, 49),
    (25, 3, 2, 32, 32, 24),
])
def test_sconvt1d_pallas_matches_xla(rng, k, s, rad, cc, co, t):
    """Pallas fused transpose (extended acc + output funnel + shifted
    output DMA) == convt + window_place."""
    b = 2 * rad + 2
    _, lo, hi = _same_pads(t, k, s)
    t_out = (t + lo + hi - k) // s + 1
    ct = _mk(rng, (b, t_out, cc))
    wf = _mk(rng, (k, cc, co))
    offs = jnp.asarray((np.arange(b) % (2 * rad + 1)).astype(np.int32))
    pad_lo_t = k - 1 - lo
    want = sconv.sconvt1d_lowered(ct, wf, offs, s, pad_lo_t, t, rad,
                                  impl="xla")
    got = sconv._sconvt1d_pallas(ct, wf, offs, s, pad_lo_t, t, rad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_sconv_pallas_gp_grads_match_xla(rng):
    """Full fused-critic-layer GP chain on the pallas tier == xla tier:
    exercises sconv1d fwd, its sconvt transpose, and the wgrad select."""
    k, s, rad, cin, cout, t = 25, 4, 2, 32, 32, 256
    b = 6
    y = _mk(rng, (b, t, cin))
    w = _mk(rng, (k, cin, cout))
    bb = _mk(rng, (cout,))
    key = jax.random.key(5)

    def f(impl):
        def g(y, w):
            return jnp.sum(sconv.sconv1d_ba(y, w, bb, key, rad, stride=s,
                                            act="leaky_relu", impl=impl))
        return g

    fx, fp = f("xla"), f("pallas")
    np.testing.assert_allclose(float(fp(y, w)), float(fx(y, w)), rtol=1e-5)
    for a, c in zip(jax.grad(fx, (0, 1))(y, w),
                    jax.grad(fp, (0, 1))(y, w)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-4,
                                   rtol=1e-4)

    def gp(fn):
        def inner(w):
            g = jax.grad(lambda v: fn(v, w))(y)
            return jnp.sum(jnp.square(g))
        return inner

    np.testing.assert_allclose(float(gp(fp)(w)), float(gp(fx)(w)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(gp(fp))(w)),
                               np.asarray(jax.grad(gp(fx))(w)),
                               atol=1e-3, rtol=5e-4)


def test_fused_sites_validation():
    cfg = tiny_config()
    bad = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fused_shuffle_sites=-2))
    with pytest.raises(ValueError):
        bad.validate()


# ---------------------------------------------------------------------------
# mrpad / mrpadt (round-5 glue lever: hand-transposed masked reflect pad)
# ---------------------------------------------------------------------------

def test_mrpad_prim_matches_plain(rng):
    """Primitive form == plain jnp form: values, 1st-order, 2nd-order
    grads, bit-exact (same terms summed over disjoint rows)."""
    for rad in (1, 2, 3):
        b, t, c = 2 * rad + 1, 4 * rad + 7, 3
        y = _mk(rng, (b, t, c))
        offs = jnp.arange(b, dtype=jnp.int32)  # every offset 0..2rad

        def loss(v, form):
            xp = (sconv.mrpad_prim(v, offs, rad=rad) if form == "prim"
                  else sconv._mrpad_fwd(v, offs, rad))
            return jnp.sum(jnp.tanh(xp) * xp)

        for fn in (lambda v, f: (sconv.mrpad_prim(v, offs, rad=rad)
                                 if f == "prim"
                                 else sconv._mrpad_fwd(v, offs, rad)),):
            np.testing.assert_array_equal(
                np.asarray(fn(y, "prim")), np.asarray(fn(y, "plain")))
        g0 = jax.grad(lambda v: loss(v, "plain"))(y)
        g1 = jax.grad(lambda v: loss(v, "prim"))(y)
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
        gg0 = jax.grad(
            lambda v: jnp.sum(jax.grad(lambda u: loss(u, "plain"))(v) ** 2)
        )(y)
        gg1 = jax.grad(
            lambda v: jnp.sum(jax.grad(lambda u: loss(u, "prim"))(v) ** 2)
        )(y)
        np.testing.assert_array_equal(np.asarray(gg0), np.asarray(gg1))


def test_mrpadt_is_exact_adjoint(rng):
    """<mrpad(y), u> == <y, mrpadt(u)> per offset (f64; reduction-order
    epsilon bound)."""
    with jax.enable_x64(True):
        for rad in (1, 2, 3):
            b, t, c = 2 * rad + 1, 4 * rad + 9, 2
            y = jnp.asarray(rng.standard_normal((b, t, c)))
            u = jnp.asarray(rng.standard_normal((b, t + 2 * rad, c)))
            offs = jnp.arange(b, dtype=jnp.int32)
            lhs = jnp.vdot(sconv.mrpad_prim(y, offs, rad=rad), u)
            rhs = jnp.vdot(y, sconv.mrpadt_prim(u, offs, rad=rad))
            np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                       rtol=1e-13)


def test_mrpad_fused_step_bit_identical(rng):
    """The full fused-shuffle WGAN-GP step with _MRPAD_PRIM=1 must be
    bit-identical to the default (AD-transposed) form."""
    import jax as _jax
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step
    from helpers_train import raw_batch

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fused_shuffle_sites=-1))

    def run(flag):
        saved = sconv._MRPAD_PRIM
        try:
            sconv._MRPAD_PRIM = flag
            state = create_train_state(cfg)
            step = _jax.jit(build_train_step(cfg))
            hist = []
            for s in range(3):
                clips, labels = raw_batch(cfg, seed=31 + s)
                state, m = step(state, clips, labels)
                hist.append(_jax.device_get(m))
        finally:
            sconv._MRPAD_PRIM = saved
        return state, hist

    st0, h0 = run(0)
    st1, h1 = run(1)
    for m0, m1 in zip(h0, h1):
        for k in m0:
            np.testing.assert_array_equal(np.asarray(m1[k]),
                                          np.asarray(m0[k]), err_msg=k)
    for l0, l1 in zip(jax.tree.leaves(st0.params_d),
                      jax.tree.leaves(st1.params_d)):
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
