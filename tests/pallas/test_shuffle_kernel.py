"""kernels/shuffle.py — the single-HBM-pass phase-shuffle primitive pair.

Pins (interpret mode on CPU; the TPU session re-checks compiled):
  * pshuf == reflect-pad + select form, EXACTLY (pure data movement)
  * pshuf_t is the EXACT linear transpose (checked against AD of the
    reference form, to second order — the op sits inside D on the WGAN-GP
    double-backprop path)
  * the XLA fallback lowering (impl="xla") equals the kernel
  * vmap batch rule collapses correctly
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audiogan_tpu.kernels.shuffle as ks
from audiogan_tpu.ops.phase_shuffle import phase_shuffle

ps = importlib.import_module("audiogan_tpu.ops.phase_shuffle")


@pytest.fixture(autouse=True)
def _interpret():
    ks._INTERPRET = True
    yield
    ks._INTERPRET = False


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _ref(x, starts, rad):
    xp = jnp.pad(x, ((0, 0), (rad, rad), (0, 0)), mode="reflect")
    shifts = rad - starts
    return ps._apply_shifts(xp, shifts, x.shape[1], rad)


@pytest.mark.parametrize("rad", [1, 2, 3])
@pytest.mark.parametrize("shape", [(4, 48, 5), (8, 16, 130), (2, 33, 1)])
def test_pshuf_matches_reference_exactly(rng, rad, shape):
    b, t, c = shape
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, 2 * rad + 1, b).astype(np.int32))
    got = ks.pshuf_prim(x, starts, rad=rad)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(_ref(x, starts, rad)))
    # XLA fallback lowering agrees too
    got_xla = ks.pshuf_prim(x, starts, rad=rad, impl="xla")
    np.testing.assert_array_equal(np.asarray(got_xla), np.asarray(got))


@pytest.mark.parametrize("rad", [1, 2])
def test_pshuf_t_is_exact_transpose(rng, rad):
    b, t, c = 4, 40, 6
    starts = jnp.asarray(rng.integers(0, 2 * rad + 1, b).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    # <pshuf(x), g> == <x, pshuf_t(g)>
    lhs = jnp.vdot(ks.pshuf_prim(x, starts, rad=rad), g)
    rhs = jnp.vdot(x, ks.pshuf_t_prim(g, starts, rad=rad))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)
    # and the AD-generated vjp equals the reference form's vjp EXACTLY
    f = lambda v: jnp.vdot(ks.pshuf_prim(v, starts, rad=rad), g)  # noqa
    f_ref = lambda v: jnp.vdot(_ref(v, starts, rad), g)           # noqa
    np.testing.assert_array_equal(np.asarray(jax.grad(f)(x)),
                                  np.asarray(jax.grad(f_ref)(x)))


@pytest.mark.parametrize("rad", [2])
def test_second_order_matches_reference(rng, rad):
    """GP-style reverse-over-reverse through the primitive pair."""
    b, t, c = 3, 24, 4
    starts = jnp.asarray(rng.integers(0, 2 * rad + 1, b).astype(np.int32))
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))

    def make_loss(op):
        def inner(v):
            y = op(v)
            return jnp.sum(jnp.tanh(y) * y)

        def outer(v):
            return jnp.sum(jax.grad(inner)(v) ** 2)
        return inner, outer

    i1, o1 = make_loss(lambda v: ks.pshuf_prim(v, starts, rad=rad))
    i2, o2 = make_loss(lambda v: _ref(v, starts, rad))
    np.testing.assert_allclose(np.asarray(jax.grad(o1)(x)),
                               np.asarray(jax.grad(o2)(x)),
                               rtol=1e-5, atol=1e-6)


def test_vmap_batch_rule(rng):
    rad = 2
    v, b, t, c = 3, 4, 20, 5
    x = jnp.asarray(rng.standard_normal((v, b, t, c)).astype(np.float32))
    starts = jnp.asarray(
        rng.integers(0, 2 * rad + 1, (v, b)).astype(np.int32))
    got = jax.vmap(lambda xv, sv: ks.pshuf_prim(xv, sv, rad=rad))(x, starts)
    want = jnp.stack([_ref(x[i], starts[i], rad) for i in range(v)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_phase_shuffle_routes_pallas_and_matches(rng):
    """ops/phase_shuffle with _IMPL='pallas' (and 'auto' under interpret)
    equals the default select path bit-for-bit, grads included."""
    x = jnp.asarray(rng.standard_normal((8, 32, 6)).astype(np.float32))
    key = jax.random.key(3)
    rad = 2

    def loss(v):
        y = phase_shuffle(v, key, rad)
        return jnp.sum(jnp.sin(y) * y)

    base, g_base = phase_shuffle(x, key, rad), jax.grad(loss)(x)
    saved = ps._IMPL
    try:
        for impl in ("pallas", "auto"):
            ps._IMPL = impl
            np.testing.assert_array_equal(
                np.asarray(phase_shuffle(x, key, rad)), np.asarray(base))
            np.testing.assert_array_equal(
                np.asarray(jax.grad(loss)(x)), np.asarray(g_base))
    finally:
        ps._IMPL = saved
    # explicit impl= threading (the model's kernels tier): pallas/mixed/
    # auto/xla all bit-equal the select default
    for impl in ("pallas", "mixed", "auto", "xla"):
        np.testing.assert_array_equal(
            np.asarray(phase_shuffle(x, key, rad, impl=impl)),
            np.asarray(base))


def test_supported_gate():
    assert ks.supported(16, 2)
    assert not ks.supported(3, 2)
    # VMEM gate: flagship biggest activation fits at rb=1; the music
    # geometry (t=25200) does not and must route to the select form
    assert ks.supported(4096, 2, 64, 2)
    assert not ks.supported(25200, 2, 64, 2)


def test_forced_pallas_falls_back_on_unsupported_geometry(rng):
    """impl='pallas' on a music-scale row must not be a compile error —
    _lowered routes it to the (identical-value) select math."""
    rad = 2
    starts = jnp.asarray(rng.integers(0, 2 * rad + 1, 2).astype(np.int32))
    xs = jnp.asarray(rng.standard_normal((2, 3, 3)).astype(np.float32))
    assert not ks.supported(3, rad)
    got = ks.pshuf_prim(xs, starts, rad=rad, impl="pallas")
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(_ref(xs, starts, rad)))
