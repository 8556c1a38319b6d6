import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.ops import phase_shuffle


def test_shapes_and_shift_content(rng):
    x = jnp.asarray(rng.standard_normal((8, 64, 3)).astype(np.float32))
    y = phase_shuffle(x, jax.random.key(0), rad=2)
    assert y.shape == x.shape
    xn, yn = np.asarray(x), np.asarray(y)
    # each example must equal some shift n in [-2, 2] of the reflect-padded x
    xp = np.pad(xn, ((0, 0), (2, 2), (0, 0)), mode="reflect")
    for b in range(8):
        assert any(np.array_equal(yn[b], xp[b, 2 - n:2 - n + 64])
                   for n in range(-2, 3))


def test_rad_zero_is_identity(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 1)).astype(np.float32))
    assert phase_shuffle(x, jax.random.key(0), 0) is x


def test_per_example_independent(rng):
    # with rad=4 and 64 examples, shifts should not all be equal
    x = jnp.asarray(rng.standard_normal((64, 32, 1)).astype(np.float32))
    y = np.asarray(phase_shuffle(x, jax.random.key(3), 4))
    xp = np.pad(np.asarray(x), ((0, 0), (4, 4), (0, 0)), mode="reflect")
    shifts = []
    for b in range(64):
        for n in range(-4, 5):
            if np.array_equal(y[b], xp[b, 4 - n:4 - n + 32]):
                shifts.append(n)
                break
    assert len(set(shifts)) > 1


def test_differentiable(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 1)).astype(np.float32))
    g = jax.grad(lambda v: phase_shuffle(v, jax.random.key(0), 2).sum())(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_select_impl_exactly_matches_gather(rng):
    """The gather-free select formulation (_SELECT_IMPL=1, the default) must
    reproduce the vmap'd-dynamic_slice gather form EXACTLY — values, grads,
    and second-order grads (it sits inside D on the GP double-backprop
    path)."""
    import importlib
    # NOT `import ... as ps`: ops/__init__ rebinds the package attribute
    # `phase_shuffle` to the function, shadowing the submodule.
    ps = importlib.import_module("audiogan_tpu.ops.phase_shuffle")

    x = jnp.asarray(rng.standard_normal((16, 48, 5)).astype(np.float32))
    saved = ps._SELECT_IMPL
    for rad in (1, 2, 3):
        key = jax.random.key(rad)

        def loss(v, k=key, r=rad):
            y = phase_shuffle(v, k, r)
            return jnp.sum(jnp.tanh(y) * y)

        def evaluate():
            return (phase_shuffle(x, key, rad),
                    jax.grad(loss)(x),
                    jax.grad(lambda v: jnp.sum(jax.grad(loss)(v) ** 2))(x))

        try:
            ps._SELECT_IMPL = 0
            base, g_base, gg_base = evaluate()
            ps._SELECT_IMPL = 1
            sel, g_sel, gg_sel = evaluate()
            ps._SELECT_IMPL = 2
            prim, g_prim, gg_prim = evaluate()
        finally:
            ps._SELECT_IMPL = saved
        np.testing.assert_array_equal(np.asarray(base), np.asarray(sel))
        np.testing.assert_array_equal(np.asarray(g_base), np.asarray(g_sel))
        np.testing.assert_array_equal(np.asarray(gg_base),
                                      np.asarray(gg_sel))
        # the r5 primitive form (hand-written transpose): same exactness bar
        np.testing.assert_array_equal(np.asarray(base), np.asarray(prim))
        np.testing.assert_array_equal(np.asarray(g_base), np.asarray(g_prim))
        np.testing.assert_array_equal(np.asarray(gg_base),
                                      np.asarray(gg_prim))


def test_pshuft_is_exact_adjoint(rng):
    """<pshuf(x), y> == <x, pshuft(y)> for every offset, incl. the reflect
    edge folds (f64; the two vdots reduce in different orders, so the bound
    is f64 epsilon-scale rather than exact-zero)."""
    import importlib
    ps = importlib.import_module("audiogan_tpu.ops.phase_shuffle")
    with jax.enable_x64(True):
        for rad in (1, 2, 3):
            b, t, c = 2 * rad + 1, 11, 2
            x = jnp.asarray(rng.standard_normal((b, t, c)))
            y = jnp.asarray(rng.standard_normal((b, t, c)))
            offs = jnp.arange(b, dtype=jnp.int32)  # every offset 0..2rad
            lhs = jnp.vdot(ps.pshuf_prim(x, offs, rad=rad), y)
            rhs = jnp.vdot(x, ps.pshuft_prim(y, offs, rad=rad))
            np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                       rtol=1e-13)


def test_pshuf_prim_under_vmap_and_jit(rng):
    import importlib
    ps = importlib.import_module("audiogan_tpu.ops.phase_shuffle")
    x = jnp.asarray(rng.standard_normal((3, 4, 24, 2)).astype(np.float32))
    offs = jnp.asarray(rng.integers(0, 5, (3, 4)).astype(np.int32))
    out = jax.vmap(lambda xv, ov: ps.pshuf_prim(xv, ov, rad=2))(x, offs)
    ref = jnp.stack([ps.pshuf_prim(x[i], offs[i], rad=2) for i in range(3)])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    jout = jax.jit(lambda xv, ov: ps.pshuf_prim(xv, ov, rad=2))(
        x[0], offs[0])
    np.testing.assert_array_equal(np.asarray(jout), np.asarray(ref[0]))
