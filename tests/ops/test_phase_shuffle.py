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
        finally:
            ps._SELECT_IMPL = saved
        np.testing.assert_array_equal(np.asarray(base), np.asarray(sel))
        np.testing.assert_array_equal(np.asarray(g_base), np.asarray(g_sel))
        np.testing.assert_array_equal(np.asarray(gg_base),
                                      np.asarray(gg_sel))
