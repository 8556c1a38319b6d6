import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogan_tpu.models import WaveGANDiscriminator, WaveGANGenerator


def make_g(**kw):
    defaults = dict(clip_len=1024, latent_dim=16, model_dim=8,
                    kernel_size=25, strides=(4, 4, 4), max_channels=64)
    defaults.update(kw)
    return WaveGANGenerator(**defaults)


def make_d(**kw):
    defaults = dict(model_dim=8, kernel_size=25, strides=(4, 4, 4),
                    phase_shuffle_rad=2, max_channels=64)
    defaults.update(kw)
    return WaveGANDiscriminator(**defaults)


def test_generator_shape_and_range():
    g = make_g()
    z = jax.random.normal(jax.random.key(0), (3, 16))
    params = g.init(jax.random.key(1), z)
    y = g.apply(params, z)
    assert y.shape == (3, 1024, 1)
    assert np.abs(np.asarray(y)).max() <= 1.0


def test_generator_deterministic():
    g = make_g()
    z = jax.random.normal(jax.random.key(0), (2, 16))
    params = g.init(jax.random.key(1), z)
    np.testing.assert_array_equal(np.asarray(g.apply(params, z)),
                                  np.asarray(g.apply(params, z)))


def test_generator_music_strides():
    # music_44k-style non-uniform strides: 48 * 7*7*5*5*3 hits 176400 shape
    g = make_g(clip_len=2940, strides=(7, 5, 3, 2 * 2))  # 2940 = 7*5*3*4 * 7
    z = jax.random.normal(jax.random.key(0), (1, 16))
    params = g.init(jax.random.key(1), z)
    assert g.apply(params, z).shape == (1, 2940, 1)


def test_discriminator_shape_and_shuffle_rng():
    d = make_d()
    x = jax.random.normal(jax.random.key(0), (4, 1024, 1))
    params = d.init({"params": jax.random.key(1),
                     "phase_shuffle": jax.random.key(2)}, x)
    s = d.apply(params, x, rngs={"phase_shuffle": jax.random.key(3)})
    assert s.shape == (4,)
    # eval path needs no rng and is deterministic
    s_eval = d.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(s_eval),
                                  np.asarray(d.apply(params, x, train=False)))


def test_conditional_models_differ_by_label():
    g = make_g(num_classes=10, embed_dim=8)
    z = jax.random.normal(jax.random.key(0), (2, 16))
    y0 = jnp.zeros((2,), jnp.int32)
    y1 = jnp.ones((2,), jnp.int32)
    params = g.init(jax.random.key(1), z, y0)
    out0, out1 = g.apply(params, z, y0), g.apply(params, z, y1)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))

    d = make_d(num_classes=10, embed_dim=8)
    x = jax.random.normal(jax.random.key(0), (2, 1024, 1))
    dp = d.init({"params": jax.random.key(1)}, x, y0, train=False)
    s0 = d.apply(dp, x, y0, train=False)
    s1 = d.apply(dp, x, y1, train=False)
    assert not np.allclose(np.asarray(s0), np.asarray(s1))


@pytest.mark.parametrize("batch", [1, 5])
def test_full_size_flagship_shapes(batch):
    # flagship wgan_gp_b64 geometry at tiny batch: 16384 = 16 * 4^5
    g = WaveGANGenerator(clip_len=16384, latent_dim=100, model_dim=4,
                         strides=(4, 4, 4, 4, 4), max_channels=64)
    z = jax.random.normal(jax.random.key(0), (batch, 100))
    params = g.init(jax.random.key(1), z)
    assert g.apply(params, z).shape == (batch, 16384, 1)
