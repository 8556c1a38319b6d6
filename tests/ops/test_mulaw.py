import jax.numpy as jnp
import numpy as np

from audiogan_tpu.ops import mu_law_compand, mu_law_expand


def test_round_trip(rng):
    x = jnp.asarray(rng.uniform(-1, 1, size=(4, 257)).astype(np.float32))
    y = mu_law_expand(mu_law_compand(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_range_and_sign(rng):
    x = jnp.asarray(rng.uniform(-1, 1, size=(1024,)).astype(np.float32))
    y = mu_law_compand(x)
    assert np.all(np.abs(np.asarray(y)) <= 1.0 + 1e-6)
    assert np.all(np.sign(np.asarray(y)) == np.sign(np.asarray(x)))


def test_closed_form_values():
    # mu-law of +-1 is +-1; of 0 is 0; of 1/255 is log(2)/log(256)
    x = jnp.asarray([0.0, 1.0, -1.0, 1.0 / 255.0], dtype=jnp.float32)
    y = np.asarray(mu_law_compand(x, 255.0))
    expected = np.array([0.0, 1.0, -1.0, np.log(2.0) / np.log(256.0)],
                        dtype=np.float32)
    np.testing.assert_allclose(y, expected, atol=1e-6)


def test_matches_torch_oracle(rng):
    torch = __import__("torch")
    x = rng.uniform(-1, 1, size=(513,)).astype(np.float32)
    # torch-free closed form used by torchaudio MuLawEncoding (continuous ver.)
    xt = torch.from_numpy(x)
    mu = 255.0
    yt = torch.sign(xt) * torch.log1p(mu * torch.abs(xt)) / np.log1p(mu)
    y = mu_law_compand(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=5e-5)
