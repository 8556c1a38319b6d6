import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.models import GRUGenerator
from audiogan_tpu.models.gru import factorize_stride
from audiogan_tpu.ops.gru import gru_cell


def test_gru_cell_matches_torch():
    torch = __import__("torch")
    rng = np.random.default_rng(0)
    b, in_dim, hidden = 4, 12, 24
    x = rng.standard_normal((b, in_dim)).astype(np.float32)
    h = rng.standard_normal((b, hidden)).astype(np.float32)

    cell = torch.nn.GRUCell(in_dim, hidden)
    with torch.no_grad():
        ref = cell(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    # torch stores weight_ih [3H, in] with gate order (r, z, n)
    w_i = cell.weight_ih.detach().numpy().T
    w_h = cell.weight_hh.detach().numpy().T
    b_i = cell.bias_ih.detach().numpy()
    b_h = cell.bias_hh.detach().numpy()
    out = gru_cell(jnp.asarray(x), jnp.asarray(h), jnp.asarray(w_i),
                   jnp.asarray(w_h), jnp.asarray(b_i), jnp.asarray(b_h))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)


def test_factorize_stride():
    for n in (64, 64, 50, 200, 13, 1):
        fs = factorize_stride(n)
        assert np.prod(fs) == max(n, 1) or (n == 1 and fs == ())
    assert factorize_stride(64) == (4, 4, 4)


def test_gru_generator_shapes():
    g = GRUGenerator(clip_len=1024, latent_dim=16, model_dim=8, hidden=32,
                     frame_size=64, kernel_size=9)
    z = jax.random.normal(jax.random.key(0), (2, 16))
    params = g.init(jax.random.key(1), z)
    y = g.apply(params, z)
    assert y.shape == (2, 1024, 1)
    assert np.abs(np.asarray(y)).max() <= 1.0


def test_gru_generator_conditional_and_deterministic():
    g = GRUGenerator(clip_len=512, latent_dim=8, model_dim=8, hidden=16,
                     frame_size=64, kernel_size=9, num_classes=10,
                     embed_dim=8)
    z = jax.random.normal(jax.random.key(0), (2, 8))
    y0 = jnp.zeros((2,), jnp.int32)
    y1 = jnp.full((2,), 3, jnp.int32)
    params = g.init(jax.random.key(1), z, y0)
    a = np.asarray(g.apply(params, z, y0))
    b = np.asarray(g.apply(params, z, y0))
    c = np.asarray(g.apply(params, z, y1))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
