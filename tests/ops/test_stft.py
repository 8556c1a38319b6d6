import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.ops import frame_signal, stft_magnitude


def test_frame_signal(rng):
    x = jnp.asarray(np.arange(20, dtype=np.float32))
    f = np.asarray(frame_signal(x, 8, 4))
    assert f.shape == (4, 8)
    np.testing.assert_array_equal(f[0], np.arange(8))
    np.testing.assert_array_equal(f[1], np.arange(4, 12))


def test_stft_matches_torch(rng):
    torch = __import__("torch")
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    n_fft, hop, win = 512, 128, 512
    y = np.asarray(stft_magnitude(jnp.asarray(x), n_fft, hop, win, eps=0.0))
    ref = torch.stft(
        torch.from_numpy(x), n_fft=n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, return_complex=True,
    ).abs().transpose(1, 2).numpy()
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=2e-3, rtol=1e-3)


def test_stft_grad_finite_at_zero():
    # eps floor keeps sqrt grad finite on silent input (GP path requirement)
    x = jnp.zeros((1, 1024), jnp.float32)
    g = jax.grad(lambda v: stft_magnitude(v, 256, 64).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
