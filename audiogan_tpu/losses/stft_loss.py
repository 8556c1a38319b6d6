"""Multi-resolution STFT losses (SURVEY C12; Yamamoto et al. 2020, [B:10]).

`multi_resolution_stft_loss(x, y)` is the standard PAIRED loss (spectral
convergence + log-magnitude L1 averaged over resolutions) for vocoder-style
use. GAN training has no paired target, so the dual_stft preset uses
`batch_spectral_matching_loss`: the same multi-resolution machinery applied
to BATCH-MEAN magnitude spectrograms of the fake vs real batches — an
unpaired adaptation (spectral feature matching) documented here as a SPEC
decision (SURVEY R1: no reference exists to pin the exact usage).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from audiogan_tpu.ops.stft import stft_magnitude

Resolutions = Sequence[tuple[int, int, int]]

DEFAULT_RESOLUTIONS: Resolutions = (
    (512, 128, 512), (1024, 256, 1024), (2048, 512, 2048))


def spectral_convergence_loss(x_mag: jnp.ndarray, y_mag: jnp.ndarray
                              ) -> jnp.ndarray:
    """||y_mag - x_mag||_F / ||y_mag||_F."""
    num = jnp.sqrt(jnp.sum(jnp.square(y_mag - x_mag)))
    den = jnp.sqrt(jnp.sum(jnp.square(y_mag))) + 1e-8
    return num / den


def log_stft_magnitude_loss(x_mag: jnp.ndarray, y_mag: jnp.ndarray
                            ) -> jnp.ndarray:
    return jnp.mean(jnp.abs(jnp.log(x_mag + 1e-7) - jnp.log(y_mag + 1e-7)))


def multi_resolution_stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    resolutions: Resolutions = DEFAULT_RESOLUTIONS,
) -> jnp.ndarray:
    """Paired multi-res loss between waveforms x, y [B, T] (or [B, T, 1])."""
    if x.ndim == 3:
        x, y = x[..., 0], y[..., 0]
    total = 0.0
    for n_fft, hop, win in resolutions:
        xm = stft_magnitude(x, n_fft, hop, win)
        ym = stft_magnitude(y, n_fft, hop, win)
        total = total + spectral_convergence_loss(xm, ym) \
                      + log_stft_magnitude_loss(xm, ym)
    return total / len(resolutions)


def batch_spectral_matching_loss(
    fake: jnp.ndarray,
    real: jnp.ndarray,
    resolutions: Resolutions = DEFAULT_RESOLUTIONS,
) -> jnp.ndarray:
    """Unpaired variant: match batch-mean magnitude spectra of fake vs real."""
    if fake.ndim == 3:
        fake, real = fake[..., 0], real[..., 0]
    total = 0.0
    for n_fft, hop, win in resolutions:
        fm = jnp.mean(stft_magnitude(fake, n_fft, hop, win), axis=0)
        rm = jnp.mean(stft_magnitude(real, n_fft, hop, win), axis=0)
        total = total + spectral_convergence_loss(fm, rm) \
                      + log_stft_magnitude_loss(fm, rm)
    return total / len(resolutions)
