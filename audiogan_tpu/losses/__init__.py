from audiogan_tpu.losses.wgan import (
    wgan_d_loss, wgan_g_loss, gradient_penalty)
from audiogan_tpu.losses.stft_loss import (
    multi_resolution_stft_loss, spectral_convergence_loss,
    log_stft_magnitude_loss, batch_spectral_matching_loss)

__all__ = [
    "wgan_d_loss", "wgan_g_loss", "gradient_penalty",
    "multi_resolution_stft_loss", "spectral_convergence_loss",
    "log_stft_magnitude_loss", "batch_spectral_matching_loss",
]
