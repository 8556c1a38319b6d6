"""audiogan-tpu: a TPU-native audio-GAN framework built from scratch in JAX.

Capability parity target: BarclayII/audiogan (see SURVEY.md — the reference
mount is empty, so SURVEY.md section 2's component inventory, reconstructed
from BASELINE.json, is the binding spec; citations below use [B:n] =
BASELINE.json line n and [C#] = SURVEY.md section 2.1 component ids).

Subpackages:
  ops       on-device ingest + signal ops (A2 layer): mu-law, framing,
            normalization, polyphase resampling, phase shuffle, STFT
  kernels   Pallas TPU kernels (A1 layer): strided conv1d, transposed
            conv1d, fused GRU cell
  models    flax.linen models (A4): WaveGAN G/D, GRU generator, STFT critic
  losses    WGAN-GP + multi-resolution STFT losses (A3)
  data      host-side corpus: RIFF wav codec, packed memmap corpus,
            synthetic SC09 fixtures
  parallel  mesh construction, sharding rules, halo-exchange collectives
  train     single-jit WGAN-GP train step, TrainState, host loop
  utils     PRNG threading, metrics, checkpoint helpers
"""

__version__ = "0.1.0"
