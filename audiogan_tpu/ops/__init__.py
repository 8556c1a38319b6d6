"""On-device signal ops (SURVEY layer A2).

Every op here is pure jnp/lax, jit-able, and fuses into the surrounding XLA
graph — this is the TPU-native replacement for the reference's host-side
numpy/scipy/libsamplerate ingest (SURVEY C1-C5) and its phase-shuffle /
STFT torch ops (C10-C11). Pallas fast paths for the conv-shaped ops live in
``audiogan_tpu.kernels`` and are selected by config, never imported here.
"""

from audiogan_tpu.ops.mulaw import mu_law_compand, mu_law_expand
from audiogan_tpu.ops.normalize import normalize_amplitude
from audiogan_tpu.ops.framing import random_crop, center_crop
from audiogan_tpu.ops.resample import design_polyphase_filter, resample_poly
from audiogan_tpu.ops.phase_shuffle import phase_shuffle
from audiogan_tpu.ops.stft import stft_magnitude, frame_signal
from audiogan_tpu.ops.ingest import ingest_batch

__all__ = [
    "mu_law_compand", "mu_law_expand", "normalize_amplitude",
    "random_crop", "center_crop", "design_polyphase_filter", "resample_poly",
    "phase_shuffle", "stft_magnitude", "frame_signal", "ingest_batch",
]
