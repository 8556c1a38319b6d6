"""Model zoo (SURVEY layer A4, components C7-C11, C15).

All models are flax.linen modules over NWC ([B, T, C]) activations; conv ops
route through audiogan_tpu.ops.conv so the Pallas kernel layer can be
selected per-run with `kernels="pallas"`.
"""

from audiogan_tpu.models.wavegan import WaveGANGenerator, WaveGANDiscriminator
from audiogan_tpu.models.gru import GRUGenerator
from audiogan_tpu.models.stft_critic import STFTCritic, DualDiscriminator
from audiogan_tpu.models.factory import build_generator, build_discriminator

__all__ = [
    "WaveGANGenerator", "WaveGANDiscriminator", "GRUGenerator",
    "STFTCritic", "DualDiscriminator", "build_generator",
    "build_discriminator",
]
