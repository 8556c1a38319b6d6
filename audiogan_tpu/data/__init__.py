"""Host-side data layer (SURVEY C1, C6).

The reference decodes/resamples/crops per item in DataLoader workers; here the
host does the absolute minimum — decode wavs ONCE into a packed int16 memmap
corpus, then serve fixed-shape int16 batches — and all DSP runs on-device in
``audiogan_tpu.ops.ingest``.
"""

from audiogan_tpu.data.wavio import read_wav, write_wav
from audiogan_tpu.data.corpus import Corpus, build_corpus, HostBatcher
from audiogan_tpu.data.synthetic import make_synthetic_sc09

__all__ = [
    "read_wav", "write_wav", "Corpus", "build_corpus", "HostBatcher",
    "make_synthetic_sc09",
]
