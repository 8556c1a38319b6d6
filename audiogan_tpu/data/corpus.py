"""Packed int16 memmap corpus + deterministic host batcher (SURVEY C1, C6).

Reference equivalent: torch Dataset + DataLoader fork workers doing decode +
DSP per item. TPU-native inversion: `build_corpus` decodes every wav ONCE
into `clips.npy` (int16 [N, store_len]) + `labels.npy` (int32 [N]) +
`meta.json`; training then memmaps clips and serves fixed-shape int16
batches with zero per-step decode work. All DSP happens on device
(ops/ingest.py). Batch order is a pure function of (seed, step) so resume
from a checkpoint replays the exact data stream (SURVEY §5 failure
recovery).
"""

from __future__ import annotations

import json
import threading
import queue as queue_mod
from pathlib import Path

import numpy as np

from audiogan_tpu.data.wavio import read_wav


def build_corpus(
    wav_dir: str | Path,
    out_dir: str | Path,
    store_len: int,
    source_rate: int | None = None,
) -> Path:
    """Pack a directory tree of wavs into a memmap corpus.

    Labels come from the parent directory name when it is an integer
    (SC09 layout `<digit>/<file>.wav`), else -1 (unconditional). Clips are
    center-padded/cropped to store_len at their native rate; rate mismatch
    across files is an error (resampling is on-device, one rate per corpus).
    """
    from audiogan_tpu.data import native

    wav_dir, out_dir = Path(wav_dir), Path(out_dir)
    paths = sorted(wav_dir.rglob("*.wav"))
    if not paths:
        raise FileNotFoundError(f"no .wav files under {wav_dir}")
    clips = np.zeros((len(paths), store_len), dtype=np.int16)
    labels = np.full((len(paths),), -1, dtype=np.int32)
    rate = source_rate
    use_native = native.available()
    for i, p in enumerate(paths):
        r = None
        if use_native:
            decoded = native.decode_to_store(p.read_bytes(), store_len)
            if decoded is not None:
                r, clips[i] = decoded
        if r is None:  # numpy fallback (no native lib / exotic format)
            r, x = read_wav(p)
            n = min(len(x), store_len)
            off = max((len(x) - store_len) // 2, 0)
            # scale by 32768 so int16 sources pass through bit-exactly
            clips[i, :n] = np.clip(np.rint(x[off:off + n] * 32768.0),
                                   -32768, 32767).astype(np.int16)
        if rate is None:
            rate = r
        elif r != rate:
            raise ValueError(f"{p}: rate {r} != corpus rate {rate}")
        if p.parent.name.lstrip("-").isdigit():
            labels[i] = int(p.parent.name)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / "clips.npy", clips)
    np.save(out_dir / "labels.npy", labels)
    (out_dir / "meta.json").write_text(json.dumps({
        "num_clips": len(paths), "store_len": store_len, "source_rate": rate,
        "num_classes": int(labels.max() + 1) if labels.max() >= 0 else 0,
    }))
    return out_dir


class Corpus:
    """Memmap view over a packed corpus directory."""

    def __init__(self, corpus_dir: str | Path):
        d = Path(corpus_dir)
        self.clips = np.load(d / "clips.npy", mmap_mode="r")
        self.labels = np.load(d / "labels.npy", mmap_mode="r")
        self.meta = json.loads((d / "meta.json").read_text())

    def __len__(self) -> int:
        return self.clips.shape[0]


class HostBatcher:
    """Deterministic (seed, step) -> batch sampler with optional prefetch.

    Each `get(step)` returns (clips int16 [n_views, B, store_len],
    labels int32 [n_views, B]): the train step consumes n_critic real
    minibatches per update (SURVEY §3.4), stacked as leading axis n_views.
    Sampling is with-replacement from a per-step PRNG stream — stateless, so
    checkpoint resume replays the identical stream (SURVEY §5).
    """

    def __init__(self, corpus: Corpus, batch_size: int, n_views: int,
                 seed: int = 0, prefetch: int = 2,
                 indices_only: bool = False):
        self.corpus = corpus
        self.batch_size = batch_size
        self.n_views = n_views
        self.seed = seed
        self._q: queue_mod.Queue | None = None
        self._prefetch = prefetch
        self._thread: threading.Thread | None = None
        # indices_only: emit (idx int32, labels) instead of gathered clips —
        # the device-resident-corpus mode (data.device_corpus) gathers
        # in-graph from the SAME index stream, so the two modes train
        # bit-identically (tests/train/test_device_corpus.py)
        self.indices_only = indices_only

    def _indices(self, step: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, step))
        return rng.integers(0, len(self.corpus),
                            size=(self.n_views, self.batch_size))

    def _sample(self, step: int) -> tuple[np.ndarray, np.ndarray]:
        from audiogan_tpu.data import native

        idx = self._indices(step)
        labels = np.ascontiguousarray(self.corpus.labels[idx])
        if self.indices_only:
            return idx.astype(np.int32), labels
        # native C++ gather (csrc/batcher.cpp) when built — byte-identical
        # to the numpy fancy-index fallback (tests/data/test_native.py)
        clips = native.gather_rows(self.corpus.clips, idx)
        if clips is None:
            clips = np.ascontiguousarray(self.corpus.clips[idx])
        return clips, labels

    def get(self, step: int) -> tuple[np.ndarray, np.ndarray]:
        return self._sample(step)

    # -- background prefetch (single-producer single-consumer, SURVEY §5) --
    def start_prefetch(self, first_step: int, last_step: int) -> None:
        self._q = queue_mod.Queue(maxsize=self._prefetch)

        def worker():
            for s in range(first_step, last_step):
                self._q.put((s, self._sample(s)))
            self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def next_prefetched(self) -> tuple[int, tuple[np.ndarray, np.ndarray]] | None:
        assert self._q is not None, "call start_prefetch first"
        return self._q.get()
