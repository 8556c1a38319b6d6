"""Native (C++) wav decoder vs the numpy codec: bit-equality on the corpus
pack path (SURVEY C1 native tier). Skipped when the lib isn't built."""

import numpy as np
import pytest

from audiogan_tpu.data import build_corpus, make_synthetic_sc09
from audiogan_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built (make -C csrc)")


def test_decode_matches_numpy(tmp_path, rng):
    from audiogan_tpu.data.wavio import read_wav, write_wav
    x = rng.uniform(-0.9, 0.9, size=3000).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, 16000, x)

    rate, got = native.decode_to_store(p.read_bytes(), 4096)
    assert rate == 16000

    r2, y = read_wav(p)
    want = np.zeros(4096, np.int16)
    want[:3000] = np.clip(np.rint(y * 32768.0), -32768, 32767)
    np.testing.assert_array_equal(got, want)


def test_center_crop_matches(tmp_path, rng):
    from audiogan_tpu.data.wavio import write_wav
    x = (rng.uniform(-1, 1, size=5000) * 20000).astype(np.int16)
    p = tmp_path / "b.wav"
    write_wav(p, 8000, x)
    rate, got = native.decode_to_store(p.read_bytes(), 2000)
    off = (5000 - 2000) // 2
    np.testing.assert_array_equal(got, x[off:off + 2000])


def test_build_corpus_native_equals_fallback(tmp_path, monkeypatch):
    wavs = make_synthetic_sc09(tmp_path / "w", n_per_class=2, num_classes=3,
                               clip_len=1500)
    d1 = build_corpus(wavs, tmp_path / "native", store_len=2048)
    monkeypatch.setattr(native, "available", lambda: False)
    d2 = build_corpus(wavs, tmp_path / "fallback", store_len=2048)
    a = np.load(d1 / "clips.npy")
    b = np.load(d2 / "clips.npy")
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.load(d1 / "labels.npy"),
                                  np.load(d2 / "labels.npy"))


def test_garbage_returns_none():
    assert native.decode_to_store(b"not a wav at all", 128) is None


def test_gather_rows_matches_fancy_index(rng):
    clips = rng.integers(-32768, 32767, size=(37, 513)).astype(np.int16)
    idx = rng.integers(0, 37, size=(5, 11))
    got = native.gather_rows(clips, idx)
    np.testing.assert_array_equal(got, clips[idx])
    # explicit multi-thread path (worker count > 1 even on a 1-CPU host)
    got4 = native.gather_rows(clips, idx, n_threads=4)
    np.testing.assert_array_equal(got4, clips[idx])


def test_gather_rows_out_of_range_raises(rng):
    clips = np.zeros((4, 8), np.int16)
    with pytest.raises(ValueError, match="out of range"):
        native.gather_rows(clips, np.array([0, 4]))
    with pytest.raises(ValueError, match="out of range"):
        native.gather_rows(clips, np.array([-1]))


def test_host_batcher_native_equals_numpy(tmp_path, monkeypatch):
    """The full HostBatcher stream is byte-identical with the native gather
    on and off (determinism/resume depends on this, SURVEY §5)."""
    from audiogan_tpu.data import Corpus, HostBatcher

    wavs = make_synthetic_sc09(tmp_path / "w", n_per_class=3, num_classes=4,
                               clip_len=900)
    corpus = Corpus(build_corpus(wavs, tmp_path / "c", store_len=1024))
    b = HostBatcher(corpus, batch_size=6, n_views=3, seed=7)
    native_batches = [b.get(s) for s in range(3)]
    monkeypatch.setattr(native, "gather_rows", lambda *a, **k: None)
    for s, (clips, labels) in enumerate(native_batches):
        c2, l2 = b.get(s)
        np.testing.assert_array_equal(clips, c2)
        np.testing.assert_array_equal(labels, l2)
