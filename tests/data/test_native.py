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
