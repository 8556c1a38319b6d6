import numpy as np

from audiogan_tpu.data import (Corpus, HostBatcher, build_corpus,
                               make_synthetic_sc09)


def test_build_and_batch(tmp_path):
    wavs = make_synthetic_sc09(tmp_path / "wavs", n_per_class=2,
                               num_classes=3, clip_len=2000)
    cdir = build_corpus(wavs, tmp_path / "packed", store_len=2048)
    corpus = Corpus(cdir)
    assert len(corpus) == 6
    assert corpus.clips.shape == (6, 2048)
    assert corpus.meta["source_rate"] == 16000
    assert corpus.meta["num_classes"] == 3
    assert set(np.asarray(corpus.labels)) == {0, 1, 2}

    b = HostBatcher(corpus, batch_size=4, n_views=3, seed=1)
    clips, labels = b.get(step=10)
    assert clips.shape == (3, 4, 2048) and clips.dtype == np.int16
    assert labels.shape == (3, 4)
    # deterministic in (seed, step)
    clips2, _ = HostBatcher(corpus, 4, 3, seed=1).get(10)
    np.testing.assert_array_equal(clips, clips2)
    clips3, _ = b.get(11)
    assert not np.array_equal(clips, clips3)


def test_prefetch_stream_matches_direct(tmp_path):
    wavs = make_synthetic_sc09(tmp_path / "w", n_per_class=2, num_classes=2,
                               clip_len=500)
    corpus = Corpus(build_corpus(wavs, tmp_path / "p", store_len=512))
    b = HostBatcher(corpus, batch_size=2, n_views=1, seed=3)
    b.start_prefetch(0, 5)
    for s in range(5):
        item = b.next_prefetched()
        assert item is not None
        step, (clips, labels) = item
        assert step == s
        ref_clips, ref_labels = b.get(s)
        np.testing.assert_array_equal(clips, ref_clips)
        np.testing.assert_array_equal(labels, ref_labels)
    assert b.next_prefetched() is None


def test_prefetch_stress_bounded_queue(tmp_path):
    """SURVEY §5 race hazards: the SPSC prefetch queue under a jittery
    consumer — 300 steps, random consumer stalls (so the producer
    alternates between blocking on a full queue and racing ahead), a
    non-zero start step, exact stream order, clean termination."""
    import random
    import time

    wavs = make_synthetic_sc09(tmp_path / "w", n_per_class=2, num_classes=2,
                               clip_len=500)
    corpus = Corpus(build_corpus(wavs, tmp_path / "p", store_len=512))
    b = HostBatcher(corpus, batch_size=2, n_views=2, seed=11)
    start, stop = 7, 307
    b.start_prefetch(start, stop)
    rng = random.Random(0)
    for s in range(start, stop):
        if rng.random() < 0.05:
            time.sleep(0.002)  # let the producer fill the bounded queue
        item = b.next_prefetched()
        assert item is not None, s
        step, (clips, labels) = item
        assert step == s
        if s % 50 == 0:  # spot-check payload against the pure function
            ref_clips, ref_labels = b.get(s)
            np.testing.assert_array_equal(clips, ref_clips)
            np.testing.assert_array_equal(labels, ref_labels)
    assert b.next_prefetched() is None


def test_synthetic_deterministic(tmp_path):
    a = make_synthetic_sc09(tmp_path / "a", n_per_class=1, num_classes=2,
                            clip_len=400, seed=5)
    b = make_synthetic_sc09(tmp_path / "b", n_per_class=1, num_classes=2,
                            clip_len=400, seed=5)
    from audiogan_tpu.data import read_wav
    for f in sorted(a.rglob("*.wav")):
        g = b / f.relative_to(a)
        np.testing.assert_array_equal(read_wav(f)[1], read_wav(g)[1])
