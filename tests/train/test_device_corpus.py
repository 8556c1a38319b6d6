"""Device-resident corpus mode (data.device_corpus): the in-graph gather
trains bit-identically to the host batcher — same (seed, step)-pure index
stream, same int16 rows, same step math — with only KB-scale host->device
traffic per step."""

import dataclasses
import json

import jax
import numpy as np

from audiogan_tpu.data import Corpus, HostBatcher, build_corpus
from audiogan_tpu.data.synthetic import make_synthetic_sc09
from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import (build_device_corpus_step,
                                     build_train_step, num_views)

from helpers_train import tiny_config


def _corpus(tmp_path, cfg):
    wavs = make_synthetic_sc09(tmp_path / "w", n_per_class=3, num_classes=4,
                               clip_len=cfg.data.store_len,
                               rate=cfg.data.source_rate)
    return Corpus(build_corpus(wavs, tmp_path / "c",
                               store_len=cfg.data.store_len))


def test_step_matches_host_batcher(tmp_path):
    """Both resident-index forms — per-step idx (index_chunk=0) and the
    chunked block the loop ships by default (the step picks its row
    in-graph at state.step % chunk) — match the host-batcher step."""
    cfg = tiny_config()
    cfg0 = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, index_chunk=0))
    K = 4                       # > the 3 steps run: partial use is normal
    cfgk = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, index_chunk=K))
    corpus = _corpus(tmp_path, cfg)
    n = num_views(cfg)

    host = HostBatcher(corpus, cfg.train.batch_size, n, seed=5)
    dev = HostBatcher(corpus, cfg.train.batch_size, n, seed=5,
                      indices_only=True)
    corpus_dev = jax.device_put(np.ascontiguousarray(corpus.clips))

    s_host = create_train_state(cfg)
    s_dev = create_train_state(cfg)
    s_chk = create_train_state(cfg)
    step_h = jax.jit(build_train_step(cfg))
    step_d = jax.jit(build_device_corpus_step(cfg0))
    step_c = jax.jit(build_device_corpus_step(cfgk))
    rows = [dev.get(s) for s in range(K)]
    idx_c = np.stack([r[0] for r in rows])
    lab_c = np.stack([r[1] for r in rows])

    for s in range(3):
        clips, labels = host.get(s)
        idx, labels_d = dev.get(s)
        np.testing.assert_array_equal(labels, labels_d)
        np.testing.assert_array_equal(np.asarray(corpus.clips)[idx], clips)
        s_host, m_h = step_h(s_host, clips, labels)
        s_dev, m_d = step_d(s_dev, corpus_dev, idx, labels_d)
        s_chk, m_c = step_c(s_chk, corpus_dev, idx_c, lab_c)
        for k in m_h:
            np.testing.assert_allclose(
                np.asarray(m_d[k]), np.asarray(m_h[k]), rtol=1e-6,
                atol=1e-7, err_msg=f"step {s}: {k}")
            np.testing.assert_array_equal(
                np.asarray(m_c[k]), np.asarray(m_d[k]),
                err_msg=f"step {s} chunked: {k}")


def test_loop_end_to_end_device_corpus(tmp_path):
    """The full train() loop in device-corpus mode vs host mode: identical
    metrics.jsonl streams (also exercises the loop wiring + HLO dump)."""
    from audiogan_tpu.train.loop import train

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, total_steps=2, log_every=1,
                                  ckpt_every=0, sample_every=0,
                                  dump_hlo=True),
    )

    def run(dev_corpus, wd):
        c = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          device_corpus=dev_corpus))
        train(c, tmp_path / wd, resume=False)
        return [json.loads(line) for line in
                (tmp_path / wd / "metrics.jsonl").read_text().splitlines()]

    m_host = run(False, "host")
    m_dev = run(True, "dev")
    assert len(m_host) == len(m_dev) >= 2
    for a, b in zip(m_host, m_dev):
        for k in ("d_loss", "g_loss", "gp", "w_dist"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-6, atol=1e-7,
                                       err_msg=k)
    assert (tmp_path / "dev" / "step_optimized_hlo.txt").exists()


def test_loop_device_corpus_dp2(tmp_path):
    """dp=2: idx/labels arrive 'data'-sharded and the in-graph gather is
    constrained to the same sharding — must match the host-batcher dp=2
    run exactly."""
    from audiogan_tpu.config import MeshCfg
    from audiogan_tpu.train.loop import train

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        mesh=MeshCfg(dp=2),
        train=dataclasses.replace(cfg.train, total_steps=2, log_every=1,
                                  ckpt_every=0, sample_every=0,
                                  batch_size=4),
    )

    def run(dev_corpus, wd):
        c = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          device_corpus=dev_corpus))
        train(c, tmp_path / wd, resume=False)
        return [json.loads(line) for line in
                (tmp_path / wd / "metrics.jsonl").read_text().splitlines()]

    m_host = run(False, "host2")
    m_dev = run(True, "dev2")
    for a, b in zip(m_host, m_dev):
        for k in ("d_loss", "g_loss", "gp", "w_dist"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-6, atol=1e-7,
                                       err_msg=k)


def test_oversized_corpus_falls_back_to_host(tmp_path, monkeypatch, capsys):
    """Corpora past the HBM budget fall back to the host batcher with a
    warning instead of failing (presets default the flag on)."""
    from audiogan_tpu.train import loop as loop_mod

    monkeypatch.setattr(loop_mod, "DEVICE_CORPUS_MAX_GB", 1e-9)
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, device_corpus=True),
        train=dataclasses.replace(cfg.train, total_steps=1, log_every=1,
                                  ckpt_every=0, sample_every=0),
    )
    loop_mod.train(cfg, tmp_path / "fb", resume=False)
    assert "falling back to" in capsys.readouterr().out


def _loop_metrics_pair(tmp_path, cfg):
    """Run the full train() loop with device_corpus off/on; return both
    metrics.jsonl streams."""
    from audiogan_tpu.train.loop import train

    def run(dev_corpus, wd):
        c = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          device_corpus=dev_corpus))
        train(c, tmp_path / wd, resume=False)
        return [json.loads(line) for line in
                (tmp_path / wd / "metrics.jsonl").read_text().splitlines()]

    return run(False, "host"), run(True, "dev")


def test_loop_index_chunk_boundary(tmp_path):
    """Loop-level equality of the chunked index form across chunk
    boundaries: index_chunk=2 over 5 steps forces three block puts and
    modular row selection (steps 0-1 / 2-3 / 4) — the metrics stream
    must match per-step index shipping (index_chunk=0) exactly."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, device_corpus=True),
        train=dataclasses.replace(cfg.train, total_steps=5, log_every=1,
                                  ckpt_every=0, sample_every=0),
    ).validate()
    from audiogan_tpu.train.loop import train

    def run(chunk, wd):
        c = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, index_chunk=chunk))
        train(c, tmp_path / wd, resume=False)
        return [json.loads(line) for line in
                (tmp_path / wd / "metrics.jsonl").read_text().splitlines()]

    m0, m2 = run(0, "perstep"), run(2, "chunked")
    assert len(m0) == len(m2) == 5
    for a, b in zip(m0, m2):
        for k in ("d_loss", "g_loss", "gp", "w_dist"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-6, atol=1e-7,
                                       err_msg=k)


def test_loop_device_corpus_cp2(tmp_path):
    """Resident corpus composed with the context-parallel step (dp=2,
    cp=2): the in-graph gather feeds the shard_map'd cp step and must
    match the host-batcher cp run exactly."""
    from audiogan_tpu.config import MeshCfg

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        mesh=MeshCfg(dp=2, cp=2),
        train=dataclasses.replace(cfg.train, total_steps=2, log_every=1,
                                  ckpt_every=0, sample_every=0,
                                  batch_size=4),
    ).validate()
    m_host, m_dev = _loop_metrics_pair(tmp_path, cfg)
    assert len(m_host) == len(m_dev) >= 2
    for a, b in zip(m_host, m_dev):
        for k in ("d_loss", "g_loss", "gp", "w_dist"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-6, atol=1e-7,
                                       err_msg=k)


def test_loop_device_corpus_tp2(tmp_path):
    """Resident corpus composed with the tensor-parallel step (dp=2,
    tp=2) — same equality bar as the cp case."""
    from audiogan_tpu.config import MeshCfg

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        mesh=MeshCfg(dp=2, tp=2),
        train=dataclasses.replace(cfg.train, total_steps=2, log_every=1,
                                  ckpt_every=0, sample_every=0,
                                  batch_size=4),
    ).validate()
    m_host, m_dev = _loop_metrics_pair(tmp_path, cfg)
    assert len(m_host) == len(m_dev) >= 2
    for a, b in zip(m_host, m_dev):
        for k in ("d_loss", "g_loss", "gp", "w_dist"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-6, atol=1e-7,
                                       err_msg=k)
