"""E2E training THROUGH the on-device resampler (VERDICT r2 missing #2):
the resample_22k preset builds a synthetic 22050 Hz corpus and every ingest
runs the true-polyphase 320/441 conversion before crop/norm/mu-law — the
first path where ops/resample.py is not an identity in real training."""

import json

import numpy as np

from audiogan_tpu.cli import main
from audiogan_tpu.config import get_preset


def test_resample_preset_is_nonidentity():
    cfg = get_preset("resample_22k")
    assert cfg.data.source_rate != cfg.data.sample_rate
    # resampled store row leaves slack for the random crop
    assert cfg.data.resampled_len > cfg.data.clip_len
    assert cfg.data.resampled_len == -(-cfg.data.store_len * 320 // 441)


def test_resample_train_e2e(tmp_path):
    """2 steps of resample_22k (scaled tiny) on CPU via the CLI: the
    synthetic corpus is written at 22050 Hz (loop.py passes
    data.source_rate to the fixture generator) and losses stay finite
    through the resampled ingest."""
    workdir = tmp_path / "run"
    rc = main([
        "train", "--preset", "resample_22k", "--workdir", str(workdir),
        "--total_steps", "2",
        "--set", "model.model_dim=4", "--set", "model.kernel_size=9",
        "--set", "model.max_channels=16", "--set", "train.batch_size=2",
        "--set", "loss.n_critic=2", "--set", "train.log_every=1",
        "--set", "train.ckpt_every=0", "--set", "train.sample_every=0",
    ])
    assert rc == 0
    cfg_json = json.loads((workdir / "config.json").read_text())
    assert cfg_json["data"]["source_rate"] == 22050
    assert cfg_json["data"]["sample_rate"] == 16000
    metrics = [json.loads(l) for l in
               (workdir / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) >= 2
    assert all(np.isfinite(m["d_loss"]) for m in metrics)
    # the packed synthetic corpus really is at the SOURCE rate
    meta = json.loads(
        (workdir / "synthetic_corpus" / "meta.json").read_text())
    assert meta["source_rate"] == 22050
