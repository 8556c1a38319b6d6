import json
from pathlib import Path

import numpy as np

from audiogan_tpu.cli import apply_overrides, main
from audiogan_tpu.config import get_preset


def test_info_and_overrides(capsys):
    assert main(["info", "--preset", "tiny_sc09",
                 "--set", "train.batch_size=3",
                 "--set", "model.model_dim=8"]) == 0
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["train"]["batch_size"] == 3
    assert cfg["model"]["model_dim"] == 8


def test_apply_overrides_types():
    cfg = get_preset("tiny_sc09")
    cfg = apply_overrides(cfg, ["data.mu_law=false",
                                "loss.gp_lambda=5.5",
                                "model.strides=[4, 4]"])
    assert cfg.data.mu_law is False
    assert cfg.loss.gp_lambda == 5.5
    assert cfg.model.strides == (4, 4)


def test_train_and_sample_end_to_end(tmp_path):
    """The [B:7]-shaped CPU-runnable integration test, via the CLI."""
    workdir = tmp_path / "run"
    rc = main([
        "train", "--preset", "tiny_sc09", "--workdir", str(workdir),
        "--total_steps", "2",
        "--set", "model.model_dim=4", "--set", "model.kernel_size=9",
        "--set", "model.max_channels=16", "--set", "train.batch_size=2",
        "--set", "loss.n_critic=2", "--set", "train.log_every=1",
        "--set", "train.ckpt_every=2", "--set", "train.sample_every=2",
    ])
    assert rc == 0
    assert (workdir / "config.json").exists()
    metrics = [json.loads(l) for l in
               (workdir / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) >= 2
    assert all(np.isfinite(m["d_loss"]) for m in metrics)
    assert list((workdir / "samples").glob("step_*/sample_*.wav"))

    rc = main(["sample", "--workdir", str(workdir), "--num", "2",
               "--seed", "3"])
    assert rc == 0
    wavs = sorted((workdir / "generated").glob("gen_seed3_*.wav"))
    assert len(wavs) == 2
    # determinism: same seed -> identical bytes
    first = wavs[0].read_bytes()
    rc = main(["sample", "--workdir", str(workdir), "--num", "2",
               "--seed", "3"])
    assert rc == 0
    assert wavs[0].read_bytes() == first

    # export: checkpoint -> standalone AOT artifact -> deterministic calls
    rc = main(["export", "--workdir", str(workdir), "--num", "2"])
    assert rc == 0
    from audiogan_tpu.serve import load_sampler
    s = load_sampler(workdir / "export")
    assert s.num == 2
    np.testing.assert_array_equal(s.generate(3), s.generate(3))


def test_build_corpus_cli(tmp_path, capsys):
    from audiogan_tpu.data.synthetic import make_synthetic_sc09
    wavs = make_synthetic_sc09(tmp_path / "w", n_per_class=1, num_classes=2,
                               clip_len=300)
    rc = main(["build-corpus", "--wav_dir", str(wavs),
               "--out_dir", str(tmp_path / "packed"), "--store_len", "512"])
    assert rc == 0
    assert (tmp_path / "packed" / "meta.json").exists()


def test_eval_command(tmp_path, capsys):
    workdir = tmp_path / "evalrun"
    assert main([
        "train", "--preset", "tiny_sc09", "--workdir", str(workdir),
        "--total_steps", "2",
        "--set", "model.model_dim=4", "--set", "model.kernel_size=9",
        "--set", "model.max_channels=16", "--set", "train.batch_size=2",
        "--set", "loss.n_critic=2", "--set", "train.log_every=1",
        "--set", "train.ckpt_every=2", "--set", "train.sample_every=0",
    ]) == 0
    capsys.readouterr()
    assert main(["eval", "--workdir", str(workdir), "--num", "4",
                 "--seed", "1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["step"] == 2
    for k in ("spectral_distance", "rms", "rms_real", "zcr", "peak"):
        assert np.isfinite(out[k]), k
    # deterministic
    assert main(["eval", "--workdir", str(workdir), "--num", "4",
                 "--seed", "1"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == out2
