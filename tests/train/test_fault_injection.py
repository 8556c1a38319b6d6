"""Crash-only recovery (SURVEY §5 failure detection): SIGKILL a training
process mid-run, resume from the last checkpoint, and require the final
metrics to be bit-identical to an uninterrupted run — possible because the
data stream and every PRNG draw are pure functions of (seed, step)."""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # 3 subprocess training runs; `make test-all`

REPO = Path(__file__).resolve().parents[2]

ARGS = [
    "train", "--preset", "tiny_sc09", "--total_steps", "4",
    "--set", "model.model_dim=4", "--set", "model.kernel_size=9",
    "--set", "model.max_channels=16", "--set", "train.batch_size=2",
    "--set", "loss.n_critic=2", "--set", "train.log_every=1",
    "--set", "train.ckpt_every=2", "--set", "train.sample_every=0",
    "--set", "data.clip_len=1024", "--set", "data.store_len=1280",
    "--set", "model.strides=[4, 4, 4]",
]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return env


def _run(workdir, wait=True, extra=()):
    cmd = [sys.executable, "-m", "audiogan_tpu.cli"] + ARGS + list(extra) + [
        "--workdir", str(workdir)]
    p = subprocess.Popen(cmd, env=_env(), stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT)
    if wait:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out.decode()[-2000:]
    return p


def _final_metrics(workdir):
    lines = (Path(workdir) / "metrics.jsonl").read_text().splitlines()
    recs = [json.loads(l) for l in lines]
    return [r for r in recs if r["step"] == 4][-1]


@pytest.mark.parametrize("dp", [1, 8])
def test_sigkill_then_resume_matches_uninterrupted(tmp_path, dp):
    """dp=8: the crash + restore happens with state sharded over the CPU
    farm (mesh.fsdp shards optimizer leaves over 'data'), so recovery is
    exercised at scale, not just single-device (SURVEY §5; C17)."""
    extra = [] if dp == 1 else [
        "--set", f"mesh.dp={dp}", "--set", "mesh.fsdp=true",
        "--set", "train.batch_size=8"]

    clean = tmp_path / "clean"
    _run(clean, extra=extra)
    want = _final_metrics(clean)

    crashy = tmp_path / "crashy"
    p = _run(crashy, wait=False, extra=extra)
    # kill as soon as the step-2 checkpoint lands
    ckpt = crashy / "ckpt" / "2"
    deadline = time.time() + 600
    while time.time() < deadline:
        if ckpt.exists():
            break
        if p.poll() is not None:  # finished before we killed it: still fine
            break
        time.sleep(0.5)
    if p.poll() is None:
        time.sleep(1.0)  # let the async ckpt finish writing
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=60)

    _run(crashy, extra=extra)  # resume to completion
    got = _final_metrics(crashy)
    for k in want:
        if k == "time" or "per_sec" in k:
            continue
        assert got[k] == want[k], (k, got[k], want[k])
