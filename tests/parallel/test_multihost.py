"""2-process jax.distributed over localhost CPU: the DCN tier actually runs
(SURVEY §2.4). Both ranks build the hybrid mesh through the SAME code path
the training loop uses (make_train_mesh + put_global_batch) and must agree
with each other AND with a single-process run of the identical global batch
at the equivalent flat-DP geometry. Three step families:

    plain  auto-SPMD step, ('dcn','data','cp')=(2,4,1)  vs  dp=8
    cp     shard_map cp step, (2,2,2)                    vs  dp=4,cp=2
    tp     shard_map tp step, (2,2,1,2)                  vs  dp=4,tp=2
"""

import dataclasses
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from audiogan_tpu.config import MeshCfg

from helpers_train import raw_batch, tiny_config

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _repo_root():
    return str(Path(__file__).resolve().parents[2])


def _run_pair(mode: str):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)               # worker sets its own 4-dev farm
    env["PALLAS_AXON_POOL_IPS"] = ""         # never claim the TPU
    env["PYTHONPATH"] = _repo_root() + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), str(i), "2", str(port), mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(WORKER.parent)) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    hists = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("METRICS ")]
        assert lines, out[-3000:]
        hists.append(json.loads(lines[0][len("METRICS "):]))

    # both ranks observe identical (replicated) metrics
    for m0, m1 in zip(*hists):
        for k in m0:
            np.testing.assert_allclose(m0[k], m1[k], rtol=1e-6, err_msg=k)
    return hists[0]


def _single_process_reference(mode: str):
    """The flat-DP-equivalent single-process run of the same global batch."""
    from audiogan_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                            make_mesh, state_shardings)
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step

    mesh_cfg = {"plain": MeshCfg(dp=8, cp=1),
                "cp": MeshCfg(dp=4, cp=2),
                "tp": MeshCfg(dp=4, tp=2)}[mode]
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, mesh=mesh_cfg,
        train=dataclasses.replace(cfg.train, batch_size=16))
    mesh = make_mesh(cfg)
    state = create_train_state(cfg)
    state = jax.device_put(state, state_shardings(mesh, state))
    if mode == "cp":
        from audiogan_tpu.train.cp_step import build_cp_train_step
        step = build_cp_train_step(cfg, mesh)(state)
    elif mode == "tp":
        from audiogan_tpu.train.tp_step import build_tp_train_step
        step = build_tp_train_step(cfg, mesh)(state)
    else:
        step = jax.jit(build_train_step(cfg), donate_argnums=(0,))
    ref = []
    for s in range(2):
        clips, labels = raw_batch(cfg, seed=100 + s)
        state, metrics = step(state,
                              jax.device_put(clips, batch_sharding(mesh)),
                              jax.device_put(labels, label_sharding(mesh)))
        ref.append({k: float(v) for k, v in jax.device_get(metrics).items()})
    return ref


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["plain", "cp", "tp"])
def test_two_process_dcn_matches_single_process(mode):
    hist = _run_pair(mode)
    ref = _single_process_reference(mode)
    for m2p, m1p in zip(hist, ref):
        for k in m1p:
            np.testing.assert_allclose(m2p[k], m1p[k], rtol=2e-4, atol=1e-5,
                                       err_msg=k)
