"""Worker for the 2-process jax.distributed CPU tests (SURVEY §2.4 DCN tier).

Launched by tests/parallel/test_multihost.py as:
    python multihost_worker.py <process_id> <num_processes> <port> [mode]
Each process gets 4 virtual CPU devices. mode selects the step family the
pair exercises over the hybrid mesh (make_train_mesh + put_global_batch,
the exact code path train/loop.py uses), printing metrics as one JSON line:

    plain  ('dcn','data','cp') = (2,4,1), auto-SPMD step (train/step.py)
    cp     ('dcn','data','cp') = (2,2,2), shard_map cp step (train/cp_step.py)
    tp     ('dcn','data','cp','tp') = (2,2,1,2), shard_map tp step
           (train/tp_step.py)
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "plain"

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")   # config beats env here
    jax.config.update("jax_default_matmul_precision", "highest")
    from audiogan_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()                  # env from parent conftest
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.default_backend() == "cpu"

    import dataclasses

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from helpers_train import raw_batch, tiny_config

    from audiogan_tpu.config import MeshCfg
    from audiogan_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                            state_shardings)
    from audiogan_tpu.parallel.multihost import (make_train_mesh,
                                                 put_global_batch)
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step

    # per-process mesh cfg; global DP = nproc * dp
    mesh_cfg = {"plain": MeshCfg(dp=4, cp=1),
                "cp": MeshCfg(dp=2, cp=2),
                "tp": MeshCfg(dp=2, tp=2)}[mode]
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        mesh=mesh_cfg,
        train=dataclasses.replace(cfg.train, batch_size=16),
    )

    mesh = make_train_mesh(cfg)
    want_axes = (("dcn", "data", "cp", "tp") if mode == "tp"
                 else ("dcn", "data", "cp"))
    assert mesh.axis_names == want_axes, mesh
    assert mesh.shape["dcn"] == nproc

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
    b_shard, l_shard = batch_sharding(mesh), label_sharding(mesh)

    hist = []
    for s in range(2):
        clips, labels = raw_batch(cfg, seed=100 + s)   # same on every rank
        state, metrics = step(state,
                              put_global_batch(clips, b_shard),
                              put_global_batch(labels, l_shard))
        hist.append({k: float(v) for k, v in jax.device_get(metrics).items()})
    print("METRICS " + json.dumps(hist), flush=True)


if __name__ == "__main__":
    main()
