"""Worker for the 2-process jax.distributed CPU test (SURVEY §2.4 DCN tier).

Launched by tests/parallel/test_multihost.py as:
    python multihost_worker.py <process_id> <num_processes> <port>
Each process gets 4 virtual CPU devices; the pair forms the
('dcn','data','cp') = (2,4,1) hybrid mesh and runs 2 real train steps on the
same code path train/loop.py uses (make_train_mesh + put_global_batch),
printing the metrics as one JSON line.
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

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

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from helpers_train import raw_batch, tiny_config

    from audiogan_tpu.config import MeshCfg
    from audiogan_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                            state_shardings)
    from audiogan_tpu.parallel.multihost import (make_train_mesh,
                                                 put_global_batch)
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        mesh=MeshCfg(dp=4, cp=1),              # per-process dp
        train=dataclasses.replace(cfg.train, batch_size=16),
    )

    mesh = make_train_mesh(cfg)
    assert mesh.axis_names == ("dcn", "data", "cp"), mesh
    assert mesh.shape["dcn"] == nproc

    state = create_train_state(cfg)
    state = jax.device_put(state, state_shardings(mesh, state))
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
