"""Batched on-TPU verification session (.claude/skills/verify drive flows).

One sequential TPU-claiming process (single-chip lease — never run two):
  1. ingest/data flow: synthetic corpus -> batcher -> jit ingest on TPU ->
     mu-law expand -> wav round-trip
  2. CLI train, 5 steps of tiny_sc09 on the real chip
  3. CLI sample twice, byte-identical wavs
  4. bench.py flagship line (the driver's headline path)
  5. sampler batch-size A/B for the audio-sec/sec metric (num=64/128/256)

Usage:  PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/verify_session.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

WORK = Path("/tmp/vrun_r3c")


def banner(s):
    print(f"\n===== {s} =====", flush=True)


def flow_ingest():
    banner("flow 1: ingest/data")
    import numpy as np
    from scipy.io import wavfile

    from audiogan_tpu.config import get_preset
    from audiogan_tpu.data.corpus import Corpus, HostBatcher, build_corpus
    from audiogan_tpu.data.synthetic import make_synthetic_sc09
    from audiogan_tpu.data.wavio import write_wav
    from audiogan_tpu.ops.ingest import ingest_batch
    from audiogan_tpu.ops.mulaw import mu_law_expand

    cfg = get_preset("tiny_sc09")
    wavs, packed = WORK / "wavs", WORK / "packed"
    if not (packed / "meta.json").exists():
        make_synthetic_sc09(wavs, n_per_class=2, num_classes=10,
                            rate=16000, clip_len=16000, seed=0)
        build_corpus(wavs, packed, store_len=cfg.data.store_len,
                     source_rate=16000)
    corpus = Corpus(packed)
    batcher = HostBatcher(corpus, 4, 1, seed=0)
    clips, labels = batcher.get(0)
    key = jax.random.key(0)
    x = jax.jit(lambda r, k: ingest_batch(r, cfg.data, k))(clips[0], key)
    y = mu_law_expand(x, cfg.data.mu)
    y = np.asarray(y)
    assert np.isfinite(y).all() and y.shape == (4, cfg.data.clip_len)
    out = WORK / "ingest_check.wav"
    write_wav(out, 16000, y[0])
    rate, back = wavfile.read(out)
    assert rate == 16000 and back.shape[0] == cfg.data.clip_len
    print("ingest flow OK; device:", x.device, flush=True)


def flow_train():
    banner("flow 2: CLI train tiny_sc09 x5 on TPU")
    from audiogan_tpu.cli import main
    rc = main(["train", "--preset", "tiny_sc09", "--data_dir", "",
               "--total_steps", "5", "--workdir", str(WORK / "run")])
    assert rc == 0
    assert any((WORK / "run" / "ckpt").iterdir())
    print("train flow OK", flush=True)


def flow_sample():
    banner("flow 3: CLI sample determinism")
    from audiogan_tpu.cli import main
    for d in ("s1", "s2"):
        rc = main(["sample", "--workdir", str(WORK / "run"), "--num", "4",
                   "--seed", "0", "--out_dir", str(WORK / d)])
        assert rc == 0
    w1 = sorted((WORK / "s1").glob("*.wav"))
    w2 = sorted((WORK / "s2").glob("*.wav"))
    assert w1 and len(w1) == len(w2)
    for a, b in zip(w1, w2):
        assert a.read_bytes() == b.read_bytes(), (a, b)
    print("sample determinism OK", flush=True)


def _load_bench():
    # `import bench` resolves to the bench/ PACKAGE (proxy modules); the
    # headline harness is the root-level bench.py file
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_headline", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def flow_bench():
    banner("flow 4: bench.py flagship line")
    bench = _load_bench()
    line = bench.bench_one("wgan_gp_b64", "bfloat16", None, 8,
                           bench.load_proxy("torch-cpu-eager"))
    print(json.dumps(line), flush=True)
    assert line["value"] > 1.0, line


def sampler_batch_ab():
    banner("sampler batch-size A/B (audio-sec/sec)")
    bench = _load_bench()
    from audiogan_tpu.cli import apply_overrides
    from audiogan_tpu.config import get_preset
    cfg = apply_overrides(get_preset("wgan_gp_b64"),
                          ["train.dtype=bfloat16"])
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [64, 128, 256]
    res = {n: [] for n in sizes}
    dead = set()
    for rnd in range(3):
        for n in res:
            if n in dead:
                continue
            try:
                res[n].append(
                    round(bench.bench_sample(cfg, n_iters=6, num=n), 1))
            except Exception as e:  # e.g. HBM OOM at huge batches
                res[n].append(f"ERR {type(e).__name__}")
                dead.add(n)
    print(json.dumps({"sampler_audio_sec_per_sec":
                      {str(k): v for k, v in res.items()}}), flush=True)


def flow_cp_pallas():
    """Compiled shard_map + Pallas on the real chip (cp=1 mesh): the
    mechanism CI cannot execute (interpret-mode pallas bodies cannot be
    discharged inside a vma-checked shard_map, and cp>1 needs >1 chip).
    At cp=1 the halos are identity but everything else — check_vma
    shard_map, psums, Mosaic kernels with vma-typed out shapes — is the
    real cp code path. xla vs pallas tiers must agree."""
    banner("flow 6: compiled shard_map+pallas cp step (cp=1, real chip)")
    import numpy as np
    from jax.sharding import Mesh

    from audiogan_tpu.config import (Config, DataCfg, LossCfg, MeshCfg,
                                     ModelCfg, TrainCfg)
    from audiogan_tpu.train.cp_step import build_cp_train_step
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import num_views

    res = {}
    for tier in ("xla", "pallas"):
        cfg = Config(
            name="cp1_hw",
            data=DataCfg(clip_len=1024, store_len=1280),
            model=ModelCfg(generator="wavegan", model_dim=32,
                           kernel_size=25, strides=(4, 4, 4),
                           max_channels=128, phase_shuffle=1),
            loss=LossCfg(n_critic=2),
            train=TrainCfg(batch_size=8, kernels=tier),
            mesh=MeshCfg(dp=1, cp=1),
        ).validate()
        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                    ("data", "cp"))
        state = create_train_state(cfg)
        step = build_cp_train_step(cfg, mesh)(state)
        rng = np.random.default_rng(0)
        n = num_views(cfg)
        clips = (rng.standard_normal((n, 8, cfg.data.store_len)) * 8000
                 ).clip(-32768, 32767).astype(np.int16)
        labels = np.zeros((n, 8), np.int32)
        state, m = step(state, clips, labels)
        res[tier] = {k: float(v) for k, v in jax.device_get(m).items()}
        print(tier, json.dumps(res[tier]), flush=True)
    import numpy.testing as npt
    for k in res["xla"]:
        npt.assert_allclose(res["pallas"][k], res["xla"][k],
                            rtol=2e-2, atol=2e-3, err_msg=k)
    print("cp=1 shard_map pallas == xla on HW", flush=True)


def flow_serve():
    """AOT export on the real chip + artifact generate + HTTP roundtrip
    (serve/export.py, serve/server.py; needs flow 2's checkpoint)."""
    banner("flow 7: export artifact + HTTP serve")
    import json as json_mod
    import threading
    import urllib.request

    import numpy as np

    from audiogan_tpu.cli import main
    from audiogan_tpu.serve import load_sampler, make_server

    rc = main(["export", "--workdir", str(WORK / "run"), "--num", "4",
               "--out_dir", str(WORK / "artifact")])
    assert rc == 0
    s = load_sampler(WORK / "artifact")
    a = s.generate(seed=11)
    b = s.generate(seed=11)
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all() and a.shape[0] == 4

    srv = make_server(s, port=0)
    host, port = srv.server_address[:2]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://{host}:{port}/generate",
            data=json_mod.dumps({"seed": 1, "num": 2}).encode())
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json_mod.loads(r.read())
        assert out["num"] == 2 and len(out["wavs"]) == 2
    finally:
        srv.shutdown()
        srv.server_close()
    print("export + serve OK", flush=True)


def flow_widebatch():
    """Width-aware default_sample_num (bench.py): the narrow tiny preset
    now defaults to 16384 clips in flight — same activation bytes as the
    flagship's 4096 at dim 64. A/B old vs new default."""
    banner("flow 8: width-aware sampler batch (tiny preset)")
    bench = _load_bench()
    from audiogan_tpu.cli import apply_overrides
    from audiogan_tpu.config import get_preset
    cfg = apply_overrides(get_preset("tiny_sc09"), ["train.dtype=bfloat16"])
    assert bench.default_sample_num(cfg) == 16384, \
        bench.default_sample_num(cfg)
    res = {}
    for num in (4096, 16384, 4096, 16384):  # interleaved
        res.setdefault(num, []).append(
            round(bench.bench_sample(cfg, n_iters=4, num=num), 1))
    print(json.dumps({"tiny_audio_sec_per_sec": res}), flush=True)


def flow_devcorpus():
    """Sustained LOOP throughput, host-batcher vs device-resident corpus
    (data.device_corpus): the step is compute-bound but the real loop
    ships ~21 MB/step (flagship) over the host link; resident mode sends
    only indices. Interleaved rounds, median of per-window steps/s with
    the first (compile) window dropped."""
    banner("flow 9: device-resident corpus loop A/B (flagship)")
    import json as json_mod
    import shutil
    import statistics

    from audiogan_tpu.cli import main

    def run(dev, wd, steps=60):
        shutil.rmtree(wd, ignore_errors=True)
        rc = main(["train", "--preset", "wgan_gp_b64", "--data_dir", "",
                   "--workdir", str(wd), "--total_steps", str(steps),
                   "--set", "train.dtype=bfloat16",
                   "--set", f"data.device_corpus={str(dev).lower()}",
                   "--set", "train.log_every=10",
                   "--set", "train.ckpt_every=0",
                   "--set", "train.sample_every=0"])
        assert rc == 0
        rows = [json_mod.loads(line) for line in
                (wd / "metrics.jsonl").read_text().splitlines()]
        return [r["steps_per_sec"] for r in rows[1:]]  # drop compile window

    res = {"host": [], "device": []}
    for rnd in range(2):
        res["host"] += run(False, WORK / f"dc_host{rnd}")
        res["device"] += run(True, WORK / f"dc_dev{rnd}")
    out = {k: {"median": round(statistics.median(v), 3),
               "windows": [round(x, 2) for x in v]} for k, v in res.items()}
    print(json.dumps({"loop_steps_per_sec": out}), flush=True)


FLOWS = {"ingest": flow_ingest, "train": flow_train, "sample": flow_sample,
         "bench": flow_bench, "sampler_ab": sampler_batch_ab,
         "cp_pallas": flow_cp_pallas, "serve": flow_serve,
         "widebatch": flow_widebatch, "devcorpus": flow_devcorpus}

if __name__ == "__main__":
    t0 = time.time()
    WORK.mkdir(parents=True, exist_ok=True)
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    from audiogan_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()
    # numeric args (sampler_ab batch sizes) pass through to the flow;
    # anything else must name a flow — a typo must NOT run everything
    unknown = [a for a in sys.argv[1:]
               if a not in FLOWS and not a.isdigit()]
    if unknown:
        sys.exit(f"unknown flow(s) {unknown}; have {sorted(FLOWS)}")
    picked = [a for a in sys.argv[1:] if a in FLOWS] or list(FLOWS)
    for name in picked:
        FLOWS[name]()
    banner(f"FLOWS {picked} PASS in {time.time() - t0:.0f}s")
