"""One-claim TPU validation session (run in background, NEVER kill early —
see .claude/skills/verify/SKILL.md on the stale-lease wedge).

Batches every on-hardware check into ONE python process so the chip is
claimed once: fused-ingest kernel check, compiled Pallas kernel validation,
flagship bench on both kernel paths, and (last, because it flips the global
matmul precision) the fidelity witness. Each stage is independent; failures
are reported and the session continues.

Run: python scripts/tpu_session.py [--skip stage,stage]
Stages: ingest, kernels, bench_xla, bench_pallas, fidelity
"""

import argparse
import json
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

RESULTS = {}


def stage(name):
    def deco(fn):
        def run():
            print(f"\n===== STAGE {name} {time.strftime('%H:%M:%S')} =====",
                  flush=True)
            t0 = time.time()
            try:
                out = fn()
                RESULTS[name] = {"ok": True, "out": out,
                                 "secs": round(time.time() - t0, 1)}
            except Exception as e:
                traceback.print_exc()
                RESULTS[name] = {"ok": False, "err": f"{type(e).__name__}: {e}",
                                 "secs": round(time.time() - t0, 1)}
            print(f"===== {name}: {RESULTS[name]['ok']} "
                  f"({RESULTS[name]['secs']}s) =====", flush=True)
        run.stage_name = name
        return run
    return deco


@stage("ingest")
def s_ingest():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiogan_tpu.config import DataCfg
    from audiogan_tpu.ops.ingest import ingest_batch

    rng = np.random.default_rng(0)
    braw = jnp.asarray((rng.standard_normal((64, 24000)) * 9000)
                       .clip(-32768, 32767).astype(np.int16))
    dcfg = DataCfg(clip_len=16384, store_len=24000)
    key = jax.random.key(5)
    fp = jax.jit(lambda r: ingest_batch(r, dcfg, key, kernels="pallas"))
    fx = jax.jit(lambda r: ingest_batch(r, dcfg, key, kernels="xla"))
    g, w = np.asarray(fp(braw)), np.asarray(fx(braw))
    err = float(np.abs(g - w).max())
    assert np.allclose(g, w, atol=1e-5), f"max|diff|={err}"
    times = {}
    for name, f in [("pallas", fp), ("xla", fx)]:
        float(np.asarray(f(braw)).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(30):
            out = f(braw)
        float(np.asarray(out).ravel()[0])
        times[name] = round((time.perf_counter() - t0) / 30 * 1e3, 3)
    print(f"ingest max|diff|={err:.2e} times(ms)={times}", flush=True)
    return {"max_diff": err, "ms": times}


@stage("kernels")
def s_kernels():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                           / "tests_tpu"))
    import run_pallas_tpu
    rc = run_pallas_tpu.main()
    assert rc == 0, f"run_pallas_tpu rc={rc}"
    return "ALL OK"


def _bench(kernels):
    # `import bench` resolves to the bench/ PACKAGE, not bench.py — load
    # the script module explicitly by path
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_script",
        pathlib.Path(__file__).resolve().parents[1] / "bench.py")
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)
    proxy = bench_mod.load_proxy("torch-cpu-eager")
    row = bench_mod.bench_one("wgan_gp_b64", "bfloat16", kernels, 10, proxy)
    print(json.dumps(row), flush=True)
    return row


@stage("bench_xla")
def s_bench_xla():
    return _bench("xla")


@stage("bench_pallas")
def s_bench_pallas():
    return _bench("pallas")


@stage("fidelity")
def s_fidelity():
    # LAST: flips jax_default_matmul_precision to "highest" globally
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                           / "tests_tpu"))
    import run_fidelity_tpu
    rc = run_fidelity_tpu.main()
    assert rc == 0, f"fidelity rc={rc}"
    return "PASS"


ALL = [s_ingest, s_kernels, s_bench_xla, s_bench_pallas, s_fidelity]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma-separated stage names")
    ap.add_argument("--only", default="", help="comma-separated stage names")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))
    only = set(filter(None, args.only.split(",")))

    from audiogan_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    print("devices:", jax.devices(), flush=True)

    for s in ALL:
        if s.stage_name in skip or (only and s.stage_name not in only):
            continue
        s()

    print("\n===== SUMMARY =====")
    print(json.dumps(RESULTS, indent=2, default=str), flush=True)
    return 0 if all(r["ok"] for r in RESULTS.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
