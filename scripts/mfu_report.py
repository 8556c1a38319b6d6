"""Per-preset MFU scoreboard (VERDICT r4 #8).

MFU = measured steps/s x cost_analysis FLOP/step / measured chip roof.
The roof is this tunneled v5e's MEASURED 163.8 bf16 TF/s (BASELINE.md
chip calibration, 8192^3 in-graph chained matmuls, 2026-08-18) — not the
datasheet number, so the ratio reflects headroom actually reachable here.

FLOP/step comes from the TPU-compiled step's Compiled.cost_analysis()
(XLA's own optimized-HLO count); steps/s from the same drift-robust
interleaved-median harness the judged headline uses (bench.bench_train).

Usage (claims the chip):
  python scripts/mfu_report.py [--presets all|name,name] [--dtype bfloat16]
Prints one JSON line per preset plus a markdown table for BASELINE.md.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]
ROOF_TFLOPS = 163.8  # measured bf16 roof on THIS chip (BASELINE.md)


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_py",
                                                  REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def flops_per_step(cfg) -> float:
    import jax
    import numpy as np

    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step, num_views

    state = create_train_state(cfg)
    step = jax.jit(build_train_step(cfg), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    n = num_views(cfg)
    clips = (rng.standard_normal((n, cfg.train.batch_size,
                                  cfg.data.store_len)) * 8000
             ).clip(-32768, 32767).astype(np.int16)
    labels = rng.integers(0, max(cfg.data.num_classes, 1),
                          size=(n, cfg.train.batch_size)).astype(np.int32)
    compiled = step.lower(state, clips, labels).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # one entry per device
        ca = ca[0]
    return float(ca["flops"])


def main() -> None:
    bench = _load_bench()
    from audiogan_tpu.cli import apply_overrides
    from audiogan_tpu.config import get_preset
    from audiogan_tpu.utils.xla_cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default="all")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    names = (bench.PRESETS if args.presets == "all"
             else args.presets.split(","))

    rows = []
    for name in names:
        import dataclasses

        import audiogan_tpu.config as _c
        cfg = apply_overrides(get_preset(name),
                              [f"train.dtype={args.dtype}"])
        if cfg.mesh.dp * cfg.mesh.cp > 1:  # one real chip (see bench.py)
            cfg = dataclasses.replace(cfg, mesh=_c.MeshCfg(dp=1, cp=1))
        fl = flops_per_step(cfg)
        sps, info = bench.bench_train(cfg, n_steps=args.steps)
        tfs = sps * fl / 1e12
        row = {"metric": "mfu", "preset": name,
               "steps_per_sec": round(sps, 4),
               "flop_per_step": fl,
               "sustained_tflop_s": round(tfs, 2),
               "mfu_pct_of_measured_roof": round(100 * tfs / ROOF_TFLOPS, 2),
               "roof_tflop_s": ROOF_TFLOPS,
               "rounds_spread_pct": info["rounds_spread_pct"]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| preset | steps/s | TFLOP/step | sustained TF/s | "
          "MFU vs 163.8 TF/s roof |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['preset']} | {r['steps_per_sec']} | "
              f"{r['flop_per_step'] / 1e12:.3f} | "
              f"{r['sustained_tflop_s']} | "
              f"{r['mfu_pct_of_measured_roof']}% |")


if __name__ == "__main__":
    main()
