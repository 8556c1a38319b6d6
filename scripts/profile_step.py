"""Profile the flagship train step on the real chip and decompose device
time by HLO op category (the Amdahl-gap hunt, round-3 s6).

Context: conv_roof (2026-08-18) showed each conv layer runs at 84-97% of
its per-shape im2col-GEMM roof (~43-48 TF/s real at batch 64), yet the
step aggregates only ~19 TF/s — more than half the step's wall time is
NOT conv MXU work. This script finds where it goes: jax.profiler trace
around N staged steps, then xprof's op_stats rollup (op name / category /
self-time) printed as a table.

Run: python scripts/profile_step.py [--preset wgan_gp_b64] [--steps 3]
Artifacts: /tmp/audiogan_profile/<ts>/... (xplane) + stdout table.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def capture(preset: str, steps: int, outdir: str, overrides):
    from audiogan_tpu.cli import apply_overrides
    from audiogan_tpu.config import get_preset
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step, num_views
    from audiogan_tpu.utils.xla_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = apply_overrides(get_preset(preset),
                          ["train.dtype=bfloat16"] + (overrides or []))
    state = create_train_state(cfg)
    step = jax.jit(build_train_step(cfg), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    n = num_views(cfg)
    clips = (rng.standard_normal(
        (n, cfg.train.batch_size, cfg.data.store_len)) * 8000
    ).clip(-32768, 32767).astype(np.int16)
    labels = rng.integers(0, max(cfg.data.num_classes, 1),
                          size=(n, cfg.train.batch_size)).astype(np.int32)
    clips, labels = jax.device_put(clips), jax.device_put(labels)
    # compile + warm OUTSIDE the trace
    state, m = step(state, clips, labels)
    state, m = step(state, clips, labels)
    float(m["d_loss"])
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, m = step(state, clips, labels)
        float(m["d_loss"])                       # host fetch = real sync
    wall = time.perf_counter() - t0
    print(f"traced {steps} steps in {wall:.3f}s "
          f"({steps / wall:.3f} steps/s)", flush=True)
    return wall


def parse(outdir: str, steps: int, top: int):
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("NO xplane.pb found — device tracing unsupported here?")
        return
    print("xplane:", paths[-1])
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "framework_op_stats",
                                      {"tqx": "out:json;"})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    tables = json.loads(data)
    if isinstance(tables, dict):
        tables = [tables.get("table", tables)]
    tbl = max(tables, key=lambda t: len(t.get("rows", [])))
    rows, cols = tbl["rows"], [c["label"] for c in tbl["cols"]]
    if not rows:
        print("op_stats table is EMPTY — device tracing unsupported here?")
        return

    def coli(pred):
        return next(i for i, c in enumerate(cols) if pred(c))

    i_dev = coli(lambda c: c == "Host/device")
    i_cat = coli(lambda c: "Type" in c or "ategory" in c)
    i_op = coli(lambda c: "Operation Name" in c or c == "Operation")
    i_n = coli(lambda c: "Occurrences" in c)
    i_self = coli(lambda c: "self-time" in c.lower() and "total" in
                  c.lower() and "%" not in c and "Device" not in c
                  and "Host" not in c)
    by_cat: dict[str, float] = {}
    ops = []
    n_host = 0
    for r in rows:
        c = [v.get("v") for v in r["c"]]
        if c[i_dev] != "Device":
            n_host += 1
            continue
        cat, op, self_us = c[i_cat], c[i_op], float(c[i_self])
        by_cat[cat] = by_cat.get(cat, 0.0) + self_us
        ops.append((self_us, int(c[i_n]), cat, op))
    if not ops:
        print(f"no Device rows ({n_host} host rows) — device tracing "
              f"unsupported on this platform")
        return
    total = sum(by_cat.values())
    print(f"\ndevice self-time total: {total / 1e3:.3f} ms "
          f"({total / steps / 1e3:.3f} ms/step)")
    print("\n== by category ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:28s} {us / steps / 1e3:9.3f} ms/step "
              f"{100 * us / total:5.1f}%")
    print(f"\n== top {top} ops by self time ==")
    ops.sort(reverse=True)
    for self_us, n, cat, op in ops[:top]:
        print(f"  {self_us / steps / 1e3:9.3f} ms/step  x{n:<5d} {cat:22s} "
              f"{op[:88]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="wgan_gp_b64")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--set", action="append", dest="overrides")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--parse-only", default=None,
                    help="skip capture; parse this existing trace dir")
    args = ap.parse_args()
    if args.parse_only:
        parse(args.parse_only, args.steps, args.top)
        return
    outdir = args.outdir or f"/tmp/audiogan_profile/{int(time.time())}"
    print("backend:", jax.default_backend(), "->", outdir, flush=True)
    capture(args.preset, args.steps, outdir, args.overrides)
    parse(outdir, args.steps, args.top)


if __name__ == "__main__":
    main()
