"""Generic interleaved step-level A/B on the real chip: each variant is a
list of --set overrides on a preset; rounds rotate order to cancel the
chip's throttle drift (BASELINE.md methodology).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/step_ab.py \
        --preset wgan_gp_b64 \
        --variant base \
        --variant unroll5=train.scan_unroll=5 \
        [--rounds 5] [--steps 6] [--dtype bfloat16]

Variant syntax: name[=ov1;ov2;...] (semicolon-separated key=value sets).
An override starting with "gvar:" sets a module attribute instead of a
config key — e.g. gvar:audiogan_tpu.kernels.conv._T_TILE_CAP=2048 — and
is applied before THIS variant's trace/compile (tracing happens in the
build loop, so the value is baked into the variant's compiled step; the
attribute is restored after compile so later variants see the default).
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="wgan_gp_b64")
    ap.add_argument("--variant", action="append", required=True)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--sequential", action="store_true",
                    help="hold ONE variant resident at a time (rebuild per "
                         "block, free before the next): the default "
                         "all-resident interleave spills HBM on heavy "
                         "configs — dual_stft+fused_d_views at batch 64 "
                         "ran 0.34 steps/s vs its 8.1 operating point "
                         "with two resident graphs (2026-08-20). Blocks "
                         "alternate A/B per round with the order flipped "
                         "each round (ABBA); the persistent compile cache "
                         "makes the per-block re-jit a cached load.")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    from audiogan_tpu.cli import apply_overrides
    from audiogan_tpu.config import get_preset
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step, num_views
    from audiogan_tpu.utils.xla_cache import enable_compilation_cache

    enable_compilation_cache()

    def apply_gvars(gvars):
        saved = []
        for o in gvars:
            path, _, val = o[len("gvar:"):].partition("=")
            modname, _, attr = path.rpartition(".")
            import importlib
            mod = importlib.import_module(modname)
            saved.append((mod, attr, getattr(mod, attr)))
            try:
                parsed = int(val)
            except ValueError:
                parsed = val  # string-valued globals (e.g. tier names)
            setattr(mod, attr, parsed)
        return saved

    def build(name, gvars, csets, quiet=False):
        saved = apply_gvars(gvars)
        cfg = apply_overrides(get_preset(args.preset),
                              [f"train.dtype={args.dtype}"] + csets)
        state = create_train_state(cfg)
        step = jax.jit(build_train_step(cfg), donate_argnums=(0,))
        rng = np.random.default_rng(0)
        n = num_views(cfg)
        clips = (rng.standard_normal(
            (n, cfg.train.batch_size, cfg.data.store_len)) * 8000
        ).clip(-32768, 32767).astype(np.int16)
        labels = rng.integers(0, max(cfg.data.num_classes, 1),
                              size=(n, cfg.train.batch_size)).astype(np.int32)
        # stage ONCE on device: feeding numpy re-pays the host transfer
        # every call and confounds the A/B (bench.py input-transfer
        # discovery, 2026-08-18 — production runs device-resident)
        clips, labels = jax.device_put(clips), jax.device_put(labels)
        t0 = time.perf_counter()
        state, metrics = step(state, clips, labels)
        state, metrics = step(state, clips, labels)
        float(metrics["d_loss"])
        if not quiet:
            print(f"{name}: compiled+warm in {time.perf_counter()-t0:.1f}s",
                  flush=True)
        for mod, attr, old in saved:
            setattr(mod, attr, old)
        return step, state, clips, labels

    if args.sequential:
        import gc

        specs = []
        for spec in args.variant:
            name, _, ovs = spec.partition("=")
            sets = [o for o in ovs.split(";") if o]
            specs.append((name,
                          [o for o in sets if o.startswith("gvar:")],
                          [o for o in sets if not o.startswith("gvar:")]))
        times = {name: [] for name, _, _ in specs}
        for r in range(args.rounds):
            idxs = range(len(specs)) if r % 2 == 0 else \
                reversed(range(len(specs)))
            for i in idxs:
                name, gvars, csets = specs[i]
                step, state, clips, labels = build(name, gvars, csets,
                                                   quiet=r > 0)
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    state, metrics = step(state, clips, labels)
                float(metrics["d_loss"])
                times[name].append(args.steps / (time.perf_counter() - t0))
                print(f"  round {r} {name}: {times[name][-1]:.4f} steps/s",
                      flush=True)
                del step, state, clips, labels, metrics
                gc.collect()
        base_name = specs[0][0]
        for name, _, _ in specs:
            med = statistics.median(times[name])
            line = f"{name}: median {med:.4f} steps/s"
            if name != base_name:
                ratios = [t / b for t, b in zip(times[name],
                                                times[base_name])]
                line += f"  per-round ratio vs {base_name}: " \
                        f"{statistics.median(ratios):.3f}"
            print(line, flush=True)
        return

    runs = {}
    for spec in args.variant:
        name, _, ovs = spec.partition("=")
        sets = [o for o in ovs.split(";") if o]
        gvars = [o for o in sets if o.startswith("gvar:")]
        csets = [o for o in sets if not o.startswith("gvar:")]
        step, state, clips, labels = build(name, gvars, csets)
        runs[name] = [step, state, clips, labels, []]

    order0 = list(runs)
    for r in range(args.rounds):
        order = order0[r % len(order0):] + order0[:r % len(order0)]
        for name in order:
            rec = runs[name]
            step, state, clips, labels, times = rec
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, metrics = step(state, clips, labels)
            float(metrics["d_loss"])
            times.append(args.steps / (time.perf_counter() - t0))
            rec[1] = state
            print(f"  round {r} {name}: {times[-1]:.4f} steps/s", flush=True)

    base_name = order0[0]
    base = runs[base_name][4]
    for name, rec in runs.items():
        med = statistics.median(rec[4])
        line = f"{name}: median {med:.4f} steps/s"
        if name != base_name:
            ratios = [t / b for t, b in zip(rec[4], base)]
            line += f"  within-round ratio vs {base_name}: " \
                    f"{statistics.median(ratios):.3f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
