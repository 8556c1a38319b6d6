"""Census of AD-glue accumulations in a preset's train step (VERDICT r4 #4).

Traces the step to a jaxpr on CPU (no compile, no chip) and aggregates the
`add_any` equations — the gradient-accumulation primitive JAX emits when a
value's cotangent has multiple contributors — by operand shape and total
bytes, recursing into scan/cond/remat/pjit sub-jaxprs (scan-body counts are
multiplied by the trip count). The device profile says WHAT fraction of the
step is add/add_any; this says WHERE each accumulation comes from, so glue
levers (e.g. train.fused_d_views merging the real/fake parameter-backwards)
can be ranked by the bytes they would remove before paying for a chip A/B.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/glue_census.py \
         --preset wgan_gp_b64 [--set train.fused_d_views=1 ...]
"""

from __future__ import annotations

import argparse
import collections
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np


def census(jaxpr, mult: int, acc: dict, prims=("add_any",)) -> None:
    # producer map for this jaxpr level: outvar -> primitive name
    prod = {}
    for eqn in jaxpr.eqns:
        for ov in eqn.outvars:
            prod[ov] = eqn.primitive.name
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in prims:
            v = eqn.outvars[0].aval
            who = "+".join(sorted(prod.get(iv, "arg") for iv in eqn.invars))
            key = (eqn.primitive.name, str(v.shape), str(v.dtype), who)
            acc[key][0] += mult
            acc[key][1] += mult * v.size * v.dtype.itemsize
        m = mult
        if eqn.primitive.name == "scan":
            m = mult * eqn.params["length"]
        for pname in ("jaxpr", "call_jaxpr", "fun_jaxpr", "cond_jaxpr"):
            sub = eqn.params.get(pname)
            if sub is not None:
                census(getattr(sub, "jaxpr", sub), m, acc, prims)
        for sub in eqn.params.get("branches", ()):  # lax.cond
            census(getattr(sub, "jaxpr", sub), m, acc, prims)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="wgan_gp_b64")
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--gvar", action="append", default=[],
                    help="module.attr=intval — set a module global before "
                         "tracing (same semantics as step_ab's gvar:)")
    ap.add_argument("--prims", default="add_any",
                    help="comma-separated primitive names to census")
    args = ap.parse_args()

    import importlib
    for g in args.gvar:
        path, _, val = g.partition("=")
        modname, _, attr = path.rpartition(".")
        setattr(importlib.import_module(modname), attr, int(val))

    from audiogan_tpu.cli import apply_overrides
    from audiogan_tpu.config import get_preset
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step, num_views

    cfg = apply_overrides(get_preset(args.preset), args.overrides)
    state = create_train_state(cfg)
    n = num_views(cfg)
    raw = np.zeros((n, cfg.train.batch_size, cfg.data.store_len), np.int16)
    labels = np.zeros((n, cfg.train.batch_size), np.int32)
    jaxpr = jax.make_jaxpr(build_train_step(cfg))(state, raw, labels)

    acc: dict = collections.defaultdict(lambda: [0, 0])
    census(jaxpr.jaxpr, 1, acc, tuple(args.prims.split(",")))
    rows = sorted(acc.items(), key=lambda kv: -kv[1][1])
    total = sum(v[1] for _, v in acc.items())
    print(f"{args.preset} {args.overrides or ''}: "
          f"{sum(v[0] for _, v in acc.items())} accumulation ops / step, "
          f"{total/1e6:.1f} MB written")
    for (prim, shape, dt, who), (count, by) in rows[:30]:
        print(f"  {by/1e6:9.2f} MB  n={count:4d}  {prim:8s} {shape} {dt}  <- {who}")


if __name__ == "__main__":
    main()
