"""CLI (SURVEY C19, layer A6): train / sample / build-corpus / info.

Usage:
    python -m audiogan_tpu.cli train --preset tiny_sc09 --workdir /tmp/run
    python -m audiogan_tpu.cli sample --workdir /tmp/run --num 8 --seed 0
    python -m audiogan_tpu.cli build-corpus --wav_dir data/sc09 \
        --out_dir data/packed --store_len 16384
    python -m audiogan_tpu.cli info --preset wgan_gp_b64

Every preset maps 1:1 to a BASELINE.json config [B:7-11]; --set key=value
overrides any config field by dotted path (e.g. --set train.batch_size=16).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

from audiogan_tpu.config import PRESETS, Config, get_preset


def _coerce(old, raw: str):
    if isinstance(old, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(old, int):
        return int(raw)
    if isinstance(old, float):
        return float(raw)
    if isinstance(old, tuple):
        return tuple(json.loads(raw))
    return raw


def apply_overrides(cfg: Config, sets: list[str]) -> Config:
    for item in sets:
        key, _, raw = item.partition("=")
        if not _:
            raise SystemExit(f"--set expects key=value, got {item!r}")
        parts = key.split(".")
        # rebuild the nested frozen dataclasses bottom-up
        objs = [cfg]
        for p in parts[:-1]:
            objs.append(getattr(objs[-1], p))
        leaf = parts[-1]
        old = getattr(objs[-1], leaf)
        val = _coerce(old, raw)
        new = dataclasses.replace(objs[-1], **{leaf: val})
        for obj, name in zip(reversed(objs[:-1]), reversed(parts[:-1])):
            new = dataclasses.replace(obj, **{name: new})
        cfg = new
    return cfg


def _load_cfg(args) -> Config:
    if args.config:
        cfg = Config.from_json(Path(args.config).read_text())
    else:
        cfg = get_preset(args.preset)
    sets = list(args.set or [])
    if getattr(args, "data_dir", None) is not None:
        sets.append(f"data.data_dir={args.data_dir}")
    if getattr(args, "total_steps", None) is not None:
        sets.append(f"train.total_steps={args.total_steps}")
    if getattr(args, "batch_size", None) is not None:
        sets.append(f"train.batch_size={args.batch_size}")
    if getattr(args, "kernels", None) is not None:
        if args.kernels == "mixed":     # G=pallas, D=xla (BASELINE.md r2)
            sets += ["train.kernels=xla", "train.kernels_g=pallas",
                     "train.kernels_d=xla"]
        else:
            # uniform tier: clear per-net overrides so --kernels xla is
            # PURE xla even on presets whose default is the mixed tier
            sets += [f"train.kernels={args.kernels}", "train.kernels_g=",
                     "train.kernels_d="]
    return apply_overrides(cfg, sets).validate()


def main(argv: list[str] | None = None) -> int:
    from audiogan_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()  # warm re-launches (resume, CI) skip compiles

    p = argparse.ArgumentParser(prog="audiogan")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_cfg_flags(sp):
        sp.add_argument("--preset", default="tiny_sc09", choices=sorted(PRESETS))
        sp.add_argument("--config", default=None,
                        help="path to a config.json (overrides --preset)")
        sp.add_argument("--set", action="append", metavar="KEY=VALUE",
                        help="override any config field by dotted path")

    t = sub.add_parser("train", help="train a GAN")
    add_cfg_flags(t)
    t.add_argument("--workdir", required=True)
    t.add_argument("--data_dir", default=None,
                   help="wav tree or packed corpus ('' = synthetic fixture)")
    t.add_argument("--total_steps", type=int, default=None)
    t.add_argument("--batch_size", type=int, default=None)
    t.add_argument("--kernels", default=None,
                   choices=["xla", "pallas", "auto", "mixed"])
    t.add_argument("--no_resume", action="store_true")

    s = sub.add_parser("sample", help="generate wavs from a checkpoint")
    s.add_argument("--workdir", required=True)
    s.add_argument("--num", type=int, default=8)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--labels", default=None,
                   help="comma-separated class labels (conditional models)")
    s.add_argument("--out_dir", default=None)
    s.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default latest)")

    e = sub.add_parser("eval", help="objective metrics: generated vs corpus")
    e.add_argument("--workdir", required=True)
    e.add_argument("--num", type=int, default=64)
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--step", type=int, default=None)

    x = sub.add_parser("export",
                       help="bake a checkpoint into a standalone AOT "
                            "sampler artifact (StableHLO)")
    x.add_argument("--workdir", required=True)
    x.add_argument("--out_dir", default=None,
                   help="artifact dir (default <workdir>/export)")
    x.add_argument("--num", type=int, default=8,
                   help="serving batch baked into the artifact")
    x.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default latest)")

    v = sub.add_parser("serve",
                       help="HTTP inference server over an artifact")
    v.add_argument("--artifact", default=None,
                   help="exported artifact dir (audiogan export)")
    v.add_argument("--workdir", default=None,
                   help="train workdir: export in-memory then serve")
    v.add_argument("--num", type=int, default=8,
                   help="serving batch when exporting from --workdir")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8765)

    bn = sub.add_parser("bench", help="run the headline benchmark")
    bn.add_argument("--preset", default="wgan_gp_b64")
    bn.add_argument("--steps", type=int, default=10)
    bn.add_argument("--kernels", default=None,
                    help="tier override passed through to bench.py "
                         "(xla|pallas|auto|mixed)")
    bn.add_argument("--dtype", default=None,
                    help="compute dtype passed through to bench.py")
    bn.add_argument("--sample_batch", type=int, default=None,
                    help="sampler batch passed through to bench.py")

    b = sub.add_parser("build-corpus", help="pack a wav tree into a corpus")
    b.add_argument("--wav_dir", required=True)
    b.add_argument("--out_dir", required=True)
    b.add_argument("--store_len", type=int, required=True)

    i = sub.add_parser("info", help="print the resolved config")
    add_cfg_flags(i)

    args = p.parse_args(argv)

    if args.cmd == "train":
        from audiogan_tpu.train.loop import train
        cfg = _load_cfg(args)
        train(cfg, args.workdir, resume=not args.no_resume)
        return 0

    if args.cmd == "sample":
        import numpy as np
        from audiogan_tpu.data.wavio import write_wav
        from audiogan_tpu.train.sample import generate
        from audiogan_tpu.train.state import create_train_state
        from audiogan_tpu.utils import checkpoint as ckpt_lib
        workdir = Path(args.workdir)
        cfg = Config.from_json((workdir / "config.json").read_text())
        state = create_train_state(cfg)
        mngr = ckpt_lib.make_manager(workdir, keep=cfg.train.keep_ckpts)
        state = ckpt_lib.restore(mngr, state, step=args.step)
        labels = (np.array([int(x) for x in args.labels.split(",")])
                  if args.labels else None)
        num = len(labels) if labels is not None else args.num
        waves = generate(cfg, state.params_g, num, args.seed, labels)
        out = Path(args.out_dir or workdir / "generated")
        out.mkdir(parents=True, exist_ok=True)
        for j, w in enumerate(waves):
            tag = f"_y{labels[j]}" if labels is not None else ""
            path = out / f"gen_seed{args.seed}_{j}{tag}.wav"
            write_wav(path, cfg.data.sample_rate, w)
            print(path)
        return 0

    if args.cmd == "eval":
        from audiogan_tpu.train.evaluate import evaluate
        from audiogan_tpu.train.loop import resolve_corpus
        from audiogan_tpu.train.state import create_train_state
        from audiogan_tpu.utils import checkpoint as ckpt_lib
        workdir = Path(args.workdir)
        cfg = Config.from_json((workdir / "config.json").read_text())
        state = create_train_state(cfg)
        mngr = ckpt_lib.make_manager(workdir, keep=cfg.train.keep_ckpts)
        state = ckpt_lib.restore(mngr, state, step=args.step)
        corpus = resolve_corpus(cfg, workdir)
        out = evaluate(cfg, state.params_g, corpus, num=args.num,
                       seed=args.seed)
        out["step"] = int(state.step)
        print(json.dumps(out))
        return 0

    if args.cmd == "export":
        from audiogan_tpu.serve import export_sampler
        from audiogan_tpu.train.state import create_train_state
        from audiogan_tpu.utils import checkpoint as ckpt_lib
        workdir = Path(args.workdir)
        cfg = Config.from_json((workdir / "config.json").read_text())
        state = create_train_state(cfg)
        mngr = ckpt_lib.make_manager(workdir, keep=cfg.train.keep_ckpts)
        state = ckpt_lib.restore(mngr, state, step=args.step)
        out = export_sampler(cfg, state.params_g, args.num,
                             args.out_dir or workdir / "export")
        print(out)
        return 0

    if args.cmd == "serve":
        from audiogan_tpu.serve import load_sampler, make_server
        if bool(args.artifact) == bool(args.workdir):
            raise SystemExit("serve needs exactly one of --artifact "
                             "or --workdir")
        if args.artifact:
            sampler = load_sampler(args.artifact)
        else:
            import tempfile

            from audiogan_tpu.serve import export_sampler
            from audiogan_tpu.train.state import create_train_state
            from audiogan_tpu.utils import checkpoint as ckpt_lib
            workdir = Path(args.workdir)
            cfg = Config.from_json((workdir / "config.json").read_text())
            state = create_train_state(cfg)
            mngr = ckpt_lib.make_manager(workdir, keep=cfg.train.keep_ckpts)
            state = ckpt_lib.restore(mngr, state)
            tmp = tempfile.mkdtemp(prefix="audiogan_export_")
            sampler = load_sampler(
                export_sampler(cfg, state.params_g, args.num, tmp))
        srv = make_server(sampler, host=args.host, port=args.port)
        host, port = srv.server_address[:2]
        print(f"[serve] {sampler.meta.get('model')} on http://{host}:{port} "
              f"(batch {sampler.num}, {sampler.sample_rate} Hz)", flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0

    if args.cmd == "bench":
        import subprocess
        argv_b = [sys.executable,
                  str(Path(__file__).parent.parent / "bench.py"),
                  "--preset", args.preset, "--steps", str(args.steps)]
        for flag in ("kernels", "dtype", "sample_batch"):
            v = getattr(args, flag)
            if v is not None:
                argv_b += [f"--{flag}", str(v)]
        return subprocess.call(argv_b)

    if args.cmd == "build-corpus":
        from audiogan_tpu.data.corpus import build_corpus
        out = build_corpus(args.wav_dir, args.out_dir, args.store_len)
        print(out)
        return 0

    if args.cmd == "info":
        print(_load_cfg(args).to_json())
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
