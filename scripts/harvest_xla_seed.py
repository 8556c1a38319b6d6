"""Harvest big XLA compilation-cache entries into bench/xla_cache_seed/.

Run at the END of a chip session, after the preset graphs have all
compiled (soak + close bench), so a fresh VM's first launch skips the
10-15 minute cold step compiles (VERDICT r4 #5; utils/xla_cache.py).

Only entries >= --min_bytes are kept (the step/sample/eval graphs; the
KB-scale broadcast/divide entries recompile in milliseconds), and the
seed dir is REPLACED by the harvest, so superseded entries from earlier
code revisions don't accumulate in the repo.

Usage: python scripts/harvest_xla_seed.py [--min_bytes 262144] [--commit]
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
from pathlib import Path

from audiogan_tpu.utils.xla_cache import SEED_DIR


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache_dir",
                    default=str(Path.home() / ".cache" / "audiogan_tpu"
                                / "xla"))
    ap.add_argument("--min_bytes", type=int, default=262144)
    ap.add_argument("--commit", action="store_true",
                    help="git add + commit the refreshed seed dir")
    args = ap.parse_args()

    cache = Path(args.cache_dir)
    entries = [p for p in sorted(cache.glob("*-cache"))
               if p.stat().st_size >= args.min_bytes]
    if not entries:
        raise SystemExit(f"no cache entries >= {args.min_bytes}B in {cache}")

    if SEED_DIR.exists():
        shutil.rmtree(SEED_DIR)
    SEED_DIR.mkdir(parents=True)
    total = 0
    for p in entries:
        shutil.copyfile(p, SEED_DIR / p.name)
        total += p.stat().st_size
        print(f"  {p.stat().st_size / 1e6:8.1f} MB  {p.name}")
    print(f"harvested {len(entries)} entries, {total / 1e6:.1f} MB "
          f"-> {SEED_DIR}")

    if args.commit:
        subprocess.run(["git", "add", "-A", str(SEED_DIR)], check=True,
                       cwd=SEED_DIR.parents[1])
        subprocess.run(
            ["git", "commit", "-m",
             f"Refresh XLA cache seeds ({len(entries)} entries, "
             f"{total / 1e6:.0f} MB) for fresh-VM cold-start"],
            check=True, cwd=SEED_DIR.parents[1])


if __name__ == "__main__":
    main()
