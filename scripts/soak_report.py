"""Summarize a soak run (VERDICT r3 #3) for the BASELINE.md writeup.

Reads the workdir's metrics.jsonl (written every log_every steps by the
training loop) plus the driver log (VmHWM polls + segment eval lines) and
prints: per-5k-bucket steps/s medians (drift check), the slow-point
distribution (checkpoint stalls show up as sub-median buckets), host
memory trajectory, and the spectral_distance trajectory from the segment
evals.

Run: python scripts/soak_report.py /tmp/soak2_r4 /tmp/r4_soak2.log
"""

import json
import re
import statistics
import sys


def _span_line(span: list[dict]) -> None:
    steps = span[-1]["step"] - span[0]["step"]
    t = span[-1]["time"] - span[0]["time"]
    if steps > 0 and t > 0:
        print(f"  steps {span[0]['step']:>6}..{span[-1]['step']:>6}  "
              f"wall {t:7.0f}s  effective {steps/t:6.3f} steps/s")


def main(workdir: str, logfile: str | None) -> None:
    raw = []
    # Accept either a workdir or a direct path to a metrics.jsonl copy
    # (the r5 queue's persist() passes the bench/ copy directly).
    path = workdir if workdir.endswith(".jsonl") else f"{workdir}/metrics.jsonl"
    with open(path) as f:
        for line in f:
            try:
                raw.append(json.loads(line))
            except json.JSONDecodeError:  # torn final line after a crash
                break
    # Keep only the step-monotonic stream: a concurrent duplicate writer
    # (e.g. an operator double-launch resuming the same workdir) interleaves
    # rows whose steps fall behind the primary run's; its stream is
    # bit-identical in content (the (seed,step)-pure data order) so dropping
    # non-increasing steps recovers the primary run exactly.
    rows, last = [], -1
    for r in raw:
        if r["step"] > last:
            rows.append(r)
            last = r["step"]
    if len(rows) != len(raw):
        print(f"NOTE: dropped {len(raw)-len(rows)} interleaved rows from a "
              "duplicate writer")
    if not rows:
        print("no metrics")
        return

    # Per-process-span effective rate: `time` restarts at each segment
    # resume, so spans are delimited by time resets within the kept stream.
    print("== per-span wall-clock effective rate (ckpt stalls included) ==")
    span = [rows[0]]
    for r in rows[1:]:
        if r["time"] < span[-1]["time"]:
            _span_line(span)
            span = [r]
        else:
            span.append(r)
    _span_line(span)
    print()

    # Steps/s per 5k-step bucket. Each row's steps_per_sec covers the
    # log_every window ending at row["step"]; checkpoint saves and resume
    # recompiles land in whichever window they interrupt.
    buckets: dict[int, list[float]] = {}
    for r in rows:
        buckets.setdefault(r["step"] // 5000, []).append(r["steps_per_sec"])
    print("== steps/s by 5k-step bucket (median / p10 / min, n) ==")
    for b in sorted(buckets):
        v = sorted(buckets[b])
        med = statistics.median(v)
        p10 = v[max(0, len(v) // 10 - 1)]
        print(f"  [{b*5000:>6}-{b*5000+4999:>6}] med {med:6.3f}  "
              f"p10 {p10:6.3f}  min {v[0]:6.3f}  n={len(v)}")

    allv = sorted(r["steps_per_sec"] for r in rows)
    med = statistics.median(allv)
    slow = [v for v in allv if v < 0.5 * med]
    print(f"\noverall median {med:.3f} steps/s over {len(rows)} windows "
          f"({rows[-1]['step']} steps); {len(slow)} windows <50% of median "
          f"(ckpt/resume stalls), worst {allv[0]:.3f}")

    first, last = buckets[min(buckets)], buckets[max(buckets)]
    print(f"drift: first-bucket med {statistics.median(first):.3f} -> "
          f"last-bucket med {statistics.median(last):.3f}")

    losses = [r for r in rows if "w_dist" in r]
    if losses:
        tail = losses[-20:]
        print(f"w_dist last-20 mean {statistics.mean(x['w_dist'] for x in tail):.2f}, "
              f"gp_grad_norm {statistics.mean(x['gp_grad_norm'] for x in tail):.3f}")

    if logfile:
        try:
            log = open(logfile, errors="replace").read()
        except OSError:
            return
        hwm = re.findall(r"seg(\d+) VmHWM:\s+(\d+) kB", log)
        if hwm:
            print("\n== host VmHWM (first/max per segment, MB) ==")
            per: dict[str, list[int]] = {}
            for seg, kb in hwm:
                per.setdefault(seg, []).append(int(kb))
            for seg in sorted(per, key=int):
                v = per[seg]
                print(f"  seg{seg}: first {v[0]/1024:.0f}  max {max(v)/1024:.0f}"
                      f"  last {v[-1]/1024:.0f}  (n={len(v)})")
        evals = re.findall(r"spectral_distance[\"']?[:=]\s*([0-9.]+)", log)
        if evals:
            print("\nspectral_distance trajectory:", ", ".join(evals))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
