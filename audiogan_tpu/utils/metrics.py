"""Metrics writers (SURVEY C18, §5): stdout + JSONL, TensorBoard if clu is
importable. On-device metric accumulation happens in the train step; this
module only formats the small host-side pytree — one D2H per log interval.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Mapping


class MetricsWriter:
    def __init__(self, workdir: str | Path, also_tensorboard: bool = True):
        self.dir = Path(workdir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "metrics.jsonl", "a", buffering=1)
        self._tb = None
        if also_tensorboard:
            try:
                from clu import metric_writers
                self._tb = metric_writers.SummaryWriter(
                    str(self.dir / "tb"))
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def write(self, step: int, metrics: Mapping[str, Any]) -> None:
        scalars = {k: float(v) for k, v in metrics.items()}
        rec = {"step": step, "time": round(time.time() - self._t0, 3),
               **{k: round(v, 6) for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        parts = " ".join(f"{k}={v:.4f}" for k, v in scalars.items())
        print(f"[step {step}] {parts}", flush=True)
        if self._tb is not None:
            self._tb.write_scalars(step, scalars)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
