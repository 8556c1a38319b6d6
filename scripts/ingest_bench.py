"""Fused-ingest kernel vs XLA ingest path on the real chip (VERDICT r2 #6:
fix or retire). Interleaved adjacent timings, host-fetch sync.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ingest_bench.py
"""

from __future__ import annotations

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from audiogan_tpu.config import DataCfg
from audiogan_tpu.ops.framing import crop_offsets
from audiogan_tpu.ops.ingest import ingest_batch

GEOMS = [  # (name, B, store_len, clip_len) — slack = store - clip
    ("flagship_slack0", 64, 16384, 16384),  # wgan_gp_b64: zero slack,
                                            # static-crop fast path
    ("slack32pc", 64, 24000, 16384),        # rotate path, generic slack
    ("slack50pc", 64, 24576, 16384),
    # music (16, 220500 -> 176400) is NOT kernel-eligible: its row budget
    # caps rb at 1 != batch, which Mosaic rejects — kernels/ingest.py
    # supported() routes it to XLA (both paths identical, nothing to time)
]


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for name, b, store, clip in GEOMS:
        cfg = DataCfg(clip_len=clip, store_len=store)
        raw = jax.numpy.asarray(
            (rng.standard_normal((b, store)) * 8000).astype(np.int16))
        key = jax.random.key(0)

        xla = jax.jit(lambda r, k: ingest_batch(r, cfg, k, kernels="xla"))
        pal = jax.jit(lambda r, k: ingest_batch(r, cfg, k,
                                                kernels="pallas"))
        xla(raw, key); pal(raw, key)
        # numerics guard: both paths draw crops from ops.framing
        np.testing.assert_allclose(np.asarray(xla(raw, key)),
                                   np.asarray(pal(raw, key)),
                                   atol=2e-6, rtol=1e-5)
        for _ in range(3):  # interleaved rounds
            t_x = timeit(xla, raw, key)
            t_p = timeit(pal, raw, key)
            mb = b * store * 2 / 1e6
            print(f"{name:18s} xla {t_x*1e3:7.3f} ms ({mb/t_x/1e3:5.1f} "
                  f"GB/s)  pallas {t_p*1e3:7.3f} ms  ratio {t_p/t_x:.2f}")


if __name__ == "__main__":
    main()
