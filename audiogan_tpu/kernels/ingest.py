"""Fused framed mu-law ingest as ONE Pallas pass (SURVEY layer A1, last
listed kernel: "framed mu-law ingest"; VERDICT r1 item 10).

Reference equivalent: the host-side Dataset.__getitem__ chain
(crop -> normalize -> mu-law) [B:5]. The XLA path (ops/ingest.py) already
fuses these elementwise stages into the train step; this kernel collapses
the whole post-resample tail — per-example random crop, int16->f32 cast,
peak/RMS amplitude normalization, and mu-law companding — into a single
VMEM-resident pass: each raw int16 row crosses HBM exactly once and only
clip_len f32 samples are written back.

Design notes (v5e, found compiling on real hardware 2026-08-17):
* Per-example crop offsets are data (PRNG-derived), so they ride the
  scalar-prefetch channel (PrefetchScalarGridSpec) into SMEM.
* The crop itself CANNOT be a dynamic slice: Mosaic's TC lowering
  implements neither `dynamic_slice` on vectors nor sub-(8,128)-aligned
  `memref_slice` on tiled HBM refs (both rejected by the compiler, and
  crop offsets are arbitrary integers). The supported primitive for
  arbitrary dynamic lane displacement is the dynamic rotate —
  `pltpu.roll` — so each row is rotated left by its offset and the crop
  becomes a STATIC [:clip_len] slice.
* Normalization needs a full-clip reduction before the scale, so each grid
  step owns whole rows; reduce + scale + compand run vectorized over the
  [rows_blk, clip_len] block.
* No AD rules: ingest feeds the data side only; the GP differentiates with
  respect to the interpolated x-hat, never through the ingest of `raw`.

Fallback contract: geometry the kernel does not cover (store < clip, i.e.
pad-needed; non-identity resample) routes to the pure-XLA ops — same
contract as kernels/conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU

# VMEM budget per grid step (bytes): i16 store rows + f32 crop + f32 out,
# double-buffered by the pipeline => stay well under the ~16 MB/core.
_VMEM_BUDGET = 6 * 1024 * 1024


def _round_up(a: int, m: int) -> int:
    return -(-a // m) * m


def _rows_blk(batch: int, store_len: int, clip_len: int) -> int:
    per_row = store_len * (2 + 4) + clip_len * 4 * 2
    cap = max(1, _VMEM_BUDGET // (2 * per_row))
    rb = min(batch, 8, cap)
    while batch % rb:
        rb -= 1
    return rb


def supported(batch: int, store_len: int, clip_len: int) -> bool:
    """True iff this geometry lowers on Mosaic: the row-block must be the
    whole batch or sublane-aligned (8-divisible). Very long store rows
    (music: 220k samples) cap the VMEM row budget at rb<8 with rb!=batch,
    which Mosaic rejects — those route to the XLA tier (ops/ingest.py
    fallback contract)."""
    if store_len < clip_len:
        return False
    s_pad = _round_up(store_len, 128)
    clip_pad = _round_up(clip_len, 128)
    rb = _rows_blk(batch, s_pad, clip_pad)
    return rb == batch or rb % 8 == 0


def _kernel(offs_ref, x_ref, o_ref, *, rows_blk, clip_len, mode, target,
            mu, eps, valid_len, zero_slack):
    gb = pl.program_id(0)
    # cast the whole block up front: Mosaic's dynamic rotate wants 32-bit
    # lanes (vector<...xi16> rotate fails to lower), and the cast is one
    # VPU pass either way
    xf = x_ref[...].astype(jnp.float32) * (1.0 / 32768.0)
    n = xf.shape[-1]
    if zero_slack:
        # store_len == clip_len (the flagship geometry): every crop offset
        # is 0, so the per-row dynamic rotate — the kernel's dominant VPU
        # cost — drops out statically
        x = xf[:, :clip_len]
    else:
        rows = []
        for i in range(rows_blk):  # static unroll over the block's rows
            off = offs_ref[gb * rows_blk + i]
            # rotate left by off => wanted window sits at [:clip_len]
            # (static). Expressed as a POSITIVE right-rotation by
            # (n-off) % n: hardware dynamic_rotate mishandles shifts
            # outside [0, n) (wrong values on HW for negatives 2026-08-17;
            # interpret mode reduces mod n and masks it) and off=0 would
            # otherwise pass shift == n exactly.
            row = pltpu.roll(xf[i:i + 1, :], (n - off) % n, 1)
            rows.append(row[:, :clip_len])
        x = jnp.concatenate(rows, axis=0)
    if valid_len != clip_len:
        # lane-alignment pad (ingest_fused): zero the tail so reductions
        # see only the true crop; the caller slices it off the output
        mask = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) < valid_len
        x = jnp.where(mask, x, 0.0)

    if mode == "peak":
        scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    elif mode == "rms":
        scale = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1,
                                 keepdims=True) / valid_len)
    else:
        scale = None
    if scale is not None:
        x = x * (target / jnp.maximum(scale, eps))
    if mu:
        # log1p(mu) is a Python constant — folded at trace time
        x = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / np.log1p(mu)
    o_ref[...] = x


def ingest_fused(
    raw: jnp.ndarray,
    offsets: jnp.ndarray,
    clip_len: int,
    mode: str = "peak",
    target: float = 0.999,
    mu: float = 255.0,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """int16 [B, S] + crop offsets [B] -> companded f32 [B, clip_len].

    One Pallas pass: crop @ offsets[b] (dynamic lane rotate + static
    slice), /32768 cast, `mode` amplitude normalization to `target`,
    mu-law compand (mu=0/None disables). Requires S >= clip_len (no-pad
    geometry; ops/ingest.py guards).
    """
    b, s = raw.shape
    assert s >= clip_len, (s, clip_len)
    mu = float(mu) if mu else 0.0

    # Mosaic's dynamic rotate requires the rotated (lane) dim be 128-aligned
    # ("unsupported unaligned shape" on vector<1x24000xf32>, found on HW
    # 2026-08-17). Pad rows to the next lane multiple: the rotate-left
    # window [0, clip_len) only ever reads x[off : off + clip_len] with
    # off + clip_len <= s, so the appended zeros never enter the crop.
    # Same for the output lanes; the caller-visible slice drops the pad.
    s_pad = _round_up(s, 128)
    clip_pad = _round_up(clip_len, 128)
    if s_pad != s:
        raw = jnp.pad(raw, ((0, 0), (0, s_pad - s)))
    rb = _rows_blk(b, s_pad, clip_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // rb,),
        in_specs=[pl.BlockSpec((rb, s_pad), lambda gb, offs: (gb, 0))],
        out_specs=pl.BlockSpec((rb, clip_pad), lambda gb, offs: (gb, 0)),
    )
    kernel = functools.partial(
        _kernel, rows_blk=rb, clip_len=clip_pad, mode=mode,
        target=float(target), mu=mu, eps=float(eps), valid_len=clip_len,
        zero_slack=(s == clip_len))
    from audiogan_tpu.kernels.conv import _vma_sds
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=_vma_sds((b, clip_pad), jnp.float32, offsets, raw),
        interpret=_INTERPRET,
    )(offsets.astype(jnp.int32), raw)
    return out[:, :clip_len]
