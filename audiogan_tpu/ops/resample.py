"""On-device polyphase resampling as a dilated/strided XLA conv (SURVEY C2).

Reference equivalent: libsamplerate / scipy.signal.resample_poly called on
the host per clip [B:5]. TPU-native design: rate conversion by a rational
factor up/down is exactly one `lax.conv_general_dilated` with
lhs_dilation=up (zero-stuffing), window_strides=down, and a Kaiser-windowed
sinc anti-alias filter — it runs on device, batches over the clip axis, and
XLA fuses the surrounding ingest elementwise ops into it. Filter design
matches scipy.signal.resample_poly's default (Kaiser beta=5.0,
half-length = taps_per_phase * max(up, down)) so the scipy oracle test can
assert close agreement.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax


def _rational(target_rate: int, source_rate: int) -> tuple[int, int]:
    g = math.gcd(target_rate, source_rate)
    return target_rate // g, source_rate // g


@lru_cache(maxsize=None)
def design_polyphase_filter(
    up: int, down: int, taps_per_phase: int = 10, beta: float = 5.0
) -> np.ndarray:
    """Kaiser-windowed sinc lowpass for up/down conversion (numpy, host-side).

    Cutoff = 1 / max(up, down) of the upsampled Nyquist; DC gain normalized
    to exactly `up` so that a constant signal maps to the same constant.
    """
    max_rate = max(up, down)
    half_len = taps_per_phase * max_rate
    n = np.arange(-half_len, half_len + 1, dtype=np.float64)
    fc = 1.0 / (2.0 * max_rate)  # cycles/sample at the upsampled rate
    h = 2.0 * fc * np.sinc(2.0 * fc * n)
    h *= np.kaiser(2 * half_len + 1, beta)
    h *= up / h.sum()
    return h.astype(np.float64)


def resample_output_len(in_len: int, up: int, down: int) -> int:
    return -(-in_len * up // down)  # ceil, matches scipy.resample_poly


def resample_poly(
    x: jnp.ndarray,
    target_rate: int,
    source_rate: int,
    taps_per_phase: int = 10,
    beta: float = 5.0,
) -> jnp.ndarray:
    """Resample [B, T] clips from source_rate to target_rate on device.

    Identity rates return x unchanged (the common SC09 16k->16k path costs
    nothing). Output length = ceil(T * up / down), phase-aligned with
    scipy.signal.resample_poly (output[0] is the filter centered on x[0]).
    """
    up, down = _rational(target_rate, source_rate)
    if up == 1 and down == 1:
        return x

    b, t = x.shape
    h = design_polyphase_filter(up, down, taps_per_phase, beta)
    half_len = (len(h) - 1) // 2
    out_len = resample_output_len(t, up, down)
    dilated_len = (t - 1) * up + 1
    # Padding so output[k] = sum_j h[j] * x_dil[k*down + j - half_len]:
    pad_lo = half_len
    pad_hi = (out_len - 1) * down + half_len + 1 - dilated_len
    pad_hi = max(pad_hi, 0)

    lhs = x[:, None, :]                      # [B, C=1, T]  (NCW)
    rhs = jnp.asarray(h, x.dtype)[None, None, :]  # [O=1, I=1, K]
    y = lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(down,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(up,),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    return y[:, 0, :out_len]
