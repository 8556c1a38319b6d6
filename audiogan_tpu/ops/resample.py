"""On-device polyphase resampling as ONE strided XLA conv (SURVEY C2).

Reference equivalent: libsamplerate / scipy.signal.resample_poly called on
the host per clip [B:5]. TPU-native design: rate conversion by a rational
factor up/down is one stride-`down` `lax.conv_general_dilated` whose `up`
output channels are the polyphase decomposition of a Kaiser-windowed sinc
anti-alias filter:

    y[p + q*up] = sum_r x[q*down + r] * h[r*up - p*down + half_len]

so each output reads only the ~2*taps_per_phase real input samples under
its filter support — never the stride-1 zeros of the textbook zero-stuffed
formulation. (An earlier version used lhs_dilation=up for the zero-stuffing;
that op is MISCOMPILED for some geometries on the axon TPU platform — see
kernels/conv.py::_convt_polyphase_xla — and does up times more MACs.)
Filter design matches scipy.signal.resample_poly's default (Kaiser beta=5.0,
half-length = taps_per_phase * max(up, down)) so the scipy oracle test can
assert close agreement.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax


# single source of truth for the rate reduction: config.DataCfg's
# validate-time resampled_len check must agree with the on-device
# conversion built here
from audiogan_tpu.config import _ratio as _rational  # noqa: E402


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

    No Pallas fast path BY POLICY: the polyphase conv here has cin=1, and
    kernels/conv.py routes any layer with min(cin, cout) < MIN_CH to XLA —
    padding one channel to the 128-lane MXU tile would multiply the FLOPs
    128x for a memory-bound op XLA already fuses into the ingest graph.
    The A1 ingest tier instead fuses the post-resample tail
    (kernels/ingest.py).
    """
    up, down = _rational(target_rate, source_rate)
    if up == 1 and down == 1:
        return x

    b, t = x.shape
    h = design_polyphase_filter(up, down, taps_per_phase, beta)
    half_len = (len(h) - 1) // 2
    out_len = resample_output_len(t, up, down)

    # Polyphase taps: G[r - r_min, p] = h[r*up - p*down + half_len]
    # (zero where the index leaves the filter). r spans the union of the
    # per-phase supports so all phases share one conv window.
    r_min = -(half_len // up)
    r_max = ((up - 1) * down + half_len) // up
    r = np.arange(r_min, r_max + 1)[:, None]            # [R, 1]
    p = np.arange(up)[None, :]                          # [1, up]
    j = r * up - p * down + half_len
    valid = (j >= 0) & (j < len(h))
    g = np.where(valid, h[np.clip(j, 0, len(h) - 1)], 0.0)  # [R, up]

    q_out = -(-out_len // up)                 # phase rows to produce
    pad_lo = -r_min
    pad_hi = max((q_out - 1) * down + r_max - (t - 1), 0)
    y = lax.conv_general_dilated(
        x[:, :, None],                                  # [B, T, 1]  (NWC)
        jnp.asarray(g, x.dtype)[:, None, :],            # [R, 1, up] (WIO)
        window_strides=(down,),
        padding=[(pad_lo, pad_hi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )                                                   # [B, q_out, up]
    return y[:, :q_out].reshape(b, q_out * up)[:, :out_len]
