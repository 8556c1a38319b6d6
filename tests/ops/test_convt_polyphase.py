"""The lhs_dilation-free conv_transpose lowering vs the textbook form.

The axon TPU platform miscompiles lax lhs_dilation convolutions for some
geometries (k=2s+1 with pad=s — e.g. k=9/s=4/pad=(4,4) gives max|err| ~ 1e1
on O(1) data; verified on-chip 2026-08-16 against CPU and a float64 oracle).
Every convt lowering in the framework is therefore polyphase
(kernels/conv.py::_convt_polyphase_xla / _convt_pallas). On CPU the
lhs_dilation form IS correct, so here it serves as the oracle: the
polyphase lowering must match it for every geometry, especially the ones
the TPU miscompiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from audiogan_tpu.kernels.conv import _convt_polyphase_xla


def _lhs_dilation_oracle(x, w, s, pad_lo, out_len):
    t = x.shape[1]
    k = w.shape[0]
    dilated_len = (t - 1) * s + 1
    total_pad = out_len - 1 + k - dilated_len
    return lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad_lo, total_pad - pad_lo)],
        lhs_dilation=(s,), dimension_numbers=("NWC", "WIO", "NWC"))


GEOMETRIES = [
    # (t, cin, cout, k, s, pad_lo, out_len)
    (64, 8, 8, 9, 4, 4, 256),       # the TPU-miscompiled combo (k=2s+1,p=s)
    (16, 4, 4, 5, 2, 2, 32),
    (64, 8, 8, 25, 4, 12, 256),     # flagship G geometry
    (32, 8, 8, 25, 7, 12, 224),     # music per-layer stride
    (32, 8, 8, 25, 3, 12, 96),
    (64, 8, 8, 9, 4, 0, 256),       # uncentered paddings (transpose rules)
    (64, 8, 8, 9, 4, 8, 256),
    (64, 8, 8, 9, 4, 4, 250),       # out_len not a multiple of stride
    (7, 4, 4, 9, 4, 4, 28),         # tiny t (deep layers)
]


@pytest.mark.parametrize("t,cin,cout,k,s,pad_lo,out_len", GEOMETRIES)
def test_polyphase_matches_lhs_dilation(t, cin, cout, k, s, pad_lo, out_len):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.3, jnp.float32)
    got = jax.jit(lambda x, w: _convt_polyphase_xla(x, w, s, pad_lo,
                                                    out_len))(x, w)
    want = _lhs_dilation_oracle(x, w, s, pad_lo, out_len)
    assert got.shape == (2, out_len, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_second_order_grads_nonaligned_geometry():
    """Regression: CP's local VALID convs differentiate through convt with
    out_len NOT a multiple of stride (t_ext = T_loc + k - s). The
    non-aligned transpose_w path used to flip the tap index
    (dw[2*pad_lo - j] instead of dw[j]) — invisible at 1st order in the
    full loss (transpose pairs cancel) but wrong for the GP's
    grad-of-grad. check_grads to order 2 across uncentered pads."""
    from jax.test_util import check_grads

    from audiogan_tpu.kernels.primitives import conv1d_prim, convt1d_prim

    k, s, c = 9, 4, 4
    x = jax.random.normal(jax.random.key(0), (2, 21, c)) * 0.5
    w = jax.random.normal(jax.random.key(1), (k, c, c)) * 0.3
    f = lambda x, w: conv1d_prim(x, w, stride=s, pad_lo=0, pad_hi=0,
                                 impl="xla")
    check_grads(f, (x, w), order=2, modes=["rev"], atol=1e-3, rtol=1e-3)

    xt = jax.random.normal(jax.random.key(2), (2, 6, c)) * 0.5
    for plo, ol in [(8, 21), (5, 21), (4, 24), (3, 17)]:
        g = lambda x, w: convt1d_prim(x, w, stride=s, pad_lo=plo,
                                      out_len=ol, impl="xla")
        check_grads(g, (xt, w), order=2, modes=["rev"], atol=2e-3, rtol=2e-3)


def test_second_order_grads_stride_divides_kernel():
    """Regression: with k % s == 0-adjacent geometry (k=25, s=5 — the music
    preset's pair) and uncentered pads, the inner conv1d produced by
    convt's transpose_x has (t_in+pads-k) % s != 0, and transpose_w's
    phase-row cover rows*s undershoots pad_lo+t_in: the back-pad went
    NEGATIVE and jnp.pad raised at trace time under grad-of-grad. The fix
    trims instead (samples no tap < k reads)."""
    from jax.test_util import check_grads

    from audiogan_tpu.kernels.primitives import convt1d_prim

    k, s, c = 25, 5, 8
    x = jax.random.normal(jax.random.key(0), (2, 12, c)) * 0.5
    w = jax.random.normal(jax.random.key(1), (k, c, c)) * 0.2
    g = lambda x, w: convt1d_prim(x, w, stride=s, pad_lo=0, out_len=60,
                                  impl="xla")
    check_grads(g, (x, w), order=2, modes=["rev"], atol=2e-3, rtol=2e-3)


def test_ops_conv_transpose_uses_polyphase_semantics():
    """ops.conv.conv_transpose1d (impl='xla') == the dilated-conv definition."""
    from audiogan_tpu.ops.conv import conv_transpose1d
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((9, 8, 8)) * 0.3, jnp.float32)
    got = conv_transpose1d(x, w, 4, impl="xla")
    want = _lhs_dilation_oracle(x, w, 4, (9 - 1) // 2, 64 * 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
