"""The two XLA-tier weight-grad contraction forms must agree exactly:
the phase-grouped einsum stack (historic default) vs the single
conv_general_dilated with batch=channels dimension numbers (r3s9 — no
lane relayout; profile r3s8 attributed ~4 ms/step of reshape to the
einsum stack's s-sample row packing). Both accumulate f32, so agreement
is tight. SURVEY §4.2 equivalence strategy."""

import jax.numpy as jnp
import numpy as np
import pytest

from audiogan_tpu.kernels import conv as kconv


def _cmp(a, b, tol):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=tol, rtol=tol)


# (k, s) pairs covering the flagship (25,4), the miscompile-class (9,4),
# the music strides, and resampler-ish stride 1.
PAIRS = [(25, 4), (9, 4), (7, 7), (5, 5), (3, 3), (25, 1), (4, 2)]


@pytest.mark.parametrize("k,s", PAIRS)
@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_conv1d_wgrad_conv_form_matches_einsum(rng, k, s, dtype):
    b, cin, cout = 3, 16, 24
    for t_in in (s * 16, s * 16 + max(s - 1, 1), max(k, 2 * s)):
        t_out, pad_lo, pad_hi = kconv._same_pads(t_in, k, s)
        x = jnp.asarray(rng.standard_normal((b, t_in, cin)), dtype)
        ct = jnp.asarray(rng.standard_normal((b, t_out, cout)), dtype)
        want = kconv._conv1d_wgrad_xla(x, ct, s, pad_lo, k)
        got = kconv._conv1d_wgrad_conv(x, ct, s, pad_lo, k)
        assert got.shape == want.shape == (k, cin, cout)
        _cmp(got, want, 1e-4 if dtype == np.float32 else 2e-2)


@pytest.mark.parametrize("k,s", PAIRS)
@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_convt1d_wgrad_conv_form_matches_einsum(rng, k, s, dtype):
    b, cin, cout = 3, 16, 24
    for t_in, extra in ((18, 0), (18, max(s - 1, 1) % s)):
        # aligned (extra=0) and, for s>1, the rare non-aligned path
        for pad_lo in {0, k // 2, k - 1}:
            out_len = t_in * s - extra
            if out_len <= 0:
                continue
            x = jnp.asarray(rng.standard_normal((b, t_in, cin)), dtype)
            ct = jnp.asarray(rng.standard_normal((b, out_len, cout)), dtype)
            want = kconv._convt1d_wgrad_xla(x, ct, s, pad_lo, out_len, k)
            got = kconv._convt1d_wgrad_conv(x, ct, s, pad_lo, out_len, k)
            assert got.shape == want.shape == (k, cin, cout)
            _cmp(got, want, 1e-4 if dtype == np.float32 else 2e-2)


def test_wgrad_form_fuzz(rng):
    g = np.random.default_rng(7)
    for _ in range(12):
        k = int(g.choice([3, 5, 9, 25]))
        s = int(g.choice([1, 2, 3, 4, 5, 7]))
        b = int(g.integers(1, 4))
        cin = int(g.choice([4, 8, 16]))
        cout = int(g.choice([4, 8, 16]))
        t_in = int(g.integers(max(k, s), 96))
        t_out, pad_lo, _ = kconv._same_pads(t_in, k, s)
        x = jnp.asarray(rng.standard_normal((b, t_in, cin)).astype(np.float32))
        ct = jnp.asarray(rng.standard_normal(
            (b, t_out, cout)).astype(np.float32))
        _cmp(kconv._conv1d_wgrad_conv(x, ct, s, pad_lo, k),
             kconv._conv1d_wgrad_xla(x, ct, s, pad_lo, k), 1e-4)
        out_len = int(g.integers(max((t_in - 1) * s // 2, 1), t_in * s + 1))
        plo = int(g.integers(0, k))
        ct2 = jnp.asarray(rng.standard_normal(
            (b, out_len, cout)).astype(np.float32))
        _cmp(kconv._convt1d_wgrad_conv(x, ct2, s, plo, out_len, k),
             kconv._convt1d_wgrad_xla(x, ct2, s, plo, out_len, k), 1e-4)


def test_wgrad_form_global_switches_lowering(rng, monkeypatch):
    """_WGRAD_FORM='conv' must route the lowered wgrad (the path the
    training step's AD actually takes) through the conv form."""
    b, t_in, cin, cout, k, s = 2, 64, 8, 8, 9, 4
    t_out, pad_lo, pad_hi = kconv._same_pads(t_in, k, s)
    x = jnp.asarray(rng.standard_normal((b, t_in, cin)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((b, t_out, cout)).astype(np.float32))
    base = kconv.conv1d_wgrad_lowered(x, ct, s, pad_lo, pad_hi, k, "xla")
    monkeypatch.setattr(kconv, "_WGRAD_FORM", "conv")
    alt = kconv.conv1d_wgrad_lowered(x, ct, s, pad_lo, pad_hi, k, "xla")
    _cmp(alt, base, 1e-4)
