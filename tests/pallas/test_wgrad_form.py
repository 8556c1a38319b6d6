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


@pytest.fixture(autouse=True)
def _pin_einsum_default(monkeypatch):
    """Pin the process default so the reference legs below stay meaningful
    even when AUDIOGAN_WGRAD_FORM=conv is exported (ADVICE r3)."""
    monkeypatch.setattr(kconv, "_WGRAD_FORM", "einsum")


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
        want = kconv._conv1d_wgrad_einsum(x, ct, s, pad_lo, k)
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
            want = kconv._convt1d_wgrad_einsum(x, ct, s, pad_lo, out_len, k)
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
             kconv._conv1d_wgrad_einsum(x, ct, s, pad_lo, k), 1e-4)
        out_len = int(g.integers(max((t_in - 1) * s // 2, 1), t_in * s + 1))
        plo = int(g.integers(0, k))
        ct2 = jnp.asarray(rng.standard_normal(
            (b, out_len, cout)).astype(np.float32))
        _cmp(kconv._convt1d_wgrad_conv(x, ct2, s, plo, out_len, k),
             kconv._convt1d_wgrad_einsum(x, ct2, s, plo, out_len, k), 1e-4)


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


def test_set_wgrad_form(monkeypatch):
    """TrainCfg.wgrad_form threads through set_wgrad_form: '' RESETS to
    the process default (a previous step build in the same process must
    not leak its form into a preset that didn't set one — e.g. bench
    --preset all building resample after the flagship), valid values
    switch the global, junk raises."""
    monkeypatch.setattr(kconv, "_WGRAD_FORM_DEFAULT", "einsum")
    monkeypatch.setattr(kconv, "_WGRAD_FORM", kconv._WGRAD_FORM)  # restore
    kconv.set_wgrad_form("conv")
    assert kconv._WGRAD_FORM == "conv"
    kconv.set_wgrad_form("")            # reset, not leave-as-is
    assert kconv._WGRAD_FORM == "einsum"
    kconv.set_wgrad_form("einsum")
    assert kconv._WGRAD_FORM == "einsum"
    with pytest.raises(ValueError):
        kconv.set_wgrad_form("blas")


def test_wgrad_form_config_validation():
    import dataclasses
    from audiogan_tpu.config import Config
    cfg = Config()
    ok = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, wgrad_form="conv"))
    ok.validate()
    bad = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, wgrad_form="blas"))
    with pytest.raises(ValueError):
        bad.validate()


def test_build_step_applies_wgrad_form(monkeypatch):
    """build_train_step must push cfg.train.wgrad_form into the kernel
    module before any tracing happens."""
    import dataclasses
    from audiogan_tpu.config import get_preset
    from audiogan_tpu.train.step import build_train_step
    monkeypatch.setattr(kconv, "_WGRAD_FORM", "einsum")
    cfg = get_preset("tiny_sc09")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, wgrad_form="conv"))
    build_train_step(cfg)
    assert kconv._WGRAD_FORM == "conv"
