"""Fused Pallas ingest (crop+cast+normalize+mu-law in one pass) vs the
pure-XLA ops chain (SURVEY §4.2; A1 "framed mu-law ingest")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogan_tpu.config import DataCfg
from audiogan_tpu.kernels.ingest import ingest_fused
from audiogan_tpu.ops.framing import crop_offsets
from audiogan_tpu.ops.ingest import ingest_batch


def _raw(rng, b, s):
    return jnp.asarray(
        (rng.standard_normal((b, s)) * 9000).clip(-32768, 32767)
        .astype(np.int16))


@pytest.mark.parametrize("mode,mu", [("peak", 255.0), ("rms", 255.0),
                                     ("peak", 0.0)])
def test_fused_matches_ops_chain(rng, mode, mu):
    b, s, clip = 4, 600, 384
    raw = _raw(rng, b, s)
    offs = jnp.asarray(rng.integers(0, s - clip + 1, size=b), jnp.int32)

    got = ingest_fused(raw, offs, clip, mode, 0.999, mu)

    x = raw.astype(jnp.float32) / 32768.0
    want = jax.vmap(
        lambda row, o: jax.lax.dynamic_slice(row, (o,), (clip,)))(x, offs)
    if mode == "peak":
        scale = jnp.max(jnp.abs(want), axis=-1, keepdims=True)
    else:
        scale = jnp.sqrt(jnp.mean(jnp.square(want), axis=-1, keepdims=True))
    want = want * (0.999 / jnp.maximum(scale, 1e-8))
    if mu:
        want = jnp.sign(want) * jnp.log1p(mu * jnp.abs(want)) / np.log1p(mu)

    assert got.shape == (b, clip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_fused_zero_offset_rows(rng):
    """off=0 rows (store_len == clip_len forces EVERY row to 0) must not
    rotate: the kernel's right-rotation amount (n - off) hits exactly n
    there, outside the [0, n) range hardware dynamic_rotate requires —
    regression for the (n - off) % n reduction (interpret mode reduces mod
    n itself and masked it; the HW witness is tests_tpu/run_pallas_tpu.py)."""
    b, s = 4, 512
    raw = _raw(rng, b, s)
    offs = jnp.zeros((b,), jnp.int32)
    got = ingest_fused(raw, offs, s, "peak", 0.999, 255.0)
    x = raw.astype(jnp.float32) / 32768.0
    want = x * (0.999 / jnp.maximum(
        jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-8))
    want = jnp.sign(want) * jnp.log1p(255.0 * jnp.abs(want)) / np.log1p(255.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_ingest_batch_pallas_route_equals_xla(rng):
    """ingest_batch(kernels='pallas') == ingest_batch(kernels='xla') for the
    training path — same key => same crop offsets => identical pipeline."""
    cfg = DataCfg(clip_len=512, store_len=640)
    raw = _raw(rng, 6, cfg.store_len)
    key = jax.random.key(7)
    a = ingest_batch(raw, cfg, key, kernels="pallas")
    b = ingest_batch(raw, cfg, key, kernels="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)


def test_pallas_route_falls_back_when_resampling(rng):
    """Non-identity rates can't fuse (resample precedes the crop) — the
    pallas route must transparently produce the XLA chain's output."""
    cfg = DataCfg(sample_rate=16000, source_rate=24000,
                  clip_len=256, store_len=600)
    raw = _raw(rng, 2, cfg.store_len)
    key = jax.random.key(3)
    a = ingest_batch(raw, cfg, key, kernels="pallas")
    b = ingest_batch(raw, cfg, key, kernels="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_offsets_shared_between_paths(rng):
    """crop_offsets is the single source of crop randomness (the fused and
    XLA paths must stay bit-comparable)."""
    key = jax.random.key(11)
    offs = crop_offsets(key, 8, 100)
    assert offs.shape == (8,)
    assert ((np.asarray(offs) >= 0) & (np.asarray(offs) <= 100)).all()


def test_unaligned_lengths(rng):
    """store/clip that are NOT lane multiples exercise the alignment pad +
    reduction mask (Mosaic's rotate needs 128-aligned lanes)."""
    b, s, clip = 3, 500, 300
    raw = _raw(rng, b, s)
    offs = jnp.asarray(rng.integers(0, s - clip + 1, size=b), jnp.int32)
    for mode in ("peak", "rms"):
        got = ingest_fused(raw, offs, clip, mode, 0.999, 255.0)
        x = raw.astype(jnp.float32) / 32768.0
        want = jax.vmap(
            lambda row, o: jax.lax.dynamic_slice(row, (o,), (clip,)))(x, offs)
        if mode == "peak":
            sc = jnp.max(jnp.abs(want), axis=-1, keepdims=True)
        else:
            sc = jnp.sqrt(jnp.mean(jnp.square(want), axis=-1, keepdims=True))
        want = want * (0.999 / jnp.maximum(sc, 1e-8))
        want = (jnp.sign(want) * jnp.log1p(255.0 * jnp.abs(want))
                / np.log1p(255.0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, rtol=1e-6)


def test_rows_blocking_divides_batch(rng):
    """Odd batch sizes must still split the grid evenly."""
    cfg = DataCfg(clip_len=384, store_len=500)
    for b in (1, 3, 5, 12):
        raw = _raw(rng, b, cfg.store_len)
        out = ingest_batch(raw, cfg, jax.random.key(0), kernels="pallas")
        assert out.shape == (b, cfg.clip_len)
        assert np.isfinite(np.asarray(out)).all()


def test_supported_gate():
    """Mosaic sublane rule: the row block must be the whole batch or
    8-divisible. The music geometry (b=16, 220500-sample rows) caps the
    VMEM row budget at rb=1 != batch -> unsupported (XLA fallback)."""
    from audiogan_tpu.kernels.ingest import supported
    assert supported(64, 24000, 16384)          # flagship: rb=8
    assert supported(4, 600, 384)               # tiny: rb==batch
    assert not supported(16, 220500, 176400)    # music: rb=1, b=16
    assert not supported(2, 100, 200)           # store < clip


def test_music_geometry_falls_back(rng):
    """kernels='pallas' on the (scaled) music geometry routes to the XLA
    chain instead of a Mosaic lowering error; outputs match exactly."""
    # scaled-down replica of the failing shape class: rb would be 1 != b
    import audiogan_tpu.kernels.ingest as king
    cfg = DataCfg(clip_len=2048, store_len=2560)
    b = 16
    raw = _raw(rng, b, cfg.store_len)
    key = jax.random.key(1)
    orig = king._VMEM_BUDGET
    king._VMEM_BUDGET = 64 * 1024      # force rb=1 at this geometry
    try:
        assert not king.supported(b, cfg.store_len, cfg.clip_len)
        a = ingest_batch(raw, cfg, key, kernels="pallas")
    finally:
        king._VMEM_BUDGET = orig
    want = ingest_batch(raw, cfg, key, kernels="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
