import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.config import DataCfg
from audiogan_tpu.ops import ingest_batch, mu_law_expand


def _raw(rng, b=4, n=16384):
    return jnp.asarray(
        (rng.standard_normal((b, n)) * 8000).clip(-32768, 32767).astype(np.int16))


def test_shapes_range_jit(rng):
    cfg = DataCfg()
    raw = _raw(rng)
    out = jax.jit(lambda r, k: ingest_batch(r, cfg, k))(raw, jax.random.key(0))
    assert out.shape == (4, cfg.clip_len) and out.dtype == jnp.float32
    a = np.asarray(out)
    assert np.abs(a).max() <= 1.0 + 1e-5
    # peak-normalized then companded: peak of |expand(out)| == norm_target
    ex = np.asarray(mu_law_expand(out))
    np.testing.assert_allclose(np.abs(ex).max(axis=-1), 0.999, rtol=1e-4)


def test_eval_path_deterministic(rng):
    cfg = DataCfg()
    raw = _raw(rng)
    a = np.asarray(ingest_batch(raw, cfg, None))
    b = np.asarray(ingest_batch(raw, cfg, None))
    np.testing.assert_array_equal(a, b)


def test_resampling_path(rng):
    cfg = DataCfg(source_rate=22050, sample_rate=16000,
                  store_len=22050 * 2, clip_len=16384)
    assert cfg.resampled_len >= cfg.clip_len
    raw = _raw(rng, b=2, n=cfg.store_len)
    out = ingest_batch(raw, cfg, jax.random.key(1))
    assert out.shape == (2, 16384)
    assert np.isfinite(np.asarray(out)).all()


def test_no_mulaw(rng):
    cfg = DataCfg(mu_law=False)
    out = np.asarray(ingest_batch(_raw(rng), cfg, jax.random.key(0)))
    np.testing.assert_allclose(np.abs(out).max(axis=-1), 0.999, rtol=1e-4)
