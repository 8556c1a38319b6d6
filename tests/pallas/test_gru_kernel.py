import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.kernels import gru_cell as pgru
from audiogan_tpu.ops.gru import gru_cell as xgru


def _params(rng, b=8, in_dim=32, hid=64):
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    return (r(b, in_dim), r(b, hid), r(in_dim, 3 * hid) * 0.2,
            r(hid, 3 * hid) * 0.2, r(3 * hid) * 0.1, r(3 * hid) * 0.1)


def test_matches_xla_cell(rng):
    args = _params(rng)
    np.testing.assert_allclose(np.asarray(pgru(*args)),
                               np.asarray(xgru(*args)), atol=1e-5)


def test_grads_match(rng):
    args = _params(rng, b=4, in_dim=16, hid=32)

    def loss(f):
        return lambda *a: jnp.sum(f(*a) ** 2)

    gp = jax.grad(loss(pgru), argnums=tuple(range(6)))(*args)
    gx = jax.grad(loss(xgru), argnums=tuple(range(6)))(*args)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_large_hidden_falls_back(rng):
    # weights too large for VMEM -> silently uses the XLA cell
    args = _params(rng, b=2, in_dim=1024, hid=1024)
    np.testing.assert_allclose(np.asarray(pgru(*args)),
                               np.asarray(xgru(*args)), atol=1e-5)


def test_gru_scan_matches_xla(rng):
    from audiogan_tpu.kernels.gru import _gru_scan_xla, gru_scan
    b, hid, feat, n_frames = 4, 32, 16, 8
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    args = (r(b, hid), r(b, feat), r(2 * feat, 3 * hid) * 0.2,
            r(hid, 3 * hid) * 0.2, r(3 * hid) * 0.1, r(3 * hid) * 0.1,
            r(feat, feat) * 0.2, r(hid, feat) * 0.2, r(feat) * 0.1)
    got = gru_scan(*args, n_frames)
    want = _gru_scan_xla(*args, n_frames=n_frames)
    assert got.shape == (b, n_frames, feat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gru_scan_grads_match_xla(rng):
    """The fused reverse-sweep backward kernel (VERDICT r2 #7) against the
    XLA scan's autodiff, every argnum, with a non-trivial cotangent."""
    from audiogan_tpu.kernels.gru import _gru_scan_xla, gru_scan
    b, hid, feat, n_frames = 2, 16, 8, 4
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    args = (r(b, hid), r(b, feat), r(2 * feat, 3 * hid) * 0.2,
            r(hid, 3 * hid) * 0.2, r(3 * hid) * 0.1, r(3 * hid) * 0.1,
            r(feat, feat) * 0.2, r(hid, feat) * 0.2, r(feat) * 0.1)
    ct = r(b, n_frames, feat)
    argnums = tuple(range(9))
    gp = jax.grad(lambda *a: jnp.sum(gru_scan(*a, n_frames) * ct),
                  argnums=argnums)(*args)
    gx = jax.grad(lambda *a: jnp.sum(_gru_scan_xla(*a, n_frames=n_frames) * ct),
                  argnums=argnums)(*args)
    for i, (a, b_) in enumerate(zip(gp, gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4, err_msg=str(i))


def test_gru_scan_grads_deeper_scan(rng):
    """Longer scan: carry/accumulator bookkeeping across many reverse grid
    steps (catches first/last-visit races the 4-frame case can't)."""
    from audiogan_tpu.kernels.gru import _gru_scan_xla, gru_scan
    b, hid, feat, n_frames = 4, 32, 16, 24
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    args = (r(b, hid), r(b, feat), r(2 * feat, 3 * hid) * 0.2,
            r(hid, 3 * hid) * 0.2, r(3 * hid) * 0.1, r(3 * hid) * 0.1,
            r(feat, feat) * 0.2, r(hid, feat) * 0.2, r(feat) * 0.1)
    ct = r(b, n_frames, feat)
    argnums = tuple(range(9))
    gp = jax.grad(lambda *a: jnp.sum(gru_scan(*a, n_frames) * ct),
                  argnums=argnums)(*args)
    gx = jax.grad(lambda *a: jnp.sum(_gru_scan_xla(*a, n_frames=n_frames) * ct),
                  argnums=argnums)(*args)
    for i, (a, b_) in enumerate(zip(gp, gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4, err_msg=str(i))


def test_gru_scan_grads_vmem_fallback(rng, monkeypatch):
    """When weights + grad accumulators overflow the VMEM budget the
    backward silently routes through the XLA scan vjp."""
    import audiogan_tpu.kernels.gru as kgru
    monkeypatch.setattr(kgru, "_MAX_VMEM_WEIGHTS", 1)   # force fallback
    b, hid, feat, n_frames = 2, 16, 8, 4
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    args = (r(b, hid), r(b, feat), r(2 * feat, 3 * hid) * 0.2,
            r(hid, 3 * hid) * 0.2, r(3 * hid) * 0.1, r(3 * hid) * 0.1,
            r(feat, feat) * 0.2, r(hid, feat) * 0.2, r(feat) * 0.1)
    gp = jax.grad(lambda *a: jnp.sum(kgru.gru_scan(*a, n_frames) ** 2),
                  argnums=tuple(range(9)))(*args)
    gx = jax.grad(
        lambda *a: jnp.sum(kgru._gru_scan_xla(*a, n_frames=n_frames) ** 2),
        argnums=tuple(range(9)))(*args)
    for i, (a, b_) in enumerate(zip(gp, gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4, err_msg=str(i))


def test_gru_scan_batch_vmem_gate(rng, monkeypatch):
    """Generation-regime batches overflow the kernel's VMEM frame (the
    h0/cond/out/scratch buffers scale with b — measured 45.8 MB at
    b=4096 on HW) and must fall back to the XLA scan instead of failing
    Mosaic compilation."""
    import audiogan_tpu.kernels.gru as kgru
    # shrink the budget so a CPU-sized batch trips the *act-bytes* term
    monkeypatch.setattr(kgru, "_VMEM_BUDGET", 64 * 1024)
    b, hid, feat, n_frames = 64, 32, 16, 3
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    args = (r(b, hid), r(b, feat), r(2 * feat, 3 * hid) * 0.2,
            r(hid, 3 * hid) * 0.2, r(3 * hid) * 0.1, r(3 * hid) * 0.1,
            r(feat, feat) * 0.2, r(hid, feat) * 0.2, r(feat) * 0.1)
    out, feats_nbf, h_seq = kgru._gru_scan_impl(*args, n_frames,
                                                with_h=True)
    assert feats_nbf is None and h_seq is None      # fell back
    want = kgru._gru_scan_xla(*args, n_frames=n_frames)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
