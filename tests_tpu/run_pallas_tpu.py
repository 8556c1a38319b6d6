"""On-hardware Pallas validation (run manually: python tests_tpu/run_pallas_tpu.py).

Compiled (not interpreted) equivalence of the Pallas conv/GRU kernels vs the
XLA path on the real TPU chip, plus a microbenchmark of each kernel.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.kernels import conv1d as pconv1d
from audiogan_tpu.kernels import conv_transpose1d as pconvt1d
from audiogan_tpu.kernels import gru_cell as pgru
from audiogan_tpu.ops.conv import conv1d as xconv1d
from audiogan_tpu.ops.conv import conv_transpose1d as xconvt1d
from audiogan_tpu.ops.gru import gru_cell as xgru


def check(name, got, want, atol=2e-3, rtol=2e-3):
    # cast up front: ml_dtypes scalars (bf16 outputs) have no __format__,
    # and np.allclose on them upcasts anyway
    got = np.asarray(got).astype(np.float64)
    want = np.asarray(want).astype(np.float64)
    err = float(np.max(np.abs(got - want))) if got.size else 0.0
    ok = np.allclose(got, want, atol=atol, rtol=rtol)
    print(f"{'OK ' if ok else 'FAIL'} {name}: max|diff|={err:.2e}")
    return ok


def _sync(out):
    """Host-fetch sync that also works for pytree outputs (grad tuples)."""
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])


def timeit(name, fn, *args, iters=20):
    out = jax.jit(fn)(*args)
    _sync(out)  # sync (host fetch — the only reliable sync on axon)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.jit(fn)(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"     {name}: {dt * 1e3:.3f} ms/call")
    return dt


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    ok = True

    # flagship D layer shapes (batch 64)
    for (b, t, cin, cout, k, s) in [
        (64, 4096, 64, 128, 25, 4),
        (64, 1024, 128, 256, 25, 4),
        (64, 256, 256, 512, 25, 4),
        (64, 64, 512, 1024, 25, 4),
    ]:
        x, w = r(b, t, cin), r(k, cin, cout) * 0.05
        got = jax.jit(lambda x, w: pconv1d(x, w, s, "SAME"))(x, w)
        want = jax.jit(lambda x, w: xconv1d(x, w, stride=s, impl="xla"))(x, w)
        ok &= check(f"conv1d {t}x{cin}->{cout}", got, want)
        tp = timeit("pallas", lambda x, w: pconv1d(x, w, s, "SAME"), x, w)
        tx = timeit("xla   ", lambda x, w: xconv1d(x, w, stride=s,
                                                   impl="xla"), x, w)
        print(f"     speedup: {tx / tp:.2f}x")

    # flagship G layer shapes
    for (b, t, cin, cout, k, s) in [
        (64, 16, 1024, 512, 25, 4),
        (64, 64, 512, 256, 25, 4),
        (64, 256, 256, 128, 25, 4),
        (64, 1024, 128, 64, 25, 4),
    ]:
        x, w = r(b, t, cin), r(k, cin, cout) * 0.05
        got = jax.jit(lambda x, w: pconvt1d(x, w, s))(x, w)
        want = jax.jit(lambda x, w: xconvt1d(x, w, stride=s,
                                             impl="xla"))(x, w)
        ok &= check(f"convt1d {t}x{cin}->{cout}", got, want)
        tp = timeit("pallas", lambda x, w: pconvt1d(x, w, s), x, w)
        tx = timeit("xla   ", lambda x, w: xconvt1d(x, w, stride=s,
                                                    impl="xla"), x, w)
        print(f"     speedup: {tx / tp:.2f}x")

    # GP second-order through pallas conv, compiled
    x, w = r(2, 256, 64) , r(25, 64, 64) * 0.1
    def gp(conv):
        def d_of_x(x, w):
            return jnp.sum(jnp.tanh(conv(x, w)))
        def f(w):
            g = jax.grad(d_of_x, argnums=0)(x, w)
            return jnp.sum(jnp.square(g))
        return f
    gp_p = jax.jit(jax.grad(gp(lambda x, w: pconv1d(x, w, 4, "SAME"))))(w)
    gp_x = jax.jit(jax.grad(gp(lambda x, w: xconv1d(x, w, stride=4,
                                                    impl="xla"))))(w)
    # Max-norm comparison with a loose bound is CORRECT here: vs CPU f32
    # truth, TPU-XLA's 2nd-order grad is ~7% off (max-norm) and the pallas
    # path ~3% off (default-precision matmul passes accumulate over the long
    # double-backprop chain; measured 2026-08-16). The pallas kernels' f32
    # accumulation is the MORE accurate of the two — exact equivalence holds
    # in f32 (tests/pallas on CPU).
    a, bb = np.asarray(gp_p), np.asarray(gp_x)
    rel = np.abs(a - bb).max() / np.abs(bb).max()
    ok2 = rel < 0.12
    print(f"{'OK ' if ok2 else 'FAIL'} 2nd-order GP grad "
          f"(compiled, default precision): max-norm rel={rel:.3f}")
    ok &= ok2

    # fused ingest (flagship wgan_gp_b64 shapes: store 24000 -> clip 16384)
    from audiogan_tpu.config import DataCfg
    from audiogan_tpu.ops.ingest import ingest_batch
    braw = jnp.asarray((rng.standard_normal((64, 24000)) * 9000)
                       .clip(-32768, 32767).astype(np.int16))
    dcfg = DataCfg(clip_len=16384, store_len=24000)
    key = jax.random.key(5)
    got = jax.jit(lambda r: ingest_batch(r, dcfg, key, kernels="pallas"))(braw)
    want = jax.jit(lambda r: ingest_batch(r, dcfg, key, kernels="xla"))(braw)
    ok &= check("ingest_fused 64x24000->16384", got, want, atol=1e-5)
    tp = timeit("pallas", lambda r: ingest_batch(r, dcfg, key,
                                                 kernels="pallas"), braw)
    tx = timeit("xla   ", lambda r: ingest_batch(r, dcfg, key,
                                                 kernels="xla"), braw)
    print(f"     speedup: {tx / tp:.2f}x")

    # off=0 rows on REAL hardware: store_len == clip_len forces every crop
    # offset to 0, driving the kernel's right-rotation through the
    # (n - off) % n == 0 branch — HW dynamic_rotate rejects shift==n
    # semantics that interpret mode silently reduces (2026-08-17)
    braw0 = braw[:, :16384]
    dcfg0 = DataCfg(clip_len=16384, store_len=16384)
    got = jax.jit(lambda r: ingest_batch(r, dcfg0, key, kernels="pallas")
                  )(braw0)
    want = jax.jit(lambda r: ingest_batch(r, dcfg0, key, kernels="xla")
                   )(braw0)
    ok &= check("ingest_fused off=0 rows (shift n%n)", got, want, atol=1e-5)

    # GRU cell (cond_gru_sc09 shapes)
    xg, hg = r(64, 1024), r(64, 512)
    wi, wh = r(1024, 1536) * 0.05, r(512, 1536) * 0.05
    bi, bh = r(1536) * 0.1, r(1536) * 0.1
    got = jax.jit(pgru)(xg, hg, wi, wh, bi, bh)
    want = jax.jit(xgru)(xg, hg, wi, wh, bi, bh)
    ok &= check("gru_cell 1024->512", got, want, atol=1e-4)
    tp = timeit("pallas", pgru, xg, hg, wi, wh, bi, bh)
    tx = timeit("xla   ", xgru, xg, hg, wi, wh, bi, bh)
    print(f"     speedup: {tx / tp:.2f}x")

    # persistent GRU scan, fwd + fused reverse-sweep bwd (cond_gru_sc09
    # geometry: hid 512, feat 256, 256 frames, batch 64; bf16 = the
    # training dtype, whose VMEM fit enables the Pallas backward)
    from audiogan_tpu.kernels.gru import _gru_scan_xla, gru_scan
    b_, hid_, feat_, nf = 64, 512, 256, 256
    sargs = (r(b_, hid_), r(b_, feat_), r(2 * feat_, 3 * hid_) * 0.05,
             r(hid_, 3 * hid_) * 0.05, r(3 * hid_) * 0.1,
             r(3 * hid_) * 0.1, r(feat_, feat_) * 0.05,
             r(hid_, feat_) * 0.05, r(feat_) * 0.1)
    def accuracy_check(name, pallas_out, xla_out, ref_out, slack=2.0):
        """bf16 carries diverge between impls BY DESIGN: the fused kernel
        keeps h/accumulators in f32 VMEM scratch across all 256 frames
        while the XLA scan truncates its carry to bf16 every step — so
        pallas-vs-xla equality is the wrong question at bf16. The right
        invariant: the kernel must be AT LEAST as close to the f32
        reference as the XLA bf16 scan is (x slack for noise)."""
        okk = True
        for pa, xa, rf in zip(jax.tree.leaves(pallas_out),
                              jax.tree.leaves(xla_out),
                              jax.tree.leaves(ref_out)):
            pa, xa, rf = (np.asarray(t).astype(np.float64)
                          for t in (pa, xa, rf))
            scale = max(float(np.max(np.abs(rf))), 1e-6)
            ep = float(np.max(np.abs(pa - rf))) / scale
            ex = float(np.max(np.abs(xa - rf))) / scale
            good = ep <= max(ex * slack, 1e-3)
            print(f"{'OK ' if good else 'FAIL'} {name}: rel-err pallas "
                  f"{ep:.2e} vs xla {ex:.2e} (vs f32 ref)")
            okk &= good
        return okk

    a32 = tuple(a.astype(jnp.float32) for a in sargs)
    for dt_ in (jnp.float32, jnp.bfloat16):
        a_dt = tuple(a.astype(dt_) for a in sargs)
        ct = r(b_, nf, feat_).astype(dt_)
        f_p = jax.jit(lambda *a: gru_scan(*a, nf))
        f_x = jax.jit(lambda *a: _gru_scan_xla(*a, n_frames=nf))
        name = jnp.dtype(dt_).name
        # f32 tolerance is LOOSE by necessity: TPU matmuls run at DEFAULT
        # precision (bf16 multiply passes) in both impls, and the 256-step
        # recurrence compounds the truncation differently per impl —
        # measured max|diff| 5.9e-3 on HW 2026-08-17 while CPU interpret
        # mode (tests/pallas/test_gru_kernel.py) is exact at 1e-5 and every
        # grad matches. Not a kernel bug; the drift is the platform's.
        tol = dict(atol=2e-2, rtol=2e-2)
        if dt_ == jnp.bfloat16:
            ref = f_x(*a32)
            ok &= accuracy_check(f"gru_scan fwd {name}", f_p(*a_dt),
                                 f_x(*a_dt), ref)
        else:
            ok &= check(f"gru_scan fwd {name}", f_p(*a_dt), f_x(*a_dt),
                        **tol)
        g_p = jax.jit(jax.grad(lambda *a: jnp.sum(
            gru_scan(*a, nf).astype(jnp.float32)
            * ct.astype(jnp.float32)), argnums=tuple(range(9))))
        g_x = jax.jit(jax.grad(lambda *a: jnp.sum(
            _gru_scan_xla(*a, n_frames=nf).astype(jnp.float32)
            * ct.astype(jnp.float32)), argnums=tuple(range(9))))
        gp_, gx_ = g_p(*a_dt), g_x(*a_dt)
        if dt_ == jnp.bfloat16:
            gref = g_x(*a32)
            for i_, (ga, gb, gr) in enumerate(zip(gp_, gx_, gref)):
                ok &= accuracy_check(f"gru_scan grad[{i_}] {name}",
                                     ga, gb, gr)
        else:
            for i_, (ga, gb) in enumerate(zip(gp_, gx_)):
                ok &= check(f"gru_scan grad[{i_}] {name}",
                            ga.astype(jnp.float32), gb.astype(jnp.float32),
                            **tol)
        tpf = timeit("pallas fwd ", f_p, *a_dt)
        txf = timeit("xla    fwd ", f_x, *a_dt)
        tpg = timeit("pallas grad", g_p, *a_dt)
        txg = timeit("xla    grad", g_x, *a_dt)
        print(f"     {name} speedup: fwd {txf / tpf:.2f}x  "
              f"grad {txg / tpg:.2f}x")

    print("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
