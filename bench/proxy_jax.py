"""Secondary measured-proxy baseline (SURVEY §6): eager un-jitted JAX.

The reference repo cannot be executed here (mount empty, no GPU), so
BASELINE.md instantiates the "reference steps/sec" denominator as measured
proxies running the IDENTICAL math as the flagship wgan_gp_b64 config
(BASELINE.json:8). This is the secondary proxy SURVEY §6 calls for: the
same WGAN-GP step as bench/proxy_torch.py written in JAX but executed
EAGERLY — no jit, no fusion, one op dispatch per primitive — i.e. what the
rebuild's single-graph compilation [B:5] buys relative to op-by-op
execution of the very same framework. Runs on CPU (force via
JAX_PLATFORMS=cpu) or any default device.

Run: PALLAS_AXON_POOL_IPS= python -m bench.proxy_jax [--steps 2] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _force_cpu():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")


def build(d=64, latent=100, max_ch=1024, clip=16384, shuffle=2):
    import jax
    import jax.numpy as jnp
    from jax import lax

    k = 25

    g_chs = [min(d * 16, max_ch)] + [min(d * 2 ** (4 - i), max_ch)
                                     for i in range(4)] + [1]
    d_chs = [1] + [min(d * 2 ** i, max_ch) for i in range(5)]

    def init(key):
        ks = jax.random.split(key, 2 + len(g_chs) + len(d_chs))
        it = iter(ks)
        p = {"g_fc": jax.random.normal(next(it), (latent, 16 * g_chs[0]))
             * 0.02}
        for i, (ci, co) in enumerate(zip(g_chs[:-1], g_chs[1:])):
            p[f"g_c{i}"] = jax.random.normal(next(it), (k, ci, co)) * 0.02
        p["d_fc"] = jax.random.normal(next(it), (d_chs[-1] * 16, 1)) * 0.02
        for i, (ci, co) in enumerate(zip(d_chs[:-1], d_chs[1:])):
            p[f"d_c{i}"] = jax.random.normal(next(it), (k, ci, co)) * 0.02
        return p

    def g_fwd(p, z):
        h = jax.nn.relu(z @ p["g_fc"]).reshape(z.shape[0], 16, g_chs[0])
        n = len(g_chs) - 1
        for i in range(n):
            # SAME-length convT: dilated len = 4t-3, out = dilated + lo +
            # hi - (k-1) = 4t needs lo + hi = 27
            h = lax.conv_general_dilated(
                h, p[f"g_c{i}"], window_strides=(1,), padding=[(13, 14)],
                lhs_dilation=(4,), dimension_numbers=("NWC", "WIO", "NWC"))
            h = jnp.tanh(h) if i == n - 1 else jax.nn.relu(h)
        return h

    def phase_shuffle(h, key, n):
        # proper per-example reflect-padded shift (same semantics as
        # ops/phase_shuffle.py), not a torch.roll-style stand-in
        b, t, _ = h.shape
        shifts = jax.random.randint(key, (b,), -n, n + 1)
        hp = jnp.pad(h, ((0, 0), (n, n), (0, 0)), mode="reflect")
        idx = (jnp.arange(t)[None, :] + n + shifts[:, None])
        return jnp.take_along_axis(hp, idx[:, :, None], axis=1)

    def d_fwd(p, x, key):
        h = x
        n = len(d_chs) - 1
        for i in range(n):
            h = lax.conv_general_dilated(
                h, p[f"d_c{i}"], window_strides=(4,), padding=[(12, 12)],
                dimension_numbers=("NWC", "WIO", "NWC"))
            h = jax.nn.leaky_relu(h, 0.2)
            if shuffle and i < n - 1:
                key, sk = jax.random.split(key)
                h = phase_shuffle(h, sk, shuffle)
        return (h.reshape(h.shape[0], -1) @ p["d_fc"])[:, 0]

    return init, g_fwd, d_fwd


def train_steps(n_steps=2, batch=64, n_critic=5, clip=16384, d=64):
    _force_cpu()
    import jax
    import jax.numpy as jnp
    import optax

    init, g_fwd, d_fwd = build(d=d, clip=clip)
    key = jax.random.key(0)
    params = init(key)
    pg = {n: v for n, v in params.items() if n.startswith("g_")}
    pd = {n: v for n, v in params.items() if n.startswith("d_")}
    opt = optax.adam(1e-4, b1=0.5, b2=0.9)
    og, od = opt.init(pg), opt.init(pd)

    times = []
    for s in range(n_steps):
        t0 = time.time()
        for c in range(n_critic):
            key, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 7)
            real = jax.random.uniform(k1, (batch, clip, 1)) * 2 - 1
            z = jax.random.normal(k2, (batch, 100))
            fake = jax.lax.stop_gradient(g_fwd(pg, z))
            eps = jax.random.uniform(k3, (batch, 1, 1))
            xhat = eps * real + (1 - eps) * fake

            def d_loss_fn(p):
                dl = jnp.mean(d_fwd(p, fake, k4)) - jnp.mean(
                    d_fwd(p, real, k5))
                gn = jnp.linalg.norm(
                    jax.grad(lambda x: jnp.sum(d_fwd(p, x, k6)))(xhat)
                    .reshape(batch, -1), axis=1)
                return dl + 10.0 * jnp.mean((gn - 1.0) ** 2)

            gd = jax.grad(d_loss_fn)(pd)        # eager: re-traced every call
            upd, od = opt.update(gd, od, pd)
            pd = jax.tree.map(lambda a, b: a + b, pd, upd)
            jax.block_until_ready(pd)
            print(f"  step {s} critic {c}: {time.time() - t0:.1f}s in",
                  flush=True)
        key, kz, ks = jax.random.split(key, 3)
        z = jax.random.normal(kz, (batch, 100))
        gg = jax.grad(lambda p: -jnp.mean(d_fwd(pd, g_fwd(p, z), ks)))(pg)
        upd, og = opt.update(gg, og, pg)
        pg = jax.tree.map(lambda a, b: a + b, pg, upd)
        jax.block_until_ready(pg)
        times.append(time.time() - t0)
        print(f"jax-eager proxy step {s}: {times[-1]:.2f}s", flush=True)
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    times = train_steps(n_steps=args.steps, batch=args.batch)
    best = min(times)
    print(json.dumps({"proxy": "jax-cpu-eager",
                      "steps_per_sec": round(1.0 / best, 5),
                      "sec_per_step": round(best, 3),
                      "batch": args.batch}))


if __name__ == "__main__":
    main()
