"""On-HW exactness witness for the sconv (fused phase-shuffle conv) family
(VERDICT r3 #1): the fused critic must match the unfused select-form critic
compiled on the real chip — values, x-gradients, and the GP double-backprop
weight gradients — at flagship shapes, in both f32 and bf16.

Run (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sconv_hw_check.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def check_critic(dtype, kernels, tol_v, tol_g):
    from audiogan_tpu.models.wavegan import WaveGANDiscriminator

    kw = dict(model_dim=64, kernel_size=25, strides=(4, 4, 4, 4, 4),
              max_channels=1024, kernels=kernels, dtype=dtype)
    d0 = WaveGANDiscriminator(fused_shuffle_sites=0, **kw)
    d1 = WaveGANDiscriminator(fused_shuffle_sites=-1, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 16384, 1)).astype(np.float32))
    params = d0.init({"params": jax.random.key(0),
                      "phase_shuffle": jax.random.key(1)}, x)

    def score(d):
        def f(p, v):
            return d.apply(p, v, train=True,
                           rngs={"phase_shuffle": jax.random.key(7)})
        return f

    s0 = jax.jit(score(d0))(params, x)
    s1 = jax.jit(score(d1))(params, x)
    dv = float(jnp.max(jnp.abs(s1 - s0)) / (jnp.max(jnp.abs(s0)) + 1e-9))
    assert dv <= tol_v, f"values: rel {dv:.3g} > {tol_v}"

    def gp(d):
        f = score(d)

        def g(p):
            gx = jax.grad(lambda v: jnp.sum(f(p, v)))(x)
            return jnp.sum(jnp.square(gx))
        return g

    g0 = jax.jit(jax.value_and_grad(gp(d0)))(params)
    g1 = jax.jit(jax.value_and_grad(gp(d1)))(params)
    dgp = abs(float(g1[0] - g0[0])) / (abs(float(g0[0])) + 1e-9)
    assert dgp <= tol_v, f"gp value: rel {dgp:.3g} > {tol_v}"
    worst = 0.0
    for a, b in zip(jax.tree.leaves(g0[1]), jax.tree.leaves(g1[1])):
        num = float(jnp.max(jnp.abs(b - a)))
        den = float(jnp.max(jnp.abs(a))) + 1e-9
        worst = max(worst, num / den)
    assert worst <= tol_g, f"gp grads: rel {worst:.3g} > {tol_g}"
    return {"values_rel": dv, "gp_rel": dgp, "gp_grads_rel": worst}


def main():
    print("backend:", jax.default_backend(), flush=True)
    for dtype, tol_v, tol_g in ((jnp.float32, 2e-5, 2e-3),
                                (jnp.bfloat16, 2e-2, 5e-2)):
        for kernels in ("xla", "auto"):
            r = check_critic(dtype, kernels, tol_v, tol_g)
            print(f"PASS {jnp.dtype(dtype).name:8s} kernels={kernels:5s} "
                  f"{r}", flush=True)
    print("sconv_hw_check: ALL PASS", flush=True)


if __name__ == "__main__":
    main()
