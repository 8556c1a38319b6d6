"""On-HW exactness witness for the Pallas phase-shuffle kernel pair.

Compiled Mosaic (not interpret) vs the select form, at the flagship D
shapes in bf16 and f32: values, vjp, and GP-style second-order — all must
be bit-exact (the op is pure data movement; every arithmetic term adds an
exact 0.0).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import importlib

import audiogan_tpu.kernels.shuffle as ks

# NOT `import ... as ps`: ops/__init__ rebinds the package attribute
# `phase_shuffle` to the function, shadowing the submodule
ps = importlib.import_module("audiogan_tpu.ops.phase_shuffle")

SHAPES = [(64, 4096, 64), (64, 1024, 128), (64, 256, 256), (64, 64, 512)]
RAD = 2


def ref(x, starts):
    xp = jnp.pad(x, ((0, 0), (RAD, RAD), (0, 0)), mode="reflect")
    return ps._apply_shifts(xp, RAD - starts, x.shape[1], RAD)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for dtype in (jnp.bfloat16, jnp.float32):
        for shape in SHAPES:
            b, t, c = shape
            x = jnp.asarray(rng.standard_normal(shape), dtype=dtype)
            starts = jnp.asarray(
                rng.integers(0, 2 * RAD + 1, b).astype(np.int32))

            pal = jax.jit(lambda v: ks.pshuf_prim(v, starts, rad=RAD))
            sel = jax.jit(lambda v: ref(v, starts))
            ok_v = np.array_equal(np.asarray(pal(x)), np.asarray(sel(x)))

            def loss(op):
                return lambda v: jnp.sum(
                    jnp.tanh(op(v).astype(jnp.float32)))

            g_pal = jax.jit(jax.grad(loss(
                lambda v: ks.pshuf_prim(v, starts, rad=RAD))))(x)
            g_sel = jax.jit(jax.grad(loss(lambda v: ref(v, starts))))(x)
            ok_g = np.array_equal(np.asarray(g_pal), np.asarray(g_sel))

            def gp(op):
                inner = loss(op)
                return lambda v: jnp.sum(
                    jax.grad(inner)(v).astype(jnp.float32) ** 2)

            gg_pal = jax.jit(jax.grad(gp(
                lambda v: ks.pshuf_prim(v, starts, rad=RAD))))(x)
            gg_sel = jax.jit(jax.grad(gp(lambda v: ref(v, starts))))(x)
            ok_gg = np.array_equal(np.asarray(gg_pal), np.asarray(gg_sel))

            print(f"{np.dtype(dtype).name} {shape}: values_exact={ok_v} "
                  f"vjp_exact={ok_g} grad2_exact={ok_gg}", flush=True)
            assert ok_v and ok_g and ok_gg, (dtype, shape)
    print("SHUFFLE HW CHECK PASS", flush=True)


if __name__ == "__main__":
    main()
