"""Pallas fused GRU cell (SURVEY C8 native tier; replaces cuDNN GRU).

One kernel computes both gate matmuls (x@W_i, h@W_h — MXU) and all gate
nonlinearities + the state blend (VPU) without round-tripping the [B, 3H]
gate tensors through HBM, which is exactly the fusion cuDNN's GRU cell does
on GPU. Weights live in VMEM across the call (max 3H x (in+H) floats —
~10 MB for the cond_gru_sc09 config, within the v5e 16 MB budget; larger
hidden sizes fall back to the XLA cell).

Grid: (n_batch_blocks,). Gate convention matches ops.gru.gru_cell
(torch.nn.GRUCell exactly); equivalence pinned by tests/pallas/test_gru.py.

Differentiability: custom_vjp with an XLA-composed backward (the GRU sits
only in the generator, which the WGAN-GP loss differentiates to first order
— SURVEY R2 note; conv1d is the only op needing reverse-over-reverse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False
_MAX_VMEM_WEIGHTS = 12 * 1024 * 1024  # bytes of W_i + W_h we allow in VMEM


def _cdiv(a, b):
    return -(-a // b)


def _gru_kernel(x_ref, h_ref, wi_ref, wh_ref, bi_ref, bh_ref, o_ref, *, hid):
    gi = jnp.dot(x_ref[...], wi_ref[...],
                 preferred_element_type=jnp.float32) + bi_ref[...]
    gh = jnp.dot(h_ref[...], wh_ref[...],
                 preferred_element_type=jnp.float32) + bh_ref[...]
    i_r, i_z, i_n = gi[:, :hid], gi[:, hid:2 * hid], gi[:, 2 * hid:]
    h_r, h_z, h_n = gh[:, :hid], gh[:, hid:2 * hid], gh[:, 2 * hid:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    h = h_ref[...].astype(jnp.float32)
    o_ref[...] = ((1.0 - z) * n + z * h).astype(o_ref.dtype)


def _gru_fwd_impl(x, h, w_i, w_h, b_i, b_h):
    b, in_dim = x.shape
    hid = h.shape[-1]
    if (w_i.size + w_h.size) * 4 > _MAX_VMEM_WEIGHTS:
        from audiogan_tpu.ops.gru import gru_cell as xla_cell
        return xla_cell(x, h, w_i, w_h, b_i, b_h, impl="xla")
    b_blk = min(b, 256)
    return pl.pallas_call(
        functools.partial(_gru_kernel, hid=hid),
        grid=(_cdiv(b, b_blk),),
        in_specs=[
            pl.BlockSpec((b_blk, in_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, hid), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_dim, 3 * hid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, 3 * hid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_blk, hid), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hid), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 3 * hid * (in_dim + hid),
            bytes_accessed=4 * (x.size + h.size + w_i.size + w_h.size
                                + b * hid),
            transcendentals=6 * b * hid),
        interpret=_INTERPRET,
    )(x, h, w_i, w_h, b_i[None, :], b_h[None, :])


@jax.custom_vjp
def gru_cell(x, h, w_i, w_h, b_i, b_h):
    """Fused GRU step: x [B,in], h [B,H] -> h' [B,H] (torch convention)."""
    return _gru_fwd_impl(x, h, w_i, w_h, b_i, b_h)


def _gru_fwd(x, h, w_i, w_h, b_i, b_h):
    # recompute-friendly residuals: keep the (cheap) gate pre-activations
    gi = x @ w_i + b_i
    gh = h @ w_h + b_h
    hid = h.shape[-1]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    out = (1 - z) * n + z * h
    return out, (x, h, r, z, n, h_n)


def _gru_fwd2(x, h, w_i, w_h, b_i, b_h):
    out, res = _gru_fwd(x, h, w_i, w_h, b_i, b_h)
    return out, res + (w_i, w_h)


def _gru_bwd2(res, g):
    x, h, r, z, n, h_n, w_i, w_h = res
    dz = g * (h - n) * z * (1 - z)
    dn = g * (1 - z) * (1 - n * n)
    dr = dn * h_n * r * (1 - r)
    dgi = jnp.concatenate([dr, dz, dn], axis=-1)
    dgh = jnp.concatenate([dr, dz, dn * r], axis=-1)
    dx = dgi @ w_i.T
    dh = dgh @ w_h.T + g * z
    dwi = x.T @ dgi
    dwh = h.T @ dgh
    dbi = dgi.sum(axis=0)
    dbh = dgh.sum(axis=0)
    return dx, dh, dwi, dwh, dbi, dbh


gru_cell.defvjp(_gru_fwd2, _gru_bwd2)


# ---------------------------------------------------------------------------
# Persistent fused GRU scan (the cuDNN-persistent-RNN analog)
# ---------------------------------------------------------------------------
#
# The GRU generator's recurrence is a lax.scan of small matmuls — on TPU that
# costs one kernel dispatch + weight refetch per frame. This kernel runs the
# ENTIRE frame scan as ONE pallas_call: grid=(n_frames,), all weight matrices
# resident in VMEM across grid steps, the (h, feat) carry living in VMEM
# scratch. Each grid step computes
#     x_t    = concat(feat_{t-1} @ w_ar, cond_proj)
#     h_t    = GRUCell(x_t, h_{t-1})
#     feat_t = tanh(h_t @ w_out + b_out)
# and writes feat_t to its output block. Gradients: custom_vjp whose backward
# re-runs the equivalent (numerically identical) XLA scan under jax.vjp — the
# generator only needs first-order grads (SURVEY R2).

def _gru_scan_kernel(h0_ref, cond_ref, wi_ref, wh_ref, bi_ref, bh_ref,
                     war_ref, wout_ref, bout_ref, o_ref, h_s, f_s, *, hid):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[...] = h0_ref[...].astype(jnp.float32)
        f_s[...] = jnp.zeros_like(f_s)

    ar = jnp.dot(f_s[...], war_ref[...], preferred_element_type=jnp.float32)
    x = jnp.concatenate([ar, cond_ref[...].astype(jnp.float32)], axis=-1)
    gi = jnp.dot(x, wi_ref[...].astype(jnp.float32),
                 preferred_element_type=jnp.float32) + bi_ref[...]
    gh = jnp.dot(h_s[...], wh_ref[...].astype(jnp.float32),
                 preferred_element_type=jnp.float32) + bh_ref[...]
    i_r, i_z, i_n = gi[:, :hid], gi[:, hid:2 * hid], gi[:, 2 * hid:]
    h_r, h_z, h_n = gh[:, :hid], gh[:, hid:2 * hid], gh[:, 2 * hid:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    h = (1.0 - z) * n + z * h_s[...]
    feat = jnp.tanh(jnp.dot(h, wout_ref[...].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
                    + bout_ref[...])
    h_s[...] = h
    f_s[...] = feat
    o_ref[0] = feat.astype(o_ref.dtype)


def _gru_scan_xla(h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out, b_out,
                  n_frames):
    """Reference scan — identical math, used for fallback and for the VJP."""
    from audiogan_tpu.ops.gru import gru_cell as xla_cell

    def step(carry, _):
        h, prev_feat = carry
        x = jnp.concatenate([prev_feat @ w_ar, cond_proj], axis=-1)
        h = xla_cell(x, h, w_i, w_h, b_i, b_h, impl="xla")
        feat = jnp.tanh(h @ w_out + b_out)
        return (h, feat), feat

    f0 = jnp.zeros((h0.shape[0], w_ar.shape[0]), h0.dtype)
    _, feats = jax.lax.scan(step, (h0, f0), None, length=n_frames)
    return jnp.transpose(feats, (1, 0, 2))      # [B, n_frames, F]


def _gru_scan_impl(h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out, b_out,
                   n_frames):
    b, hid = h0.shape
    feat = w_ar.shape[0]
    weight_bytes = 4 * (w_i.size + w_h.size + w_ar.size + w_out.size)
    if weight_bytes > _MAX_VMEM_WEIGHTS:
        return _gru_scan_xla(h0, cond_proj, w_i, w_h, b_i, b_h, w_ar,
                             w_out, b_out, n_frames)
    out = pl.pallas_call(
        functools.partial(_gru_scan_kernel, hid=hid),
        grid=(n_frames,),
        in_specs=[
            pl.BlockSpec(h0.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cond_proj.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_i.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_h.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hid), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hid), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_ar.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_out.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, feat), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, feat), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_frames, b, feat), h0.dtype),
        scratch_shapes=[
            pltpu.VMEM((b, hid), jnp.float32),
            pltpu.VMEM((b, feat), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_frames * b * (feat * feat + 3 * hid * (2 * feat + hid)
                                      + hid * feat),
            bytes_accessed=weight_bytes + 4 * n_frames * b * feat,
            transcendentals=8 * n_frames * b * hid),
        interpret=_INTERPRET,
    )(h0, cond_proj, w_i, w_h, b_i[None, :], b_h[None, :], w_ar, w_out,
      b_out[None, :])
    return jnp.transpose(out, (1, 0, 2))        # [B, n_frames, F]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def gru_scan(h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out, b_out,
             n_frames):
    """Whole frame-level GRU recurrence fused into one TPU kernel.

    h0 [B,H], cond_proj [B,F] -> frame features [B, n_frames, F].
    """
    return _gru_scan_impl(h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out,
                          b_out, n_frames)


def _gru_scan_fwd(h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out, b_out,
                  n_frames):
    out = _gru_scan_impl(h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out,
                         b_out, n_frames)
    return out, (h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out, b_out)


def _gru_scan_bwd(n_frames, res, g):
    # backward = vjp through the numerically-identical XLA scan (recomputes
    # the forward once; G only ever needs first-order grads)
    _, vjp = jax.vjp(
        lambda *a: _gru_scan_xla(*a, n_frames=n_frames), *res)
    return vjp(g)


gru_scan.defvjp(_gru_scan_fwd, _gru_scan_bwd)
