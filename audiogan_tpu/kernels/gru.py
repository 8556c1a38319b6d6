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

from audiogan_tpu.kernels.conv import _vma_sds

_INTERPRET = False
_MAX_VMEM_WEIGHTS = 12 * 1024 * 1024  # bytes of W_i + W_h we allow in VMEM
# whole-kernel VMEM frame budget (weights + batch-scaled carries/blocks);
# the scoped-vmem hard limit is 16 MB — leave headroom like conv.py's
# tile fitter. Generation-regime batches (b >= ~2k at cond_gru geometry)
# overflow this and fall back to the XLA scan, which is also the
# measured-faster tier at such batches (BASELINE.md sampler A/Bs).
_VMEM_BUDGET = 13 * 1024 * 1024


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
        out_shape=_vma_sds((b, hid), x.dtype, x, h),
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


def _gru_gates(x, h, w_i, w_h, b_i, b_h):
    # recompute-friendly residuals: the (cheap) gate activations
    gi = x @ w_i + b_i
    gh = h @ w_h + b_h
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return r, z, n, h_n


def _gru_fwd2(x, h, w_i, w_h, b_i, b_h):
    # the PRIMAL comes from the fused kernel — identical numerics in grad
    # and no-grad contexts (r3 review: the old fwd recomposed the cell in
    # XLA, silently bypassing the kernel under differentiation); the gate
    # residuals for the backward are recomputed with two small matmuls
    out = _gru_fwd_impl(x, h, w_i, w_h, b_i, b_h)
    r, z, n, h_n = _gru_gates(x, h, w_i, w_h, b_i, b_h)
    return out, (x, h, r, z, n, h_n, w_i, w_h)


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


def _gru_scan_kernel_h(h0_ref, cond_ref, wi_ref, wh_ref, bi_ref, bh_ref,
                       war_ref, wout_ref, bout_ref, o_ref, oh_ref, h_s, f_s,
                       *, hid):
    """Forward scan step that ALSO emits the hidden-state sequence — the
    residual the fused backward kernel needs (the recurrence is not
    invertible, so h_t cannot be recomputed during the reverse sweep)."""
    _gru_scan_kernel(h0_ref, cond_ref, wi_ref, wh_ref, bi_ref, bh_ref,
                     war_ref, wout_ref, bout_ref, o_ref, h_s, f_s, hid=hid)
    oh_ref[0] = h_s[...].astype(oh_ref.dtype)


def _gru_scan_impl(h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out, b_out,
                   n_frames, with_h=False):
    b, hid = h0.shape
    feat = w_ar.shape[0]
    # VMEM-resident weight bytes at the STORED dtype (bf16 training halves
    # the footprint; the kernels cast up to f32 per-use in registers)
    weight_bytes = jnp.dtype(w_i.dtype).itemsize * (
        w_i.size + w_h.size + w_ar.size + w_out.size)
    # batch-scaled VMEM: h0/cond inputs, double-buffered out block(s),
    # f32 carry scratch — at generation batches these dwarf the weights
    # (measured: b=4096 wants a 45.8 MB frame vs the 16 MB scoped limit)
    itemsize = jnp.dtype(h0.dtype).itemsize
    act_bytes = (b * hid + b * feat) * itemsize
    act_bytes += 2 * b * feat * itemsize
    if with_h:
        act_bytes += 2 * b * hid * itemsize
    act_bytes += 4 * b * (hid + feat)
    if weight_bytes > _MAX_VMEM_WEIGHTS or \
            weight_bytes + act_bytes > _VMEM_BUDGET:
        out = _gru_scan_xla(h0, cond_proj, w_i, w_h, b_i, b_h, w_ar,
                            w_out, b_out, n_frames)
        return (out, None, None) if with_h else out
    kern = (functools.partial(_gru_scan_kernel_h, hid=hid) if with_h
            else functools.partial(_gru_scan_kernel, hid=hid))
    out_specs = pl.BlockSpec((1, b, feat), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = _vma_sds((n_frames, b, feat), h0.dtype, h0, cond_proj)
    if with_h:
        out_specs = [out_specs,
                     pl.BlockSpec((1, b, hid), lambda t: (t, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     _vma_sds((n_frames, b, hid), h0.dtype, h0, cond_proj)]
    out = pl.pallas_call(
        kern,
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
        out_specs=out_specs,
        out_shape=out_shape,
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
    if with_h:
        feats_nbf, h_seq = out
        return jnp.transpose(feats_nbf, (1, 0, 2)), feats_nbf, h_seq
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
    out, feats_nbf, h_seq = _gru_scan_impl(
        h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out, b_out, n_frames,
        with_h=True)
    return out, (h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out, b_out,
                 feats_nbf, h_seq)


def _gru_scan_bwd_kernel(g_ref, pf_ref, ph_ref, cond_ref, wi_ref, wh_ref,
                         bi_ref, bh_ref, war_ref, wout_ref, bout_ref,
                         dh0_ref, dcond_ref, dwi_ref, dwh_ref, dbi_ref,
                         dbh_ref, dwar_ref, dwout_ref, dbout_ref,
                         dh_s, dfc_s, dwi_s, dwh_s, dbi_s, dbh_s, dwar_s,
                         dwout_s, dbout_s, dcond_s, *, hid, feat, n_frames):
    """Reverse-sweep GRU-scan backward as ONE persistent kernel (the cuDNN
    GRU-backward analog, VERDICT r2 #7): grid step p processes frame
    t = n_frames-1-p, recomputing that frame's gates from the saved
    (h_{t-1}, feat_{t-1}) residuals — one extra gate-matmul pass instead of
    storing [n_frames, B, 3H] gate tensors — while every weight matrix AND
    every weight-grad accumulator stays VMEM-resident across all frames.
    The dL/dh and ar-path dL/dfeat carries live in VMEM scratch; outputs
    are flushed once, on the final (t=0) visit."""
    p = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(p == 0)
    def _():
        for ref in (dh_s, dfc_s, dwi_s, dwh_s, dbi_s, dbh_s, dwar_s,
                    dwout_s, dbout_s, dcond_s):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    prev_f = pf_ref[0].astype(f32)              # feat_{t-1} [B,F]
    prev_h = ph_ref[0].astype(f32)              # h_{t-1}    [B,H]
    cond = cond_ref[...].astype(f32)
    wi = wi_ref[...].astype(f32)
    wh = wh_ref[...].astype(f32)
    war = war_ref[...].astype(f32)
    wout = wout_ref[...].astype(f32)

    def mm(a, b_, dims):                        # MXU matmul, f32 accum
        return jax.lax.dot_general(a, b_, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=f32)

    # --- recompute frame t's forward intermediates (same math as fwd) ---
    ar = mm(prev_f, war, ((1,), (0,)))
    x = jnp.concatenate([ar, cond], axis=-1)
    gi = mm(x, wi, ((1,), (0,))) + bi_ref[...]
    gh = mm(prev_h, wh, ((1,), (0,))) + bh_ref[...]
    i_r, i_z, i_n = gi[:, :hid], gi[:, hid:2 * hid], gi[:, 2 * hid:]
    h_r, h_z, h_n = gh[:, :hid], gh[:, hid:2 * hid], gh[:, 2 * hid:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    h = (1.0 - z) * n + z * prev_h
    feat_t = jnp.tanh(mm(h, wout, ((1,), (0,))) + bout_ref[...])

    # --- frame-output head: feat_t = tanh(h @ wout + bout) ---
    dfeat = g_ref[0].astype(f32) + dfc_s[...]   # output ct + ar-path carry
    dfp = dfeat * (1.0 - feat_t * feat_t)
    dwout_s[...] += mm(h, dfp, ((0,), (0,)))
    dbout_s[...] += jnp.sum(dfp, axis=0, keepdims=True)
    dh = dh_s[...] + mm(dfp, wout, ((1,), (1,)))

    # --- GRU cell backward (torch gate convention, = _gru_bwd2) ---
    dz = dh * (prev_h - n) * z * (1.0 - z)
    dn = dh * (1.0 - z) * (1.0 - n * n)
    dr = dn * h_n * r * (1.0 - r)
    dgi = jnp.concatenate([dr, dz, dn], axis=-1)
    dgh = jnp.concatenate([dr, dz, dn * r], axis=-1)
    dx = mm(dgi, wi, ((1,), (1,)))
    dh_prev = mm(dgh, wh, ((1,), (1,))) + dh * z
    dwi_s[...] += mm(x, dgi, ((0,), (0,)))
    dwh_s[...] += mm(prev_h, dgh, ((0,), (0,)))
    dbi_s[...] += jnp.sum(dgi, axis=0, keepdims=True)
    dbh_s[...] += jnp.sum(dgh, axis=0, keepdims=True)

    # --- input split: ar half feeds feat_{t-1}, cond half accumulates ---
    dar = dx[:, :feat]
    dcond_s[...] += dx[:, feat:]
    dwar_s[...] += mm(prev_f, dar, ((0,), (0,)))
    dfc_s[...] = mm(dar, war, ((1,), (1,)))
    dh_s[...] = dh_prev

    @pl.when(p == n_frames - 1)
    def _():
        dh0_ref[...] = dh_s[...].astype(dh0_ref.dtype)
        dcond_ref[...] = dcond_s[...].astype(dcond_ref.dtype)
        dwi_ref[...] = dwi_s[...].astype(dwi_ref.dtype)
        dwh_ref[...] = dwh_s[...].astype(dwh_ref.dtype)
        dbi_ref[...] = dbi_s[...].astype(dbi_ref.dtype)
        dbh_ref[...] = dbh_s[...].astype(dbh_ref.dtype)
        dwar_ref[...] = dwar_s[...].astype(dwar_ref.dtype)
        dwout_ref[...] = dwout_s[...].astype(dwout_ref.dtype)
        dbout_ref[...] = dbout_s[...].astype(dbout_ref.dtype)


def _gru_scan_bwd(n_frames, res, g):
    (h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out, b_out,
     feats_nbf, h_seq) = res
    n_w = w_i.size + w_h.size + w_ar.size + w_out.size
    # resident set = stored-dtype weights + f32 grad accumulators
    weight_bytes = (jnp.dtype(w_i.dtype).itemsize + 4) * n_w
    bsz, hid_ = h0.shape
    feat_ = w_ar.shape[0]
    itemsize = jnp.dtype(h0.dtype).itemsize
    # batch-scaled VMEM: double-buffered reverse blocks (g, prev_f,
    # prev_h), the resident cond_proj input, dh0/dcond outputs, and the
    # f32 carry + dcond scratch
    act_bytes = 2 * bsz * (2 * feat_ + hid_) * itemsize
    act_bytes += bsz * feat_ * itemsize
    act_bytes += bsz * (hid_ + feat_) * itemsize
    act_bytes += 4 * bsz * (hid_ + 2 * feat_)
    if feats_nbf is None or weight_bytes > _MAX_VMEM_WEIGHTS or \
            weight_bytes + act_bytes > _VMEM_BUDGET:
        # forward fell back to XLA (or grads + weights overflow VMEM):
        # backward = vjp through the numerically-identical XLA scan
        _, vjp = jax.vjp(
            lambda *a: _gru_scan_xla(*a, n_frames=n_frames),
            h0, cond_proj, w_i, w_h, b_i, b_h, w_ar, w_out, b_out)
        return vjp(g)

    b, hid = h0.shape
    feat = w_ar.shape[0]
    in_dim = w_i.shape[0]
    g_nbf = jnp.transpose(g, (1, 0, 2))         # [n_frames, B, F]
    # shifted residuals: frame t's backward needs feat_{t-1} / h_{t-1}
    prev_f = jnp.concatenate([jnp.zeros_like(feats_nbf[:1]),
                              feats_nbf[:-1]], axis=0)
    prev_h = jnp.concatenate([h0[None], h_seq[:-1]], axis=0)

    rev = lambda t: (n_frames - 1 - t, 0, 0)
    full2 = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0),
                                       memory_space=pltpu.VMEM)
    grads = pl.pallas_call(
        functools.partial(_gru_scan_bwd_kernel, hid=hid, feat=feat,
                          n_frames=n_frames),
        grid=(n_frames,),
        in_specs=[
            pl.BlockSpec((1, b, feat), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, feat), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hid), rev, memory_space=pltpu.VMEM),
            full2(cond_proj.shape), full2(w_i.shape), full2(w_h.shape),
            full2((1, 3 * hid)), full2((1, 3 * hid)), full2(w_ar.shape),
            full2(w_out.shape), full2((1, feat)),
        ],
        out_specs=[
            full2((b, hid)), full2((b, feat)), full2((in_dim, 3 * hid)),
            full2((hid, 3 * hid)), full2((1, 3 * hid)),
            full2((1, 3 * hid)), full2((feat, feat)), full2((hid, feat)),
            full2((1, feat)),
        ],
        out_shape=[
            _vma_sds((b, hid), h0.dtype, h0, g_nbf),
            _vma_sds((b, feat), cond_proj.dtype, h0, g_nbf),
            _vma_sds((in_dim, 3 * hid), w_i.dtype, h0, g_nbf),
            _vma_sds((hid, 3 * hid), w_h.dtype, h0, g_nbf),
            _vma_sds((1, 3 * hid), b_i.dtype, h0, g_nbf),
            _vma_sds((1, 3 * hid), b_h.dtype, h0, g_nbf),
            _vma_sds((feat, feat), w_ar.dtype, h0, g_nbf),
            _vma_sds((hid, feat), w_out.dtype, h0, g_nbf),
            _vma_sds((1, feat), b_out.dtype, h0, g_nbf),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hid), jnp.float32),          # dh carry
            pltpu.VMEM((b, feat), jnp.float32),         # ar-path dfeat carry
            pltpu.VMEM((in_dim, 3 * hid), jnp.float32),
            pltpu.VMEM((hid, 3 * hid), jnp.float32),
            pltpu.VMEM((1, 3 * hid), jnp.float32),
            pltpu.VMEM((1, 3 * hid), jnp.float32),
            pltpu.VMEM((feat, feat), jnp.float32),
            pltpu.VMEM((hid, feat), jnp.float32),
            pltpu.VMEM((1, feat), jnp.float32),
            pltpu.VMEM((b, feat), jnp.float32),         # dcond accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n_frames * b * (feat * feat
                                      + 3 * hid * (2 * feat + hid)
                                      + hid * feat),
            bytes_accessed=2 * weight_bytes
                           + 4 * n_frames * b * (2 * feat + hid),
            transcendentals=8 * n_frames * b * hid),
        interpret=_INTERPRET,
    )(g_nbf, prev_f, prev_h, cond_proj, w_i, w_h, b_i[None, :],
      b_h[None, :], w_ar, w_out, b_out[None, :])
    (dh0, dcond, dwi, dwh, dbi, dbh, dwar, dwout, dbout) = grads
    return (dh0, dcond, dwi, dwh, dbi[0], dbh[0], dwar, dwout, dbout[0])


gru_scan.defvjp(_gru_scan_fwd, _gru_scan_bwd)
