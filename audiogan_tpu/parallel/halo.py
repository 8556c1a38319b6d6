"""Context-parallel (time-axis) conv ops via halo exchange (SURVEY §5
long-context; the conv-net analog of ring attention, [B:11]).

Inside a shard_map over the 'cp' mesh axis, each shard holds a contiguous
time slice of the signal. A strided conv needs (k-1) boundary samples from
its neighbors; one `lax.ppermute` each way ships exactly the halo, then the
conv runs locally — cost O(k) per layer vs O(T/cp) compute. Non-cyclic
permutes deliver zeros at the outer edges, which is exactly SAME-conv
zero-padding, so sharded == unsharded bit-for-bit (pinned by
tests/parallel/test_halo.py).

These helpers must be called INSIDE shard_map with the time axis sharded
over `axis`; x is the local shard [B, T_loc, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from audiogan_tpu.ops.conv import conv1d as conv1d_impl


def _shift_from_left(x_edge: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Each shard receives its LEFT neighbor's right-edge slab (zeros at i=0)."""
    n = lax.axis_size(axis)
    perm = [(i, i + 1) for i in range(n - 1)]
    return lax.ppermute(x_edge, axis, perm)


def _shift_from_right(x_edge: jnp.ndarray, axis: str) -> jnp.ndarray:
    n = lax.axis_size(axis)
    perm = [(i + 1, i) for i in range(n - 1)]
    return lax.ppermute(x_edge, axis, perm)


def gather_halo(x: jnp.ndarray, left: int, right: int, axis: str
                ) -> jnp.ndarray:
    """Extend the local shard along dim 1 with `left`/`right` neighbor
    slabs (any rank; dim 1 is the sharded time/frame axis)."""
    parts = []
    if left > 0:
        parts.append(_shift_from_left(x[:, -left:], axis))
    parts.append(x)
    if right > 0:
        parts.append(_shift_from_right(x[:, :right], axis))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def cp_conv1d(x: jnp.ndarray, w: jnp.ndarray, stride: int, axis: str,
              impl: str = "xla") -> jnp.ndarray:
    """Time-sharded SAME conv: halo exchange + local VALID conv.

    Requires T_global % (cp * stride) == 0 (config.validate enforces
    clip_len % cp == 0 and the model strides divide clip lengths).

    Deep layers can shrink the local shard below the halo width (one
    ppermute only reaches immediate neighbors); there the tensor is tiny,
    so fall back to an all-gather + local conv + slice — exact and cheap
    precisely when it triggers.
    """
    k = w.shape[0]
    t_loc = x.shape[1]
    assert t_loc % stride == 0, "local shard must be stride-aligned"
    t_out_loc = t_loc // stride
    # global SAME pad for stride-aligned T: total = k - stride (k >= stride)
    total_pad = max(k - stride, 0)
    pad_lo = total_pad // 2
    pad_hi = total_pad - pad_lo
    if pad_lo > t_loc or pad_hi > t_loc:
        idx = lax.axis_index(axis)
        x_full = lax.all_gather(x, axis, axis=1, tiled=True)
        y_full = conv1d_impl(x_full, w, stride=stride, padding="SAME",
                             impl=impl)
        return lax.dynamic_slice_in_dim(y_full, idx * t_out_loc, t_out_loc,
                                        axis=1)
    x_ext = gather_halo(x, pad_lo, pad_hi, axis)
    y = conv1d_impl(x_ext, w, stride=stride, padding=(0, 0), impl=impl)
    assert y.shape[1] == t_out_loc, (y.shape, t_out_loc)
    return y


def cp_conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray, stride: int,
                        axis: str, impl: str = "xla") -> jnp.ndarray:
    """Time-sharded fractionally-strided conv (overlap via input halos).

    Local out length is T_loc * stride; boundary contributions come from the
    neighbor input halos rather than post-hoc overlap-add (one ppermute per
    side, no second exchange).
    """
    k = w.shape[0]
    s = stride
    pad_lo = (k - 1) // 2
    t_loc = x.shape[1]
    lx = -(-pad_lo // s)                    # left halo in input samples
    rx = -(-max(k - 1 - pad_lo, 0) // s)    # right halo
    if lx > t_loc or rx > t_loc:
        # halo wider than the shard (deep tiny layers): all-gather fallback
        idx = lax.axis_index(axis)
        x_full = lax.all_gather(x, axis, axis=1, tiled=True)
        t_full = x_full.shape[1]
        from audiogan_tpu.kernels import conv_transpose1d as kconvt
        y_full = kconvt(x_full, w, s, pad_lo=pad_lo, out_len=t_full * s,
                        impl=impl)
        return lax.dynamic_slice_in_dim(y_full, idx * t_loc * s, t_loc * s,
                                        axis=1)
    x_ext = gather_halo(x, lx, rx, axis)
    from audiogan_tpu.kernels import conv_transpose1d as kconvt
    # both impls are lhs_dilation-free (kernels/conv.py: Pallas polyphase
    # kernel, or the XLA polyphase-phases conv)
    y_ext = kconvt(x_ext, w, s, pad_lo=pad_lo,
                   out_len=(t_loc + lx + rx) * s, impl=impl)
    return lax.slice_in_dim(y_ext, lx * s, lx * s + t_loc * s, axis=1)


def cp_conv2d_frames(h: jnp.ndarray, w: jnp.ndarray, strides: tuple[int, int],
                     axis: str) -> jnp.ndarray:
    """SAME 2D conv on [B, F_loc, bins, C] with only the FRAME axis (dim 1)
    sharded over `axis` (the STFT critic's spectrogram under CP, SURVEY §5).

    Frame axis: halo exchange + local VALID conv, exactly like cp_conv1d
    (non-cyclic ppermute zeros == global SAME zero padding); requires
    F_global % (cp * stride_f) == 0. Bins axis: replicated, plain SAME.
    Falls back to all-gather when the shard is narrower than the halo.
    """
    kf, kb = w.shape[0], w.shape[1]
    sf, sb = strides
    f_loc = h.shape[1]
    assert f_loc % sf == 0, "local frame shard must be stride-aligned"
    total_f = max(kf - sf, 0)
    lo_f, hi_f = total_f // 2, total_f - total_f // 2
    out_b = -(-h.shape[2] // sb)
    total_b = max((out_b - 1) * sb + kb - h.shape[2], 0)
    pad_b = (total_b // 2, total_b - total_b // 2)
    dn = ("NHWC", "HWIO", "NHWC")
    if lo_f > f_loc or hi_f > f_loc:
        idx = lax.axis_index(axis)
        h_full = lax.all_gather(h, axis, axis=1, tiled=True)
        y = lax.conv_general_dilated(h_full, w, (sf, sb),
                                     padding=[(lo_f, hi_f), pad_b],
                                     dimension_numbers=dn)
        return lax.dynamic_slice_in_dim(y, idx * (f_loc // sf), f_loc // sf,
                                        axis=1)
    h_ext = gather_halo(h, lo_f, hi_f, axis)
    y = lax.conv_general_dilated(h_ext, w, (sf, sb),
                                 padding=[(0, 0), pad_b],
                                 dimension_numbers=dn)
    assert y.shape[1] == f_loc // sf, (y.shape, f_loc, sf)
    return y


def cp_chunked_scan(step_fn, carry0, length_local: int, axis: str):
    """Sequential scan whose time axis is sharded over `axis` (SURVEY §2.3
    CP row: "frame-level chunked scan with state handoff via ppermute").

    Stage j of n_cp: every shard runs its local `length_local`-step scan;
    only shard j's results are real — the carry that arrived there was
    handed from shard j-1 by the previous stage's non-cyclic `ppermute`.
    Other shards compute discarded values on otherwise-idle cores, so wall
    time is the recurrence's intrinsic global sequential length
    (n_cp * length_local steps); what CP buys is MEMORY — each stage is
    rematerialized (jax.checkpoint), so backward-pass residuals are
    O(length_local) live at once instead of O(global length), and the scan
    OUTPUT (the expensive per-step activations downstream consumers hold)
    exists only for the local shard.

    step_fn: (carry, None) -> (carry, y), as lax.scan with xs=None.
    Returns ys [length_local, ...] — this shard's slice of the global scan
    output (garbage on shards whose stage never matched, overwritten by the
    where-select so every shard ends with ITS real slice).
    """
    n_cp = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    perm = [(i, i + 1) for i in range(n_cp - 1)]

    @jax.checkpoint
    def stage(carry_in):
        return lax.scan(step_fn, carry_in, None, length=length_local)

    carry, ys = carry0, None
    for j in range(n_cp):
        new_carry, new_ys = stage(carry)
        keep = idx == j
        sel = lambda a, b: jnp.where(keep, a, b)  # noqa: E731
        ys = new_ys if ys is None else jax.tree.map(sel, new_ys, ys)
        if j < n_cp - 1:  # the final carry is dropped: no handoff for it
            kept = jax.tree.map(sel, new_carry, carry)
            carry = jax.tree.map(
                lambda v: lax.ppermute(v, axis, perm), kept)
    return ys


def cp_phase_shuffle(x: jnp.ndarray, key: jax.Array, rad: int, axis: str
                     ) -> jnp.ndarray:
    """Phase shuffle on a time-sharded activation: gather rad halos, then
    apply the same per-example shift on every shard (key must be identical
    across the cp axis so shards pick the same shift)."""
    if rad == 0:
        return x
    b, t, c = x.shape
    idx = lax.axis_index(axis)
    n_cp = lax.axis_size(axis)
    # interior halos from neighbors; GLOBAL edges reflect locally, exactly
    # like the unsharded op's reflect padding (the reflected samples live on
    # the edge shard itself).
    left_recv = _shift_from_left(x[:, -rad:, :], axis)
    left_refl = x[:, 1:rad + 1, :][:, ::-1, :]
    left = jnp.where(idx == 0, left_refl, left_recv)
    right_recv = _shift_from_right(x[:, :rad, :], axis)
    right_refl = x[:, t - rad - 1:t - 1, :][:, ::-1, :]
    right = jnp.where(idx == n_cp - 1, right_refl, right_recv)
    x_ext = jnp.concatenate([left, x, right], axis=1)
    shifts = jax.random.randint(key, (b,), -rad, rad + 1)
    from audiogan_tpu.ops.phase_shuffle import _apply_shifts
    return _apply_shifts(x_ext, shifts, t, rad)
