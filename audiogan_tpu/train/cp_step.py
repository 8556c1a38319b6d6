"""Fully context-parallel WGAN-GP train step (SURVEY §5 long-context;
[B:11] beyond-one-chip clips).

The standard step (train/step.py) shards the BATCH; this step additionally
shards each clip's TIME axis over the 'cp' mesh axis via shard_map: the
generator emits only its time slice (parallel.cp_models.cp_generator_forward),
the critic scores time slices with halo exchanges and one psum'd head, and
activations never materialize a full clip on any chip.

Collective structure per critic update:
  - ppermute halos per conv layer (ICI, O(kernel) bytes)
  - one psum for the critic head score
  - GP norm: per-example ||grad||^2 summed locally then psum'd over cp
    (the gradient of a time-slice is the slice of the global gradient)
  - parameter grads: the vma transpose of the replicated params psums the
    per-shard contributions over BOTH axes (the ICI all-reduce); dividing
    by the data axis size yields the replica mean (see finalize_grads)

Numerics: with phase shuffle off, cp=N equals the unsharded step exactly
(pinned by tests/parallel/test_cp_step.py, test_cp_gru.py, test_cp_stft.py).
Covers every model family: wavegan AND gru generators (gru via
cp_gru_generator_forward's ppermute carry handoff), conv critic AND the
[B:10] dual wave+STFT critic (hop-aligned frames + (win-hop) halo).

Composes with the multi-host DCN tier: on a ('dcn','data','cp') hybrid
mesh the batch is sharded over ('dcn','data') — dcn carries only the DP
grad all-reduce while every cp collective stays on one slice's ICI
(tests/parallel/test_multihost.py, mode "cp").
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from audiogan_tpu.config import Config
from audiogan_tpu.losses import wgan_d_loss, wgan_g_loss
from audiogan_tpu.ops.ingest import ingest_batch
from audiogan_tpu.parallel.cp_models import (
    cp_batch_spectral_matching_loss, cp_discriminator_forward,
    cp_generator_forward)
from audiogan_tpu.parallel.mesh import (data_axes, fsdp_shardable,
                                        zero1_update)
from audiogan_tpu.train.state import TrainState, make_optimizers
from audiogan_tpu.train.step import d_scores_real_fake
from audiogan_tpu.utils.prng import split_for_step


def _cp_gradient_penalty(d_apply, real_loc, fake_loc, key, cp_axis):
    """GP on time-sharded interpolates: eps is per-example and identical on
    every cp shard (same key), so eps*real_loc+(1-eps)*fake_loc IS the local
    slice of the global interpolate; the per-example norm sums squares
    locally then psums over cp."""
    b = real_loc.shape[0]
    eps = jax.random.uniform(key, (b,) + (1,) * (real_loc.ndim - 1),
                             dtype=real_loc.dtype)
    xhat = eps * real_loc + (1.0 - eps) * fake_loc
    grads = jax.grad(lambda v: jnp.sum(d_apply(v)))(xhat)
    sq = jnp.sum(jnp.square(grads).reshape(b, -1), axis=-1)
    sq = lax.psum(sq, cp_axis)
    norms = jnp.sqrt(sq + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0)), jnp.mean(norms)


def build_cp_train_step(cfg: Config, mesh) -> Callable:
    """Returns jit'd step(state, raw, labels) with time sharded over 'cp'.

    raw [n_views, B, store_len] is sharded over 'data' on B; each cp shard
    ingests the full (local-batch) clip — cheap elementwise work — and
    slices its time window; all model compute is time-sharded.
    """
    from audiogan_tpu.kernels import conv as _kconv
    _kconv.set_wgrad_form(cfg.train.wgrad_form)
    import importlib
    importlib.import_module(
        "audiogan_tpu.ops.phase_shuffle").set_shuffle_impl(
            cfg.model.shuffle_impl)
    n_critic = cfg.loss.n_critic
    gp_lambda = cfg.loss.gp_lambda
    stft_w = cfg.loss.stft_loss_weight
    latent = cfg.model.latent_dim
    opt_g, opt_d = make_optimizers(cfg)
    conditional = cfg.data.num_classes > 0
    # on the multi-host hybrid mesh the batch axis spans ('dcn','data') —
    # dcn is outermost, so the linearized replica index matches a
    # single-process run at dp = dcn*data (parallel.multihost)
    batch_axes = data_axes(mesh)
    n_data = math.prod(mesh.shape[a] for a in batch_axes)
    # ZeRO-1: optimizer state sharded over 'data' only (replicated over
    # 'dcn' on a hybrid mesh — DCN carries nothing but the DP grad sum)
    fsdp, dp_size = cfg.mesh.fsdp, mesh.shape["data"]

    if cfg.model.generator == "gru":
        from audiogan_tpu.parallel.cp_models import cp_gru_generator_forward

        def g_apply(params_g, z, labels):
            return cp_gru_generator_forward(params_g, z, cfg, "cp", labels)
    else:
        def g_apply(params_g, z, labels):
            return cp_generator_forward(params_g, z, cfg, "cp", labels)

    def d_apply(params_d, x_loc, labels, key):
        return cp_discriminator_forward(params_d, x_loc, cfg, "cp",
                                        shuffle_key=key, labels=labels)

    def finalize_grads(tree):
        """Under check_vma=True the transpose of using replicated params in
        shard-varying compute already psums grads over BOTH mesh axes (see
        train/step.py _replica_mean): over 'cp' that sum IS the correct
        total of the time-slice partials; over the batch axes ('data',
        plus 'dcn' multi-host) divide to get the replica mean. Explicit
        psum/pmean here would scale by the axis size (masked by Adam's
        exact invariance to uniform grad scale)."""
        return jax.tree.map(lambda g: g / n_data, tree)

    def body(state: TrainState, raw, labels):
        base = jax.random.wrap_key_data(state.base_key)
        (step_key,) = split_for_step(base, state.step, "step")
        # decorrelate data-parallel replicas; cp shards MUST share keys
        step_key = jax.random.fold_in(step_key, lax.axis_index(batch_axes))
        cp_idx = lax.axis_index("cp")
        n_cp = lax.axis_size("cp")
        t_loc = cfg.data.clip_len // n_cp

        def d_micro(carry, view):
            params_d, opt_d_state = carry
            raw_v, labels_v, i = view
            k = jax.random.fold_in(step_key, i)
            k_crop, k_z, k_eps, k_lab, k_s1, k_s2, k_s3 = \
                jax.random.split(k, 7)
            real = ingest_batch(
                raw_v, cfg.data, k_crop,
                kernels=cfg.train.kernels_ingest or cfg.train.kernels,
            )[..., None]
            real_loc = lax.dynamic_slice_in_dim(real, cp_idx * t_loc, t_loc,
                                                axis=1)
            bsz = real.shape[0]
            lab_f = (jax.random.randint(k_lab, (bsz,), 0,
                                        cfg.data.num_classes)
                     if conditional else None)
            lab_r = labels_v if conditional else None
            z = jax.random.normal(k_z, (bsz, latent))
            fake_loc = lax.stop_gradient(g_apply(state.params_g, z, lab_f))

            sk1 = k_s1 if cfg.model.phase_shuffle else None
            sk2 = k_s2 if cfg.model.phase_shuffle else None
            sk3 = k_s3 if cfg.model.phase_shuffle else None

            def d_loss_fn(p):
                rs, fs = d_scores_real_fake(
                    d_apply, p, real_loc, fake_loc, lab_r, lab_f, sk1, sk2,
                    cfg.train.fused_d_views)
                gp, gnorm = _cp_gradient_penalty(
                    lambda v: d_apply(p, v, lab_r, sk3), real_loc, fake_loc,
                    k_eps, "cp")
                loss = wgan_d_loss(rs, fs) + gp_lambda * gp
                return loss, (jnp.mean(rs) - jnp.mean(fs), gp, gnorm)

            (d_loss, (w_dist, gp, gnorm)), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(params_d)
            grads = finalize_grads(grads)
            updates, opt_d_state = zero1_update(
                opt_d, grads, opt_d_state, params_d, fsdp, dp_size)
            params_d = jax.tree.map(lambda a, u: a + u, params_d, updates)
            return (params_d, opt_d_state), dict(
                d_loss=d_loss, w_dist=w_dist, gp=gp, gp_grad_norm=gnorm)

        views = (raw[:n_critic], labels[:n_critic],
                 jnp.arange(n_critic, dtype=jnp.int32))
        (params_d, opt_d_state), d_metrics = lax.scan(
            d_micro, (state.params_d, state.opt_d), views)

        kg = jax.random.fold_in(step_key, n_critic + 1)
        # split(kg, 4)[:3] == split(kg, 3) (counter-mode bits), so adding
        # k_crop keeps the z/label/shuffle streams identical to
        # train/step.py — the cp==unsharded equality tests depend on it
        k_z, k_lab, k_shuf, k_crop = jax.random.split(kg, 4)
        bsz = raw.shape[1]
        lab_g = (jax.random.randint(k_lab, (bsz,), 0, cfg.data.num_classes)
                 if conditional else None)
        skg = k_shuf if cfg.model.phase_shuffle else None

        if stft_w > 0:
            # the G spectral-matching term's own real view (train/step.py):
            # ingest the full clip (cheap elementwise), slice the shard
            real_g = ingest_batch(
                raw[n_critic], cfg.data, k_crop,
                kernels=cfg.train.kernels_ingest or cfg.train.kernels)
            real_g_loc = lax.dynamic_slice_in_dim(
                real_g, cp_idx * t_loc, t_loc, axis=1)

        def g_loss_fn(p):
            z = jax.random.normal(k_z, (bsz, latent))
            fake_loc = g_apply(p, z, lab_g)
            loss = wgan_g_loss(d_apply(params_d, fake_loc, lab_g, skg))
            aux = {}
            if stft_w > 0:
                sl = cp_batch_spectral_matching_loss(
                    fake_loc[..., 0], real_g_loc,
                    cfg.model.stft_resolutions, "cp")
                loss = loss + stft_w * sl
                aux["stft_loss"] = sl
            return loss, aux

        (g_loss, g_aux), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params_g)
        g_grads = finalize_grads(g_grads)
        g_updates, opt_g_state = zero1_update(
            opt_g, g_grads, state.opt_g, state.params_g, fsdp, dp_size)
        params_g = jax.tree.map(lambda a, u: a + u, state.params_g,
                                g_updates)

        metrics = {k: v[-1] for k, v in d_metrics.items()}
        metrics["g_loss"] = g_loss
        metrics.update(g_aux)
        metrics = jax.lax.pmean(jax.lax.pmean(metrics, batch_axes), "cp")
        new_state = state.replace(step=state.step + 1, params_g=params_g,
                                  params_d=params_d, opt_g=opt_g_state,
                                  opt_d=opt_d_state)
        return new_state, metrics

    def make(state, device_corpus: bool = False,
             sharded_corpus: bool = False):
        specs = jax.tree.map(lambda _: P(), state)
        if fsdp:
            def opt_spec(x):
                return (P("data", *([None] * (x.ndim - 1)))
                        if fsdp_shardable(x, dp_size) else P())
            specs = specs.replace(
                opt_g=jax.tree.map(opt_spec, state.opt_g),
                opt_d=jax.tree.map(opt_spec, state.opt_d))
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs, P(None, batch_axes, None),
                      P(None, batch_axes)),
            out_specs=(specs, P()),
            check_vma=True)
        if device_corpus:
            # resident-corpus mode: gather the batch in-graph from the
            # replicated HBM corpus before entering the shard_map
            from audiogan_tpu.train.step import wrap_device_corpus
            fn = wrap_device_corpus(fn, mesh, sharded=sharded_corpus,
                                    chunk=cfg.data.index_chunk)
        return jax.jit(fn, donate_argnums=(0,))

    return make
