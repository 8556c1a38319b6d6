"""Tensor-parallel WGAN-GP train step (SURVEY §2.3 TP row, made trainable
in round 3 per VERDICT r2 #4).

The standard step (train/step.py) shards the BATCH; this step additionally
computes the CRITIC's channel axis across the 'tp' mesh axis via shard_map:
every critic conv runs on a 1/tp channel slice in the Megatron-style
column->row pairing of parallel.tp_models (one psum per layer pair + one
for the head). The generator runs replicated on each tp shard (its params
are small and its cost is a fraction of the critic's n_critic * 3 forwards
+ GP double-backprop), so TP here buys critic FLOP parallelism for wide-
critic configs, composing with DP over 'data'.

Collective structure per critic update:
  - one psum per row-parallel critic layer + one for the head (ICI)
  - GP: the local x̂-gradient is the shard's PARTIAL contribution (x̂ is
    replicated over tp, the score is a psum of per-shard partials), so the
    full gradient is their psum over 'tp'; norms follow on the replicated
    result
  - parameter grads: the vma transpose of replicated params in shard-
    varying compute psums contributions over BOTH axes — over 'tp' the sum
    assembles the slice partials into the full gradient; over 'data' divide
    by the axis size for the replica mean (same rule as train/cp_step.py)

Numerics: with phase shuffle off, tp=N equals the unsharded step exactly
(pinned by tests/parallel/test_tp_step.py). Phase shuffle ON uses
tp_models' per-layer fold_in stream (identical on every tp shard, so the
channel slicing commutes with the time shuffle) — deterministic but a
different stream than the flax module's make_rng, like the cp step.

Composes with the multi-host DCN tier: on a ('dcn','data','cp','tp')
hybrid mesh the batch is sharded over ('dcn','data') — dcn carries only
the DP grad all-reduce while every tp psum stays on one slice's ICI
(tests/parallel/test_multihost.py, mode "tp").
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from audiogan_tpu.config import Config
from audiogan_tpu.losses import (batch_spectral_matching_loss,
                                 gradient_penalty, wgan_d_loss, wgan_g_loss)
from audiogan_tpu.models import build_generator
from audiogan_tpu.ops.ingest import ingest_batch
from audiogan_tpu.parallel.mesh import (data_axes, fsdp_shardable,
                                        zero1_update)
from audiogan_tpu.parallel.tp_models import tp_discriminator_forward
from audiogan_tpu.train.state import TrainState, make_optimizers
from audiogan_tpu.train.step import d_scores_real_fake
from audiogan_tpu.utils.prng import split_for_step


def build_tp_train_step(cfg: Config, mesh) -> Callable:
    """Returns state -> jit'd step(state, raw, labels) with the critic
    channel-parallel over 'tp' and the batch sharded over 'data'."""
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
    impl_d = cfg.train.kernels_d or cfg.train.kernels
    g_mod = build_generator(cfg)
    # multi-host hybrid mesh: batch spans ('dcn','data'), dcn outermost,
    # so the linearized replica index matches single-process dp = dcn*data
    batch_axes = data_axes(mesh)
    n_data = math.prod(mesh.shape[a] for a in batch_axes)
    # ZeRO-1 over 'data' only (mesh.py zero1_update; same rule as cp_step)
    fsdp, dp_size = cfg.mesh.fsdp, mesh.shape["data"]

    def g_apply(params_g, z, labels):
        if conditional:
            return g_mod.apply(params_g, z, labels)
        return g_mod.apply(params_g, z)

    def d_apply_raw(params_d, x, labels, key):
        return tp_discriminator_forward(params_d, x, cfg, "tp",
                                        shuffle_key=key, labels=labels,
                                        impl=impl_d)

    d_apply = (jax.checkpoint(d_apply_raw)
               if cfg.train.remat_discriminator else d_apply_raw)

    def finalize_grads(tree):
        # vma transpose has already psum'd over (batch axes, 'tp'): over tp
        # the sum is the assembled full gradient; over the batch axes
        # ('data', plus 'dcn' multi-host) divide for the replica mean
        return jax.tree.map(lambda g: g / n_data, tree)

    def body(state: TrainState, raw, labels):
        base = jax.random.wrap_key_data(state.base_key)
        (step_key,) = split_for_step(base, state.step, "step")
        # decorrelate data replicas; tp shards MUST share keys
        step_key = jax.random.fold_in(step_key, lax.axis_index(batch_axes))

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
            bsz = real.shape[0]
            lab_f = (jax.random.randint(k_lab, (bsz,), 0,
                                        cfg.data.num_classes)
                     if conditional else None)
            lab_r = labels_v if conditional else None
            z = jax.random.normal(k_z, (bsz, latent))
            fake = lax.stop_gradient(g_apply(state.params_g, z, lab_f))

            sk1 = k_s1 if cfg.model.phase_shuffle else None
            sk2 = k_s2 if cfg.model.phase_shuffle else None
            sk3 = k_s3 if cfg.model.phase_shuffle else None

            def d_loss_fn(p):
                rs, fs = d_scores_real_fake(
                    d_apply, p, real, fake, lab_r, lab_f, sk1, sk2,
                    cfg.train.fused_d_views)
                # the CANONICAL gradient_penalty is correct here unchanged:
                # x̂ is tp-invariant, so the vma-aware transpose of the
                # in-forward psums already assembles the shard partials of
                # d(score)/dx̂ into the full (tp-invariant) gradient — an
                # explicit psum would multiply it by the axis size
                gp, gnorm = gradient_penalty(
                    lambda v: d_apply(p, v, lab_r, sk3), real, fake,
                    k_eps, batch_chunks=cfg.loss.gp_batch_chunks)
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
        # split(kg, 4)[:3] == split(kg, 3) (counter-mode bits): adding
        # k_crop keeps z/label/shuffle identical to train/step.py
        k_z, k_lab, k_shuf, k_crop = jax.random.split(kg, 4)
        bsz = raw.shape[1]
        lab_g = (jax.random.randint(k_lab, (bsz,), 0, cfg.data.num_classes)
                 if conditional else None)
        skg = k_shuf if cfg.model.phase_shuffle else None

        if stft_w > 0:
            # the G spectral-matching term's own real view (train/step.py);
            # x is full-length and tp-replicated, so the plain loss applies
            real_g = ingest_batch(
                raw[n_critic], cfg.data, k_crop,
                kernels=cfg.train.kernels_ingest or cfg.train.kernels)

        def g_loss_fn(p):
            z = jax.random.normal(k_z, (bsz, latent))
            fake = g_apply(p, z, lab_g)
            loss = wgan_g_loss(d_apply(params_d, fake, lab_g, skg))
            aux = {}
            if stft_w > 0:
                sl = batch_spectral_matching_loss(
                    fake[..., 0], real_g, cfg.model.stft_resolutions)
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
        metrics = jax.lax.pmean(jax.lax.pmean(metrics, batch_axes), "tp")
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
