"""The single-jit WGAN-GP training step (SURVEY C13/C14, §3.4; [B:5]).

Reference equivalent: the Python-orchestrated hot loop of §3.1 — n_critic
critic updates (each with a fresh real minibatch, a G forward, and a
gradient-penalty double-backprop) followed by one generator update, every op
a separate CUDA launch. Here the WHOLE thing — on-device ingest included —
is ONE compiled XLA graph: a `lax.scan` over the n_critic D micro-steps,
then the G update. The only host work per step is feeding raw int16 clips.

Step signature (built by `build_train_step`):
    step_fn(state, raw [n_views, B, store_len] int16,
            labels [n_views, B] int32) -> (new_state, metrics)
with n_views = n_critic (+1 when the G spectral-matching term is on, which
consumes its own real view). Determinism: all randomness folds out of
(state.base_key, state.step) via utils.prng.split_for_step.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from audiogan_tpu.config import Config
from audiogan_tpu.losses import (batch_spectral_matching_loss,
                                 gradient_penalty, wgan_d_loss, wgan_g_loss)
from audiogan_tpu.models import build_discriminator, build_generator
from audiogan_tpu.ops.ingest import ingest_batch
from audiogan_tpu.train.state import TrainState, make_optimizers
from audiogan_tpu.utils.prng import split_for_step


def num_views(cfg: Config) -> int:
    return cfg.loss.n_critic + (1 if cfg.loss.stft_loss_weight > 0 else 0)


def d_scores_real_fake(d_apply, p, real, fake, lab_r, lab_f, k1, k2,
                       fused: bool):
    """Critic scores on the real and fake views of one D micro-step.

    fused=False: two B-batch calls (keys k1/k2) — the reference-shaped
    form every golden was recorded under.
    fused=True (train.fused_d_views): ONE 2B-batch call under k1. The
    critic factorizes over the batch (no cross-example coupling anywhere
    in D — WGAN-GP forbids batch norm), so per-example scores are
    unchanged math; what changes is op structure (one conv stack at 2B
    rows instead of two at B, one parameter-backward instead of two
    accumulated with add_any) and the phase-shuffle stream (2B shifts
    drawn from k1). Shared by the plain/cp/tp step builders so the
    cp==unsharded and tp==unsharded equalities hold under either setting.
    """
    if not fused:
        return d_apply(p, real, lab_r, k1), d_apply(p, fake, lab_f, k2)
    b = real.shape[0]
    both = jnp.concatenate([real, fake], axis=0)
    lab = (jnp.concatenate([lab_r, lab_f], axis=0)
           if lab_r is not None else None)
    scores = d_apply(p, both, lab, k1)
    return scores[:b], scores[b:]


def _replica_mean(grads, axis_name: str):
    """Mean of per-replica gradients, for vma-checked shard_map bodies.

    Under `jax.shard_map(..., check_vma=True)` — REQUIRED for every
    shard_map of these step bodies — the transpose of using the replicated
    params in shard-varying compute already inserts the psum over
    `axis_name`: each shard holds the global SUM of per-replica grads
    (this is the grad all-reduce on ICI of [B:5]; verified empirically,
    tests/parallel/test_dp.py). Dividing by the axis size yields the
    replica mean. An explicit lax.pmean here would be an identity on the
    already-replicated value (and psum would multiply by the axis size) —
    a silent bug Adam masks, since its update is exactly invariant to a
    uniform gradient scale.
    """
    n = jax.lax.axis_size(axis_name)
    return jax.tree.map(lambda g: g / n, grads)


def wrap_device_corpus(inner: Callable, mesh=None,
                       sharded: bool = False, chunk: int = 0) -> Callable:
    """Wrap a (state, raw, labels) step as a resident-corpus step
    (data.device_corpus):

    step(state, corpus_clips [N, store_len] int16 (HBM-resident,
    replicated), idx [n_views, B] int32, labels [n_views, B] int32)
    -> (state, metrics)

    chunk > 0 (data.index_chunk): idx/labels instead arrive as RESIDENT
    blocks [chunk, n_views, B] covering steps [m*chunk, (m+1)*chunk);
    the step picks its own row in-graph at state.step % chunk, so the
    per-step host->device index transfer disappears too — on a
    high-latency tunneled host link the per-transfer round trip, not
    the bytes, is what a per-step put costs (BASELINE.md "Soak
    discovery", r4 s4). The loop re-ships one ~KB block per chunk steps.

    The host ships the whole packed corpus to HBM ONCE and then only the
    (seed, step)-pure sample indices per step (a few KB), so the per-step
    host->device bulk transfer — the sustained-throughput bottleneck on
    slow-interconnect hosts — disappears. The in-graph gather
    (jnp.take over the clip axis) reproduces the host batcher's stream
    bit-exactly: HostBatcher(indices_only=True) emits the SAME indices the
    gathering batcher consumes (pinned by tests/train/test_device_corpus.py).

    DP sharding: idx/labels arrive 'data'-sharded on B; the gather output
    is constrained to the same sharding so each replica gathers only its
    slice from the replicated corpus. The same wrapper serves the
    shard_map'd cp/tp steps (gather outside shard_map, constrained to the
    in_spec's batch sharding) — `inner` may be the plain step body or an
    un-jitted shard_map.
    """
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from audiogan_tpu.parallel.mesh import data_axes
        shard = NamedSharding(mesh, P(None, data_axes(mesh), None))
    if sharded and mesh is None:
        raise ValueError("sharded device corpus requires a mesh")

    def step_fn(state: TrainState, corpus_clips, idx, labels):
        if chunk:
            k = jax.lax.rem(state.step.astype(jnp.int32), jnp.int32(chunk))
            idx = jax.lax.dynamic_index_in_dim(idx, k, 0, keepdims=False)
            labels = jax.lax.dynamic_index_in_dim(labels, k, 0,
                                                  keepdims=False)
        if sharded:
            # corpus clip axis sharded over the batch axes: explicit
            # all_gather(idx) + masked take + psum_scatter on ICI
            # (parallel/sharded_corpus.py) — bit-identical stream
            from audiogan_tpu.parallel.sharded_corpus import \
                sharded_corpus_gather
            raw = sharded_corpus_gather(corpus_clips, idx, mesh)
            return inner(state, raw, labels)
        raw = jnp.take(corpus_clips, idx, axis=0)   # [n_views, B, store_len]
        if shard is not None:
            raw = jax.lax.with_sharding_constraint(raw, shard)
        return inner(state, raw, labels)

    return step_fn


def build_device_corpus_step(cfg: Config, mesh=None, sharded: bool = False
                             ) -> Callable[..., tuple[TrainState, dict]]:
    """Resident-corpus variant of the data-parallel train step
    (see wrap_device_corpus)."""
    return wrap_device_corpus(build_train_step(cfg), mesh, sharded=sharded,
                              chunk=cfg.data.index_chunk)


def build_train_step(cfg: Config, axis_name: str | None = None
                     ) -> Callable[..., tuple[TrainState, dict]]:
    """Build the pure (state, raw, labels) -> (state, metrics) step.

    The returned function is NOT yet jit'd — the caller jits it with the
    mesh shardings it wants (train.loop for real runs, tests directly).

    axis_name=None (default): parallelism-agnostic step; under jit with
    batch-sharded inputs XLA's SPMD partitioner inserts the grad all-reduce.
    axis_name="data": explicit-collective variant for shard_map — gradients
    are lax.pmean'd over the axis (the ICI all-reduce of [B:5]) and the
    PRNG stream folds in axis_index so replicas draw decorrelated z/crops
    while applying identical (pmean'd) updates.
    """
    from audiogan_tpu.kernels import conv as _kconv
    _kconv.set_wgrad_form(cfg.train.wgrad_form)
    import importlib
    importlib.import_module(
        "audiogan_tpu.ops.phase_shuffle").set_shuffle_impl(
            cfg.model.shuffle_impl)
    g = build_generator(cfg)
    d = build_discriminator(cfg)
    opt_g, opt_d = make_optimizers(cfg)
    n_critic = cfg.loss.n_critic
    gp_lambda = cfg.loss.gp_lambda
    stft_w = cfg.loss.stft_loss_weight
    drift = cfg.loss.drift_epsilon
    conditional = cfg.data.num_classes > 0
    latent_dim = cfg.model.latent_dim

    def g_apply(params_g, z, labels):
        if conditional:
            return g.apply(params_g, z, labels)
        return g.apply(params_g, z)

    def d_apply_raw(params_d, x, labels, shuffle_key):
        kw = dict(train=True, rngs={"phase_shuffle": shuffle_key})
        if conditional:
            return d.apply(params_d, x, labels, **kw)
        return d.apply(params_d, x, **kw)

    # Optional remat of D's forward (SURVEY R5 worried the GP
    # double-backprop would keep every critic activation live across the
    # scan; measured on HW the no-remat step fits HBM at every preset and
    # runs 1.28-1.36x faster — see TrainCfg.remat_discriminator).
    d_apply = (jax.checkpoint(d_apply_raw)
               if cfg.train.remat_discriminator else d_apply_raw)

    def sample_labels(key, b):
        if not conditional:
            return None
        return jax.random.randint(key, (b,), 0, cfg.data.num_classes)

    def d_micro_step(params_g, carry, view):
        """One critic update on one real view (scan body)."""
        params_d, opt_d_state, step_key = carry
        raw, labels_real, idx = view
        k = jax.random.fold_in(step_key, idx)
        k_crop, k_z, k_eps, k_lab, k_s1, k_s2, k_s3 = jax.random.split(k, 7)

        real = ingest_batch(
            raw, cfg.data, k_crop,
            kernels=cfg.train.kernels_ingest or cfg.train.kernels,
        )[..., None]                                               # [B, T, 1]
        b = real.shape[0]
        labels_fake = sample_labels(k_lab, b)
        z = jax.random.normal(k_z, (b, latent_dim))
        fake = jax.lax.stop_gradient(g_apply(params_g, z, labels_fake))
        lr = labels_real if conditional else None

        def d_loss_fn(p):
            real_scores, fake_scores = d_scores_real_fake(
                d_apply, p, real, fake, lr, labels_fake, k_s1, k_s2,
                cfg.train.fused_d_views)
            gp, gnorm = gradient_penalty(
                lambda x: d_apply(p, x, lr, k_s3), real, fake, k_eps,
                batch_chunks=cfg.loss.gp_batch_chunks)
            loss = wgan_d_loss(real_scores, fake_scores) + gp_lambda * gp
            if drift:
                loss = loss + drift * jnp.mean(jnp.square(real_scores))
            w_dist = jnp.mean(real_scores) - jnp.mean(fake_scores)
            return loss, (w_dist, gp, gnorm)

        (d_loss, (w_dist, gp, gnorm)), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(params_d)
        if axis_name is not None:
            grads = _replica_mean(grads, axis_name)     # ICI all-reduce
        updates, opt_d_state = opt_d.update(grads, opt_d_state, params_d)
        params_d = jax.tree.map(lambda p, u: p + u, params_d, updates)
        metrics = dict(d_loss=d_loss, w_dist=w_dist, gp=gp, gp_grad_norm=gnorm)
        return (params_d, opt_d_state, step_key), metrics

    def step_fn(state: TrainState, raw: jnp.ndarray, labels: jnp.ndarray
                ) -> tuple[TrainState, dict[str, jnp.ndarray]]:
        base = jax.random.wrap_key_data(state.base_key)
        (step_key,) = split_for_step(base, state.step, "step")
        if axis_name is not None:
            # decorrelate replicas' data randomness (z, crops, eps, shifts)
            step_key = jax.random.fold_in(
                step_key, jax.lax.axis_index(axis_name))

        # ---- n_critic critic updates: lax.scan, fresh real view each ----
        views = (raw[:n_critic], labels[:n_critic],
                 jnp.arange(n_critic, dtype=jnp.int32))
        carry = (state.params_d, state.opt_d, step_key)
        carry, d_metrics = jax.lax.scan(
            functools.partial(d_micro_step, state.params_g), carry, views,
            unroll=max(1, min(cfg.train.scan_unroll, n_critic)))
        params_d, opt_d_state, _ = carry

        # ---- one generator update ----
        kg = jax.random.fold_in(step_key, n_critic + 1)
        k_z, k_lab, k_shuf, k_crop = jax.random.split(kg, 4)
        b = raw.shape[1]
        labels_g = sample_labels(k_lab, b)

        if stft_w > 0:
            real_g = ingest_batch(
                raw[n_critic], cfg.data, k_crop,
                kernels=cfg.train.kernels_ingest or cfg.train.kernels)

        def g_loss_fn(p):
            z = jax.random.normal(k_z, (b, latent_dim))
            fake = g_apply(p, z, labels_g)
            scores = d_apply(params_d, fake, labels_g, k_shuf)
            loss = wgan_g_loss(scores)
            aux = {}
            if stft_w > 0:
                sl = batch_spectral_matching_loss(
                    fake[..., 0], real_g, cfg.model.stft_resolutions)
                loss = loss + stft_w * sl
                aux["stft_loss"] = sl
            return loss, aux

        (g_loss, g_aux), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params_g)
        if axis_name is not None:
            g_grads = _replica_mean(g_grads, axis_name)
        g_updates, opt_g_state = opt_g.update(g_grads, state.opt_g,
                                              state.params_g)
        params_g = jax.tree.map(lambda p, u: p + u, state.params_g, g_updates)

        metrics: dict[str, Any] = {k: v[-1] for k, v in d_metrics.items()}
        metrics["d_loss_mean"] = jnp.mean(d_metrics["d_loss"])
        metrics["g_loss"] = g_loss
        metrics.update(g_aux)
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g, params_d=params_d,
            opt_g=opt_g_state, opt_d=opt_d_state)
        return new_state, metrics

    return step_fn
