"""Host training loop (SURVEY C14/C18/§3.4): the only per-step host work is
feeding raw int16 batches into the one jit'd train step.

Crash-only design (SURVEY §5): checkpoints every ckpt_every steps; `resume`
picks up the latest complete step; the data stream and all in-step
randomness are pure functions of (seed, step), so a resumed run is
bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.config import Config
from audiogan_tpu.data.corpus import Corpus, HostBatcher, build_corpus
from audiogan_tpu.data.synthetic import make_synthetic_sc09
from audiogan_tpu.data.wavio import write_wav
from audiogan_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                        state_shardings)
from audiogan_tpu.parallel.multihost import (make_train_mesh,
                                             put_global_batch)
from audiogan_tpu.train.sample import build_sample_fn
from audiogan_tpu.train.state import create_train_state, param_count
from audiogan_tpu.train.step import build_train_step, num_views
from audiogan_tpu.utils import checkpoint as ckpt_lib
from audiogan_tpu.utils.metrics import MetricsWriter


# Largest packed corpus held replicated in HBM (device_corpus); larger
# corpora fall back to the host batcher with a warning.
DEVICE_CORPUS_MAX_GB = 8.0


class _AsyncCkpt:
    """Checkpoint without stalling the device (SURVEY C17 at soak scale).

    `jax.device_get(state)` pulls the full TrainState (~450 MB at the
    flagship) through the host link synchronously — on the tunneled axon
    link that was ~35-40 s per save, a ~30% wall-time tax at
    ckpt_every=500 (r4 soak segment 1). Instead: take an on-device
    snapshot (one jit'd HBM->HBM copy, ~ms — required anyway because the
    step donates the state buffers), then do the D2H fetch + orbax save
    in a worker thread while the main thread keeps dispatching steps.
    One save in flight; the next save joins the previous first, so host
    memory holds at most two host copies of the state.

    The fetch is leaf-AT-A-TIME, not `jax.device_get(tree)`: device_get
    enqueues every leaf's D2H copy up front, so a concurrent small
    transfer (the loop's per-log_every metrics fetch) queues behind the
    ENTIRE state on the host link — measured as an unchanged ~35 s log
    bucket per save even with the fetch off-thread (r4 soak2, step
    1050). Sequential per-leaf fetches bound that wait to one leaf.
    """

    def __init__(self, mngr):
        self._mngr = mngr
        self._thread: threading.Thread | None = None
        self._err: BaseException | None = None
        self._snap_fn = jax.jit(lambda s: jax.tree.map(jnp.copy, s))

    @staticmethod
    def _fetch(tree):
        leaves, treedef = jax.tree.flatten(tree)
        return jax.tree.unflatten(treedef,
                                  [np.asarray(leaf) for leaf in leaves])

    def save(self, state) -> None:
        snap = self._snap_fn(state)  # async dispatch; orders after the step
        self.join()

        def work():
            try:
                ckpt_lib.save(self._mngr, self._fetch(snap))
            except BaseException as e:  # surfaced on the next join()
                self._err = e

        self._thread = threading.Thread(target=work, daemon=True,
                                        name="audiogan-ckpt")
        self._thread.start()

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def resolve_corpus(cfg: Config, workdir: Path) -> Corpus:
    """data_dir: '' -> seeded synthetic fixture; wav tree -> pack once;
    packed dir (has meta.json) -> open."""
    d = cfg.data
    if not d.data_dir:
        wavs = workdir / "synthetic_wavs"
        packed = workdir / "synthetic_corpus"
        if not (packed / "meta.json").exists():
            make_synthetic_sc09(
                wavs, n_per_class=8,
                num_classes=max(d.num_classes, 10),
                rate=d.source_rate,
                clip_len=min(d.store_len, d.source_rate), seed=0)
            build_corpus(wavs, packed, store_len=d.store_len,
                         source_rate=d.source_rate)
        return Corpus(packed)
    src = Path(d.data_dir)
    if (src / "meta.json").exists():
        return Corpus(src)
    packed = workdir / "corpus"
    if not (packed / "meta.json").exists():
        build_corpus(src, packed, store_len=d.store_len)
    return Corpus(packed)


def train(cfg: Config, workdir: str | Path, resume: bool = True) -> dict:
    """Run cfg.train.total_steps steps; returns final host metrics."""
    cfg.validate()
    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    (workdir / "config.json").write_text(cfg.to_json())

    corpus = resolve_corpus(cfg, workdir)
    if cfg.data.num_classes and corpus.meta.get("num_classes", 0) == 0:
        raise ValueError("conditional config but corpus has no labels")
    # a rate/length mismatch would otherwise train silently at the wrong
    # sample rate (ingest trusts cfg.data, not the corpus metadata)
    for field, want in (("source_rate", cfg.data.source_rate),
                        ("store_len", cfg.data.store_len)):
        got = corpus.meta.get(field)
        if got is not None and got != want:
            raise ValueError(
                f"corpus {field}={got} but config data.{field}={want} — "
                f"repack the corpus or fix the config (clips would be "
                f"misinterpreted silently)")

    # single-process: ('data','cp') ICI mesh; under jax.distributed:
    # ('dcn','data','cp') hybrid, DP-only over DCN (SURVEY section 2.4)
    mesh = make_train_mesh(cfg)
    n_views = num_views(cfg)
    # device-resident corpus (data.device_corpus): clips live in HBM, the
    # host ships only sample indices per step (build_device_corpus_step)
    dev_corpus = cfg.data.device_corpus
    shard_corpus = False
    if dev_corpus:
        from audiogan_tpu.parallel.sharded_corpus import corpus_num_shards
        gb = corpus.clips.nbytes / 2**30
        nsh = corpus_num_shards(mesh)
        mode = cfg.data.device_corpus_shard
        if mode == "shard":
            shard_corpus = True
        elif mode == "auto" and gb > DEVICE_CORPUS_MAX_GB and nsh > 1 \
                and gb / nsh <= DEVICE_CORPUS_MAX_GB:
            # replicated doesn't fit but a 'data'-axis shard does: each
            # device holds 1/nsh of the clips; the step gathers cross-
            # replica on ICI (parallel/sharded_corpus.py — VERDICT r3 #4)
            print(f"[data] corpus is {gb:.1f} GiB: sharding over "
                  f"{nsh} data shards ({gb / nsh:.1f} GiB/device)",
                  flush=True)
            shard_corpus = True
        elif gb > DEVICE_CORPUS_MAX_GB:
            # too large to hold replicated in HBM next to the training
            # state — fall back to the host batcher rather than failing
            # (the presets default the flag on; corpus size is data-dependent)
            print(f"[data] corpus is {gb:.1f} GiB > {DEVICE_CORPUS_MAX_GB} GiB "
                  f"even at {nsh} shards: falling back to "
                  f"the host batcher (device_corpus off)", flush=True)
            dev_corpus = False
    batcher = HostBatcher(corpus, cfg.train.batch_size, n_views,
                          seed=cfg.train.seed, indices_only=dev_corpus)

    state = create_train_state(cfg)
    n_g, n_d = param_count(state.params_g), param_count(state.params_d)
    print(f"[init] G params: {n_g:,}  D params: {n_d:,}  "
          f"mesh: data={cfg.mesh.dp} cp={cfg.mesh.cp} tp={cfg.mesh.tp}  "
          f"devices: {len(jax.devices())}", flush=True)

    mngr = ckpt_lib.make_manager(workdir, keep=cfg.train.keep_ckpts)
    if resume and ckpt_lib.latest_step(mngr) is not None:
        state = ckpt_lib.restore(mngr, state)
        print(f"[resume] restored step {int(state.step)}", flush=True)

    if cfg.train.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if cfg.mesh.cp > 1:
        # fully context-parallel step: clips' time axis sharded over 'cp'
        # (shard_map with explicit halo/psum collectives, train/cp_step.py)
        from audiogan_tpu.train.cp_step import build_cp_train_step
        base_step = build_cp_train_step(cfg, mesh)(
            state, device_corpus=dev_corpus, sharded_corpus=shard_corpus)
    elif cfg.mesh.tp > 1:
        # channel-parallel critic over 'tp' (Megatron-style col/row conv
        # pairing, train/tp_step.py) composed with DP over 'data'
        from audiogan_tpu.train.tp_step import build_tp_train_step
        base_step = build_tp_train_step(cfg, mesh)(
            state, device_corpus=dev_corpus, sharded_corpus=shard_corpus)
    elif dev_corpus:
        from audiogan_tpu.train.step import build_device_corpus_step
        base_step = jax.jit(
            build_device_corpus_step(cfg, mesh, sharded=shard_corpus),
            donate_argnums=(0,))
    else:
        step_fn = build_train_step(cfg)
        # Sharding comes in through the operands (device_put below): state
        # replicated, batch sharded over 'data' — XLA's SPMD partitioner
        # then emits the grad all-reduce over ICI ([B:5]). donate buffers.
        base_step = jax.jit(step_fn, donate_argnums=(0,))
    chunk = cfg.data.index_chunk if dev_corpus else 0
    if dev_corpus:
        from audiogan_tpu.parallel.mesh import replicated_sharding
        # put_global_batch so the resident corpus also composes with the
        # multi-host DCN tier (every process holds the same packed corpus)
        if shard_corpus:
            from audiogan_tpu.parallel.sharded_corpus import (
                corpus_num_shards, corpus_sharding, pad_clips_to_shards)
            corpus_dev = put_global_batch(
                pad_clips_to_shards(corpus.clips, corpus_num_shards(mesh)),
                corpus_sharding(mesh))
        else:
            corpus_dev = put_global_batch(
                np.ascontiguousarray(corpus.clips),
                replicated_sharding(mesh))

        def jit_step(state, idx, labels):
            return base_step(state, corpus_dev, idx, labels)
    else:
        jit_step = base_step
    # in device-corpus mode the "batch" is the [n_views, B] index array —
    # sharded over 'data' on B exactly like the labels
    b_shard = label_sharding(mesh) if dev_corpus else batch_sharding(mesh)
    l_shard = label_sharding(mesh)

    def chunk_rows(m: int) -> tuple[np.ndarray, np.ndarray]:
        """Index/label rows for steps [m*chunk, (m+1)*chunk) — a resume
        mid-chunk rebuilds the full block (the stream is (seed, step)-
        pure); rows before the resume step are simply never indexed."""
        rows = [batcher.get(s) for s in range(m * chunk, (m + 1) * chunk)]
        return (np.stack([r[0] for r in rows]),
                np.stack([r[1] for r in rows]))

    if cfg.train.dump_hlo:
        # auditable single-graph claim of [B:5]: the WHOLE training step
        # (ingest + n_critic scan + GP double-backprop + both optimizers)
        # is one optimized HLO module.
        if chunk:
            c0, l0 = chunk_rows(int(state.step) // chunk)
        else:
            c0, l0 = batcher.get(int(state.step))
        if dev_corpus:
            hlo = base_step.lower(state, corpus_dev, c0,
                                  l0).compile().as_text()
        else:
            hlo = jit_step.lower(state, c0, l0).compile().as_text()
        (workdir / "step_optimized_hlo.txt").write_text(hlo)
        print(f"[hlo] dumped {len(hlo.splitlines())} lines", flush=True)
    state = jax.device_put(state, state_shardings(mesh, state, cfg.mesh.fsdp))

    writer = MetricsWriter(workdir)
    sample_fn = build_sample_fn(cfg)
    ckpt_async = _AsyncCkpt(mngr)

    start = int(state.step)
    total = cfg.train.total_steps
    metrics = {}
    t_log = time.time()
    last_logged = start

    def put(item):
        s, (clips, labels) = item
        return s, (put_global_batch(clips, b_shard),
                   put_global_batch(labels, l_shard))

    staged = None
    cur_m, cur_chunk = -1, None
    if chunk:
        # resident index blocks (data.index_chunk): one put per `chunk`
        # steps; the step picks its row in-graph at state.step % chunk.
        # Per-step index puts pay the tunneled host link's per-transfer
        # LATENCY each step (BASELINE.md "Soak discovery", r4 s4).
        from audiogan_tpu.parallel.mesh import index_chunk_sharding
        c_shard = index_chunk_sharding(mesh)
    else:
        # Host prefetch (SURVEY C6): the batcher thread samples ahead
        # while the device steps; device_put of the NEXT batch overlaps
        # the current step because jit dispatch is async.
        batcher.start_prefetch(start, total)
        pending = batcher.next_prefetched()
        staged = put(pending) if pending is not None else None

    prof_on, prof_off = (start + cfg.train.profile_steps[0],
                         start + cfg.train.profile_steps[1])

    for step in range(start, total):
        if cfg.train.profile_dir:
            if step == prof_on:
                jax.profiler.start_trace(cfg.train.profile_dir)
            elif step == prof_off:
                jax.device_get(metrics)  # close out in-flight work
                jax.profiler.stop_trace()
                print(f"[profile] xplane trace in {cfg.train.profile_dir}",
                      flush=True)
        if chunk:
            if step // chunk != cur_m:
                cur_m = step // chunk
                ci, cl = chunk_rows(cur_m)
                cur_chunk = (put_global_batch(ci, c_shard),
                             put_global_batch(cl, c_shard))
            state, metrics = jit_step(state, *cur_chunk)
        else:
            assert staged is not None and staged[0] == step
            clips, labels = staged[1]
            state, metrics = jit_step(state, clips, labels)
            nxt = batcher.next_prefetched()
            staged = put(nxt) if nxt is not None else None

        if (step + 1) % cfg.train.log_every == 0 or step + 1 == total:
            metrics = jax.device_get(metrics)  # sync point
            dt = time.time() - t_log
            # steps actually timed since the last log — a resume from a
            # non-boundary step would otherwise inflate the first point
            steps_done = step + 1 - last_logged
            last_logged = step + 1
            sps = steps_done / max(dt, 1e-9)
            audio_sec = (sps * cfg.train.batch_size * cfg.loss.n_critic *
                         cfg.data.clip_len / cfg.data.sample_rate)
            writer.write(step + 1, {**metrics, "steps_per_sec": sps,
                                    "train_audio_sec_per_sec": audio_sec})
            t_log = time.time()

        if (cfg.train.ckpt_every and (step + 1) % cfg.train.ckpt_every == 0
                ) or step + 1 == total:
            ckpt_async.save(state)

        if cfg.train.sample_every and (step + 1) % cfg.train.sample_every == 0:
            _dump_samples(cfg, state, sample_fn, workdir, step + 1)

    ckpt_async.join()
    mngr.wait_until_finished()
    writer.close()
    return {k: float(v) for k, v in jax.device_get(metrics).items()}


def _dump_samples(cfg: Config, state, sample_fn, workdir: Path,
                  step: int, num: int = 4) -> None:
    key = jax.random.key(cfg.train.seed + step)
    labels = None
    if cfg.data.num_classes:
        labels = np.arange(num, dtype=np.int32) % cfg.data.num_classes
    waves = np.asarray(sample_fn(state.params_g, key, labels, num=num))
    out = workdir / "samples" / f"step_{step:08d}"
    out.mkdir(parents=True, exist_ok=True)
    for i, w in enumerate(waves):
        tag = f"_y{labels[i]}" if labels is not None else ""
        write_wav(out / f"sample_{i}{tag}.wav", cfg.data.sample_rate, w)
