"""Typed config tree + the five named presets mirroring BASELINE.json configs.

Reference equivalent: argparse flags (SURVEY.md C19). Here every experiment is
a frozen dataclass tree; presets map 1:1 onto BASELINE.json lines 7-11:

  tiny_sc09      [B:7]  tiny unconditional WaveGAN, batch 8, CPU-runnable
  wgan_gp_b64    [B:8]  WGAN-GP + phase shuffle, batch 64, full ingest fusion
  cond_gru_sc09  [B:9]  class-conditional GRU (SampleRNN-style) generator
  dual_stft      [B:10] dual discriminator (raw conv + STFT critic) +
                        multi-resolution spectral loss
  music_44k_dp16 [B:11] 4 s 44.1 kHz clips, data-parallel over 16 chips
"""

from __future__ import annotations

import dataclasses
import json
import math
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class DataCfg:
    """On-device ingest pipeline config (SURVEY C1-C6)."""

    data_dir: str = ""              # corpus dir; "" -> synthetic fixture corpus
    sample_rate: int = 16000        # model rate (Hz)
    source_rate: int = 16000        # corpus rate (Hz); != sample_rate -> on-device resample
    clip_len: int = 16384           # T: model-rate samples fed to the GAN
    store_len: int = 16384          # host-stored samples per clip, at source_rate
    mu_law: bool = True             # mu-law compand inside ingest (C3)
    mu: float = 255.0
    normalize: str = "peak"         # peak | rms | none  (C5)
    norm_target: float = 0.999
    num_classes: int = 0            # 0 = unconditional; SC09 = 10
    resample_taps_per_phase: int = 10   # windowed-sinc halfwidth per phase (C2)
    resample_beta: float = 5.0      # Kaiser beta for the anti-alias filter
    device_corpus: bool = False     # resident-corpus mode: ship the packed
                                    # int16 corpus to HBM once; per step the
                                    # host sends only the (seed, step)-pure
                                    # sample INDICES (~KBs) and the batch
                                    # gather runs in-graph — removes the
                                    # per-step host->device bulk transfer
                                    # (train/step.py build_device_corpus_step)
    # HBM placement of the resident corpus: "replicate" = every device
    # holds all clips (capped at DEVICE_CORPUS_MAX_GB); "shard" = clip
    # axis sharded over the batch ('data'/'dcn') axes with an explicit
    # all_gather(idx)+masked-take+psum_scatter gather on ICI
    # (parallel/sharded_corpus.py) — n_data_shards x the capacity;
    # "auto" = replicate when it fits, shard when only the sharded form
    # fits, host batcher otherwise
    device_corpus_shard: str = "auto"
    # Resident-INDEX chunking (device_corpus only): the loop ships the
    # (seed, step)-pure sample indices in blocks of this many steps (one
    # ~KB-scale transfer per block) and the step indexes its own row
    # in-graph via state.step % index_chunk, removing the per-step
    # host->device index put (whose per-transfer round trip is the cost
    # on the tunneled host link — BASELINE.md "Soak discovery", r4 s4).
    # 0 = legacy per-step index transfer. Bit-identical stream either way.
    index_chunk: int = 512

    @property
    def resampled_len(self) -> int:
        """Length of a store_len clip after source->model rate conversion."""
        up, down = _ratio(self.sample_rate, self.source_rate)
        return -(-self.store_len * up // down)  # ceil


@dataclass(frozen=True)
class ModelCfg:
    """Generator/discriminator architecture (SURVEY C7-C11, C15)."""

    generator: str = "wavegan"      # wavegan | gru
    latent_dim: int = 100
    model_dim: int = 64             # channel base d; G top width = d * 2**(L-1)
    kernel_size: int = 25
    strides: tuple[int, ...] = (4, 4, 4, 4, 4)   # per upsample/downsample layer
    phase_shuffle: int = 2          # max |shift| between D conv layers (C10)
    # Fuse the first N phase-shuffle sites into their consuming critic
    # convs (kernels/sconv.py weight-shift identity — no shuffled
    # activation ever materializes on the fwd/dx paths): 0 = off (the
    # select-form op), -1 = all sites, N = sites 0..N-1 (earliest sites
    # carry most of the shuffle bytes: T halves while C doubles).
    # Numerically interchangeable with the unfused critic (same shift
    # stream, same math). Wave critic + plain dp step only (the cp/tp
    # shard_map forwards keep the select form).
    fused_shuffle_sites: int = 0
    # Lowering for the UNFUSED shuffle sites (ops/phase_shuffle.py, set at
    # step-build time like train.wgrad_form): "select" (AD-transposed
    # select-over-static-slices), "prim" (same select values behind the
    # pshuf/pshuft linear primitive pair whose hand-written transpose
    # emits one select-scatter write instead of AD's (2·rad+1)-term
    # full-width padded chain), "gather" (vmap'd dynamic_slice — the r3
    # diagnostic form), "" = process default (env AUDIOGAN_SHUFFLE_IMPL,
    # else select). All three are bit-identical through the full train
    # step (tests/train/test_shuffle_impl.py) — pure op-structure choice.
    shuffle_impl: str = ""
    use_stft_critic: bool = False   # dual discriminator (C11)
    stft_resolutions: tuple[tuple[int, int, int], ...] = (
        (512, 128, 512), (1024, 256, 1024), (2048, 512, 2048),
    )                               # (n_fft, hop, win) triples
    # GRU generator (C8): frame-level RNN, one scan step per frame
    gru_frame_size: int = 64        # samples per frame BEFORE conv upsampling
    gru_hidden: int = 512
    embed_dim: int = 64             # label embedding width (C15)
    max_channels: int = 1024        # cap on widest conv layer

    @property
    def total_stride(self) -> int:
        return math.prod(self.strides)


@dataclass(frozen=True)
class LossCfg:
    """WGAN-GP + spectral losses (SURVEY C12-C13)."""

    gp_lambda: float = 10.0
    n_critic: int = 5
    stft_loss_weight: float = 0.0   # aux multi-res spectral term on G (dual_stft)
    drift_epsilon: float = 0.0      # optional D-score drift penalty (off by default)
    gp_batch_chunks: int = 1        # >1 bounds GP memory on long clips [B:11]


@dataclass(frozen=True)
class TrainCfg:
    batch_size: int = 64            # GLOBAL batch per D micro-step
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    beta1: float = 0.5
    beta2: float = 0.9
    total_steps: int = 200_000
    log_every: int = 50
    ckpt_every: int = 1000
    sample_every: int = 2000
    keep_ckpts: int = 3
    seed: int = 0
    # Checkpoint D's forward inside the n_critic scan. OFF by default:
    # every preset fits HBM without it on one v5e, and the recompute costs
    # 24-27% of the step (interleaved A/Bs 2026-08-18: flagship 8.47 vs
    # 6.24 steps/s, cond_gru 8.53 vs 6.25, dual_stft 6.08 vs 4.64, music
    # 1.41 vs 1.10 — remat also compiled 5-10x slower). Turn on for
    # memory-constrained runs (bigger models / longer clips / large
    # device-resident corpora sharing HBM with the step).
    remat_discriminator: bool = False
    scan_unroll: int = 5            # unroll factor for the n_critic scan
                                    # (capped at n_critic). Default 5 =
                                    # full unroll at every preset: measured
                                    # +2.6-4.1% steps/s on ALL five presets
                                    # under the staged no-remat harness
                                    # (r3s6 interleaved A/Bs, 2026-08-18);
                                    # was a no-win under remat-on.
                                    # (>1 lets XLA software-pipeline across
                                    # micro-steps at higher compile cost)
    kernels: str = "xla"            # xla | pallas — A1 fast path selector
    # optional per-net overrides ("" inherits `kernels`): the measured
    # optimum on this chip is G=pallas, D=xla (scripts/step_bisect.py;
    # BASELINE.md round 2)
    kernels_g: str = ""
    kernels_d: str = ""
    kernels_ingest: str = ""        # "" inherits `kernels`
    # XLA-tier weight-grad contraction form: "einsum" (phase-grouped
    # einsum stack, pays a (b,rows,s*cin) lane relayout) | "conv" (single
    # conv_general_dilated, relayout-free) | "" (process default: env
    # AUDIOGAN_WGRAD_FORM, else einsum). Applied at step-build time via
    # kernels.conv.set_wgrad_form; step-level A/B verdict in BASELINE.md
    # (round 4).
    wgrad_form: str = ""
    # Fuse the critic's real+fake evaluations into ONE 2B-batch call:
    # merges the two forward conv stacks and — more importantly — the two
    # parameter-backward passes, removing a weight-sized add_any gradient
    # accumulation per layer per micro-step and doubling the wgrad GEMM
    # rows (the r4 profiles' ~18% add/add_any AD-glue bucket). Changes the
    # phase-shuffle stream (one key draws 2B per-example shifts instead of
    # two keys drawing B each), so training trajectories differ from the
    # unfused step; with phase_shuffle=0 the math is identical (pinned by
    # tests/train/test_fused_views.py). Honored by the plain, cp and tp
    # step builders. Step-level A/B verdict in BASELINE.md (round 5).
    fused_d_views: bool = False
    dtype: str = "float32"          # compute dtype for conv stacks
    # observability (SURVEY §5): xplane trace window, optimized-HLO dump of
    # the single train-step graph, NaN debugging
    profile_dir: str = ""           # write a jax.profiler trace here
    profile_steps: tuple[int, int] = (5, 10)  # trace window (rel. to start)
    dump_hlo: bool = False          # save step_optimized_hlo.txt in workdir
    debug_nans: bool = False


@dataclass(frozen=True)
class MeshCfg:
    """Device mesh axes. dp * cp must divide/equal len(jax.devices())."""

    dp: int = 1                     # data-parallel axis size
    cp: int = 1                     # context (time-axis) parallel size
    tp: int = 1                     # tensor (critic channel) parallel size
    fsdp: bool = False              # shard optimizer state over 'data'
                                    # (ZeRO-1 via sharding annotations,
                                    # arXiv:2004.13336 — XLA partitions the
                                    # weight update + inserts the gathers)


@dataclass(frozen=True)
class Config:
    name: str = "default"
    data: DataCfg = field(default_factory=DataCfg)
    model: ModelCfg = field(default_factory=ModelCfg)
    loss: LossCfg = field(default_factory=LossCfg)
    train: TrainCfg = field(default_factory=TrainCfg)
    mesh: MeshCfg = field(default_factory=MeshCfg)

    def validate(self) -> "Config":
        d, m = self.data, self.model
        if m.generator == "wavegan":
            if d.clip_len % m.total_stride != 0:
                raise ValueError(
                    f"clip_len={d.clip_len} not divisible by total stride "
                    f"{m.total_stride} (strides={m.strides})")
        if m.generator == "gru":
            if d.clip_len % (m.gru_frame_size) != 0:
                raise ValueError("clip_len must be divisible by gru_frame_size")
        if d.resampled_len < d.clip_len:
            raise ValueError(
                f"resampled corpus clips ({d.resampled_len}) shorter than "
                f"clip_len ({d.clip_len}); increase store_len")
        if self.train.batch_size % self.mesh.dp != 0:
            raise ValueError("batch_size must be divisible by mesh.dp")
        for f in ("kernels", "kernels_g", "kernels_d", "kernels_ingest"):
            v = getattr(self.train, f)
            if v not in (("xla", "pallas", "auto") if f == "kernels"
                         else ("", "xla", "pallas", "auto")):
                raise ValueError(f"train.{f}={v!r} not in xla|pallas|auto")
        if m.fused_shuffle_sites < -1:
            raise ValueError("model.fused_shuffle_sites must be >= -1")
        if m.shuffle_impl not in ("", "gather", "select", "prim"):
            raise ValueError(
                f"model.shuffle_impl={m.shuffle_impl!r} "
                "not in gather|select|prim")
        if d.device_corpus_shard not in ("auto", "replicate", "shard"):
            raise ValueError(
                f"data.device_corpus_shard={d.device_corpus_shard!r} "
                "not in auto|replicate|shard")
        if d.index_chunk < 0:
            raise ValueError("data.index_chunk must be >= 0")
        if self.train.wgrad_form not in ("", "einsum", "conv"):
            raise ValueError(
                f"train.wgrad_form={self.train.wgrad_form!r} "
                "not in einsum|conv")
        if d.clip_len % self.mesh.cp != 0:
            raise ValueError("clip_len must be divisible by mesh.cp")
        if self.mesh.tp > 1:
            if self.mesh.cp > 1:
                raise ValueError("tp>1 with cp>1 is not supported")
            if m.use_stft_critic:
                raise ValueError(
                    "tp covers the wave critic only (no STFT critic)")
            chs = [min(m.model_dim * 2 ** i, m.max_channels)
                   for i in range(len(m.strides))]
            bad = [c for c in chs if c % self.mesh.tp]
            if bad:
                raise ValueError(
                    f"critic channels {chs} must each be divisible by "
                    f"tp={self.mesh.tp} (violated by {bad})")
        if self.mesh.cp > 1:
            if m.use_stft_critic:
                _, hop, _ = m.stft_resolutions[0]
                frames = d.clip_len // hop
                # 4 = STFTCritic n_layers (stride-2 frame downsampling)
                if (d.clip_len % (self.mesh.cp * hop)
                        or frames % (self.mesh.cp * 2 ** 4)):
                    raise ValueError(
                        f"cp dual-STFT needs hop-aligned shards and a frame "
                        f"axis divisible by cp*16: clip_len={d.clip_len}, "
                        f"hop={hop}, cp={self.mesh.cp}")
            if self.loss.stft_loss_weight > 0:
                t_loc = d.clip_len // self.mesh.cp
                for n_fft, hop, win in m.stft_resolutions:
                    if t_loc % hop or (win - hop) > t_loc:
                        raise ValueError(
                            "cp spectral-matching loss needs hop-aligned "
                            "shards and a (win-hop) halo within one shard: "
                            f"shard len {t_loc}, resolution "
                            f"({n_fft},{hop},{win})")
            if m.generator == "wavegan":
                base = d.clip_len // m.total_stride
                if base % self.mesh.cp != 0:
                    raise ValueError(f"generator base length {base} must be "
                                     f"divisible by cp={self.mesh.cp}")
            elif m.generator == "gru":
                n_frames = d.clip_len // m.gru_frame_size
                if n_frames % self.mesh.cp != 0:
                    raise ValueError(f"gru frame count {n_frames} must be "
                                     f"divisible by cp={self.mesh.cp}")
        return self

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @staticmethod
    def from_json(s: str) -> "Config":
        raw = json.loads(s)
        return Config(
            name=raw.get("name", "default"),
            data=_build(DataCfg, raw.get("data", {})),
            model=_build(ModelCfg, raw.get("model", {})),
            loss=_build(LossCfg, raw.get("loss", {})),
            train=_build(TrainCfg, raw.get("train", {})),
            mesh=_build(MeshCfg, raw.get("mesh", {})),
        )

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


def _build(cls, raw: dict):
    kw = {}
    for f in dataclasses.fields(cls):
        if f.name in raw:
            v = raw[f.name]
            if isinstance(v, list):
                v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
            kw[f.name] = v
    return cls(**kw)


def _ratio(target: int, source: int) -> tuple[int, int]:
    g = math.gcd(target, source)
    return target // g, source // g


# ---------------------------------------------------------------------------
# Presets [B:7-11]
# ---------------------------------------------------------------------------

def tiny_sc09() -> Config:
    """[B:7] Tiny unconditional WaveGAN on SC09-shaped clips, batch 8, CPU-ok."""
    return Config(
        name="tiny_sc09",
        data=DataCfg(num_classes=0, device_corpus=True),
        model=ModelCfg(generator="wavegan", model_dim=16, max_channels=256),
        loss=LossCfg(n_critic=2),
        train=TrainCfg(batch_size=8, total_steps=2000, log_every=10),
    ).validate()


def wgan_gp_b64() -> Config:
    """[B:8] Flagship: WGAN-GP + phase shuffle, batch 64, fused ingest.

    Default kernel tier is AUTO — every conv (including each AD-generated
    conv in the GP double-backprop) and the fused ingest pick the
    measured-best tier for THEIR geometry (kernels/conv.py _auto_*,
    ops/ingest.py). Round-3 deciding A/B (BASELINE.md 2026-08-17): auto
    == mixed within ±0.5% within-round, both >= xla, uniform pallas
    0.88-0.94; auto additionally wins the GRU family outright (+4.3%).
    Override with --kernels xla|pallas|mixed for the other tiers.
    """
    return Config(
        name="wgan_gp_b64",
        data=DataCfg(num_classes=0, device_corpus=True),
        # Shuffle lowering (r5 re-verdict under fused_d_views): NO sconv
        # sites + the pshuf primitive at every site — 12.97 vs the r4
        # fx1 default's 11.73 steps/s (+10.6%, interleaved A/B,
        # bench/r5_pshuf_ab_log.txt). Under fdv the fused site no longer
        # pays (f0 == fx1 at 11.73) and the hand-written pshuf transpose
        # (one select-scatter write instead of AD's (2·rad+1)-term padded
        # chain) wins outright. r4 history: fx1 was +3.7% over f0-select
        # pre-fdv (BASELINE.md r4 batch 4).
        model=ModelCfg(generator="wavegan", model_dim=64,
                       fused_shuffle_sites=0, shuffle_impl="prim"),
        loss=LossCfg(n_critic=5),
        # wgrad_form=conv: relayout-free single-conv weight-grad contraction,
        # +2.5% step-level vs the einsum stack (r4 interleaved A/B, 6 rounds;
        # BASELINE.md). tiny/resample keep einsum (0.976/0.990 there).
        # dtype=bfloat16: the headline operating point (f32 is 0.63x —
        # r4 loop A/B; GP norms track f32 to 1e-3, learning proof and
        # 100k soak both bf16). tiny/resample keep f32 (CPU CI presets).
        # fused_d_views: ONE 2B-batch critic call per D micro-step —
        # +16.6% step-level (11.73 vs 10.07, 6-round interleaved A/B,
        # r5; BASELINE.md "fused_d_views"). All four TPU-scale presets
        # ship it; tiny/resample keep the unfused two-call form (CPU CI
        # presets — golden-trajectory continuity, and the win is glue
        # the small graphs don't have).
        train=TrainCfg(batch_size=64, kernels="auto", wgrad_form="conv",
                       dtype="bfloat16", fused_d_views=True),
    ).validate()


def cond_gru_sc09() -> Config:
    """[B:9] Class-conditional GRU (SampleRNN-style frame RNN) generator."""
    return Config(
        name="cond_gru_sc09",
        data=DataCfg(num_classes=10, device_corpus=True),
        # Shuffle lowering (r5 decider under fused_d_views): NO sconv
        # sites + the pshuf primitive at every site — 13.07 vs 11.57
        # steps/s over the r4 fxla default (+12.4%, 6x10 interleaved,
        # bench/r5_f0prim_ab_log.txt), the same verdict as the flagship
        # and music. (r4 history: fused_shuffle_sites=-1 was +1.9% over
        # select-unfused pre-fdv.)
        model=ModelCfg(generator="gru", model_dim=64,
                       gru_frame_size=64, gru_hidden=512,
                       fused_shuffle_sites=0, shuffle_impl="prim"),
        loss=LossCfg(n_critic=5),
        # auto: fused GRU scan (1.21x on-HW) + per-geometry conv routing;
        # wgrad_form=conv +3.3% (r4 A/B); bf16 = headline operating point;
        # fused_d_views +19.6% (11.71 vs 9.80, r5 A/B — BASELINE.md)
        train=TrainCfg(batch_size=64, kernels="auto", wgrad_form="conv",
                       dtype="bfloat16", fused_d_views=True),
    ).validate()


def dual_stft() -> Config:
    """[B:10] Dual discriminator (conv + STFT critic) + multi-res STFT loss."""
    return Config(
        name="dual_stft",
        data=DataCfg(num_classes=0, device_corpus=True),
        # Shuffle lowering (r5 decider under fused_d_views, sequential
        # A/B — the resident harness spills HBM on this preset): NO
        # sconv sites + the pshuf primitive — 8.93 vs 8.20 steps/s over
        # the r4 fx1 default (+8.9%, bench/r5_dual_seq_ab_log.txt), the
        # same verdict as the other three TPU-scale presets. (r4
        # history: fused_shuffle_sites=1 was +2.9% pre-fdv; the STFT
        # critic has no shuffle sites.)
        model=ModelCfg(generator="wavegan", model_dim=64, use_stft_critic=True,
                       fused_shuffle_sites=0, shuffle_impl="prim"),
        loss=LossCfg(n_critic=5, stft_loss_weight=1.0),
        # auto: wave G/D geometry identical to the flagship (the measured
        # routing transfers); the STFT critic's 2D convs stay XLA;
        # wgrad_form=conv +2.4% (r4 A/B); bf16 = headline operating point;
        # fused_d_views +14.8% (8.09 vs 7.05, r5 A/B — both critics and
        # the STFT framing fuse their real+fake views)
        train=TrainCfg(batch_size=64, kernels="auto", wgrad_form="conv",
                       dtype="bfloat16", fused_d_views=True),
    ).validate()


def resample_22k() -> Config:
    """On-device resampling on the data path (SURVEY C2, [B:5]
    "resampling"): a 22050 Hz corpus feeding the 16 kHz model, so every
    ingest runs the true-polyphase Kaiser-sinc conversion (up/down =
    320/441) before crop/normalize/mu-law. Store 24000 source samples
    (~1.09 s) -> 17415 model-rate samples, leaving random-crop slack
    around the 16384-sample clip. CPU-runnable like tiny_sc09."""
    return Config(
        name="resample_22k",
        data=DataCfg(sample_rate=16000, source_rate=22050,
                     clip_len=16384, store_len=24000, num_classes=0,
                     device_corpus=True),
        model=ModelCfg(generator="wavegan", model_dim=16, max_channels=256),
        loss=LossCfg(n_critic=2),
        train=TrainCfg(batch_size=8, total_steps=2000, log_every=10),
    ).validate()


def music_44k_dp16() -> Config:
    """[B:11] 4 s 44.1 kHz music clips, data-parallel WGAN-GP over 16 chips.

    176400 = 48 * 3 * 5 * 5 * 7 * 7: per-layer strides (7, 7, 5, 5, 3)
    upsample a 48-frame base to the full clip.

    Kernel tier: the default xla IS the measured optimum here — every
    stride-7/5/3 geometry loses or ties on the Pallas tier
    (kernel_bench --sets music, BASELINE.md r3), the stride-aware auto
    router therefore routes the whole net to xla anyway (step-level:
    auto 0.310 vs xla 0.306 steps/s — identical graphs, noise), and the
    220500-sample store rows are Mosaic-ineligible for the fused ingest.
    gp_batch_chunks stays 1 (chunking measured 3-7% slower; it exists to
    bound GP memory, not for speed). Golden + on-HW fidelity coverage:
    tests/helpers_golden.py case_music.
    """
    return Config(
        name="music_44k_dp16",
        data=DataCfg(sample_rate=44100, source_rate=44100,
                     clip_len=176400, store_len=220500,  # store 5 s, crop 4 s
                     device_corpus=True,  # 113 MB/step of host transfer
                     # otherwise (falls back to the host batcher with a
                     # warning when the packed corpus exceeds 8 GiB)
                     num_classes=0),
        # Shuffle lowering (r5 re-verdict under fused_d_views): unfused +
        # pshuf primitive beats the r4 fused-all default +10.3% (2.548 vs
        # 2.309 steps/s dp=1, interleaved A/B, bench/r5_pshuf_ab_log.txt)
        # — the hand-written transpose removes the t=25200-row padded
        # add_any chains that fusing only partially avoided.
        model=ModelCfg(generator="wavegan", model_dim=64,
                       strides=(7, 7, 5, 5, 3), kernel_size=25,
                       fused_shuffle_sites=0, shuffle_impl="prim"),
        loss=LossCfg(n_critic=5),
        # wgrad_form=conv is the music preset's single biggest r4 win:
        # +25.9% step-level (1.45 -> 1.83 steps/s dp=1, interleaved A/B) —
        # the einsum stack's (b, rows, s*cin) relayout at t=25200 rows was
        # the cost the r3s8 flagship profile saw, scaled up 6x.
        # fused_d_views is the r5 equivalent: +24.9% (2.31 vs 1.85 dp=1 —
        # one 128-row conv stack at t=176400 instead of two 64-row ones).
        train=TrainCfg(batch_size=64, wgrad_form="conv",
                       dtype="bfloat16",  # headline operating point
                       fused_d_views=True),
        mesh=MeshCfg(dp=16, cp=1),
    ).validate()


PRESETS = {
    "tiny_sc09": tiny_sc09,
    "wgan_gp_b64": wgan_gp_b64,
    "cond_gru_sc09": cond_gru_sc09,
    "dual_stft": dual_stft,
    "resample_22k": resample_22k,
    "music_44k_dp16": music_44k_dp16,
}


def get_preset(name: str) -> Config:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]()
