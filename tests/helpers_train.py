from audiogan_tpu.config import (Config, DataCfg, LossCfg, MeshCfg, ModelCfg,
                                 TrainCfg)


def tiny_config(**kw) -> Config:
    """Micro config that trains in seconds on CPU (SURVEY section 4.4)."""
    base = dict(
        name="test_tiny",
        data=DataCfg(clip_len=1024, store_len=1280, num_classes=0),
        model=ModelCfg(generator="wavegan", model_dim=4, kernel_size=9,
                       strides=(4, 4, 4), max_channels=16, phase_shuffle=1),
        loss=LossCfg(n_critic=2, gp_lambda=10.0),
        train=TrainCfg(batch_size=4, total_steps=4, log_every=2,
                       ckpt_every=100, sample_every=0, seed=0),
        mesh=MeshCfg(dp=1, cp=1),
    )
    base.update(kw)
    return Config(**base).validate()


def raw_batch(cfg, seed=0):
    import numpy as np
    from audiogan_tpu.train.step import num_views
    rng = np.random.default_rng(seed)
    n = num_views(cfg)
    clips = (rng.standard_normal((n, cfg.train.batch_size, cfg.data.store_len))
             * 8000).clip(-32768, 32767).astype(np.int16)
    labels = rng.integers(0, max(cfg.data.num_classes, 1),
                          size=(n, cfg.train.batch_size)).astype(np.int32)
    return clips, labels
