from audiogan_tpu.train.state import TrainState, create_train_state
from audiogan_tpu.train.step import build_train_step
from audiogan_tpu.train.loop import train
from audiogan_tpu.train.sample import generate, build_sample_fn

__all__ = ["TrainState", "create_train_state", "build_train_step", "train",
           "generate", "build_sample_fn"]
