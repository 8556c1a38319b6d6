from audiogan_tpu.utils.prng import split_for_step

__all__ = ["split_for_step"]
