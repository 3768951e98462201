from tip_tpu.sampling.negative import typed_negative_sampling

__all__ = ["typed_negative_sampling"]
