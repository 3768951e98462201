from tip_tpu.sampling.negative import (
    typed_negative_sampling,
    typed_negative_sampling_chunked,
    build_typed_bitmap,
    build_key_bitmap,
    bitmap_stride_bits,
)

__all__ = [
    "typed_negative_sampling",
    "typed_negative_sampling_chunked",
    "build_typed_bitmap",
    "build_key_bitmap",
    "bitmap_stride_bits",
]
