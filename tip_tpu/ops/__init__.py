"""Kernel layer: sparse gather/scatter aggregation ops with two backends.

``xla``    — jax.ops.segment_sum / take based; runs everywhere (CPU tests,
             TPU), serves as the numerical oracle.
``pallas`` — TPU Mosaic kernels that express gather+scatter as one-hot
             matmuls on the MXU over chunk-aligned, type-binned edge buffers.

Select per call with ``backend=``.  This layer replaces what the reference gets
from torch-scatter / torch-sparse CUDA extensions (reference:
environment_tip_gpu.yml:105-113, invoked via PyG MessagePassing at
src/layers.py:42,123,202).
"""

from tip_tpu.ops.segment import (
    segment_sum_sorted,
    weighted_gather_sum,
    typed_neighbor_sum,
    mean_from_sum,
    distmult_score,
)

__all__ = [
    "segment_sum_sorted",
    "weighted_gather_sum",
    "typed_neighbor_sum",
    "mean_from_sum",
    "distmult_score",
]
