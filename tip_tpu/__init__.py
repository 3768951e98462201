"""tip_tpu — a TPU-native multi-relational message-passing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NYXFLOWER/TIP
(Tri-graph Information Propagation for polypharmacy side-effect prediction):
relational graph convolution over the Decagon tri-graph (protein-protein,
protein-drug, drug-drug with ~1,100 side-effect relation types),
basis-decomposed R-GCN, a bipartite protein-to-drug hand-off convolution,
DistMult / MLP multi-relational link decoders, device-side typed negative
sampling, and device-side batched ranking metrics.

Design notes (TPU-first, not a port):
  * All edge buffers are type-binned, destination-sorted, and padded to
    static shapes so every step compiles once under ``jax.jit``.
  * The reference's per-relation Python matmul loop
    (reference: src/layers.py:169-177) is replaced by a single segment-sum
    into per-(relation, dst) bins followed by one basis-factored einsum on
    the MXU — numerically the same math, O(1) kernels instead of O(R).
  * Scatter/gather aggregation has two interchangeable backends: an XLA
    `segment_sum` path (correctness oracle, CPU-runnable) and Pallas TPU
    kernels that express gather+scatter as one-hot matmuls on the MXU.
  * Multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` with XLA
    collectives (edge-sharded aggregation and scoring), not NCCL/MPI.
"""

__version__ = "0.1.0"

from tip_tpu.config import ModelConfig, TrainConfig

__all__ = ["ModelConfig", "TrainConfig", "__version__"]
