"""XLA-path sparse ops: sorted segment reductions, SpMM, and edge scoring.

These are the TPU-native equivalents of the reference's native dependencies:

  * :func:`weighted_gather_sum`  ~ torch-sparse SpMM (PyG GCNConv's
    normalized-adjacency matmul, reference: src/layers.py:386-394);
  * :func:`typed_neighbor_sum`   ~ the gather + per-relation matmul + scatter
    of MyRGCNConv2 (reference: src/layers.py:157-188), reorganized so the
    scatter happens FIRST into per-(relation, dst) bins and the relation
    matmuls become one dense einsum on the MXU (see nn/rgcn.py);
  * :func:`distmult_score`       ~ the decoder's gather-multiply-reduce
    (reference: src/layers.py:591).

All edge buffers are expected destination-sorted within relation bins
(see data/packing.py), so every reduction runs with sorted segment ids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum_sorted(data, segment_ids, num_segments: int):
    """segment_sum with the sorted-ids contract made explicit."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )


def weighted_gather_sum(x, src, dst, weight, n_nodes: int):
    """out[d] = sum_{e: dst_e = d} weight_e * x[src_e]   (COO SpMM).

    ``dst`` must be sorted ascending.  With the cached GCN normalization
    weights this is exactly A_hat @ x.
    """
    msgs = x[src] * weight[:, None]
    return segment_sum_sorted(msgs, dst, n_nodes)


def typed_neighbor_sum(x, src, dst, edge_type, n_nodes: int, n_et: int):
    """P[t, d] = sum_{e in relation t, dst_e = d} x[src_e].

    Returns [n_et, n_nodes, d_in].  Edges must be sorted by
    (edge_type, dst) so segment ids are ascending.  This single sorted
    segment-sum replaces the reference's 1,097-iteration Python loop over
    relation ranges (reference: src/layers.py:169-177): the per-relation
    weight matmul is deferred to a dense einsum over the binned sums.
    """
    seg = edge_type.astype(jnp.int32) * n_nodes + dst
    flat = segment_sum_sorted(x[src], seg, n_et * n_nodes)
    return flat.reshape(n_et, n_nodes, x.shape[-1])


def mean_from_sum(summed, degree):
    """Divide aggregated sums by in-degree; zero-degree rows stay zero.

    Matches torch-scatter's scatter_mean convention (empty mean = 0),
    the aggregation the reference uses everywhere (aggr='mean',
    reference: src/layers.py:42,123,202).
    """
    deg = degree.astype(summed.dtype)
    inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
    return summed * inv.reshape((-1,) + (1,) * (summed.ndim - 1))


def distmult_score(z, rel_weight, src, dst, edge_type, sigmoid: bool = True):
    """score_e = sum_d z[src_e, d] * z[dst_e, d] * rel_weight[et_e, d].

    The DistMult decoder (reference: src/layers.py:590-592).
    """
    logits = jnp.sum(z[src] * z[dst] * rel_weight[edge_type], axis=-1)
    return jax.nn.sigmoid(logits) if sigmoid else logits
