"""Directed bipartite protein->drug convolution.

Equivalent of the reference's MyHierarchyConv (reference:
src/layers.py:196-247): identity messages, mean aggregation of each drug's
targeted proteins, then a single dense projection.  The reference routes
this through a concatenated [n_prot + n_drug] node tensor with zero rows
for drugs and an index offset (reference: src/layers.py:526, prepare.py:43);
here the bipartite structure is direct — src indexes proteins, dst indexes
drugs — which removes the concat/slice entirely (same output, verified in
tests/test_layers.py).
"""

from __future__ import annotations

import jax

from tip_tpu.nn import initializers as init
from tip_tpu.ops import segment_sum_sorted, mean_from_sum


def hierarchy_conv_init(key, in_dim: int, out_dim: int, after_relu: bool = True):
    """Weight init of reference src/layers.py:220-224 (bias defaults off)."""
    return {
        "weight": init.normal(
            key, (in_dim, out_dim), std=init.hierarchy_std(in_dim, after_relu)
        )
    }


def hierarchy_conv_apply(params, x_src, src, dst, dst_degree, n_dst: int):
    """x_src: [n_src, in_dim]; (src, dst) bipartite edges, dst-sorted.

    Returns [n_dst, out_dim] = mean_{src in N(dst)} x_src[src] @ W.
    Drugs with no targeted proteins get zero rows (scatter_mean convention).
    """
    summed = segment_sum_sorted(x_src[src], dst, n_dst)
    return mean_from_sum(summed, dst_degree) @ params["weight"]
