"""GCN convolution over a cached normalized adjacency.

Equivalent of PyG ``GCNConv(..., cached=True)`` as used by the reference's
PPEncoder (reference: src/layers.py:386-394): out = A_hat (x W) + b with
A_hat = D^-1/2 (A + I) D^-1/2.  The normalization is precomputed host-side
once per split (data/packing.py:gcn_normalize) — the TPU analog of PyG's
``cached=True``.

TPU notes: when the input features are the identity (the reference feeds a
sparse identity matrix, reference: prepare.py:23), ``x=None`` skips the
feature matmul entirely — layer 1 becomes SpMM(A_hat, W), i.e. the weight
matrix acts as an embedding table and the N x N identity never exists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tip_tpu.nn import initializers as init
from tip_tpu.ops import weighted_gather_sum


def gcn_conv_init(key, in_dim: int, out_dim: int, bias: bool = True):
    kw, _ = jax.random.split(key)
    params = {"weight": init.glorot_uniform(kw, (in_dim, out_dim))}
    if bias:
        params["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return params


def gcn_conv_apply(params, x, norm_index, norm_weight, n_nodes: int):
    """x: [n_nodes, in_dim] or None for the identity-features fast path."""
    h = params["weight"] if x is None else x @ params["weight"]
    out = weighted_gather_sum(h, norm_index[0], norm_index[1], norm_weight, n_nodes)
    if "bias" in params:
        out = out + params["bias"]
    return out


def gcn_conv_apply_windowed(
    params, x, wsrc2d, wdstl2d, ww2d, chunk_window, n_windows: int,
    window: int, n_nodes: int, kernel_dtype: str = "float32",
):
    """Pallas windowed-scatter variant over data/packing.py:pad_windowed_edges
    buffers.  Requires the symmetric cached normalization (see
    ops/pallas_segment.py:gcn_spmm_padded for the backward-pass argument)."""
    from tip_tpu.ops.pallas_segment import gcn_spmm_padded

    h = params["weight"] if x is None else x @ params["weight"]
    import jax.numpy as jnp

    out = gcn_spmm_padded(
        h, wsrc2d, wdstl2d, ww2d, chunk_window, n_windows, window, n_nodes,
        jnp.dtype(kernel_dtype),
    )
    if "bias" in params:
        out = out + params["bias"]
    return out
