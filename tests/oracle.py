"""Numpy oracles implementing the reference layer semantics edge-by-edge.

Deliberately naive (per-edge loops, dense matrices) so they are an
independent check on the vectorized TPU implementations.  Semantics follow
SURVEY.md section 2.2: mean aggregation over ALL incoming edges (denominator
= cross-relation in-degree), basis-decomposed per-relation weights, root
self-term, PyG gcn_norm with self-loops.
"""

from __future__ import annotations

import numpy as np


def rgcn_oracle(x, src, dst, edge_type, att, basis, root, n_nodes):
    """Per-edge messages m_e = x[src] @ W_{et}; scatter-mean; + x @ root."""
    n_et, n_base = att.shape
    w = np.einsum("tb,bde->tde", att, basis)
    d_out = basis.shape[-1]
    acc = np.zeros((n_nodes, d_out))
    deg = np.zeros(n_nodes)
    for e in range(src.shape[0]):
        acc[dst[e]] += x[src[e]] @ w[edge_type[e]]
        deg[dst[e]] += 1
    mean = np.where(deg[:, None] > 0, acc / np.maximum(deg[:, None], 1), 0.0)
    return mean + x @ root


def hierarchy_oracle(x_src, src, dst, weight, n_dst):
    acc = np.zeros((n_dst, x_src.shape[1]))
    deg = np.zeros(n_dst)
    for e in range(src.shape[0]):
        acc[dst[e]] += x_src[src[e]]
        deg[dst[e]] += 1
    mean = np.where(deg[:, None] > 0, acc / np.maximum(deg[:, None], 1), 0.0)
    return mean @ weight


def gcn_oracle(x, edge_index, n_nodes, weight, bias):
    """Dense A_hat (x W) + b with A_hat = D^-1/2 (A+I) D^-1/2 (PyG gcn_norm)."""
    a = np.zeros((n_nodes, n_nodes))
    a[edge_index[1], edge_index[0]] = 1.0  # a[dst, src]
    a = a + np.eye(n_nodes)
    deg = a.sum(axis=1)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1)), 0.0)
    a_hat = dinv[:, None] * a * dinv[None, :]
    h = weight if x is None else x @ weight
    return a_hat @ h + (bias if bias is not None else 0.0)


def distmult_oracle(z, w, src, dst, et):
    logits = np.array(
        [np.sum(z[src[e]] * z[dst[e]] * w[et[e]]) for e in range(src.shape[0])]
    )
    return 1.0 / (1.0 + np.exp(-logits))
