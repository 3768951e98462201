"""Multi-relational link-prediction decoders.

DistMult-style diagonal bilinear decoder and the per-relation MLP decoder,
equivalents of the reference's MultiInnerProductDecoder and NNDecoder
(reference: src/layers.py:581-637).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tip_tpu.nn import initializers as init
from tip_tpu.ops import distmult_score


def distmult_init(key, in_dim: int, n_et: int):
    """weight ~ N(0, 1/sqrt(in_dim)) (reference: src/layers.py:594-595)."""
    return {"weight": init.normal(key, (n_et, in_dim), std=1.0 / jnp.sqrt(in_dim))}


def distmult_apply(params, z, src, dst, edge_type, sigmoid: bool = True):
    """score_e = sigmoid( sum_d z[src,d] z[dst,d] w[et,d] )."""
    return distmult_score(z, params["weight"], src, dst, edge_type, sigmoid=sigmoid)


def distmult_apply_padded(
    params, z, src2d, dst2d, chunk_type, sigmoid: bool = True,
    backend: str = "xla", kernel_dtype: str = "float32",
):
    """Chunk-aligned variant returning flat scores [n_chunks * chunk].

    'pallas' runs the fused SDDMM kernel (no [E, d] intermediates — the XLA
    path materializes several, 8x-padded on TPU; see ops/pallas_segment.py).
    """
    if backend == "pallas":
        from tip_tpu.ops.pallas_segment import distmult_logits_padded

        logits = distmult_logits_padded(
            z, params["weight"], src2d, dst2d, chunk_type,
            jnp.dtype(kernel_dtype),
        ).reshape(-1)
    else:
        chunk = src2d.shape[1]
        src = src2d.reshape(-1)
        # clamp padding dst (= n_nodes) into range; masked out by the caller
        dst = jnp.minimum(dst2d.reshape(-1), z.shape[0] - 1)
        et = jnp.repeat(chunk_type, chunk)
        logits = jnp.sum(z[src] * z[dst] * params["weight"][et], axis=-1)
    return jax.nn.sigmoid(logits) if sigmoid else logits


def nn_decoder_apply_padded(params, z, src2d, dst2d, chunk_type, sigmoid: bool = True):
    """Chunk-aligned NN decoder (XLA path; padding clamped, caller masks)."""
    chunk = src2d.shape[1]
    src = src2d.reshape(-1)
    dst = jnp.minimum(dst2d.reshape(-1), z.shape[0] - 1)
    et = jnp.repeat(chunk_type, chunk)
    return nn_decoder_apply(params, z, src, dst, et, sigmoid=sigmoid)


def nn_decoder_init(key, in_dim: int, n_et: int, l1_dim: int = 16):
    """Per-drug 2-layer MLP decoder params (reference: src/layers.py:610-618)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s2 = 1.0 / jnp.sqrt(l1_dim)
    return {
        "w1_l1": init.normal(k1, (in_dim, l1_dim)),
        "w2_l1": init.normal(k2, (in_dim, l1_dim)),
        "w1_l2": init.normal(k3, (n_et, l1_dim), std=s2),
        "w2_l2": init.normal(k4, (n_et, l1_dim), std=s2),
    }


def nn_decoder_apply(params, z, src, dst, edge_type, sigmoid: bool = True):
    """Shared L1 per endpoint, per-relation L2 row (reference: src/layers.py:620-631).

    TPU shaping: the L1 projections are computed ONCE on the [n_drug, l1]
    node table and gathered per edge, instead of projecting every edge
    endpoint (the reference projects the gathered [E, in_dim] tensor).
    Same math — relu and the per-relation reduction commute with the gather.
    """
    h1 = jax.nn.relu(z @ params["w1_l1"])
    h2 = jax.nn.relu(z @ params["w2_l1"])
    d1 = jnp.sum(h1[src] * params["w1_l2"][edge_type], axis=-1)
    d2 = jnp.sum(h2[dst] * params["w2_l2"][edge_type], axis=-1)
    logits = d1 + d2
    return jax.nn.sigmoid(logits) if sigmoid else logits
