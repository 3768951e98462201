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

    'pallas' runs the fused two-level-gather SDDMM kernel (no [E, d]
    intermediates — the XLA path materializes several, 8x-padded on TPU;
    see ops/pallas_sddmm2.py; measured 10.7 ms fwd+bwd vs 24.3 for the
    full-axis one-hot v1 and 328 for the XLA gather path at Decagon scale,
    runs/decoder_ab_float32.json).
    """
    if backend == "pallas":
        from tip_tpu.ops.pallas_sddmm2 import distmult_logits_padded2

        logits = distmult_logits_padded2(
            z, params["weight"], src2d, dst2d, chunk_type, z.shape[0],
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


def distmult_dense_pos_bce_sum(
    w, z, dense_adj, kernel_dtype: str = "float32", block: int = 128,
):
    """sum over POSITIVE edges of softplus(-logit), from the dense relation
    adjacency (data/packing.py:dense_relation_adj) — zero per-edge work.

    The positive edge set is static, so instead of gathering z rows per edge
    (the SDDMM path), score ALL n^2 pairs per relation as one [B, n, d] x
    [n, d] batched matmul and weight the BCE terms by the adjacency counts:

        sum_e softplus(-logit_e) = sum_t sum_{d,s} DA[t,d,s] softplus(-L_t[d,s])

    Relations are processed in static blocks of ``block`` (the [B, n, n]
    logit tile stays ~100 MB); each block is rematerialized in the backward
    pass instead of saving its logits.  The last block is clamped to the
    array end and stale (re-covered) leading rows are masked out.

    Same value as masking the chunked SDDMM logits, up to fp reassociation
    (tests/test_dense.py); replaces the positive half of the decoder that
    the reference gathers per edge (reference: src/layers.py:590-592).
    """
    n_et, n1, n2 = dense_adj.shape  # may be tile-padded (pad_dense_adj)
    block = min(block, n_et)
    cdt = jnp.dtype(kernel_dtype)
    zc = jnp.pad(z, ((0, n1 - z.shape[0]), (0, 0))).astype(cdt)
    zc2 = jnp.pad(z, ((0, n2 - z.shape[0]), (0, 0))).astype(cdt)
    mixed_ok = cdt == jnp.float32 or jax.default_backend() != "cpu"

    def block_sum(wb, da, fresh):
        zw = zc[None] * wb.astype(cdt)[:, None, :]  # [B, n1, d]
        if mixed_ok:
            logits = jnp.einsum(
                "tnf,mf->tnm", zw, zc2, preferred_element_type=jnp.float32
            )
        else:  # CPU XLA lacks the bf16->f32 dot; f32 over bf16-rounded inputs
            logits = jnp.einsum(
                "tnf,mf->tnm", zw.astype(jnp.float32), zc2.astype(jnp.float32)
            )
        val = jax.nn.softplus(-logits) * da.astype(jnp.float32)
        return jnp.sum(val * fresh[:, None, None])

    block_sum = jax.checkpoint(block_sum)
    total = jnp.zeros((), jnp.float32)
    for i in range(-(-n_et // block)):
        start = min(i * block, n_et - block)
        fresh = jnp.asarray(
            (start + jnp.arange(block)) >= i * block, jnp.float32
        )
        total = total + block_sum(
            w[start:start + block], dense_adj[start:start + block], fresh
        )
    return total


def nn_decoder_apply_padded(
    params, z, src2d, dst2d, chunk_type, sigmoid: bool = True,
    backend: str = "xla", kernel_dtype: str = "float32",
):
    """Chunk-aligned NN decoder; padding rows are garbage, caller masks.

    'pallas' fuses the per-edge gather-mul-reduce of both endpoint terms
    into one SDDMM kernel over the [n_drug, l1] L1 tables — the [E, l1]
    gather intermediates of the XLA path never exist
    (ops/pallas_segment.py:nn_logits_padded; reference decoder:
    src/layers.py:620-631).
    """
    h1 = jax.nn.relu(z @ params["w1_l1"])
    h2 = jax.nn.relu(z @ params["w2_l1"])
    if backend == "pallas":
        from tip_tpu.ops.pallas_sddmm2 import nn_logits_padded2

        logits = nn_logits_padded2(
            h1, h2, params["w1_l2"], params["w2_l2"], src2d, dst2d, chunk_type,
            z.shape[0], jnp.dtype(kernel_dtype),
        ).reshape(-1)
    else:
        # dense (node, relation) score tables + scalar gathers — see
        # nn_decoder_apply for why the per-edge [E, l1] form is avoided
        chunk = src2d.shape[1]
        src = src2d.reshape(-1)
        dst = jnp.minimum(dst2d.reshape(-1), z.shape[0] - 1)
        et = jnp.repeat(chunk_type, chunk)
        s1 = h1 @ params["w1_l2"].T
        s2 = h2 @ params["w2_l2"].T
        logits = s1[src, et] + s2[dst, et]
    return jax.nn.sigmoid(logits) if sigmoid else logits


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

    TPU shaping: the per-relation reduction is precomputed as a DENSE
    (node, relation) score table s1 = relu(z W1) @ w1^T — a [n_drug, n_et]
    matmul on the MXU — and each edge gathers one SCALAR s1[src, et].
    Same math; the naive per-edge form gathers [E, l1] tensors, which TPU
    lane-padding inflates 16x (observed 3.97 GB per gather at Decagon
    scale — an instant OOM in the PR-HMP-NN train step).
    """
    h1 = jax.nn.relu(z @ params["w1_l1"])
    h2 = jax.nn.relu(z @ params["w2_l1"])
    s1 = h1 @ params["w1_l2"].T  # [n_nodes, n_et]
    s2 = h2 @ params["w2_l2"].T
    logits = s1[src, edge_type] + s2[dst, edge_type]
    return jax.nn.sigmoid(logits) if sigmoid else logits
