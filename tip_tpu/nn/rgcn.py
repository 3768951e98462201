"""Basis-decomposed relational graph convolution, TPU-shaped.

Same math as the reference's MyRGCNConv / MyRGCNConv2 (reference:
src/layers.py:21-193) — per-relation weight W_t = sum_b att[t, b] * basis_b,
messages m_e = x[src_e] @ W_{et_e}, scatter-MEAN into destinations with the
cross-relation in-degree as denominator, plus a root/self term x @ root —
but reorganized for the MXU:

    out[d] = (1/deg[d]) * sum_t ( sum_{e in t, dst=d} x[src_e] ) @ W_t
                + x[d] @ root

1. ``typed_neighbor_sum`` bins the neighbor-feature sums into
   P[t, d, :] with ONE sorted segment-sum over the whole edge buffer —
   no per-relation Python loop (the reference iterates 1,097 times per
   layer per step, reference: src/layers.py:169-177).
2. The relation matmuls collapse through the basis:
        sum_t P[t] @ W_t = sum_b ( sum_t att[t, b] P[t] ) @ basis_b
   i.e. two dense einsums with a [num_base, n_nodes, d_in] intermediate —
   large, static matmuls that tile onto the systolic array.

Numerically identical to the reference up to float reassociation
(validated allclose against a numpy oracle in tests/test_layers.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tip_tpu.nn import initializers as init
from tip_tpu.ops import typed_neighbor_sum, mean_from_sum


def rgcn_init(
    key,
    in_dim: int,
    out_dim: int,
    n_et: int,
    n_base: int,
    after_relu: bool,
    bias: bool = False,
):
    """Parameters and init distributions of reference src/layers.py:131-155."""
    k_att, k_basis, k_root = jax.random.split(key, 3)
    std = init.rgcn_std(in_dim, after_relu)
    params = {
        "att": init.normal(k_att, (n_et, n_base), std=1.0 / jnp.sqrt(n_base)),
        "basis": init.normal(k_basis, (n_base, in_dim, out_dim), std=std),
        "root": init.normal(k_root, (in_dim, out_dim), std=std),
    }
    if bias:
        params["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return params


def rgcn_apply(params, x, src, dst, edge_type, degree, n_nodes: int, n_et: int):
    """x: [n_nodes, d_in] -> [n_nodes, d_out].

    ``degree`` is the total in-degree over the WHOLE edge buffer (all
    relations), matching aggr='mean' over the concatenated edge list
    (reference: src/layers.py:123).  Edges must be (type, dst)-sorted.
    """
    # [n_et, n_nodes, d_in] binned neighbor sums — the only sparse op.
    p = typed_neighbor_sum(x, src, dst, edge_type, n_nodes, n_et)
    # Basis-factored relation matmuls: dense MXU work from here on.
    q = jnp.einsum("tb,tnd->bnd", params["att"], p)
    agg = jnp.einsum("bnd,bde->ne", q, params["basis"])
    out = mean_from_sum(agg, degree) + x @ params["root"]
    if "bias" in params:
        out = out + params["bias"]
    return out


def dense_rgcn_pair_apply(
    params1, params2, x, dense_adj, degree, axis_name=None,
):
    """BOTH R-GCN layers over ONE dense-adjacency stream (M-first form).

    The dense branch of :func:`rgcn_apply_padded` computes
    ``P[t] = DA[t] @ x`` then contracts relations through ``att`` — at
    Decagon scale that streams the 913 MB adjacency once per layer per
    direction (4 streams/step) and materializes a 181 MB ``[R, d, n]``
    intermediate per layer.  Reassociating the SAME math
    (tests/test_dense.py):

        sum_t att[t,b] (DA[t] @ x) = (sum_t att[t,b] DA[t]) @ x = M[b] @ x

    turns the relation contraction into ``M = att^T @ DA`` — and since M
    does not depend on x, BOTH layers' M are one einsum over the
    concatenated ``[R, B1+B2]`` att table: the adjacency is streamed ONCE
    forward and once for d(att) in the whole backward (2 streams/step
    total), the big per-relation intermediate disappears (M is
    ``[B1+B2, n, n]``, basis-count-bound, not relation-bound), and the
    remaining per-layer work is a tiny ``[B, n, n] @ [n, d]`` pair of
    einsums.  Measured at Decagon scale: one M pass 1.27 ms at HBM rate
    vs 1.36 ms per layer-GEMM before (runs/roofline_probe_f32.out); rgcn
    fwd+bwd 5.9 -> 3.3 ms (runs/roofline_probe2_f32.out).

    Under shard_map with the dense adjacency EP-sharded by relation
    (``axis_name`` set, parallel/ep.py), each device contracts its LOCAL
    relation block (att rows and DA pages are co-partitioned) and the
    [n, d_out] per-layer aggregate — not the adjacency, not M — is psum'd:
    relation work and HBM traffic scale down with the mesh.

    Same reference semantics as rgcn_apply_padded (cross-relation mean
    denominator, root term, optional bias; reference: src/layers.py:102-193).
    """
    att_cat = jnp.concatenate(
        [params1["att"], params2["att"]], axis=1
    )  # [R(_local), B1 + B2]
    b1 = params1["att"].shape[1]
    n_true = degree.shape[0]
    n2 = dense_adj.shape[2]  # tile-padded extent (data/packing.py:pad_dense_adj)
    if dense_adj.dtype != jnp.float32 and jax.default_backend() == "cpu":
        # CPU XLA has no mixed bf16->f32 dot; round att to the storage dtype
        # then contract in f32 — bit-identical to the TPU bf16-input MXU path
        m = jnp.einsum(
            "tb,tds->bds",
            att_cat.astype(dense_adj.dtype).astype(jnp.float32),
            dense_adj.astype(jnp.float32),
        )
    else:
        m = jnp.einsum(
            "tb,tds->bds", att_cat.astype(dense_adj.dtype), dense_adj,
            preferred_element_type=jnp.float32,
        )

    def half(params, m_half, h):
        hd = jnp.pad(h, ((0, n2 - n_true), (0, 0))).astype(dense_adj.dtype)
        if dense_adj.dtype != jnp.float32 and jax.default_backend() == "cpu":
            qd = jnp.einsum(
                "bds,sf->bdf",
                m_half.astype(dense_adj.dtype).astype(jnp.float32),
                hd.astype(jnp.float32),
            )
        else:
            qd = jnp.einsum(
                "bds,sf->bdf", m_half, hd, preferred_element_type=jnp.float32
            )
        agg = jnp.einsum("bdf,bfe->de", qd, params["basis"])[:n_true]
        if axis_name is not None:
            agg = jax.lax.psum(agg, axis_name)
        out = mean_from_sum(agg, degree) + h @ params["root"]
        if "bias" in params:
            out = out + params["bias"]
        return out

    h = jax.nn.relu(half(params1, m[:b1], x))
    return half(params2, m[b1:], h)


def dense_rgcn_pair_apply_sym(
    params1, params2, x, sym_strips, degree, axis_name=None,
):
    """Both R-GCN layers over the SYMMETRIC strip-packed int8 adjacency
    (data/packing.py:sym_strip_pack) — the M-first form of
    :func:`dense_rgcn_pair_apply` on ~3x less HBM stream.

    The relation pages are symmetric, so M[b] = sum_t att[t, b] DA[t] is
    symmetric per basis: contracting the packed strips gives M's upper
    block triangle directly —

        M_strips = einsum('tb,tis->bis', att, strips)

    — and XLA fuses the int8->bf16 convert into the einsum's operand read
    (measured 519 GB/s of int8 traffic vs 599 GB/s of bf16: ~2.3x less
    stream time for the step's second-largest HBM consumer).  The
    per-layer product M @ h is reassembled from strips: block row I
    contributes ``strip_I @ h[I*B:]`` to rows I and the transposed
    off-diagonal part ``strip_I[:, B:]^T @ h[I]`` to the mirror rows —
    dense MXU dots, no transposes materialized beyond XLA's.

    Same semantics as dense_rgcn_pair_apply (cross-relation mean
    denominator, root term, optional bias; reference:
    src/layers.py:102-193); equality validated in tests/test_dense.py.
    Under shard_map (``axis_name``) the strips are EP-partitioned by
    relation and the [n, d_out] per-layer aggregate is psum'd.
    """
    from tip_tpu.data.packing import SYM_BLOCK as B

    att_cat = jnp.concatenate([params1["att"], params2["att"]], axis=1)
    b1 = params1["att"].shape[1]
    n_true = degree.shape[0]
    totcols = sym_strips.shape[2]
    n_blk = totcols // B
    nb = int(round(((8 * n_blk + 1) ** 0.5 - 1) / 2))
    offs = [(i * nb - i * (i - 1) // 2) * B for i in range(nb + 1)]
    cpu = jax.default_backend() == "cpu"

    def mm(a, b, expr):
        # bf16 inputs / f32 accumulate; CPU rounds to bf16 then contracts
        # in f32 — the same emulation contract as dense_rgcn_pair_apply.
        if cpu:
            return jnp.einsum(
                expr, a.astype(jnp.bfloat16).astype(jnp.float32),
                b.astype(jnp.bfloat16).astype(jnp.float32),
            )
        return jnp.einsum(
            expr, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    m = mm(att_cat, sym_strips, "tb,tis->bis")  # [B1+B2, 128, totcols] f32

    def half(params, m_half, h):
        hd = jnp.pad(h, ((0, nb * B - n_true), (0, 0)))
        qd = jnp.zeros((m_half.shape[0], nb * B, h.shape[1]), jnp.float32)
        for i in range(nb):
            ms = m_half[:, :, offs[i]:offs[i + 1]]  # [b, 128, (nb-i)*128]
            qd = qd.at[:, i * B:(i + 1) * B].add(
                mm(ms, hd[i * B:], "bis,sf->bif")
            )
            if nb - i > 1:  # mirror of the off-diagonal strip part
                qd = qd.at[:, (i + 1) * B:].add(
                    mm(ms[:, :, B:], hd[i * B:(i + 1) * B], "bis,if->bsf")
                )
        agg = jnp.einsum("bdf,bfe->de", qd[:, :n_true], params["basis"])
        if axis_name is not None:
            agg = jax.lax.psum(agg, axis_name)
        out = mean_from_sum(agg, degree) + h @ params["root"]
        if "bias" in params:
            out = out + params["bias"]
        return out

    h = jax.nn.relu(half(params1, m[:b1], x))
    return half(params2, m[b1:], h)


def rgcn_apply_padded(
    params, x, src2d, dst2d, chunk_type, degree, n_nodes: int, n_et: int,
    backend: str = "xla", axis_name=None, kernel_dtype: str = "float32",
    dense_adj=None,
):
    """Padded chunk-aligned variant (data/packing.py:pad_typed_edges).

    src2d/dst2d: [n_chunks, chunk] with padding dst = n_nodes; chunk_type:
    [n_chunks] relation per chunk.  backend 'pallas' runs the one-hot MXU
    scatter kernel; 'xla' uses a stride-(n_nodes+1) sorted segment-sum whose
    extra column absorbs the padding.

    ``dense_adj``: optional [n_et, n_nodes, n_nodes] per-relation dense
    adjacency (data/packing.py:dense_relation_adj) in the compute dtype.
    When given, the neighbor binning runs as ONE batched dense matmul on the
    MXU — ~25x fewer FLOPs than the chunked one-hot kernels at Decagon scale
    and no per-edge work at all.  Identical math (counts are exact in the
    compute dtype; accumulation is float32).  With a bf16 adjacency the
    ``x.astype(dense_adj.dtype)`` cast assumes DEFAULT matmul precision
    (where f32 MXU inputs round to bf16 anyway — the cast is then free);
    train/model.py:preferred_dense_dtype keeps f32 storage when the user
    pins jax_default_matmul_precision to float32/highest.  Takes precedence over
    ``backend`` for the binning; the edge buffers are ignored here but still
    feed the decoder/sampler.  Ignored under shard_map (``axis_name`` set):
    the dense adjacency is replicated, so every device would compute the
    FULL aggregation and the psum would multiply it by the axis size — the
    chunked paths below partition edges by chunk and psum partial sums.

    ``axis_name``: when running under shard_map with the CHUNK axis sharded
    across devices, each device bins only its local edges; the basis-mixed
    [num_base, n_nodes, d_in] intermediate — not the much larger per-relation
    binning — is summed over devices with ONE psum (edge contributions are
    linear, so any chunk partition is valid).
    """
    if axis_name is not None:
        dense_adj = None  # replicated; see docstring
    if dense_adj is not None:
        # pt [n_et, d_in, n_pad] — same transposed layout as the Pallas
        # kernel, contracted by the basis einsums directly.  The adjacency
        # may be tile-padded (data/packing.py:pad_dense_adj): pad x's rows
        # to the source extent (zero pads contribute nothing) and slice the
        # destination extent back at the end.
        xd = jnp.pad(
            x, ((0, dense_adj.shape[2] - x.shape[0]), (0, 0))
        ).astype(dense_adj.dtype)
        if dense_adj.dtype != jnp.float32 and jax.default_backend() == "cpu":
            # CPU XLA has no mixed bf16->f32 dot; rounding the inputs to the
            # compute dtype then contracting in f32 is bit-identical to the
            # TPU bf16-input / f32-accumulate MXU path.
            pt = jnp.einsum(
                "tds,sf->tfd", dense_adj.astype(jnp.float32),
                xd.astype(jnp.float32),
            )
        else:
            pt = jnp.einsum(
                "tds,sf->tfd", dense_adj, xd,
                preferred_element_type=jnp.float32,
            )
        q = jnp.einsum("tb,tdn->bdn", params["att"], pt)
        agg = jnp.einsum("bdn,bde->ne", q, params["basis"])[: x.shape[0]]
    elif backend == "pallas":
        from tip_tpu.ops.pallas_segment import typed_neighbor_sum_padded_t

        # Transposed kernel layout [n_et, d, n] — the basis einsums contract
        # it directly; see ops/pallas_segment.py:typed_neighbor_sum_padded_t.
        pt = typed_neighbor_sum_padded_t(
            x, src2d, dst2d, chunk_type, n_et, jnp.dtype(kernel_dtype)
        )
        q = jnp.einsum("tb,tdn->bdn", params["att"], pt)
        if axis_name is not None:
            q = jax.lax.psum(q, axis_name)
        agg = jnp.einsum("bdn,bde->ne", q, params["basis"])
    else:
        chunk = src2d.shape[1]
        src = src2d.reshape(-1)
        dst = dst2d.reshape(-1)
        et = jnp.repeat(chunk_type, chunk)
        seg = et.astype(jnp.int32) * (n_nodes + 1) + dst
        flat = jax.ops.segment_sum(
            x[src], seg, num_segments=n_et * (n_nodes + 1), indices_are_sorted=True
        )
        p = flat.reshape(n_et, n_nodes + 1, x.shape[-1])[:, :n_nodes, :]
        q = jnp.einsum("tb,tnd->bnd", params["att"], p)
        if axis_name is not None:
            q = jax.lax.psum(q, axis_name)
        agg = jnp.einsum("bnd,bde->ne", q, params["basis"])
    out = mean_from_sum(agg, degree) + x @ params["root"]
    if "bias" in params:
        out = out + params["bias"]
    return out
