"""Protein-row ring decomposition of the P-P GCN (SP/CP-analog).

The reference's P-P encoder is a full-graph SpMM over the 19,081-protein /
1.43M-nnz adjacency on one device (reference: src/layers.py:391-394).  On a
TPU mesh the rows are partitioned instead: each chip owns a contiguous shard
of protein rows, and the SpMM runs as a **ring** — at step ``s`` chip ``i``
multiplies its local adjacency block ``A[rows_i, rows_{(i+s) mod k}]``
against the activation shard it currently holds, then passes that shard to
its ring neighbor with ``lax.ppermute`` over ICI.  After ``k`` steps every
output row has seen every source shard; activations move (k-1 hops of
``n_prot/k x d`` — ~300 KB at Decagon scale), the adjacency never does.
XLA's async collective-permute overlaps each hop with the current block's
gather/segment-sum, which is the communication/compute overlap SURVEY.md
section 2.4 calls for.

Block layout (host-side, :func:`build_ring_pp`): edges are binned by
(dst_shard, (src_shard - dst_shard) mod k), sorted by local dst within each
bin, and padded to one static block size so the scan body has static shapes.
The protein->drug hierarchy conv consumes the row-sharded output directly:
each chip partially aggregates its local protein rows into the replicated
drug rows and one psum completes the mean (:func:`ring_hierarchy_apply`) —
the full protein embedding is never materialized on any single chip.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tip_tpu.ops import mean_from_sum, segment_sum_sorted


def ring_shard_size(n_rows: int, n_shards: int) -> int:
    return -(-n_rows // n_shards)


@dataclass(frozen=True)
class RingPP:
    """Host-packed ring blocks; all arrays lead with the shard axis."""

    src_local: np.ndarray  # [k, k, E_pad] int32, row within the SOURCE shard
    dst_local: np.ndarray  # [k, k, E_pad] int32, row within the DEST shard
    weight: np.ndarray  # [k, k, E_pad] f32, 0 on padding
    dp_src_local: np.ndarray  # [k, Edp_pad] int32
    dp_dst: np.ndarray  # [k, Edp_pad] int32 (global drug row)
    dp_weight: np.ndarray  # [k, Edp_pad] f32 valid mask
    n_shards: int
    n_local: int  # protein rows per shard (last shard padded)


def build_ring_pp(
    norm_index: np.ndarray,
    norm_weight: np.ndarray,
    dp_edge_index: np.ndarray,
    n_prot: int,
    n_shards: int,
    pad_multiple: int = 512,  # = the RDMA kernel's inner chunk size
) -> RingPP:
    """Bin the cached-normalized P-P COO + the P->D edges into ring blocks.

    Block (i, s) holds the edges whose destination row lives in shard i and
    whose source row lives in shard (i + s) mod k; within a block edges are
    sorted by local destination so the device-side reduction is a sorted
    segment-sum.
    """
    k = n_shards
    n_local = ring_shard_size(n_prot, k)
    src, dst = np.asarray(norm_index, np.int64)
    w = np.asarray(norm_weight, np.float32)
    ss, ds = src // n_local, dst // n_local
    step = (ss - ds) % k
    bin_id = ds * k + step
    order = np.lexsort((dst, bin_id))
    src, dst, w, bin_id = src[order], dst[order], w[order], bin_id[order]
    counts = np.bincount(bin_id, minlength=k * k)
    e_pad = max(int(counts.max()), 1)
    e_pad = -(-e_pad // pad_multiple) * pad_multiple
    src_l = np.zeros((k * k, e_pad), np.int32)
    dst_l = np.zeros((k * k, e_pad), np.int32)
    w_p = np.zeros((k * k, e_pad), np.float32)
    offs = np.concatenate([[0], np.cumsum(counts)])
    for b in range(k * k):
        lo, hi = offs[b], offs[b + 1]
        n = hi - lo
        src_l[b, :n] = (src[lo:hi] % n_local).astype(np.int32)
        dst_l[b, :n] = (dst[lo:hi] % n_local).astype(np.int32)
        w_p[b, :n] = w[lo:hi]

    # P->D edges binned by source (protein) shard, sorted by drug dst.
    dsrc, ddst = np.asarray(dp_edge_index, np.int64)
    pshard = dsrc // n_local
    order = np.lexsort((ddst, pshard))
    dsrc, ddst, pshard = dsrc[order], ddst[order], pshard[order]
    dcounts = np.bincount(pshard, minlength=k)
    dp_pad = -(-max(int(dcounts.max()), 1) // pad_multiple) * pad_multiple
    dp_src_l = np.zeros((k, dp_pad), np.int32)
    dp_dst = np.zeros((k, dp_pad), np.int32)
    dp_w = np.zeros((k, dp_pad), np.float32)
    doffs = np.concatenate([[0], np.cumsum(dcounts)])
    for i in range(k):
        lo, hi = doffs[i], doffs[i + 1]
        n = hi - lo
        dp_src_l[i, :n] = (dsrc[lo:hi] % n_local).astype(np.int32)
        dp_dst[i, :n] = ddst[lo:hi].astype(np.int32)
        dp_w[i, :n] = 1.0
    return RingPP(
        src_local=src_l.reshape(k, k, e_pad),
        dst_local=dst_l.reshape(k, k, e_pad),
        weight=w_p.reshape(k, k, e_pad),
        dp_src_local=dp_src_l,
        dp_dst=dp_dst,
        dp_weight=dp_w,
        n_shards=k,
        n_local=n_local,
    )


def add_ring_pp(graph: dict, data, gs, n_shards: int, dense_pp=None):
    """Attach ring-sharded P-P / P->D buffers to a packed graph dict.

    Returns (graph', gs') where gs'.pp_ring_shards = n_shards; the new keys
    ("ppr_*", "dpr_*", "pp_a1r") are sharded along their leading shard axis
    by parallel/sharded.py.  The replicated P-P layouts stay in the dict so
    the un-sharded eval path keeps working.

    ``dense_pp``: also ship the ROW-SHARDED dense bf16 (A+I)
    (``pp_a1r`` [n_shards * n_local, n_prot] + replicated ``pp_dinv``) so
    the sharded encoder runs the same dense GEMM fast path as the
    single-chip one, each device streaming only its row block
    (parallel/ring.py:ring_pp_encoder_apply_dense).  None = auto
    (feasibility + no duplicate edges, the single-device policy,
    data/packing.py:dense_pp_feasible).
    """
    import dataclasses

    import jax.numpy as jnp

    ring = build_ring_pp(
        data.pp_norm_index, data.pp_norm_weight, data.dp_edge_index,
        gs.n_prot, n_shards,
    )
    g = dict(graph)
    g["ppr_src"] = jnp.asarray(ring.src_local)
    g["ppr_dstl"] = jnp.asarray(ring.dst_local)
    g["ppr_w"] = jnp.asarray(ring.weight)
    g["dpr_srcl"] = jnp.asarray(ring.dp_src_local)
    g["dpr_dst"] = jnp.asarray(ring.dp_dst)
    g["dpr_w"] = jnp.asarray(ring.dp_weight)
    if dense_pp is None:
        from tip_tpu.data.packing import dense_pp_feasible

        dense_pp = dense_pp_feasible(gs.n_prot)
    if dense_pp:
        from tip_tpu.data.packing import dense_pp_parts

        try:
            a1, dinv = dense_pp_parts(data.pp_norm_index, gs.n_prot)
        except ValueError:  # duplicate P-P edges: 0/1 can't hold them
            a1 = None
        if a1 is not None:
            pad = n_shards * ring.n_local - a1.shape[0]
            if pad:
                a1 = np.pad(a1, ((0, pad), (0, 0)))  # zero rows: inert
            g["pp_a1r"] = jnp.asarray(a1)
            g["pp_dinv"] = jnp.asarray(dinv)
    return g, dataclasses.replace(gs, pp_ring_shards=n_shards)


def _ring_perm(k: int):
    # Chip i holds shard (i+s)%k at step s; to advance, j sends to (j-1)%k.
    return [(j, (j - 1) % k) for j in range(k)]


def ring_spmm(h_own, src_l, dst_l, w, n_local: int, axis_name: str):
    """out[rows_i] = sum_s A[rows_i, rows_(i+s)] @ h[rows_(i+s)]  per chip.

    h_own: [n_local, d] — this chip's own source-row shard.
    src_l/dst_l/w: [k, E_pad] — this chip's ring blocks, step-major.
    Runs k steps of (gather * weight -> sorted segment-sum) with the
    activation shard ppermuted between steps.
    """
    k = src_l.shape[0]

    def body(carry, blk):
        out, h = carry
        sl, dl, ww = blk
        out = out + segment_sum_sorted(h[sl] * ww[:, None], dl, n_local)
        h = jax.lax.ppermute(h, axis_name, perm=_ring_perm(k))
        return (out, h), None

    # The accumulator must be device-varying from step 0 so the scan carry
    # type stays stable under shard_map's varying-axis checking.
    out0 = jax.lax.pcast(
        jnp.zeros((n_local, h_own.shape[1]), h_own.dtype), axis_name,
        to="varying",
    )
    (out, _), _ = jax.lax.scan(body, (out0, h_own), (src_l, dst_l, w))
    return out


def local_rows(x, axis_name: str, n_shards: int, n_local: int):
    """This chip's row shard of a replicated [n_rows, d] array (zero-padded)."""
    i = jax.lax.axis_index(axis_name)
    pad = n_shards * n_local - x.shape[0]
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return jax.lax.dynamic_slice_in_dim(x, i * n_local, n_local, axis=0)


def ring_pp_encoder_apply(params, graph, gs, axis_name: str,
                          backend: str = "xla", x_prot=None):
    """Row-sharded 2-layer P-P GCN; returns hp_local [n_local, pp_hid2].

    Identity protein features (``x_prot=None``, the default data path,
    reference: prepare.py:22-23): layer 1's weight matrix IS the per-protein
    activation table, so each chip slices its own weight rows and no feature
    matmul happens (same fast path as nn/gcn.py:gcn_conv_apply with x=None).
    With a feature matrix, each chip projects only its own row shard —
    ``local_rows(x_prot) @ W1`` — before the ring; the full [n_prot, d]
    activation is still never materialized on one chip.

    backend 'pallas' rotates the activation shard with the in-kernel remote
    DMA ring (ops/pallas_ring.py, overlap owned by the kernel); 'xla' uses
    the lax.scan + ppermute oracle below.
    """
    k, n_local = gs.pp_ring_shards, ring_shard_size(gs.n_prot, gs.pp_ring_shards)
    blocks = (graph["ppr_src"][0], graph["ppr_dstl"][0], graph["ppr_w"][0])
    if backend == "pallas":
        from tip_tpu.ops.pallas_ring import ring_spmm_rdma

        spmm = lambda h: ring_spmm_rdma(h, *blocks, axis_name)
    else:
        spmm = lambda h: ring_spmm(h, *blocks, n_local=n_local,
                                   axis_name=axis_name)
    if x_prot is None:
        h = local_rows(params["conv1"]["weight"], axis_name, k, n_local)
    else:
        h = local_rows(x_prot, axis_name, k, n_local) @ params["conv1"]["weight"]
    h = spmm(h)
    h = jax.nn.relu(h + params["conv1"]["bias"])
    h = h @ params["conv2"]["weight"]
    h = spmm(h)
    return h + params["conv2"]["bias"]


def ring_pp_encoder_apply_dense(params, graph, gs, axis_name: str,
                                x_prot=None):
    """Row-sharded 2-layer P-P GCN over the dense bf16 (A+I) row block.

    Each device holds ``pp_a1r`` rows [n_local, n_prot] (the dense
    counterpart of the COO ring blocks; same n_local row layout, so the
    P->D buffers of :func:`ring_hierarchy_apply` consume the output
    directly) and computes

        out_local = dinv_local * (A1_local @ (dinv * (x @ W)))

    exactly like nn/gcn.py:gcn_conv_apply_dense but for its row shard.
    Layer 1 under identity features needs NO communication (the weight
    table is replicated); layer 2 all-gathers the [n_prot, d] hidden
    (~2.4 MB at Decagon scale — ICI, trivial next to the per-device
    adjacency stream it unlocks).  Returns hp_local [n_local, pp_hid2].
    """
    k = gs.pp_ring_shards
    n_local = ring_shard_size(gs.n_prot, k)
    a1l = graph["pp_a1r"]  # [n_local, n_prot] under shard_map
    dinv = graph["pp_dinv"]  # [n_prot] replicated
    dinv_l = local_rows(dinv[:, None], axis_name, k, n_local)

    def conv_local(xw_full, bias):
        g = xw_full * dinv[: xw_full.shape[0], None]
        # int8 row blocks upcast to bf16 inside the dot (fused convert —
        # see nn/gcn.py:gcn_conv_apply_dense)
        cdt = jnp.bfloat16 if a1l.dtype == jnp.int8 else a1l.dtype
        if cdt != jnp.float32 and jax.default_backend() == "cpu":
            out = a1l.astype(jnp.float32) @ g.astype(cdt).astype(
                jnp.float32)
        else:
            out = jnp.matmul(
                a1l.astype(cdt), g.astype(cdt),
                preferred_element_type=jnp.float32,
            )
        out = out * dinv_l
        return out if bias is None else out + bias

    if x_prot is None:
        xw = params["conv1"]["weight"]  # identity features: table = activation
    else:
        xw = x_prot @ params["conv1"]["weight"]
    h_local = jax.nn.relu(conv_local(xw, params["conv1"]["bias"]))
    # layer 2 needs all source rows of the hidden: gather the row shards
    h_full = jax.lax.all_gather(h_local, axis_name, tiled=True)[: gs.n_prot]
    return conv_local(
        h_full @ params["conv2"]["weight"], params["conv2"]["bias"]
    )


def ring_hierarchy_apply(params, hp_local, graph, dp_deg, n_drug: int,
                         axis_name: str):
    """P->D mean-conv from the row-sharded protein embedding.

    Each chip scatters its local protein rows into the (replicated) drug
    rows; one psum completes the cross-shard sum before the mean division
    and dense projection (reference semantics: src/layers.py:229-242)."""
    sl = graph["dpr_srcl"][0]
    dst = graph["dpr_dst"][0]
    w = graph["dpr_w"][0]
    part = segment_sum_sorted(hp_local[sl] * w[:, None], dst, n_drug)
    total = jax.lax.psum(part, axis_name)
    return mean_from_sum(total, dp_deg) @ params["weight"]
