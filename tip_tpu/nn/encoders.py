"""Tri-graph encoders: P-P GCN, the full tri-graph FMEncoder, and the
P-D-only HierEncoder.

Equivalents of the reference's PPEncoder / FMEncoder / HierEncoder
(reference: src/layers.py:380-575), as pure init/apply function pairs over a
``graph`` dict of device arrays (built by train/model.py):

    pp_norm_index [2, Epp'] , pp_norm_weight [Epp']   cached GCN normalization
    dp_src, dp_dst [Edp], dp_deg [n_drug]             protein->drug edges
    dd_src, dd_dst, dd_et [E], dd_deg [n_drug]        (type, dst)-sorted D-D

The default data path uses identity node features (reference: prepare.py:22-23),
so protein features enter as ``None`` (GCN layer 1 acts as an embedding) and
the drug "feature matmul" (reference: src/layers.py:532) degenerates to the
embedding table itself.  The general feature path (``x_drug``/``x_prot``
given) is kept for mono-feature experiments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tip_tpu.config import ModelConfig
from tip_tpu.nn import initializers as init
from tip_tpu.nn.gcn import gcn_conv_init, gcn_conv_apply
from tip_tpu.nn.hierarchy import hierarchy_conv_init, hierarchy_conv_apply
from tip_tpu.nn.rgcn import rgcn_init, rgcn_apply


# ---------------------------------------------------------------------------
# PPEncoder: 2-layer GCN on the protein-protein graph
# ---------------------------------------------------------------------------


def pp_encoder_init(key, in_dim: int, hid1: int = 32, hid2: int = 16):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": gcn_conv_init(k1, in_dim, hid1),
        "conv2": gcn_conv_init(k2, hid1, hid2),
    }


def pp_encoder_apply(params, x_prot, norm_index, norm_weight, n_prot: int):
    """x_prot=None => identity-features fast path (reference: src/layers.py:391-395)."""
    h = gcn_conv_apply(params["conv1"], x_prot, norm_index, norm_weight, n_prot)
    h = jax.nn.relu(h)
    return gcn_conv_apply(params["conv2"], h, norm_index, norm_weight, n_prot)


def pp_encoder_apply_dense(params, x_prot, a1, dinv):
    """Dense-adjacency P-P path (nn/gcn.py:gcn_conv_apply_dense)."""
    from tip_tpu.nn.gcn import gcn_conv_apply_dense

    h = gcn_conv_apply_dense(params["conv1"], x_prot, a1, dinv)
    h = jax.nn.relu(h)
    return gcn_conv_apply_dense(params["conv2"], h, a1, dinv)


def pp_encoder_apply_windowed(params, x_prot, graph, gs, kernel_dtype="float32"):
    """Pallas windowed-SpMM path over the pre-windowed P-P buffers."""
    from tip_tpu.nn.gcn import gcn_conv_apply_windowed

    args = (
        graph["ppw_src"], graph["ppw_dstl"], graph["ppw_w"],
        graph["ppw_chunk_window"], gs.pp_n_windows, gs.pp_window, gs.n_prot,
    )
    h = gcn_conv_apply_windowed(params["conv1"], x_prot, *args,
                                kernel_dtype=kernel_dtype)
    h = jax.nn.relu(h)
    return gcn_conv_apply_windowed(params["conv2"], h, *args,
                                   kernel_dtype=kernel_dtype)


# ---------------------------------------------------------------------------
# FMEncoder: the full tri-graph encoder (TIP-cat / TIP-add)
# ---------------------------------------------------------------------------


def fm_encoder_init(
    key, cfg: ModelConfig, n_drug: int, n_prot: int, n_et: int, in_dim_drug=None
):
    """in_dim_drug defaults to n_drug (identity drug features)."""
    in_dim_drug = n_drug if in_dim_drug is None else in_dim_drug
    k_pp, k_embed, k_h, k_r1, k_r2 = jax.random.split(key, 5)
    return {
        "pp": pp_encoder_init(k_pp, n_prot, cfg.pp_hid1, cfg.pp_hid2),
        # Drug embedding ~ N(0, 1) (reference: src/layers.py:552-553).
        "embed": init.normal(k_embed, (in_dim_drug, cfg.n_embed)),
        "hier": hierarchy_conv_init(k_h, cfg.pp_hid2, cfg.prot_drug_dim),
        "rgcn1": rgcn_init(
            k_r1, cfg.rgcn_in_dim, cfg.n_hid1, n_et, cfg.num_base, after_relu=False
        ),
        "rgcn2": rgcn_init(
            k_r2, cfg.n_hid1, cfg.n_hid2, n_et, cfg.num_base, after_relu=True
        ),
    }


def fm_encoder_apply(
    params,
    graph,
    cfg: ModelConfig,
    gs,
    backend: str = "xla",
    axis_name=None,
    x_drug=None,
    x_prot=None,
    d_norm=None,
):
    """Returns final drug embeddings z [n_drug, n_hid2].

    Mirrors reference FMEncoder.forward (src/layers.py:520-550): P-P GCN ->
    protein->drug hierarchy conv -> drug embedding (cat or add) -> two R-GCN
    layers with a ReLU between.  ``gs`` is the static GraphStatic metadata
    (train/model.py); ``backend`` selects the XLA segment path or the Pallas
    one-hot MXU kernels for the two sparse hot paths (P-P SpMM, D-D R-GCN).
    """
    from tip_tpu.nn.rgcn import rgcn_apply_padded

    # P-P net + P->D hand-off (no zero-padding/offset dance — direct
    # bipartite edges).
    if axis_name is not None and gs.pp_ring_shards > 0:
        # Protein-row ring decomposition: row-sharded GCN (dense row-block
        # GEMM when the bf16 (A+I) rows are shipped, else ppermute ring over
        # the COO blocks), partial P->D aggregation completed by one psum.
        from tip_tpu.parallel.ring import (
            ring_hierarchy_apply,
            ring_pp_encoder_apply,
            ring_pp_encoder_apply_dense,
        )

        # On a 2-D (ring, edges) mesh the ring subsystem lives on the
        # LEADING axis only (parallel/mesh.py:make_mesh2); the edge-chunk
        # psums below still reduce over the full ``axis_name``.
        ring_axis = (axis_name[0] if isinstance(axis_name, (tuple, list))
                     else axis_name)
        if "pp_a1r" in graph:
            hp_local = ring_pp_encoder_apply_dense(
                params["pp"], graph, gs, ring_axis, x_prot=x_prot
            )
        else:
            hp_local = ring_pp_encoder_apply(
                params["pp"], graph, gs, ring_axis, backend=backend,
                x_prot=x_prot,
            )
        hd = ring_hierarchy_apply(
            params["hier"], hp_local, graph, graph["dp_deg"], gs.n_drug,
            ring_axis,
        )
    else:
        if "pp_a1" in graph:
            # Dense bf16 (A+I) GEMM — preferred whenever shipped
            # (train/model.py:make_graph_arrays): 4x fewer FLOPs than the
            # windowed one-hot scatter at full MXU shapes.
            hp = pp_encoder_apply_dense(
                params["pp"], x_prot, graph["pp_a1"], graph["pp_dinv"]
            )
        elif backend == "pallas":
            hp = pp_encoder_apply_windowed(
                params["pp"], x_prot, graph, gs, kernel_dtype=cfg.kernel_dtype
            )
        else:
            hp = pp_encoder_apply(
                params["pp"], x_prot, graph["pp_norm_index"],
                graph["pp_norm_weight"], gs.n_prot,
            )
        hd = hierarchy_conv_apply(
            params["hier"], hp, graph["dp_src"], graph["dp_dst"],
            graph["dp_deg"], gs.n_drug,
        )
    # Drug embedding; identity features => the table itself (see module doc).
    xd = params["embed"] if x_drug is None else x_drug @ params["embed"]
    if d_norm is not None:
        xd = xd / d_norm[:, None]
    x = jnp.concatenate([xd, hd], axis=1) if cfg.mode == "cat" else xd + hd
    # D-D net
    dd = (
        graph["dd_src2d"], graph["dd_dst2d"], graph["dd_chunk_type"],
        graph["dd_deg"],
    )
    dense_adj = graph.get("dd_adj_t")
    sym_strips = graph.get("dd_adj_sym")
    if sym_strips is not None and (axis_name is None or gs.ep_r_max > 0):
        # Preferred: both layers over ONE symmetric strip-packed int8
        # stream (nn/rgcn.py:dense_rgcn_pair_apply_sym, ~3x less HBM
        # traffic than the full bf16 pages).  EP sharding partitions the
        # strips by relation like the full pages (parallel/ep.py).
        from tip_tpu.nn.rgcn import dense_rgcn_pair_apply_sym

        return dense_rgcn_pair_apply_sym(
            params["rgcn1"], params["rgcn2"], x, sym_strips,
            graph["dd_deg"], axis_name=axis_name,
        )
    if dense_adj is not None and (axis_name is None or gs.ep_r_max > 0):
        # Both layers over ONE adjacency stream (M-first reassociation;
        # nn/rgcn.py:dense_rgcn_pair_apply).  Under shard_map the adjacency
        # is EP-partitioned into per-device relation pages co-sharded with
        # the att rows (parallel/ep.py:ep_shard_graph), so each device
        # contracts its local relation block and the [n, d_out] aggregate
        # is psum'd inside the pair.
        from tip_tpu.nn.rgcn import dense_rgcn_pair_apply

        return dense_rgcn_pair_apply(
            params["rgcn1"], params["rgcn2"], x, dense_adj, graph["dd_deg"],
            axis_name=axis_name,
        )
    x = rgcn_apply_padded(
        params["rgcn1"], x, *dd, gs.n_drug, gs.n_et, backend=backend,
        axis_name=axis_name, kernel_dtype=cfg.kernel_dtype,
        dense_adj=dense_adj,
    )
    x = jax.nn.relu(x)
    return rgcn_apply_padded(
        params["rgcn2"], x, *dd, gs.n_drug, gs.n_et, backend=backend,
        axis_name=axis_name, kernel_dtype=cfg.kernel_dtype,
        dense_adj=dense_adj,
    )


# ---------------------------------------------------------------------------
# HierEncoder: P-D-only model (reference: src/layers.py:556-575)
# ---------------------------------------------------------------------------


def hier_encoder_init(key, source_dim: int, embed_dim: int, target_dim: int):
    k_e, k_h = jax.random.split(key)
    return {
        "embed": init.normal(k_e, (source_dim, embed_dim)),
        "hier": hierarchy_conv_init(k_h, embed_dim, target_dim),
    }


def hier_encoder_apply(
    params, graph, n_drug: int, x_src=None, x_norm=None
):
    x = params["embed"] if x_src is None else x_src @ params["embed"]
    if x_norm is not None:
        x = x / x_norm[:, None]
    return hierarchy_conv_apply(
        params["hier"], x, graph["dp_src"], graph["dp_dst"], graph["dp_deg"], n_drug
    )
