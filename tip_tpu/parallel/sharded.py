"""Edge-sharded multi-chip training step (shard_map + XLA collectives).

Sharding layout (SURVEY.md section 2.4 — the TPU-native replacement for the
parallelism the reference lacks entirely):

  * **Edge/relation sharding (DP/EP-analog).** The D-D multigraph's
    chunk-aligned edge buffer is split evenly across the mesh's ``edges``
    axis.  R-GCN aggregation is linear in edge contributions, so each chip
    bins only its local chunks and ONE psum of the basis-mixed
    [num_base, n_drug, d_in] intermediate (a few MB) reconstructs the global
    aggregate — the per-relation binning (hundreds of MB) never crosses ICI.
  * **Decoder/loss sharding.** Each chip scores and negative-samples its
    local chunk shard; masked log-likelihood sums psum into the global loss.
  * The P-P encoder and P->D hand-off are computed replicated (1.3M edges,
    milliseconds) — sharding them buys nothing at this model scale; the
    protein-row ring decomposition is reserved for larger graphs.
  * Parameters are replicated; gradients arrive already globally summed
    because AD flows through the loss psum.  Adam updates run replicated.

Everything compiles under one jit; the driver validates this path on a
virtual N-device CPU mesh (see __graft_entry__.py:dryrun_multichip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from tip_tpu.parallel.mesh import EDGE_AXIS


# Graph-dict keys sharded along their leading axis (D-D chunk axis for the
# dd_* buffers, the protein-row shard axis for the ring ppr_*/dpr_* buffers
# built by parallel/ring.py); all others are replicated.
_SHARDED_KEYS = (
    "dd_src2d", "dd_dst2d", "dd_chunk_type", "dd_chunk_type_local", "dd_valid",
    "ppr_src", "ppr_dstl", "ppr_w", "dpr_srcl", "dpr_dst", "dpr_w",
    # dense fast-path shards: EP relation pages (parallel/ep.py) and the
    # ring-row-sharded dense (A+I) (parallel/ring.py)
    "dd_adj_t", "dd_neg_q", "dd_adj_sym", "dd_neg_q8", "pp_a1r",
)


def shard_graph(graph: dict, gs, n_devices: int):
    """Pad the D-D chunk axis to a multiple of n_devices.

    Padding chunks are assigned relation n_et-1 with all-padding rows
    (dst = n_drug => zero one-hot rows, valid = 0), so they contribute
    nothing to aggregation or loss.  Returns (graph', n_chunks_padded).
    """
    n_chunks = graph["dd_chunk_type"].shape[0]
    # The single-device dense buffers are replicated layouts: under
    # shard_map they would cost a full HBM copy per device and the dense
    # branches would double-count — drop them here.  Their SHARDED
    # counterparts are re-attached downstream: EP relation pages
    # dd_adj_t/dd_neg_q by parallel/ep.py:ep_shard_graph and the row-sharded
    # pp_a1r by parallel/ring.py:add_ring_pp, so the sharded step runs the
    # same dense fast paths per-device.
    # (pp_dinv survives: it is a tiny [n_prot] diagonal the row-sharded
    # dense P-P path reuses, harmless replicated.)
    graph = {
        k: v for k, v in graph.items()
        if k not in ("dd_adj_t", "dd_neg_q", "dd_adj_sym", "dd_neg_q8",
                     "pp_a1")
    }
    pad = (-n_chunks) % n_devices
    if pad == 0:
        return dict(graph), n_chunks
    g = dict(graph)
    chunk = graph["dd_src2d"].shape[1]
    g["dd_src2d"] = jnp.concatenate(
        [g["dd_src2d"], jnp.zeros((pad, chunk), jnp.int32)]
    )
    g["dd_dst2d"] = jnp.concatenate(
        [g["dd_dst2d"], jnp.full((pad, chunk), gs.n_drug, jnp.int32)]
    )
    g["dd_chunk_type"] = jnp.concatenate(
        [g["dd_chunk_type"], jnp.full((pad,), gs.n_et - 1, jnp.int32)]
    )
    valid2d = g["dd_valid"].reshape(n_chunks, chunk)
    g["dd_valid"] = jnp.concatenate(
        [valid2d, jnp.zeros((pad, chunk), valid2d.dtype)]
    ).reshape(-1)
    return g, n_chunks + pad


# Ring-subsystem keys (parallel/ring.py): sharded on the RING axis of a
# 2-D mesh, on the one axis of a 1-D mesh.
_RING_KEYS = ("ppr_src", "ppr_dstl", "ppr_w", "dpr_srcl", "dpr_dst",
              "dpr_w", "pp_a1r")


def graph_specs(graph: dict, axes=EDGE_AXIS, ring_axis=None):
    """PartitionSpec per graph entry: chunk-axis keys sharded over ``axes``
    (a name or a tuple — on a 2-D mesh the D-D chunk/EP shard flattens over
    BOTH axes), ring keys over ``ring_axis``, rest replicated."""
    ring_axis = ring_axis or axes
    return {
        k: (P(ring_axis) if k in _RING_KEYS
            else P(axes) if k in _SHARDED_KEYS or k == "dd_valid"
            else P())
        for k in graph
    }


def mesh_graph_specs(graph: dict, mesh):
    from tip_tpu.parallel.mesh import mesh_axes

    axes, ring_axis, _ = mesh_axes(mesh)
    return graph_specs(graph, axes=axes, ring_axis=ring_axis)


def place_graph(graph: dict, mesh):
    """Device_put the graph with its sharding layout (host -> mesh)."""
    specs = mesh_graph_specs(graph, mesh)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in graph.items()
    }


def make_sharded_train_step(model, opt, mesh, remat: bool = False,
                            param_specs=None):
    """Jitted (params, opt_state, graph, key) -> (params', opt_state', loss).

    ``graph`` must be pre-padded with :func:`shard_graph`.  The valid mask is
    sharded as [n_chunks * chunk] flat — shard_map splits it evenly, which
    coincides with the chunk split because chunk counts divide evenly.

    ``param_specs``: optional PartitionSpec pytree matching ``params`` for
    EP-sharded relation weights (parallel/ep.py:ep_param_specs); gradients
    of sharded leaves stay device-local, and the elementwise Adam update
    runs on the sharded layout without communication.  None = all params
    replicated.
    """

    from tip_tpu.parallel.mesh import mesh_axes

    axes, _, _ = mesh_axes(mesh)

    def local_grads(params, graph, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, graph, key, remat=remat, axis_name=axes)
        )(params)
        return loss, grads

    p_specs = P() if param_specs is None else param_specs

    def step(params, opt_state, graph, key):
        specs = mesh_graph_specs(graph, mesh)
        loss, grads = shard_map(
            local_grads,
            mesh=mesh,
            in_specs=(p_specs, specs, P()),
            out_specs=(P(), p_specs),
        )(params, graph, key)
        import optax

        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step)


def place_params(params, mesh, param_specs):
    """Device_put a params pytree with per-leaf PartitionSpecs."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, param_specs,
    )
