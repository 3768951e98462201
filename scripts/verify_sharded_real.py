"""Full-scale multi-chip validation on the virtual 8-device CPU mesh.

Drives the ENTIRE parallel stack — edge-chunk sharding (DP-analog),
protein-row ring P-P GCN (SP/CP-analog), relation-partitioned weight shards
(EP/TP-analog) — on the REAL packed Decagon graph (1,097 relations, ~8.4k
chunks at the default chunk size, 19,081 protein rows), asserting:

  * ring+EP sharded encode == replicated encode (allclose);
  * several sharded Adam steps from a fresh init hit the 2*log(2) anchor
    and decrease;
  * the unsharded eval path (slot-gather decoder) runs on the EP layout.

This is the real-scale counterpart of __graft_entry__.dryrun_multichip
(which uses a small synthetic graph so the driver can run it fast).

Usage: python scripts/verify_sharded_real.py  (takes several minutes on CPU)
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import time

import numpy as np
import optax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tip_tpu.config import ModelConfig
from tip_tpu.data import cached_trigraph, load_decagon_raw
from tip_tpu.parallel import (
    add_ring_pp,
    ep_param_specs,
    ep_params,
    ep_shard_graph,
    make_mesh,
    make_sharded_train_step,
    partition_relations,
    place_graph,
    place_params,
    shard_graph,
)
from tip_tpu.parallel.mesh import EDGE_AXIS
from tip_tpu.parallel.sharded import graph_specs
from tip_tpu.train.model import TIP, make_graph_arrays, make_test_arrays


def main() -> None:
    n_dev = len(jax.devices())
    data = cached_trigraph(load_decagon_raw(), seed=1111)
    graph, gs = make_graph_arrays(data)
    model = TIP.for_data(ModelConfig.tip_cat(), data, gs, backend="xla")
    mesh = make_mesh(n_dev)
    sgraph, _ = shard_graph(graph, gs, n_dev)
    rgraph, rgs = add_ring_pp(sgraph, data, gs, n_dev)
    part = partition_relations(
        np.asarray(rgraph["dd_chunk_type"]), rgs.n_et, n_dev
    )
    egraph, egs = ep_shard_graph(rgraph, rgs, part)
    emodel = dataclasses.replace(model, gs=egs)
    params = model.init(jax.random.key(0))
    eparams = ep_params(params, part)
    specs = ep_param_specs(eparams, EDGE_AXIS)
    egraph_p = place_graph(egraph, mesh)
    balance = np.bincount(
        part.dev_of_rel[np.asarray(rgraph["dd_chunk_type"])], minlength=n_dev
    )
    print(f"devices={n_dev} chunks/dev={balance} r_max={part.r_max} "
          f"(R={rgs.n_et})")

    z1 = np.asarray(jax.jit(model.encode)(params, graph))
    z2 = np.asarray(
        jax.jit(
            shard_map(
                lambda p, g: emodel.encode(p, g, axis_name=EDGE_AXIS),
                mesh=mesh,
                in_specs=(specs, graph_specs(egraph_p)),
                out_specs=P(),
            )
        )(eparams, egraph_p)
    )
    err = float(np.max(np.abs(z1 - z2)))
    print(f"ring+EP encode vs replicated: max abs err {err:.2e}")
    assert err < 2e-4, err

    eparams = place_params(eparams, mesh, specs)
    opt = optax.adam(0.01)
    opt_state = opt.init(eparams)
    step = make_sharded_train_step(emodel, opt, mesh, param_specs=specs)
    losses = []
    for i in range(4):
        t0 = time.time()
        eparams, opt_state, loss = step(
            eparams, opt_state, egraph_p, jax.random.key(i + 1)
        )
        losses.append(float(loss))
        print(f"step {i}: loss {losses[-1]:.4f} ({time.time() - t0:.1f}s)")
    assert abs(losses[0] - 2 * np.log(2)) < 0.02, losses
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses

    test = make_test_arrays(data)
    tn = jax.jit(emodel.sample_test_negatives)(jax.random.key(99), test)
    _, avg = jax.jit(emodel.evaluate)(eparams, egraph_p, test, tn)
    print("post-shard eval:", {k: round(float(v), 4) for k, v in avg.items()})
    print("OK")


if __name__ == "__main__":
    main()
