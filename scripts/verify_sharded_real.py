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

Usage: python scripts/verify_sharded_real.py [out.json]
(takes several minutes on CPU; writes the parity numbers, chunk balance,
step times and eval to the JSON artifact — default
runs/verify_sharded_real.json)
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
    import json
    import sys

    out_path = sys.argv[1] if len(sys.argv) > 1 else "runs/verify_sharded_real.json"
    art = {}
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
    art.update(
        n_devices=n_dev, n_et=int(rgs.n_et), n_chunks=int(egs.dd_n_chunks),
        dd_chunk=int(gs.dd_chunk), n_valid_edges=int(gs.dd_n_valid),
        chunks_per_device=[int(x) for x in balance], ep_r_max=int(part.r_max),
        pp_ring_shards=int(rgs.pp_ring_shards), n_prot=int(gs.n_prot),
    )

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
    art["encode_max_abs_err"] = err

    eparams = place_params(eparams, mesh, specs)
    opt = optax.adam(0.01)
    opt_state = opt.init(eparams)
    step = make_sharded_train_step(emodel, opt, mesh, param_specs=specs)
    losses, step_secs = [], []
    for i in range(4):
        t0 = time.time()
        eparams, opt_state, loss = step(
            eparams, opt_state, egraph_p, jax.random.key(i + 1)
        )
        losses.append(float(loss))
        step_secs.append(round(time.time() - t0, 2))
        print(f"step {i}: loss {losses[-1]:.4f} ({step_secs[-1]:.1f}s)")
    assert abs(losses[0] - 2 * np.log(2)) < 0.02, losses
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses
    art["losses"] = [round(x, 6) for x in losses]
    art["step_secs_cpu_virtual_mesh"] = step_secs

    test = make_test_arrays(data)
    tn = jax.jit(emodel.sample_test_negatives)(jax.random.key(99), test)
    _, avg = jax.jit(emodel.evaluate)(eparams, egraph_p, test, tn)
    avg = {k: round(float(v), 4) for k, v in avg.items()}
    print("post-shard eval:", avg)
    art["eval_after_4_steps"] = avg
    art["ok"] = True
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print(f"artifact -> {out_path}")
    print("OK")


if __name__ == "__main__":
    main()
