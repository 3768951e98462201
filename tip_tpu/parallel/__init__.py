"""Multi-chip layer: mesh + shard_map collectives (SURVEY.md section 2.4).

  * :mod:`sharded` — edge-chunk sharding of the D-D multigraph (DP-analog),
    sharded train step, graph placement.
  * :mod:`ring`    — protein-row ring decomposition of the P-P GCN
    (SP/CP-analog, ppermute over ICI).
  * :mod:`ep`      — relation-partitioned weight sharding (EP/TP-analog).
"""

from tip_tpu.parallel.mesh import make_mesh
from tip_tpu.parallel.sharded import (
    make_sharded_train_step,
    place_graph,
    place_params,
    shard_graph,
)
from tip_tpu.parallel.ring import add_ring_pp
from tip_tpu.parallel.ep import (
    ep_param_specs,
    ep_params,
    ep_shard_graph,
    partition_relations,
    unep_params,
)

__all__ = [
    "make_mesh",
    "shard_graph",
    "make_sharded_train_step",
    "place_graph",
    "place_params",
    "add_ring_pp",
    "ep_shard_graph",
    "ep_params",
    "ep_param_specs",
    "unep_params",
    "partition_relations",
]
