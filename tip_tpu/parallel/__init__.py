from tip_tpu.parallel.mesh import make_mesh
from tip_tpu.parallel.sharded import shard_graph, make_sharded_train_step

__all__ = ["make_mesh", "shard_graph", "make_sharded_train_step"]
