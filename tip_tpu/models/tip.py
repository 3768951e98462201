"""Full tri-graph TIP model — canonical implementation lives in
tip_tpu/train/model.py; re-exported here so every model family is reachable
under tip_tpu.models (reference: src/layers.py:272-375)."""

from tip_tpu.train.model import (  # noqa: F401
    TIP,
    GraphStatic,
    make_graph_arrays,
    make_test_arrays,
)

__all__ = ["TIP", "GraphStatic", "make_graph_arrays", "make_test_arrays"]
