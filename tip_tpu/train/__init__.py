from tip_tpu.train.model import TIP, make_graph_arrays
from tip_tpu.train.loop import train, TrainState

__all__ = ["TIP", "make_graph_arrays", "train", "TrainState"]
