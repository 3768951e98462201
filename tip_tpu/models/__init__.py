"""Model families of the TIP reference, TPU-native.

  * :class:`TIP` — full tri-graph TIP-cat / TIP-add
    (canonical implementation: tip_tpu.train.model; reference: src/layers.py:272-375).
  * :mod:`tip_tpu.models.dd`  — D-D-only R-GCN with DistMult (DR-DF) or NN
    decoder (DR-NN) (reference: model/ddm-df_rgcn.py, model/ddm-nn.py).
  * :mod:`tip_tpu.models.pd`  — P-D-only hierarchy encoder + NN decoder
    (PR-HMP-NN) (reference: test/pd_net.py).
  * :mod:`tip_tpu.models.pp`  — P-P GAE: GCN encoder + inner-product
    decoder (reference: test/pp_net.py).
"""

from tip_tpu.models.dd import DDModel, DDConfig
from tip_tpu.models.pd import PDModel, PDConfig
from tip_tpu.models.pp import PPModel, PPConfig
from tip_tpu.train.model import TIP

__all__ = [
    "TIP",
    "DDModel",
    "DDConfig",
    "PDModel",
    "PDConfig",
    "PPModel",
    "PPConfig",
]
