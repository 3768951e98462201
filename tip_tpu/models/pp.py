"""P-P GAE: 2-layer GCN encoder + inner-product link decoder.

Equivalent of reference test/pp_net.py: identity protein features ->
GCNConv(n, 32) -> relu -> GCNConv(32, 16), score(u, v) =
sigmoid(z_u . z_v), BCE against one untyped uniform negative per positive.
This is the reference's minimum end-to-end slice (BASELINE.json config 1).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tip_tpu.data.packing import TriGraphData, gcn_normalize
from tip_tpu.metrics import grouped_ranking_metrics, macro_average
from tip_tpu.nn import pp_encoder_init, pp_encoder_apply
from tip_tpu.sampling import typed_negative_sampling
from tip_tpu.sampling.negative import build_key_bitmap


@dataclass(frozen=True)
class PPConfig:
    hid1: int = 32
    hid2: int = 16


def make_pp_graph_arrays(data: TriGraphData):
    n = data.n_prot

    def pair_bitmap(edge_index):
        src, dst = edge_index.astype(np.int64)
        keys = np.unique(dst * n + src)
        return build_key_bitmap(keys, n * n)

    graph = {
        "pp_norm_index": jnp.asarray(data.pp_norm_index),
        "pp_norm_weight": jnp.asarray(data.pp_norm_weight),
        "train_src": jnp.asarray(data.pp_train[0]),
        "train_dst": jnp.asarray(data.pp_train[1]),
        "pair_bitmap": jnp.asarray(pair_bitmap(data.pp_train)),
    }
    from tip_tpu.data.packing import dense_pp_feasible

    if dense_pp_feasible(n):
        # dense bf16 (A+I) path, same regime as the tri-graph encoder
        # (data/packing.py:dense_pp_parts, nn/gcn.py:gcn_conv_apply_dense)
        from tip_tpu.data.packing import dense_pp_parts

        try:
            a1, dinv = dense_pp_parts(data.pp_norm_index, n)
        except ValueError:  # duplicate P-P edges: 0/1 can't hold them
            a1 = None
        if a1 is not None:
            graph["pp_a1"] = jnp.asarray(a1)
            graph["pp_dinv"] = jnp.asarray(dinv)
    test = {
        "src": jnp.asarray(data.pp_test[0]),
        "dst": jnp.asarray(data.pp_test[1]),
        "pair_bitmap": jnp.asarray(pair_bitmap(data.pp_test)),
    }
    return graph, test


@dataclass(frozen=True)
class PPModel:
    cfg: PPConfig
    n_prot: int

    @staticmethod
    def for_data(cfg: PPConfig, data: TriGraphData) -> "PPModel":
        if data.n_prot * data.n_prot >= 2**31:
            raise ValueError("protein pair key space exceeds int32")
        return PPModel(cfg=cfg, n_prot=data.n_prot)

    def init(self, key) -> dict:
        return {"encoder": pp_encoder_init(key, self.n_prot, self.cfg.hid1, self.cfg.hid2)}

    def encode(self, params, graph):
        if "pp_a1" in graph:
            from tip_tpu.nn.encoders import pp_encoder_apply_dense

            return pp_encoder_apply_dense(
                params["encoder"], None, graph["pp_a1"], graph["pp_dinv"]
            )
        return pp_encoder_apply(
            params["encoder"], None, graph["pp_norm_index"], graph["pp_norm_weight"],
            self.n_prot,
        )

    def _logits(self, z, src, dst):
        return jnp.sum(z[src] * z[dst], axis=-1)

    def _sample(self, key, n_samples, bitmap):
        return typed_negative_sampling(
            key, jnp.zeros(n_samples, jnp.int32), bitmap, self.n_prot
        )

    def loss(self, params, graph, key):
        z = self.encode(params, graph)
        ns, nd = self._sample(key, graph["train_src"].shape[0], graph["pair_bitmap"])
        pos_l = self._logits(z, graph["train_src"], graph["train_dst"])
        neg_l = self._logits(z, ns, nd)
        return jnp.mean(jax.nn.softplus(-pos_l)) + jnp.mean(jax.nn.softplus(neg_l))

    def sample_test_negatives(self, key, test):
        ns, nd = self._sample(key, test["src"].shape[0], test["pair_bitmap"])
        return {"src": ns, "dst": nd}

    def evaluate(self, params, graph, test, test_neg):
        z = self.encode(params, graph)
        pos = jax.nn.sigmoid(self._logits(z, test["src"], test["dst"]))
        neg = jax.nn.sigmoid(self._logits(z, test_neg["src"], test_neg["dst"]))
        et = jnp.zeros(pos.shape[0], jnp.int32)
        per = grouped_ranking_metrics(pos, neg, et, 1)
        return per, macro_average(per)
