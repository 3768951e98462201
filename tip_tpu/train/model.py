"""TIP model assembly: tri-graph encoder + multi-relational decoder.

Equivalent of the reference's ``TIP`` training framework class
(reference: src/layers.py:272-375), as a thin static-config object over
pure functions: parameters are a pytree, the graph is a pytree of device
arrays, every method is jit-compatible.  Differences by design:

  * negative sampling happens ON DEVICE inside the jitted step
    (reference round-trips to numpy each step, src/neg_sampling.py:8);
  * evaluation metrics are computed on device for all relations at once
    (reference: 1,097 sklearn calls, src/layers.py:355-375);
  * the fixed test negatives are sampled once from a dedicated PRNG key
    (reference samples them once at init, src/layers.py:293).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tip_tpu.config import ModelConfig
from tip_tpu.data.packing import TriGraphData
from tip_tpu.metrics import grouped_ranking_metrics, macro_average
from tip_tpu.nn import (
    distmult_apply,
    distmult_init,
    fm_encoder_apply,
    fm_encoder_init,
    nn_decoder_apply,
    nn_decoder_init,
)
from tip_tpu.sampling import typed_negative_sampling

EPS = 1e-13  # loss epsilon (reference: src/layers.py:15)


def make_graph_arrays(data: TriGraphData) -> dict:
    """Device pytree of the training graph (passed as a jit argument, not
    closed over, so the big edge buffers never bake into the executable)."""
    return {
        "pp_norm_index": jnp.asarray(data.pp_norm_index),
        "pp_norm_weight": jnp.asarray(data.pp_norm_weight),
        "dp_src": jnp.asarray(data.dp_edge_index[0]),
        "dp_dst": jnp.asarray(data.dp_edge_index[1]),
        "dp_deg": jnp.asarray(data.dp_drug_deg),
        "dd_src": jnp.asarray(data.dd_train.edge_index[0]),
        "dd_dst": jnp.asarray(data.dd_train.edge_index[1]),
        "dd_et": jnp.asarray(data.dd_train.edge_type),
        "dd_deg": jnp.asarray(data.dd_train_deg),
        "dd_train_keys": jnp.asarray(data.dd_train_keys, jnp.int32),
    }


def make_test_arrays(data: TriGraphData) -> dict:
    return {
        "src": jnp.asarray(data.dd_test.edge_index[0]),
        "dst": jnp.asarray(data.dd_test.edge_index[1]),
        "et": jnp.asarray(data.dd_test.edge_type),
        "keys": jnp.asarray(data.dd_test_keys, jnp.int32),
    }


@dataclass(frozen=True)
class TIP:
    """Static model description; all state lives in explicit pytrees."""

    cfg: ModelConfig
    n_drug: int
    n_prot: int
    n_et: int

    @staticmethod
    def for_data(cfg: ModelConfig, data: TriGraphData) -> "TIP":
        if data.n_et * data.n_drug * data.n_drug >= 2**31:
            raise ValueError(
                "relation*node^2 key space exceeds int32; enable x64 keys"
            )
        return TIP(cfg=cfg, n_drug=data.n_drug, n_prot=data.n_prot, n_et=data.n_et)

    # -- parameters ---------------------------------------------------------

    def init(self, key) -> dict:
        k_enc, k_dec = jax.random.split(key)
        params = {
            "encoder": fm_encoder_init(
                k_enc, self.cfg, self.n_drug, self.n_prot, self.n_et
            )
        }
        if self.cfg.decoder == "distmult":
            params["decoder"] = distmult_init(k_dec, self.cfg.n_hid2, self.n_et)
        else:
            params["decoder"] = nn_decoder_init(
                k_dec, self.cfg.n_hid2, self.n_et, self.cfg.nn_decoder_l1_dim
            )
        return params

    # -- forward ------------------------------------------------------------

    def encode(self, params, graph, remat: bool = False):
        """Drug embeddings z [n_drug, n_hid2] from the training graph."""
        enc = lambda p: fm_encoder_apply(
            p, graph, self.cfg, self.n_drug, self.n_prot, self.n_et
        )
        if remat:
            enc = jax.checkpoint(enc)
        return enc(params["encoder"])

    def score(self, params, z, src, dst, et, sigmoid: bool = True):
        if self.cfg.decoder == "distmult":
            return distmult_apply(params["decoder"], z, src, dst, et, sigmoid)
        return nn_decoder_apply(params["decoder"], z, src, dst, et, sigmoid)

    def loss(self, params, graph, key, remat: bool = False):
        """Full-graph BCE with one fresh negative per positive
        (reference: src/layers.py:328-342)."""
        z = self.encode(params, graph, remat=remat)
        neg_src, neg_dst = typed_negative_sampling(
            key, graph["dd_et"], graph["dd_train_keys"], self.n_drug
        )
        pos = self.score(params, z, graph["dd_src"], graph["dd_dst"], graph["dd_et"])
        neg = self.score(params, z, neg_src, neg_dst, graph["dd_et"])
        pos_loss = -jnp.log(pos + EPS).mean()
        neg_loss = -jnp.log(1.0 - neg + EPS).mean()
        return pos_loss + neg_loss

    # -- evaluation ---------------------------------------------------------

    def sample_test_negatives(self, key, test):
        neg_src, neg_dst = typed_negative_sampling(
            key, test["et"], test["keys"], self.n_drug
        )
        return {"src": neg_src, "dst": neg_dst}

    def evaluate(self, params, graph, test, test_neg):
        """Per-relation + macro AUPRC/AUROC/AP on the test split.

        Transductive setting: the encoder runs on the TRAIN graph and test
        edges are only scored (reference: src/layers.py:347-353)."""
        z = self.encode(params, graph)
        pos = self.score(params, z, test["src"], test["dst"], test["et"])
        neg = self.score(params, z, test_neg["src"], test_neg["dst"], test["et"])
        per_rel = grouped_ranking_metrics(pos, neg, test["et"], self.n_et)
        return per_rel, macro_average(per_rel)
