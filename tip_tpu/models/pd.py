"""P-D-only model (PR-HMP-NN): hierarchy encoder + per-relation NN decoder.

Equivalent of reference test/pd_net.py: drugs are embedded purely from their
protein targets — protein embedding table -> directed P->D mean-aggregation
conv (embed_dim=32, target_dim=16, reference: test/pd_net.py:57-59) — and
D-D side-effect edges are scored with the NN decoder (l1_dim=8, reference:
test/pd_net.py:86).  Negative sampling here is UNTYPED: one uniform
corruption per positive checked against the positives of ALL relations
(reference: test/pd_net.py:151 calls the untyped sampler on the whole train
index), reproduced with an any-relation pair bitmap.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tip_tpu.data.packing import TriGraphData
from tip_tpu.metrics import grouped_ranking_metrics, macro_average
from tip_tpu.nn import (
    hier_encoder_init,
    hier_encoder_apply,
    nn_decoder_init,
    nn_decoder_apply,
)
from tip_tpu.sampling import typed_negative_sampling
from tip_tpu.sampling.negative import build_key_bitmap


@dataclass(frozen=True)
class PDConfig:
    embed_dim: int = 32  # protein embedding (reference: test/pd_net.py:58)
    target_dim: int = 16  # drug dim out of the hierarchy conv
    l1_dim: int = 8  # NN decoder hidden (reference: test/pd_net.py:86)


def make_pd_graph_arrays(data: TriGraphData):
    """Flat arrays (this model is tiny — no padding/chunking needed) plus
    any-relation pair bitmaps for untyped negative sampling."""
    n = data.n_drug

    def pair_bitmap(edges):
        src, dst = edges.edge_index.astype(np.int64)
        keys = np.unique(dst * n + src)
        return build_key_bitmap(keys, n * n)

    graph = {
        "dp_src": jnp.asarray(data.dp_edge_index[0]),
        "dp_dst": jnp.asarray(data.dp_edge_index[1]),
        "dp_deg": jnp.asarray(data.dp_drug_deg),
        "dd_src": jnp.asarray(data.dd_train.edge_index[0]),
        "dd_dst": jnp.asarray(data.dd_train.edge_index[1]),
        "dd_et": jnp.asarray(data.dd_train.edge_type),
        "pair_bitmap": jnp.asarray(pair_bitmap(data.dd_train)),
    }
    test = {
        "src": jnp.asarray(data.dd_test.edge_index[0]),
        "dst": jnp.asarray(data.dd_test.edge_index[1]),
        "et": jnp.asarray(data.dd_test.edge_type),
        "pair_bitmap": jnp.asarray(pair_bitmap(data.dd_test)),
    }
    return graph, test


@dataclass(frozen=True)
class PDModel:
    cfg: PDConfig
    n_drug: int
    n_prot: int
    n_et: int

    @staticmethod
    def for_data(cfg: PDConfig, data: TriGraphData) -> "PDModel":
        return PDModel(
            cfg=cfg, n_drug=data.n_drug, n_prot=data.n_prot, n_et=data.n_et
        )

    def init(self, key) -> dict:
        k_e, k_d = jax.random.split(key)
        return {
            "encoder": hier_encoder_init(
                k_e, self.n_prot, self.cfg.embed_dim, self.cfg.target_dim
            ),
            "decoder": nn_decoder_init(
                k_d, self.cfg.target_dim, self.n_et, self.cfg.l1_dim
            ),
        }

    def encode(self, params, graph):
        return hier_encoder_apply(params["encoder"], graph, self.n_drug)

    def _sample(self, key, n_samples, bitmap):
        # untyped: relation 0 over the any-relation pair bitmap
        return typed_negative_sampling(
            key, jnp.zeros(n_samples, jnp.int32), bitmap, self.n_drug
        )

    def loss(self, params, graph, key):
        z = self.encode(params, graph)
        ns, nd = self._sample(key, graph["dd_src"].shape[0], graph["pair_bitmap"])
        pos_l = nn_decoder_apply(
            params["decoder"], z, graph["dd_src"], graph["dd_dst"], graph["dd_et"],
            sigmoid=False,
        )
        neg_l = nn_decoder_apply(
            params["decoder"], z, ns, nd, graph["dd_et"], sigmoid=False
        )
        return jnp.mean(jax.nn.softplus(-pos_l)) + jnp.mean(jax.nn.softplus(neg_l))

    def sample_test_negatives(self, key, test):
        ns, nd = self._sample(key, test["src"].shape[0], test["pair_bitmap"])
        return {"src": ns, "dst": nd}

    def evaluate(self, params, graph, test, test_neg):
        z = self.encode(params, graph)
        pos = nn_decoder_apply(
            params["decoder"], z, test["src"], test["dst"], test["et"]
        )
        neg = nn_decoder_apply(
            params["decoder"], z, test_neg["src"], test_neg["dst"], test["et"]
        )
        per_rel = grouped_ranking_metrics(pos, neg, test["et"], self.n_et)
        return per_rel, macro_average(per_rel)
