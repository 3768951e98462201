"""D-D-only model: drug embedding -> 2x basis R-GCN -> multi-relational decoder.

Equivalent of the reference's DR-DF / DR-NN variants (reference:
model/ddm-df_rgcn.py:38-84 with n_base=16, n_embed=16, n_hid1=32, n_hid2=16;
model/ddm-nn.py analogous with the NN decoder).  Unlike FMEncoder, these
variants apply a ReLU AFTER the second R-GCN layer too (reference:
model/ddm-df_rgcn.py:59), preserved here behind ``final_relu``.

Reuses the TIP machinery: chunk-aligned padded D-D buffers, both ops
backends, bitmap negative sampling, logit-space BCE, batched metrics.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tip_tpu.data.packing import TriGraphData, pad_typed_edges
from tip_tpu.metrics import grouped_ranking_metrics, macro_average
from tip_tpu.nn import (
    distmult_init,
    distmult_apply,
    nn_decoder_init,
    nn_decoder_apply,
    rgcn_init,
    rgcn_apply_padded,
)
from tip_tpu.nn import initializers as init
from tip_tpu.nn.decoders import distmult_apply_padded, nn_decoder_apply_padded
from tip_tpu.sampling import (
    typed_negative_sampling,
    typed_negative_sampling_chunked,
)
from tip_tpu.sampling.negative import bitmap_byte_planes
from tip_tpu.train.model import GraphStatic, resolve_backend


@dataclass(frozen=True)
class DDConfig:
    n_embed: int = 16
    n_hid1: int = 32
    n_hid2: int = 16
    num_base: int = 16
    decoder: str = "distmult"  # 'distmult' (DR-DF) | 'nn' (DR-NN)
    nn_decoder_l1_dim: int = 16
    final_relu: bool = True  # reference: model/ddm-df_rgcn.py:59
    kernel_dtype: str = "float32"  # see ModelConfig.kernel_dtype
    # 'auto' = fused Poissonized dense BCE when the dense fast path is
    # active (ops/pallas_dense_bce.py), per-slot sampler otherwise — same
    # semantics as ModelConfig.negatives
    negatives: str = "auto"

    def __post_init__(self) -> None:
        if self.decoder not in ("distmult", "nn"):
            raise ValueError(f"unknown decoder {self.decoder!r}")
        if self.negatives not in ("auto", "poisson", "sampled"):
            raise ValueError(f"unknown negatives mode {self.negatives!r}")


def make_dd_graph_arrays(data: TriGraphData, chunk: int = 1024,
                         dense_dtype: str | None = None,
                         planes: bool | None = None):
    if planes is None:
        planes = resolve_backend("auto") == "pallas"
    padded = pad_typed_edges(data.dd_train, data.n_drug, chunk=chunk)
    n_chunks = padded.chunk_type.shape[0]
    graph = {
        "dd_src2d": jnp.asarray(padded.src.reshape(n_chunks, chunk)),
        "dd_dst2d": jnp.asarray(padded.dst.reshape(n_chunks, chunk)),
        "dd_valid": jnp.asarray(padded.valid.astype("float32")),
        "dd_chunk_type": jnp.asarray(padded.chunk_type),
        "dd_deg": jnp.asarray(data.dd_train_deg),
        "dd_bitmap": jnp.asarray(data.dd_train_bitmap),
    }
    if planes:
        # see make_graph_arrays: Pallas-sampler-only view, skipped on XLA
        graph["dd_bitmap_planes"] = jnp.asarray(
            bitmap_byte_planes(data.dd_train_bitmap, data.n_et, data.n_drug)
        )
    if dense_dtype is not None:
        from tip_tpu.data.packing import (
            cast_dense_adj, dense_relation_adj, pad_dense_adj,
        )

        da = dense_relation_adj(data.dd_train, data.n_drug)
        graph["dd_adj_t"] = jnp.asarray(
            pad_dense_adj(cast_dense_adj(da, jnp.dtype(dense_dtype)))
        )
        from tip_tpu.data.packing import poisson_neg_thresholds

        graph["dd_neg_q"] = jnp.asarray(
            poisson_neg_thresholds(data.dd_train, data.n_drug)
        )
        if jnp.dtype(dense_dtype) == jnp.bfloat16:
            # symmetric strip layout — same gating and consumers as the
            # TIP graph (train/model.py:make_graph_arrays)
            from tip_tpu.data.packing import (
                poisson_neg_thresholds_sym, sym_strip_pack,
            )

            try:
                graph["dd_adj_sym"] = jnp.asarray(sym_strip_pack(da))
                graph["dd_neg_q8"] = jnp.asarray(
                    poisson_neg_thresholds_sym(data.dd_train, data.n_drug)
                )
            except ValueError:
                pass
    if data.drug_feat is not None:
        graph["drug_feat"] = jnp.asarray(data.drug_feat)
    if data.d_norm is not None:
        graph["d_norm"] = jnp.asarray(data.d_norm)
    gs = GraphStatic(
        n_drug=data.n_drug, n_prot=data.n_prot, n_et=data.n_et,
        dd_chunk=chunk, dd_n_chunks=n_chunks, dd_n_valid=padded.n_valid,
        pp_window=0, pp_n_windows=0,
        drug_feat_dim=(0 if data.drug_feat is None else data.drug_feat.shape[1]),
    )
    return graph, gs


@dataclass(frozen=True)
class DDModel:
    cfg: DDConfig
    gs: GraphStatic
    backend: str = "xla"

    @staticmethod
    def for_data(cfg: DDConfig, gs: GraphStatic, backend: str = "auto") -> "DDModel":
        return DDModel(cfg=cfg, gs=gs, backend=resolve_backend(backend))

    def init(self, key) -> dict:
        cfg, gs = self.cfg, self.gs
        k_e, k_r1, k_r2, k_d = jax.random.split(key, 4)
        # With mono features the embedding projects [identity | mono] rows
        # (reference: model/ddm-df_rgcn.py:41,51 — x @ embed with
        # in_dim = n_drug + n_mono); identity features degenerate to a table.
        params = {
            "embed": init.normal(k_e, (gs.drug_feat_dim or gs.n_drug, cfg.n_embed)),
            "rgcn1": rgcn_init(
                k_r1, cfg.n_embed, cfg.n_hid1, gs.n_et, cfg.num_base, after_relu=False
            ),
            "rgcn2": rgcn_init(
                k_r2, cfg.n_hid1, cfg.n_hid2, gs.n_et, cfg.num_base, after_relu=True
            ),
        }
        if cfg.decoder == "distmult":
            params["decoder"] = distmult_init(k_d, cfg.n_hid2, gs.n_et)
        else:
            params["decoder"] = nn_decoder_init(
                k_d, cfg.n_hid2, gs.n_et, cfg.nn_decoder_l1_dim
            )
        return params

    def encode(self, params, graph, axis_name=None):
        gs = self.gs
        dd = (
            graph["dd_src2d"], graph["dd_dst2d"], graph["dd_chunk_type"],
            graph["dd_deg"],
        )
        x = params["embed"]
        if "drug_feat" in graph:
            x = graph["drug_feat"] @ x
        if "d_norm" in graph:
            x = x / graph["d_norm"][:, None]
        dense_adj = graph.get("dd_adj_t")
        sym_strips = graph.get("dd_adj_sym")
        if sym_strips is not None and axis_name is None:
            # symmetric strip stream (nn/rgcn.py:dense_rgcn_pair_apply_sym
            # — same fast path as the TIP encoder)
            from tip_tpu.nn.rgcn import dense_rgcn_pair_apply_sym

            x = dense_rgcn_pair_apply_sym(
                params["rgcn1"], params["rgcn2"], x, sym_strips,
                graph["dd_deg"],
            )
            return jax.nn.relu(x) if self.cfg.final_relu else x
        if dense_adj is not None and axis_name is None:
            # Both layers over ONE adjacency stream (M-first reassociation,
            # nn/rgcn.py:dense_rgcn_pair_apply — same fast path as the TIP
            # encoder).
            from tip_tpu.nn.rgcn import dense_rgcn_pair_apply

            x = dense_rgcn_pair_apply(
                params["rgcn1"], params["rgcn2"], x, dense_adj,
                graph["dd_deg"],
            )
            return jax.nn.relu(x) if self.cfg.final_relu else x
        x = rgcn_apply_padded(
            params["rgcn1"], x, *dd, gs.n_drug, gs.n_et,
            backend=self.backend, axis_name=axis_name,
            kernel_dtype=self.cfg.kernel_dtype, dense_adj=dense_adj,
        )
        x = jax.nn.relu(x)
        x = rgcn_apply_padded(
            params["rgcn2"], x, *dd, gs.n_drug, gs.n_et,
            backend=self.backend, axis_name=axis_name,
            kernel_dtype=self.cfg.kernel_dtype, dense_adj=dense_adj,
        )
        return jax.nn.relu(x) if self.cfg.final_relu else x

    def score(self, params, z, src, dst, et, sigmoid=True):
        if self.cfg.decoder == "distmult":
            return distmult_apply(params["decoder"], z, src, dst, et, sigmoid)
        return nn_decoder_apply(params["decoder"], z, src, dst, et, sigmoid)

    def score_padded(self, params, z, src2d, dst2d, chunk_type, sigmoid=True):
        if self.cfg.decoder == "distmult":
            return distmult_apply_padded(
                params["decoder"], z, src2d, dst2d, chunk_type, sigmoid,
                backend=self.backend, kernel_dtype=self.cfg.kernel_dtype,
            )
        return nn_decoder_apply_padded(
            params["decoder"], z, src2d, dst2d, chunk_type, sigmoid,
            backend=self.backend, kernel_dtype=self.cfg.kernel_dtype,
        )

    def loss(self, params, graph, key, axis_name=None):
        gs = self.gs
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        z = self.encode(params, graph, axis_name=axis_name)
        fused_ok = (
            graph.get("dd_adj_t") is not None
            and self.cfg.negatives in ("auto", "poisson")
            and "dd_neg_q" in graph
            and axis_name is None
        )
        if self.cfg.negatives == "poisson" and not fused_ok:
            raise ValueError(
                "negatives='poisson' was pinned but the fused dense BCE "
                "path cannot run here (it needs the dense adjacency pages "
                "and an unsharded graph); use negatives='auto' to allow "
                "the sampled fallback"
            )
        if fused_ok:
            # Fused dense BCE (positives + in-kernel Poissonized negatives)
            # — same fast path as TIP.loss; the NN decoder's dense logits
            # are an outer SUM per relation (ops/pallas_dense_bce_nn.py).
            dec = params["decoder"]
            if self.cfg.decoder == "distmult":
                if "dd_adj_sym" in graph and "dd_neg_q8" in graph:
                    # symmetric strip layout (ops/pallas_dense_bce_sym.py)
                    if self.backend == "pallas":
                        from tip_tpu.ops.pallas_dense_bce_sym import (
                            dense_bce_sym_sum as bce_sym,
                        )
                    else:
                        from tip_tpu.ops.pallas_dense_bce_sym import (
                            dense_bce_sym_sum_xla as bce_sym,
                        )
                    total = bce_sym(
                        dec["weight"], z, graph["dd_adj_sym"],
                        graph["dd_neg_q8"], key,
                    )
                else:
                    if self.backend == "pallas":
                        from tip_tpu.ops.pallas_dense_bce import (
                            dense_bce_sum as bce,
                        )
                    else:
                        from tip_tpu.ops.pallas_dense_bce import (
                            dense_bce_sum_xla as bce,
                        )
                    total = bce(
                        dec["weight"], z, graph["dd_adj_t"],
                        graph["dd_neg_q"], key,
                    )
            else:
                if self.backend == "pallas":
                    from tip_tpu.ops.pallas_dense_bce_nn import (
                        dense_bce_nn_sum as bce_nn,
                    )
                else:
                    from tip_tpu.ops.pallas_dense_bce_nn import (
                        dense_bce_nn_sum_xla as bce_nn,
                    )
                h1 = jax.nn.relu(z @ dec["w1_l1"])
                h2 = jax.nn.relu(z @ dec["w2_l1"])
                total = bce_nn(
                    dec["w1_l2"], dec["w2_l2"], h1, h2, graph["dd_adj_t"],
                    graph["dd_neg_q"], key,
                )
            return total / float(gs.dd_n_valid)
        ns2d, nd2d = typed_negative_sampling_chunked(
            key, graph["dd_chunk_type"], graph["dd_bitmap"], gs.n_drug,
            gs.n_et, gs.dd_chunk, backend=self.backend,
            planes=graph.get("dd_bitmap_planes"),
        )
        v = graph["dd_valid"]
        dense_adj = graph.get("dd_adj_t")
        # axis_name guard: dd_adj_t is replicated under shard_map, so the
        # dense pos_sum would be double-counted by the psum below (see
        # TIP.loss); fall back to the chunk-sharded scoring path.
        if dense_adj is not None and self.cfg.decoder == "distmult" \
                and axis_name is None:
            from tip_tpu.nn.decoders import distmult_dense_pos_bce_sum

            pos_sum = distmult_dense_pos_bce_sum(
                params["decoder"]["weight"], z, dense_adj,
                kernel_dtype=self.cfg.kernel_dtype,
            )
        else:
            pos_l = self.score_padded(
                params, z, graph["dd_src2d"], graph["dd_dst2d"],
                graph["dd_chunk_type"], sigmoid=False,
            )
            pos_sum = jnp.sum(jax.nn.softplus(-pos_l) * v)
        neg_l = self.score_padded(
            params, z, ns2d, nd2d, graph["dd_chunk_type"], sigmoid=False,
        )
        total = pos_sum + jnp.sum(jax.nn.softplus(neg_l) * v)
        if axis_name is not None:
            total = jax.lax.psum(total, axis_name)
        return total / float(gs.dd_n_valid)

    def sample_test_negatives(self, key, test):
        ns, nd = typed_negative_sampling(
            key, test["et"], test["bitmap"], self.gs.n_drug
        )
        return {"src": ns, "dst": nd}

    def evaluate(self, params, graph, test, test_neg):
        z = self.encode(params, graph)
        pos = self.score(params, z, test["src"], test["dst"], test["et"])
        neg = self.score(params, z, test_neg["src"], test_neg["dst"], test["et"])
        per_rel = grouped_ranking_metrics(pos, neg, test["et"], self.gs.n_et)
        return per_rel, macro_average(per_rel)
