"""TIP model assembly: tri-graph encoder + multi-relational decoder.

Equivalent of the reference's ``TIP`` training framework class
(reference: src/layers.py:272-375), as a thin static-config object over
pure functions: parameters are a pytree, the graph is a pytree of device
arrays, every method is jit-compatible.  Differences by design:

  * all D-D edge buffers are chunk-aligned padded (static shapes; the loss
    masks padding), so the same layout feeds both the XLA segment path and
    the Pallas one-hot MXU kernels — selected by ``backend``;
  * negative sampling happens ON DEVICE inside the jitted step via a packed
    membership bitmap (reference round-trips to numpy each step,
    src/neg_sampling.py:8);
  * evaluation metrics are computed on device for all relations at once
    (reference: 1,097 sklearn calls, src/layers.py:355-375);
  * the fixed test negatives are sampled once from a dedicated PRNG key
    (reference samples them once at init, src/layers.py:293).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tip_tpu.config import ModelConfig
from tip_tpu.data.packing import (
    TriGraphData,
    pad_typed_edges,
    pad_windowed_edges,
)
from tip_tpu.metrics import grouped_ranking_metrics, macro_average
from tip_tpu.nn import (
    distmult_apply,
    distmult_init,
    fm_encoder_apply,
    fm_encoder_init,
    nn_decoder_apply,
    nn_decoder_init,
)
from tip_tpu.nn.decoders import distmult_apply_padded, nn_decoder_apply_padded
from tip_tpu.sampling import (
    typed_negative_sampling,
    typed_negative_sampling_chunked,
)
from tip_tpu.sampling.negative import bitmap_byte_planes

EPS = 1e-13  # loss epsilon (reference: src/layers.py:15)


@dataclass(frozen=True)
class GraphStatic:
    """Hashable static metadata of a packed tri-graph (jit-safe)."""

    n_drug: int
    n_prot: int
    n_et: int
    dd_chunk: int
    dd_n_chunks: int
    dd_n_valid: int
    pp_window: int
    pp_n_windows: int
    drug_feat_dim: int = 0  # 0 => identity drug features
    pp_ring_shards: int = 0  # >0 => protein rows ring-sharded over the mesh
    ep_r_max: int = 0  # >0 => relation weights EP-sharded (parallel/ep.py)


def dense_rgcn_feasible(n_drug: int, n_et: int, dtype: str = "bfloat16") -> bool:
    """Whether the [n_et, n_drug, n_drug] dense relation adjacency fits a
    sane HBM budget (~2.5 GB).  True for Decagon (1097 x 645 x 645)."""
    itemsize = jnp.dtype(dtype).itemsize
    return n_et * n_drug * n_drug * itemsize <= 2.5e9


def preferred_dense_dtype(data: TriGraphData, kernel_dtype: str = "float32"):
    """Storage dtype for the dense relation adjacency, or None if infeasible.

    Prefers **bfloat16 regardless of the kernel dtype**: it halves the
    adjacency's HBM footprint and streaming traffic (the dominant encoder
    cost at Decagon scale), and is numerically FREE for the float32 path —
    the adjacency holds small integer counts (exact in bf16 up to 256, so
    exactness is verified, not assumed), and JAX's DEFAULT-precision f32
    matmul already rounds MXU inputs to bf16: encoder outputs measured
    bit-identical between f32 and bf16 adjacency storage
    (runs/probe_bf16da.out; encode fwd+bwd 38.4 -> 32.9 ms, dense positive
    BCE fwd+bwd 15.5 -> 8.2 ms).

    That freeness assumes default matmul precision: when the user pins
    ``jax_default_matmul_precision`` to float32/highest they are asking for
    true f32 matmuls, and the dense paths' ``x.astype(adj.dtype)`` casts
    WOULD round activations — so the bf16 preference is gated off there and
    float32 storage kept for a float32 kernel.  (On CPU the dense paths
    deliberately round inputs to bf16 to stay bit-identical with the TPU
    MXU path — that emulation is intentional and not gated.)
    """
    from tip_tpu.data.packing import max_multiplicity

    prec = jax.config.jax_default_matmul_precision
    f32_matmuls = str(kernel_dtype) == "float32" and prec in (
        "float32", "highest")
    limit = {"bfloat16": 256, "float32": 2**24}
    m = None
    candidates = (str(kernel_dtype),) if f32_matmuls else (
        "bfloat16", str(kernel_dtype))
    for cand in candidates:
        if not dense_rgcn_feasible(data.n_drug, data.n_et, cand):
            continue
        if m is None:
            m = max_multiplicity(data.dd_train, data.n_drug)
        if m <= limit.get(cand, 0):
            return cand
    return None


def make_graph_arrays(
    data: TriGraphData,
    dd_chunk: int = 1024,
    pp_window: int = 1024,
    pp_chunk: int = 512,
    dense_dtype: str | None = None,
    planes: bool | None = None,
    pp_dense: bool | None = None,
):
    """Pack the training graph into a device pytree + static metadata.

    The D-D multigraph is chunk-aligned per relation
    (data/packing.py:pad_typed_edges); the P-P graph is additionally
    windowed by destination for the Pallas SpMM.  Both the XLA and Pallas
    backends consume this one layout.

    ``dense_dtype``: when set (e.g. the model's kernel_dtype), also ship the
    dense per-relation adjacency ``dd_adj_t`` so the R-GCN aggregation runs
    as one batched MXU GEMM (data/packing.py:dense_relation_adj,
    nn/rgcn.py) — the preferred path whenever
    :func:`dense_rgcn_feasible` holds.

    ``pp_dense``: ship the dense int8 (A+I) P-P buffers (``pp_a1`` /
    ``pp_dinv``) when feasible.  False keeps the COO/windowed P-P paths
    selectable by ``backend`` — the encoder's dense branch keys on the
    buffers' presence (nn/encoders.py), so this is the supported opt-out
    for A/B-ing or debugging the sparse paths.
    """
    # The Pallas sampler's byte-plane bitmap view is ~n_et * n_drug * 8 bytes
    # at Decagon scale — only build/ship it when that backend can run
    # (``planes`` None = auto by platform; the XLA sampler ignores planes).
    if planes is None:
        planes = resolve_backend("auto") == "pallas"
    padded = pad_typed_edges(data.dd_train, data.n_drug, chunk=dd_chunk)
    n_chunks = padded.chunk_type.shape[0]
    wpp = pad_windowed_edges(
        data.pp_norm_index, data.pp_norm_weight, data.n_prot,
        window=pp_window, chunk=pp_chunk,
    )
    npp_chunks = wpp.chunk_window.shape[0]
    graph = {
        # D-D (chunk-aligned, relation-binned, dst-sorted)
        "dd_src2d": jnp.asarray(padded.src.reshape(n_chunks, dd_chunk)),
        "dd_dst2d": jnp.asarray(padded.dst.reshape(n_chunks, dd_chunk)),
        "dd_valid": jnp.asarray(padded.valid.astype("float32")),
        "dd_chunk_type": jnp.asarray(padded.chunk_type),
        "dd_deg": jnp.asarray(data.dd_train_deg),
        "dd_bitmap": jnp.asarray(data.dd_train_bitmap),
        # P-P, XLA COO path
        "pp_norm_index": jnp.asarray(data.pp_norm_index),
        "pp_norm_weight": jnp.asarray(data.pp_norm_weight),
        # P-P, Pallas windowed path
        "ppw_src": jnp.asarray(wpp.src.reshape(npp_chunks, pp_chunk)),
        "ppw_dstl": jnp.asarray(wpp.dst_local.reshape(npp_chunks, pp_chunk)),
        "ppw_w": jnp.asarray(wpp.weight.reshape(npp_chunks, pp_chunk)),
        "ppw_chunk_window": jnp.asarray(wpp.chunk_window),
        # P->D
        "dp_src": jnp.asarray(data.dp_edge_index[0]),
        "dp_dst": jnp.asarray(data.dp_edge_index[1]),
        "dp_deg": jnp.asarray(data.dp_drug_deg),
    }
    if planes:
        # static byte-plane view of the bitmap for the Pallas sampler
        # (sampling/negative.py:bitmap_byte_planes) — built once, not per step
        graph["dd_bitmap_planes"] = jnp.asarray(
            bitmap_byte_planes(data.dd_train_bitmap, data.n_et, data.n_drug)
        )
    if dense_dtype is not None:
        from tip_tpu.data.packing import (
            cast_dense_adj, dense_relation_adj, pad_dense_adj,
        )

        da = dense_relation_adj(data.dd_train, data.n_drug)
        # host-side exactness-checked cast so only the final compute-dtype
        # tensor is ever transferred / resident on device; zero-padded to
        # HBM tile bounds for whole-tile Pallas page DMAs (pad_dense_adj)
        graph["dd_adj_t"] = jnp.asarray(
            pad_dense_adj(cast_dense_adj(da, jnp.dtype(dense_dtype)))
        )
        # Binomial tail thresholds for the fused Poissonized-negative dense
        # BCE (ops/pallas_dense_bce.py); static per split.
        from tip_tpu.data.packing import poisson_neg_thresholds

        graph["dd_neg_q"] = jnp.asarray(
            poisson_neg_thresholds(data.dd_train, data.n_drug)
        )
        from tip_tpu.data.packing import (
            poisson_neg_thresholds_sym, sym_strip_pack,
        )

        if jnp.dtype(dense_dtype) == jnp.bfloat16:
            # Symmetric upper-triangle strip layout: the preferred stream
            # for the fused dense BCE and the M-first R-GCN
            # (ops/pallas_dense_bce_sym.py, nn/rgcn.py:..._sym) — 377 MB
            # int8 vs 1.09 GB at Decagon scale.  Its matmuls run with
            # bf16 inputs, so it rides the same precision regime as bf16
            # page storage (preferred_dense_dtype): a float32 dense_dtype
            # (pinned-precision users, exact-parity tests) keeps the full
            # tile-padded f32 path.  ValueError (asymmetric pages or
            # counts beyond int8) also falls back to the full layout.
            try:
                graph["dd_adj_sym"] = jnp.asarray(sym_strip_pack(da))
                graph["dd_neg_q8"] = jnp.asarray(
                    poisson_neg_thresholds_sym(data.dd_train, data.n_drug)
                )
            except ValueError:
                pass
    from tip_tpu.data.packing import dense_pp_feasible

    # Dense P-P is an INDEPENDENT subsystem of the D-D dense path:
    # pp_dense=True ships it even with dense_dtype None (the D-D
    # fallback/scaling configuration still wants the dense P-P GEMM —
    # bench.py's no_dense lane); the default None ties it to dense_dtype
    # (the historical contract the sparse-path A/B tests rely on).
    if pp_dense is None:
        pp_dense = dense_dtype is not None
    if pp_dense and dense_pp_feasible(data.n_prot):
        # Ship the exact 0/1 (A+I) in int8 + the factored D^-1/2 diagonal
        # (data/packing.py:dense_pp_parts, nn/gcn.py).
        from tip_tpu.data.packing import dense_pp_parts

        try:
            a1, dinv = dense_pp_parts(data.pp_norm_index, data.n_prot)
        except ValueError:  # duplicate P-P edges: 0/1 can't hold them
            a1 = None
        if a1 is not None:
            graph["pp_a1"] = jnp.asarray(a1)
            graph["pp_dinv"] = jnp.asarray(dinv)
    if data.drug_feat is not None:
        graph["drug_feat"] = jnp.asarray(data.drug_feat)
    if data.d_norm is not None:
        graph["d_norm"] = jnp.asarray(data.d_norm)
    gs = GraphStatic(
        n_drug=data.n_drug,
        n_prot=data.n_prot,
        n_et=data.n_et,
        dd_chunk=dd_chunk,
        dd_n_chunks=n_chunks,
        dd_n_valid=padded.n_valid,
        pp_window=pp_window,
        pp_n_windows=wpp.n_windows,
        drug_feat_dim=(0 if data.drug_feat is None else data.drug_feat.shape[1]),
    )
    return graph, gs


def make_test_arrays(data: TriGraphData) -> dict:
    return {
        "src": jnp.asarray(data.dd_test.edge_index[0]),
        "dst": jnp.asarray(data.dd_test.edge_index[1]),
        "et": jnp.asarray(data.dd_test.edge_type),
        "bitmap": jnp.asarray(data.dd_test_bitmap),
    }


def resolve_backend(requested: str = "auto") -> str:
    if requested != "auto":
        return requested
    return "pallas" if jax.default_backend() == "tpu" else "xla"


@dataclass(frozen=True)
class TIP:
    """Static model description; all state lives in explicit pytrees."""

    cfg: ModelConfig
    gs: GraphStatic
    backend: str = "xla"

    @staticmethod
    def for_data(
        cfg: ModelConfig, data: TriGraphData, gs: GraphStatic, backend: str = "auto"
    ) -> "TIP":
        from tip_tpu.sampling.negative import bitmap_stride_bits

        if data.n_et * bitmap_stride_bits(data.n_drug) >= 2**31:
            raise ValueError(
                "relation-strided key space exceeds int32; enable x64 keys"
            )
        return TIP(cfg=cfg, gs=gs, backend=resolve_backend(backend))

    @property
    def n_drug(self) -> int:
        return self.gs.n_drug

    @property
    def n_et(self) -> int:
        return self.gs.n_et

    # -- parameters ---------------------------------------------------------

    def init(self, key) -> dict:
        k_enc, k_dec = jax.random.split(key)
        in_dim_drug = self.gs.drug_feat_dim or None
        params = {
            "encoder": fm_encoder_init(
                k_enc, self.cfg, self.gs.n_drug, self.gs.n_prot, self.gs.n_et,
                in_dim_drug=in_dim_drug,
            )
        }
        if self.cfg.decoder == "distmult":
            params["decoder"] = distmult_init(k_dec, self.cfg.n_hid2, self.gs.n_et)
        else:
            params["decoder"] = nn_decoder_init(
                k_dec, self.cfg.n_hid2, self.gs.n_et, self.cfg.nn_decoder_l1_dim
            )
        return params

    # -- forward ------------------------------------------------------------

    def _ep_encoder_view(self, enc_params, graph, axis_name):
        """Resolve EP-sharded R-GCN ``att`` leaves into the layout
        fm_encoder_apply expects (parallel/ep.py).

        Under shard_map each device's view of att is [1, r_max, B]: squeeze
        it and bin by LOCAL relation id over a shrunken [r_max] segment
        space.  Unsharded (eval), gather the global row order back through
        the precomputed slot table."""
        import dataclasses

        gs = self.gs
        if axis_name is not None:
            fix = lambda att: att[0]
            graph = dict(graph, dd_chunk_type=graph["dd_chunk_type_local"])
            gs = dataclasses.replace(gs, n_et=gs.ep_r_max)
        elif "dd_adj_sym" in graph or "dd_adj_t" in graph:
            # The dense pages are stored in EP SLOT order — and
            # M = sum_t att[t] * DA[t] is invariant to any consistent
            # relation order (padding slots: zero att rows x zero pages),
            # so the unsharded eval encode feeds the dense pair with the
            # slot-ordered att view directly: no slot gather, no chunked
            # fallback.  Measured at Decagon/EP(8) scale: eval is
            # dominated by test-edge scoring + metrics (~277 ms/call);
            # the chunked-fallback encode added 7% (297 vs 277 ms) and
            # this path removes it (runs/ep_eval_r5.out; r4 weak #6).
            fix = lambda att: att.reshape(-1, att.shape[-1])
            graph = {
                k: v for k, v in graph.items()
                if k not in ("dd_neg_q", "dd_neg_q8")
            }
        else:
            slot = graph["ep_slot"]
            fix = lambda att: att.reshape(-1, att.shape[-1])[slot]
            # No dense pages shipped: gather att back to GLOBAL relation
            # order for the chunked kernels.
            graph = {
                k: v for k, v in graph.items()
                if k not in ("dd_adj_t", "dd_neg_q", "dd_adj_sym",
                             "dd_neg_q8")
            }
        out = dict(enc_params)
        for name in ("rgcn1", "rgcn2"):
            out[name] = dict(enc_params[name], att=fix(enc_params[name]["att"]))
        return out, graph, gs

    def _ep_decoder_view(self, dec_params, graph, axis_name):
        """Same resolution for the relation-row decoder leaves (DistMult
        ``weight``; NN decoder ``w1_l2``/``w2_l2`` — parallel/ep.py)."""
        from tip_tpu.parallel.ep import _DECODER_REL_LEAVES

        if axis_name is not None:
            fix = lambda w: w[0]
        else:
            slot = graph["ep_slot"]
            fix = lambda w: w.reshape(-1, w.shape[-1])[slot]
        return dict(
            dec_params,
            **{k: fix(dec_params[k]) for k in _DECODER_REL_LEAVES
               if k in dec_params},
        )

    def encode(self, params, graph, remat: bool = False, axis_name=None):
        """Drug embeddings z [n_drug, n_hid2] from the training graph.

        Under shard_map (``axis_name`` set) the D-D chunk axis of ``graph``
        is device-local and the R-GCN layers psum their basis-mixed
        intermediates (see nn/rgcn.py)."""
        enc_params = params["encoder"]
        gs = self.gs
        if gs.ep_r_max:
            enc_params, graph, gs = self._ep_encoder_view(
                enc_params, graph, axis_name
            )
        enc = lambda p: fm_encoder_apply(
            p, graph, self.cfg, gs, backend=self.backend, axis_name=axis_name,
            x_drug=graph.get("drug_feat"), d_norm=graph.get("d_norm"),
        )
        if remat:
            enc = jax.checkpoint(enc)
        return enc(enc_params)

    def score(self, params, z, src, dst, et, sigmoid: bool = True):
        """Score arbitrary (src, dst, relation) triples (flat layout)."""
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

    def loss(self, params, graph, key, remat: bool = False, axis_name=None):
        """Full-graph BCE with one fresh negative per positive
        (reference: src/layers.py:328-342); padding masked out.

        With ``axis_name`` set (inside shard_map), each device scores its
        local chunk shard with an independent sampling key and the masked
        log-likelihood sums are psum'd before dividing by the GLOBAL number
        of real edges."""
        gs = self.gs
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        z = self.encode(params, graph, remat=remat, axis_name=axis_name)
        dense_adj = graph.get("dd_adj_t")
        sym_ok = "dd_adj_sym" in graph and "dd_neg_q8" in graph
        fused_ok = (
            (dense_adj is not None or sym_ok)
            and self.cfg.decoder == "distmult"
            and self.cfg.negatives in ("auto", "poisson")
            and ("dd_neg_q" in graph or sym_ok)
            # unsharded plain graph, or shard_map with relation-partitioned
            # pages; a replicated dense adjacency under shard_map would
            # double-count and never ships (parallel/sharded.py drops it)
            and (
                (axis_name is None and not gs.ep_r_max)
                or (axis_name is not None and gs.ep_r_max > 0)
            )
        )
        if self.cfg.negatives == "poisson" and not fused_ok:
            raise ValueError(
                "negatives='poisson' was pinned but the fused dense BCE "
                "path cannot run here (it needs the dense adjacency pages "
                "and the distmult decoder, and under shard_map an "
                "EP-partitioned graph); use negatives='auto' to allow the "
                "sampled fallback"
            )
        if fused_ok:
            # Fused dense BCE: positives AND Poissonized negatives from one
            # logits tile per relation — the sampler, the negative SDDMM and
            # the separate positive pass all collapse into this kernel
            # (ops/pallas_dense_bce.py; XLA fallback off-TPU).  Under
            # shard_map the adjacency pages / thresholds / decoder rows are
            # co-partitioned by relation (parallel/ep.py), each device
            # scores its local block and ONE psum totals the loss; the
            # device-folded key decorrelates the per-page PRNG streams.
            w = params["decoder"]["weight"]
            if axis_name is not None and gs.ep_r_max:
                w = w[0]  # [1, r_max, d] shard view -> local rows
            if sym_ok:
                # Symmetric packed layout: half the stream, ~31% of the
                # cells skipped (ops/pallas_dense_bce_sym.py).
                if self.backend == "pallas":
                    from tip_tpu.ops.pallas_dense_bce_sym import (
                        dense_bce_sym_sum as bce_sym,
                    )
                else:
                    from tip_tpu.ops.pallas_dense_bce_sym import (
                        dense_bce_sym_sum_xla as bce_sym,
                    )
                total = bce_sym(
                    w, z, graph["dd_adj_sym"], graph["dd_neg_q8"], key
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
                total = bce(w, z, dense_adj, graph["dd_neg_q"], key)
            if axis_name is not None:
                total = jax.lax.psum(total, axis_name)
            return total / float(gs.dd_n_valid)
        # Sampling is keyed by GLOBAL relation id (the bitmap layout) even
        # when the decoder/encoder run on EP-local relation rows.
        neg_src2d, neg_dst2d = typed_negative_sampling_chunked(
            key, graph["dd_chunk_type"], graph["dd_bitmap"], gs.n_drug,
            gs.n_et, gs.dd_chunk, backend=self.backend,
            planes=graph.get("dd_bitmap_planes"),
        )
        dec_params, score_type = params, graph["dd_chunk_type"]
        if gs.ep_r_max:
            dec_params = dict(
                params,
                decoder=self._ep_decoder_view(params["decoder"], graph, axis_name),
            )
            if axis_name is not None:
                score_type = graph["dd_chunk_type_local"]
        valid = graph["dd_valid"]
        # Stable logit-space BCE: -log(sigmoid(x)) = softplus(-x) and
        # -log(1 - sigmoid(x)) = softplus(x).  The reference computes
        # -log(score + 1e-13) on probabilities (src/layers.py:338-340) — the
        # same value up to the eps clamp — but XLA's excess-precision
        # reassociation turns (1 - sigmoid(x)) + eps into exactly 0 for
        # saturated logits, so the probability form produces log(0) = -inf
        # on accelerators.  Verified equivalent in tests/test_model.py.
        dense_adj = graph.get("dd_adj_t")
        if (
            dense_adj is not None
            and self.cfg.decoder == "distmult"
            and not gs.ep_r_max
            # Under shard_map dd_adj_t is replicated: the dense pos_sum would
            # be computed in full on every device and the psum below would
            # multiply it by the axis size.  Use the chunk-sharded path.
            and axis_name is None
        ):
            # Positive edges are static: score all pairs per relation
            # against the dense adjacency — one batched MXU GEMM, no
            # per-edge gathers (nn/decoders.py:distmult_dense_pos_bce_sum).
            from tip_tpu.nn.decoders import distmult_dense_pos_bce_sum

            pos_sum = distmult_dense_pos_bce_sum(
                dec_params["decoder"]["weight"], z, dense_adj,
                kernel_dtype=self.cfg.kernel_dtype,
            )
        else:
            pos_logits = self.score_padded(
                dec_params, z, graph["dd_src2d"], graph["dd_dst2d"],
                score_type, sigmoid=False,
            )
            pos_sum = jnp.sum(jax.nn.softplus(-pos_logits) * valid)
        neg_logits = self.score_padded(
            dec_params, z, neg_src2d, neg_dst2d, score_type,
            sigmoid=False,
        )
        neg_sum = jnp.sum(jax.nn.softplus(neg_logits) * valid)
        total = pos_sum + neg_sum
        if axis_name is not None:
            total = jax.lax.psum(total, axis_name)
        return total / float(gs.dd_n_valid)

    # -- evaluation ---------------------------------------------------------

    def sample_test_negatives(self, key, test):
        neg_src, neg_dst = typed_negative_sampling(
            key, test["et"], test["bitmap"], self.gs.n_drug
        )
        return {"src": neg_src, "dst": neg_dst}

    def evaluate(self, params, graph, test, test_neg):
        """Per-relation + macro AUPRC/AUROC/AP on the test split.

        Transductive setting: the encoder runs on the TRAIN graph and test
        edges are only scored (reference: src/layers.py:347-353)."""
        z = self.encode(params, graph)
        if self.gs.ep_r_max:
            params = dict(
                params,
                decoder=self._ep_decoder_view(params["decoder"], graph, None),
            )
        pos = self.score(params, z, test["src"], test["dst"], test["et"])
        neg = self.score(params, z, test_neg["src"], test_neg["dst"], test["et"])
        per_rel = grouped_ranking_metrics(pos, neg, test["et"], self.gs.n_et)
        return per_rel, macro_average(per_rel)
