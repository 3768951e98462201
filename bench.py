"""Benchmark: full TIP-cat training-step throughput on the real Decagon graph.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N, ...}

Metric: directed D-D training edges processed per second per chip by a full
jitted training step (encoder fwd + decoder on positives AND fresh sampled
negatives + backward + Adam update) at the reference's default configuration
(TIP-cat, 1,097 relations, ~8.33M directed train edges — reference: tip.py).
Both Pallas kernel precisions are measured; the headline value is float32
(the accuracy-validated default — see RESULTS.md), bf16 is reported
alongside.

Baselines (extra JSON keys, honest about provenance):
  * ``vs_baseline``     — ours / 8.33e6 edges/s, a deliberately GENEROUS
    ESTIMATE of the single-GPU reference (1.0 s/epoch; its per-step Python
    loop over 1,097 relations x 2 layers x fwd+bwd implies thousands of
    sequential CUDA launches).  The reference publishes no throughput
    (BASELINE.md), so this anchor is an estimate, marked as such.
  * ``vs_torch_cpu``    — ours / a MEASURED torch-CPU run of the reference
    algorithm on this machine (scripts/torch_oracle_tip.py, same packed
    graph; see runs/torch_oracle_cat.json).
  * ``achieved_tflops`` / ``mxu_util_est`` — executed one-hot-matmul FLOPs
    per step divided by wall time, and that rate against the v5e MXU peak
    for the measured precision (197 TFLOP/s bf16; f32 inputs decompose on
    the MXU, conservatively 1/4 rate) — the roofline context the raw
    edges/s number lacks.
"""

from __future__ import annotations

import json
import sys
import time

import jax

REFERENCE_EDGES_PER_S = 8.33e6  # generous single-GPU reference ESTIMATE
TORCH_CPU_SEC_PER_STEP = 25.0  # measured: scripts/torch_oracle_tip.py on this
# host (2-vCPU, epochs 40-99 steady state 18-35 s; runs/torch_oracle_cat.json)
V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = V5E_PEAK_BF16 / 4


def _step_mxu_flops(gs, cfg, dense_path: bool) -> float:
    """Matmul FLOPs executed per training step (fwd + bwd).

    ``dense_path`` True (dense_rgcn_feasible held, the benched config on
    real hardware): R-GCN aggregation runs on the dense relation adjacency
    (data/packing.py:dense_relation_adj): per layer, fwd is one batched GEMM
    [R,n,n]x[n,d] (2*R*n^2*d flops) and the dx backward the same again.  The
    decoder scores POSITIVES densely too (all n^2 pairs per relation,
    nn/decoders.py:distmult_dense_pos_bce_sum; fwd + remat + 2 grad einsums
    ~4x fwd) and NEGATIVES through the chunked one-hot SDDMM
    (ops/pallas_segment.py): fwd runs 2 gathers at [D,N]x[N,C] per chunk,
    its backward ~2x fwd.

    ``dense_path`` False (big-graph fallback): both R-GCN binning and the
    positive decoder run the chunked one-hot kernels, whose per-chunk GEMMs
    dominate; count those instead of the dense formulas.

    NEGATIVES run the two-level SDDMM (ops/pallas_sddmm2.py): per chunk the
    forward is two single-tile gathers [NB*D, 128] x [128, C] and the
    backward two scatters of the same size (the forward's gathered
    endpoints are residuals — nothing is regathered), so bwd = fwd, not
    2x fwd as the v1 full-axis kernel cost.

    The basis einsums, P-P SpMM (dense: 2*N_prot^2*d, ~8%) and sampler are
    small; ignored — utilization estimates here are an upper bound.
    """
    c, n, k = gs.dd_chunk, gs.n_drug, gs.dd_n_chunks
    r = gs.n_et
    if dense_path:
        dense = lambda d: 2.0 * r * n * n * d  # one batched GEMM, fwd
        rgcn_fwd = dense(cfg.rgcn_in_dim) + dense(cfg.n_hid1)
        rgcn_bwd = rgcn_fwd
        dec_pos = 4 * dense(cfg.n_hid2)  # fwd + remat + dz/dw einsums
    else:
        # chunked one-hot binning: per chunk, scatter [n+1,C]x[C,d] GEMM
        onehot = lambda d: 2.0 * (n + 1) * c * d * k
        rgcn_fwd = onehot(cfg.rgcn_in_dim) + onehot(cfg.n_hid1)
        rgcn_bwd = 2 * rgcn_fwd  # dx gather + one-hot grads
        dec_pos = 3 * (4.0 * c * n * cfg.n_hid2) * k  # chunked SDDMM fwd+bwd
    from tip_tpu.ops.pallas_sddmm2 import _nb

    nb = _nb(n)  # two-level gather hi-blocks, from the kernel itself
    dec_neg_fwd = (2.0 * 2 * c * 128 * nb * cfg.n_hid2) * k
    dec_neg_bwd = dec_neg_fwd
    return rgcn_fwd + rgcn_bwd + dec_pos + dec_neg_fwd + dec_neg_bwd


def _bench_one(data, kernel_dtype: str, n_steps: int = 30):
    import optax

    from tip_tpu.config import ModelConfig
    from tip_tpu.train.model import TIP, make_graph_arrays

    from tip_tpu.train.model import preferred_dense_dtype

    dense = preferred_dense_dtype(data, kernel_dtype)
    graph, gs = make_graph_arrays(data, dense_dtype=dense)
    cfg = ModelConfig.tip_cat(kernel_dtype=kernel_dtype)
    model = TIP.for_data(cfg, data, gs, backend="auto")
    params = model.init(jax.random.key(0))
    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, graph, key):
        loss, grads = jax.value_and_grad(lambda p: model.loss(p, graph, key))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(1)
    for _ in range(3):  # compile + warm
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, graph, k)
    float(loss)  # value fetch: block_until_ready alone is unreliable on axon

    t0 = time.time()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, graph, k)
    float(loss)  # forces the whole chained computation to completion
    dt = (time.time() - t0) / n_steps
    return dt, gs, cfg, dense is not None


def main() -> None:
    from tip_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from tip_tpu.data import (
        build_trigraph, cached_trigraph, load_decagon_raw, synthetic_trigraph,
    )
    from tip_tpu.data.decagon import has_reference_data

    if has_reference_data():
        raw = load_decagon_raw()
        data = cached_trigraph(raw, split_rate=0.9, seed=1111)
    else:  # no dataset on this machine — bench a synthetic graph of same scale
        raw = synthetic_trigraph(n_drug=645, n_prot=19081, n_et=1097,
                                 pairs_per_et=4200, seed=0)
        data = build_trigraph(raw, split_rate=0.9, seed=1111)

    results = {}
    for dtype in ("float32", "bfloat16"):
        dt, gs, cfg, dense_path = _bench_one(data, dtype)
        flops = _step_mxu_flops(gs, cfg, dense_path)
        peak = V5E_PEAK_F32 if dtype == "float32" else V5E_PEAK_BF16
        results[dtype] = {
            "sec_per_step": round(dt, 4),
            "edges_per_s": round(gs.dd_n_valid / dt, 1),
            "achieved_tflops": round(flops / dt / 1e12, 2),
            "mxu_util_est": round(flops / dt / peak, 3),
        }
        print(f"[bench] {dtype}: {results[dtype]}", file=sys.stderr)

    headline = results["float32"]["edges_per_s"]
    torch_cpu_edges_per_s = gs.dd_n_valid / TORCH_CPU_SEC_PER_STEP
    print(
        json.dumps(
            {
                "metric": "TIP-cat full-train-step throughput (directed D-D "
                          "train edges/s/chip, 1097 relations, float32)",
                "value": headline,
                "unit": "edges/s",
                "vs_baseline": round(headline / REFERENCE_EDGES_PER_S, 3),
                "baseline_kind": "estimate (reference publishes no throughput)",
                "vs_torch_cpu_measured": round(headline / torch_cpu_edges_per_s, 1),
                "float32": results["float32"],
                "bfloat16": results["bfloat16"],
            }
        )
    )


if __name__ == "__main__":
    main()
