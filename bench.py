"""Benchmark: full TIP-cat training-step throughput on the real Decagon graph.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

Metric: directed D-D training edges processed per second per chip by a full
jitted training step (encoder fwd + decoder on positives AND fresh sampled
negatives + backward + Adam update) at the reference's default configuration
(TIP-cat, 1,097 relations, ~8.33M directed train edges — reference: tip.py).

``vs_baseline``: the reference publishes no throughput (BASELINE.md). The
anchor used here is a DELIBERATELY GENEROUS estimate of the single-GPU
reference: 1.0 s/epoch => 8.33e6 edges/s (the reference's per-step Python
loop over 1,097 relations x 2 layers x fwd+bwd alone implies several
thousand sequential CUDA launches; published-era GPUs ran multi-second
epochs).  vs_baseline = ours / 8.33e6.
"""

from __future__ import annotations

import json
import time

import jax

REFERENCE_EDGES_PER_S = 8.33e6  # generous single-GPU reference anchor (see above)


def main() -> None:
    import optax

    from tip_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from tip_tpu.config import ModelConfig, TrainConfig
    from tip_tpu.data import (
        build_trigraph, cached_trigraph, load_decagon_raw, synthetic_trigraph,
    )
    from tip_tpu.data.decagon import has_reference_data
    from tip_tpu.train.model import TIP, make_graph_arrays

    if has_reference_data():
        raw = load_decagon_raw()
        data = cached_trigraph(raw, split_rate=0.9, seed=1111)
    else:  # no dataset on this machine — bench a synthetic graph of same scale
        raw = synthetic_trigraph(n_drug=645, n_prot=19081, n_et=1097,
                                 pairs_per_et=4200, seed=0)
        data = build_trigraph(raw, split_rate=0.9, seed=1111)
    graph, gs = make_graph_arrays(data)
    model = TIP.for_data(ModelConfig.tip_cat(), data, gs, backend="auto")
    params = model.init(jax.random.key(0))
    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, graph, key):
        loss, grads = jax.value_and_grad(lambda p: model.loss(p, graph, key))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(1)
    for i in range(2):  # compile + warm
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, graph, k)
    float(loss)  # value fetch: block_until_ready alone is unreliable on axon

    n_steps = 10
    t0 = time.time()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, graph, k)
    float(loss)  # forces the whole chained computation to completion
    dt = (time.time() - t0) / n_steps

    edges_per_s = gs.dd_n_valid / dt
    print(
        json.dumps(
            {
                "metric": "TIP-cat full-train-step throughput (directed D-D train edges/s/chip, 1097 relations)",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / REFERENCE_EDGES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
