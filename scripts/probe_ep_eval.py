"""EP-scale EVAL latency at Decagon scale (round-4 verdict weak #6).

With EP active, eval runs unsharded through the slot-gather view
(train/model.py:_ep_encoder_view), which drops the dense pages and falls
back to the chunked encoder kernels.  This measures that cost on the real
chip against the non-EP dense eval, so the downgrade has a number.
"""
import time

import jax
import numpy as np

from tip_tpu.config import ModelConfig
from tip_tpu.data import cached_trigraph, load_decagon_raw
from tip_tpu.train.model import (
    TIP, make_graph_arrays, make_test_arrays, preferred_dense_dtype,
)


def timed_eval(model, params, graph, test, tn, n=12):
    """Median per-call wall time with a sync per call (includes ONE axon
    host round trip, identical for every variant measured here — the
    differences, not the absolute floor, are the signal).  Params are
    perturbed per call so no executor layer can serve a cached result."""
    import jax.numpy as jnp

    def f(params, graph, test, tn, eps):
        p = dict(params, encoder=dict(
            params["encoder"],
            embed=params["encoder"]["embed"] + eps,
        ))
        return model.evaluate(p, graph, test, tn)

    fj = jax.jit(f)
    out = fj(params, graph, test, tn, jnp.float32(0))
    float(out[1]["auroc"])  # value fetch: block_until_ready alone is
    # unreliable on axon (see bench.py)
    walls = []
    for i in range(n):
        t0 = time.perf_counter()
        out = fj(params, graph, test, tn, jnp.float32(i) * 1e-9)
        float(out[1]["auroc"])
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return walls[len(walls) // 2], out


def main():
    import dataclasses

    from tip_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    raw = load_decagon_raw()
    data = cached_trigraph(raw, split_rate=0.9, seed=1111)
    cfg = ModelConfig.tip_cat()
    graph, gs = make_graph_arrays(
        data, dense_dtype=preferred_dense_dtype(data, cfg.kernel_dtype)
    )
    model = TIP.for_data(cfg, data, gs, backend="auto")
    params = model.init(jax.random.key(0))
    test = make_test_arrays(data)
    tn = jax.jit(model.sample_test_negatives)(jax.random.key(1), test)

    dt, (_, avg) = timed_eval(model, params, graph, test, tn)
    print(f"dense eval (no EP):   {dt*1e3:8.1f} ms  "
          f"auroc={float(avg['auroc']):.4f}")

    from tip_tpu.parallel import ep_params, ep_shard_graph, partition_relations

    for n_dev in (8,):
        part = partition_relations(
            np.asarray(graph["dd_chunk_type"]), gs.n_et, n_dev
        )
        egraph, egs = ep_shard_graph(
            graph, gs, part,
            dense_adj=graph.get("dd_adj_t"), neg_q=graph.get("dd_neg_q"),
            sym_pages=graph.get("dd_adj_sym"), neg_q8=graph.get("dd_neg_q8"),
        )
        emodel = dataclasses.replace(model, gs=egs)
        eparams = ep_params(params, part)
        dt_ep, (_, avg_ep) = timed_eval(emodel, eparams, egraph, test, tn)
        print(f"EP({n_dev}) eval (slot-ordered dense): {dt_ep*1e3:8.1f} ms  "
              f"auroc={float(avg_ep['auroc']):.4f}  "
              f"({dt_ep/dt:.2f}x the dense eval)")
        # the pre-fix behavior: no dense pages shipped -> chunked fallback
        egraph_nd, egs_nd = ep_shard_graph(graph, gs, part)
        emodel_nd = dataclasses.replace(model, gs=egs_nd)
        dt_nd, (_, avg_nd) = timed_eval(emodel_nd, eparams, egraph_nd, test, tn)
        print(f"EP({n_dev}) eval (chunked fallback, pre-fix): "
              f"{dt_nd*1e3:8.1f} ms  auroc={float(avg_nd['auroc']):.4f}  "
              f"({dt_nd/dt:.2f}x the dense eval)")


if __name__ == "__main__":
    main()
