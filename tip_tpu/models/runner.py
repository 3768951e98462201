"""Generic training runner for the non-TIP model families.

Equivalent of the reference's per-variant experiment scripts
(reference: model/ddm-df_rgcn.py:92-236, model/ddm-nn.py:114-261,
test/pd_net.py:134-261, test/pp_net.py:58-93), which each re-implement the
same Adam loop with edited constants.  Here one loop drives every family;
the variant table in analysis/evaluation.ipynb cell 13 is reproduced by
``python -m tip_tpu.models --variant {dr-df,dr-nn,pr-hmp-nn,pp-gae}``.
"""

from __future__ import annotations

import json
import time
from typing import Callable, Optional

import jax
import numpy as np
import optax

from tip_tpu.data.packing import TriGraphData
from tip_tpu.models.dd import DDConfig, DDModel, make_dd_graph_arrays
from tip_tpu.models.pd import PDConfig, PDModel, make_pd_graph_arrays
from tip_tpu.models.pp import PPConfig, PPModel, make_pp_graph_arrays

VARIANTS = ("dr-df", "dr-nn", "pr-hmp-nn", "pp-gae")


def build_variant(variant: str, data: TriGraphData, backend: str = "auto",
                  kernel_dtype: str = "float32", dims: Optional[dict] = None):
    """Model + (graph, test) arrays for one reference experiment variant.

    ``dims`` overrides DDConfig dimension fields (n_embed/n_hid1/n_hid2/
    num_base) — the recorded runs behind analysis/evaluation.ipynb cell 13
    used dims that differ from the shipped script constants (run dir
    ``dd-rgcn-dist(16-64-32-16)`` vs model/ddm-df_rgcn.py:31-35's
    n_base=16, n_embed=16, n_hid1=32, n_hid2=16 — one field wider).
    """
    if variant in ("dr-df", "dr-nn"):
        from tip_tpu.train.model import make_test_arrays

        from tip_tpu.train.model import preferred_dense_dtype

        cfg = DDConfig(
            decoder="distmult" if variant == "dr-df" else "nn",
            kernel_dtype=kernel_dtype,
            **(dims or {}),
        )
        graph, gs = make_dd_graph_arrays(
            data, dense_dtype=preferred_dense_dtype(data, kernel_dtype)
        )
        model = DDModel.for_data(cfg, gs, backend=backend)
        return model, graph, make_test_arrays(data)
    if variant == "pr-hmp-nn":
        graph, test = make_pd_graph_arrays(data)
        return PDModel.for_data(PDConfig(), data), graph, test
    if variant == "pp-gae":
        graph, test = make_pp_graph_arrays(data)
        return PPModel.for_data(PPConfig(), data), graph, test
    raise ValueError(f"unknown variant {variant!r}; one of {VARIANTS}")


def train_variant(
    model,
    graph,
    test,
    epochs: int = 100,
    lr: float = 0.01,
    seed: int = 1111,
    log: Optional[Callable[[str], None]] = print,
    eval_every: int = 0,
):
    """Adam full-graph loop (reference: model/ddm-nn.py:199-229); returns
    (params, {"final", "history", "per_relation"})."""
    key = jax.random.key(seed)
    key, k_init, k_testneg = jax.random.split(key, 3)
    params = model.init(k_init)
    test_neg = jax.jit(model.sample_test_negatives)(k_testneg, test)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    # ``graph`` is an explicit argument (not a closure constant): closed-over
    # arrays are baked into the serialized program, and the dense relation
    # adjacency (~1.6 GB) overflows remote-compile request limits.
    @jax.jit
    def step_fn(params, opt_state, graph, key):
        loss, grads = jax.value_and_grad(lambda p: model.loss(p, graph, key))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_fn = jax.jit(model.evaluate)

    history = []
    t_start = time.time()
    for epoch in range(epochs):
        key, k = jax.random.split(key)
        t0 = time.time()
        params, opt_state, loss = step_fn(params, opt_state, graph, k)
        loss = float(loss)
        if not np.isfinite(loss):
            raise FloatingPointError(f"non-finite loss {loss} at epoch {epoch}")
        rec = {"epoch": epoch, "loss": loss, "sec": round(time.time() - t0, 4)}
        if eval_every and (epoch + 1) % eval_every == 0:
            _, avg = eval_fn(params, graph, test, test_neg)
            rec.update({k_: round(float(v), 4) for k_, v in avg.items()})
        history.append(rec)
        if log:
            log(json.dumps(rec))
    per_rel, avg = eval_fn(params, graph, test, test_neg)
    final = {k_: float(v) for k_, v in avg.items()}
    final["train_time_sec"] = time.time() - t_start
    if log:
        log("On test set: auprc:{auprc:.4f}   auroc:{auroc:.4f}   ap@50:{ap:.4f}"
            .format(**final))
    return params, {
        "final": final,
        "history": history,
        "per_relation": {k_: np.asarray(v) for k_, v in per_rel.items()},
    }
