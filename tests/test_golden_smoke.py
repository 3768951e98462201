"""5-relation golden regression on real Decagon data, pinned to a committed
torch-oracle trace.

The reference records a smoke trace in comments (test/dd_net.py:197-201,
test AUPRC 0.564 -> 0.628 over 5 epochs) that does NOT reproduce with the
shipped code: scripts/torch_oracle_dd.py re-implements dd_net.py's exact
protocol (dims 4, UNTYPED negative sampling, GLOBAL AUPRC over the whole
score vector — not the per-type macro) on tip_tpu's packed split and lands
at 0.496 +/- 0.015 after 5 epochs, 0.561 +/- 0.060 after 25, across 5 torch
seeds (committed trace: tests/golden/dd_net_trace.json).  This test runs the
same protocol through tip_tpu for several seeds and pins the outcome to the
oracle distribution.  Skipped when the reference data is absent.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tip_tpu.data.decagon import has_reference_data

pytestmark = pytest.mark.skipif(
    not has_reference_data(), reason="reference Decagon data not available"
)

ET_LIST = [20, 34, 38, 41, 42]  # reference test/dd_net.py:14,34
TRACE = os.path.join(os.path.dirname(__file__), "golden", "dd_net_trace.json")


def _global_auprc(pos, neg):
    from tip_tpu.metrics import grouped_ranking_metrics

    scores = jnp.concatenate([pos, neg])
    et = jnp.zeros(pos.shape[0], jnp.int32)
    per = grouped_ranking_metrics(
        jnp.asarray(pos), jnp.asarray(neg), et, 1
    )
    return float(per["auprc"][0])


def _run_seed(data, seed, epochs):
    from tip_tpu.models import DDModel, DDConfig
    from tip_tpu.models.dd import make_dd_graph_arrays
    from tip_tpu.sampling import typed_negative_sampling
    from tip_tpu.sampling.negative import build_key_bitmap

    n = data.n_drug
    graph, gs = make_dd_graph_arrays(data, chunk=128)
    # dd_net applies a final ReLU (test/dd_net.py:91) => final_relu=True
    cfg = DDConfig(n_embed=4, n_hid1=4, n_hid2=4, num_base=4,
                   decoder="distmult", final_relu=True)
    model = DDModel.for_data(cfg, gs, backend="xla")
    params = model.init(jax.random.key(seed))
    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    # UNTYPED sampling (dd_net.py:131): any-relation pair bitmap
    def pair_bitmap(edges):
        s, d = edges.edge_index.astype(np.int64)
        return jnp.asarray(build_key_bitmap(np.unique(d * n + s), n * n))

    tr_bm = pair_bitmap(data.dd_train)
    te_bm = pair_bitmap(data.dd_test)
    te_src = jnp.asarray(data.dd_test.edge_index[0])
    te_dst = jnp.asarray(data.dd_test.edge_index[1])
    te_et = jnp.asarray(data.dd_test.edge_type)

    def untyped(key, m, bitmap):
        return typed_negative_sampling(
            key, jnp.zeros(m, jnp.int32), bitmap, n
        )

    key = jax.random.key(seed + 1000)
    key, ktn = jax.random.split(key)
    tn = untyped(ktn, te_src.shape[0], te_bm)

    tr_src = jnp.asarray(data.dd_train.edge_index[0])
    tr_dst = jnp.asarray(data.dd_train.edge_index[1])
    tr_et = jnp.asarray(data.dd_train.edge_type)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            z = model.encode(p, graph)
            ns, nd = untyped(key, tr_src.shape[0], tr_bm)
            pos = model.score(p, z, tr_src, tr_dst, tr_et, sigmoid=False)
            neg = model.score(p, z, ns, nd, tr_et, sigmoid=False)
            return jnp.mean(jax.nn.softplus(-pos)) + jnp.mean(jax.nn.softplus(neg))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def test_scores(params):
        z = model.encode(params, graph)
        pos = model.score(params, z, te_src, te_dst, te_et)
        neg = model.score(params, z, tn[0], tn[1], te_et)
        return pos, neg

    first = last = None
    losses = []
    for epoch in range(epochs):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
        if epoch == 0:
            first = _global_auprc(*test_scores(params))
    last = _global_auprc(*test_scores(params))
    assert np.isfinite(losses).all()
    return first, last


def test_dd_net_golden_matches_torch_oracle():
    from tip_tpu.data import load_decagon_raw, build_trigraph

    with open(TRACE) as f:
        trace = json.load(f)
    raw = load_decagon_raw(et_list=ET_LIST)
    data = build_trigraph(raw, split_rate=0.9, seed=1111)

    finals, firsts = [], []
    for seed in range(3):
        first, last = _run_seed(data, seed, epochs=trace["epochs"])
        firsts.append(first)
        finals.append(last)

    ours = float(np.mean(finals))
    oracle = trace["test_final_mean"]
    spread = max(trace["test_final_std"], 0.02)
    # same protocol, independent RNG streams: means must agree within the
    # oracle's own seed spread (3 sigma) and training must help on average
    assert abs(ours - oracle) < 3 * spread, (finals, oracle, spread)
    assert ours > np.mean(firsts), (firsts, finals)
