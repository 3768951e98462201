"""The non-TIP model families train and evaluate on a synthetic tri-graph."""

import numpy as np
import jax
import optax
import pytest

from tip_tpu.data import synthetic_trigraph, build_trigraph
from tip_tpu.models import DDModel, DDConfig, PDModel, PDConfig, PPModel, PPConfig
from tip_tpu.models.dd import make_dd_graph_arrays
from tip_tpu.models.pd import make_pd_graph_arrays
from tip_tpu.models.pp import make_pp_graph_arrays
from tip_tpu.train.model import make_test_arrays


@pytest.fixture(scope="module")
def data():
    raw = synthetic_trigraph(n_drug=50, n_prot=80, n_et=6, pairs_per_et=70, seed=13)
    return build_trigraph(raw, split_rate=0.85, seed=13)


def _train(model, params, graph, loss_fn, n=25, lr=0.05):
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, graph, key))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(0)
    losses = []
    for _ in range(n):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
    return params, losses


@pytest.mark.parametrize("decoder", ["distmult", "nn"])
def test_dd_model(data, decoder):
    graph, gs = make_dd_graph_arrays(data, chunk=32)
    cfg = DDConfig(n_embed=8, n_hid1=8, n_hid2=6, num_base=4, decoder=decoder)
    model = DDModel.for_data(cfg, gs, backend="xla")
    params = model.init(jax.random.key(1))
    params, losses = _train(model, params, graph, model.loss)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    test = make_test_arrays(data)
    tn = model.sample_test_negatives(jax.random.key(2), test)
    _, avg = model.evaluate(params, graph, test, tn)
    assert 0 <= float(avg["auroc"]) <= 1


def test_pd_model(data):
    graph, test = make_pd_graph_arrays(data)
    model = PDModel.for_data(PDConfig(embed_dim=8, target_dim=6, l1_dim=4), data)
    params = model.init(jax.random.key(3))
    params, losses = _train(model, params, graph, model.loss)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    tn = model.sample_test_negatives(jax.random.key(4), test)
    _, avg = model.evaluate(params, graph, test, tn)
    assert 0 <= float(avg["auroc"]) <= 1


def test_pp_model(data):
    graph, test = make_pp_graph_arrays(data)
    model = PPModel.for_data(PPConfig(hid1=8, hid2=6), data)
    params = model.init(jax.random.key(5))
    params, losses = _train(model, params, graph, model.loss)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    tn = model.sample_test_negatives(jax.random.key(6), test)
    _, avg = model.evaluate(params, graph, test, tn)
    # P-P link prediction on a community-structured graph is learnable
    assert float(avg["auroc"]) > 0.5
