"""Fused dense BCE (ops/pallas_dense_bce.py): math, grads, distribution.

Interpret mode stubs the on-chip PRNG to zeros, so u24 = 0 and the per-cell
negative count becomes #{k: q_k > 0} — a deterministic count field that
exercises the full kernel math (both BCE halves, the count inverse-CDF, the
positive-cell exclusion and both backward contractions) against a plain-JAX
oracle.  The XLA fallback's random draws are validated statistically, and
the host threshold computation against exact Binomial tails.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tip_tpu.data import build_trigraph, synthetic_trigraph
from tip_tpu.data.packing import (
    dense_relation_adj,
    poisson_neg_thresholds,
)
from tip_tpu.ops.pallas_dense_bce import dense_bce_sum, dense_bce_sum_xla


@pytest.fixture(scope="module")
def setup():
    raw = synthetic_trigraph(n_drug=48, n_prot=16, n_et=6, pairs_per_et=50,
                             seed=9)
    data = build_trigraph(raw, split_rate=0.9, seed=9)
    da = jnp.asarray(
        dense_relation_adj(data.dd_train, data.n_drug).astype(np.float32)
    )
    k1, k2 = jax.random.split(jax.random.key(0))
    w = jax.random.normal(k1, (data.n_et, 8)) * 0.3
    z = jax.random.normal(k2, (data.n_drug, 8)) * 0.5
    return data, da, w, z


def _oracle(w, z, da, cnt):
    logits = jnp.einsum("nf,tf,mf->tnm", z, w, z)
    return jnp.sum(
        jax.nn.softplus(-logits) * da + jax.nn.softplus(logits) * cnt
    )


def test_kernel_value_and_grads_match_oracle(setup):
    data, da, w, z = setup
    # deterministic counts under the interpret-mode PRNG stub (u24 = 0):
    # count_t = #{k: q_tk > 0} on non-positive cells
    per_rel = np.array([0, 1, 2, 3, 1, 2])[: data.n_et]
    q_int = np.zeros((data.n_et, 3), np.int32)
    for t, c in enumerate(per_rel):
        q_int[t, :c] = 7  # any positive threshold: 0 < 7
    cnt = jnp.asarray(
        (np.asarray(da) == 0) * per_rel[:, None, None].astype(np.float32)
    )

    with pltpu.force_tpu_interpret_mode():
        val, (dw, dz) = jax.value_and_grad(
            lambda wz: dense_bce_sum(
                wz[0], wz[1], da, jnp.asarray(q_int), jax.random.key(3)
            ),
            argnums=0,
        )((w, z))
    ov, (odw, odz) = jax.value_and_grad(
        lambda wz: _oracle(wz[0], wz[1], da, cnt), argnums=0
    )((w, z))
    np.testing.assert_allclose(float(val), float(ov), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(odw),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dz), np.asarray(odz),
                               rtol=2e-4, atol=2e-4)


def test_xla_fallback_unbiased_and_grad_consistent(setup):
    data, da, w, z = setup
    q_int = jnp.asarray(poisson_neg_thresholds(data.dd_train, data.n_drug))
    n = data.n_drug
    danp = np.asarray(da)
    m = np.bincount(data.dd_train.edge_type, minlength=data.n_et)
    # expected value: pos_sum + sum_t m_t * mean_{nonpos}(softplus L_t)
    logits = np.asarray(jnp.einsum("nf,tf,mf->tnm", z, w, z))
    sp_pos = float(np.sum(np.log1p(np.exp(-logits)) * danp))
    spl = np.log1p(np.exp(logits))
    nonpos = danp == 0
    exp_neg = float(
        sum(
            m[t] * spl[t][nonpos[t]].mean()
            for t in range(data.n_et)
        )
    )
    vals = np.array([
        float(dense_bce_sum_xla(w, z, da, q_int, jax.random.key(s)))
        for s in range(64)
    ])
    se = vals.std() / np.sqrt(len(vals))
    assert abs(vals.mean() - (sp_pos + exp_neg)) < 5 * se + 1e-3, (
        vals.mean(), sp_pos + exp_neg, se,
    )
    # grads: for ONE key, the fallback's grad must equal autodiff of its own
    # value function (custom machinery free) AND move the loss downhill
    g = jax.grad(
        lambda wz: dense_bce_sum_xla(wz[0], wz[1], da, q_int,
                                     jax.random.key(1))
    )((w, z))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    v0 = float(dense_bce_sum_xla(w, z, da, q_int, jax.random.key(1)))
    v1 = float(dense_bce_sum_xla(
        w - 1e-3 * g[0], z - 1e-3 * g[1], da, q_int, jax.random.key(1)
    ))
    assert v1 < v0


def test_thresholds_match_exact_binomial_tails(setup):
    from scipy import stats

    data, _, _, _ = setup
    q = np.asarray(poisson_neg_thresholds(data.dd_train, data.n_drug),
                   np.float64) / (1 << 24)
    m = np.bincount(data.dd_train.edge_type, minlength=data.n_et)
    src, dst = data.dd_train.edge_index
    for t in range(data.n_et):
        sel = data.dd_train.edge_type == t
        cells = len(set(zip(dst[sel].tolist(), src[sel].tolist())))
        nonpos = data.n_drug**2 - cells
        b = stats.binom(m[t], 1.0 / nonpos)
        for k in range(3):
            expect = 1.0 - b.cdf(k)
            assert abs(q[t, k] - expect) < 2e-7, (t, k, q[t, k], expect)


def test_model_loss_takes_fused_path_and_decreases(setup):
    """End-to-end: TIP loss with negatives='poisson' trains on the XLA
    fallback (CPU), and the padded-sampler loss stays available."""
    import optax

    from tip_tpu.config import ModelConfig
    from tip_tpu.train.model import TIP, make_graph_arrays

    data = setup[0]
    graph, gs = make_graph_arrays(data, dd_chunk=64, pp_window=128,
                                  pp_chunk=64, dense_dtype="float32")
    assert "dd_neg_q" in graph
    cfg = ModelConfig.tip_cat(negatives="poisson")
    model = TIP.for_data(cfg, data, gs, backend="xla")
    params = model.init(jax.random.key(0))
    loss0 = float(jax.jit(model.loss)(params, graph, jax.random.key(1)))
    assert abs(loss0 - 2 * np.log(2)) < 0.05  # untrained anchor ~1.386
    opt = optax.adam(0.01)
    ost = opt.init(params)

    @jax.jit
    def step(p, o, k):
        l, g = jax.value_and_grad(lambda q: model.loss(q, graph, k))(p)
        u, o = opt.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    for i in range(8):
        params, ost, l = step(params, ost, jax.random.key(10 + i))
        losses.append(float(l))
    assert losses[-1] < losses[0]
    # sampled mode still runs and gives a comparable untrained loss
    cfg2 = ModelConfig.tip_cat(negatives="sampled")
    model2 = TIP.for_data(cfg2, data, gs, backend="xla")
    p2 = model2.init(jax.random.key(0))
    l2 = float(jax.jit(model2.loss)(p2, graph, jax.random.key(1)))
    assert abs(l2 - loss0) < 0.05


def test_kernel_padded_pages_match_oracle(setup):
    """Tile-padded adjacency pages (pad_dense_adj): the kernel's valid-extent
    mask must exclude pad cells from the negative draws and the padded
    z/z^T from the logits — value and grads equal the unpadded oracle."""
    from tip_tpu.data.packing import pad_dense_adj

    data, da, w, z = setup
    dap = jnp.asarray(pad_dense_adj(np.asarray(da)))
    assert dap.shape[2] > da.shape[2]  # lanes padded 48 -> 128
    per_rel = np.array([0, 1, 2, 3, 1, 2])[: data.n_et]
    q_int = np.zeros((data.n_et, 3), np.int32)
    for t, c in enumerate(per_rel):
        q_int[t, :c] = 7
    cnt = jnp.asarray(
        (np.asarray(da) == 0) * per_rel[:, None, None].astype(np.float32)
    )
    with pltpu.force_tpu_interpret_mode():
        val, (dw, dz) = jax.value_and_grad(
            lambda wz: dense_bce_sum(
                wz[0], wz[1], dap, jnp.asarray(q_int), jax.random.key(3)
            ),
            argnums=0,
        )((w, z))
    ov, (odw, odz) = jax.value_and_grad(
        lambda wz: _oracle(wz[0], wz[1], da, cnt), argnums=0
    )((w, z))
    np.testing.assert_allclose(float(val), float(ov), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(odw),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dz), np.asarray(odz),
                               rtol=2e-4, atol=2e-4)


def test_nn_kernel_value_and_grads_match_oracle(setup):
    """NN-decoder fused BCE (ops/pallas_dense_bce_nn.py): outer-sum logits,
    deterministic interpret counts, value + all four grads vs the oracle
    (padded pages included)."""
    from tip_tpu.data.packing import pad_dense_adj
    from tip_tpu.ops.pallas_dense_bce_nn import (
        dense_bce_nn_sum, dense_bce_nn_sum_xla,
    )

    data, da, _, _ = setup
    dap = jnp.asarray(pad_dense_adj(np.asarray(da)))
    l1 = 8
    ks = jax.random.split(jax.random.key(5), 4)
    w1 = jax.random.normal(ks[0], (data.n_et, l1)) * 0.4
    w2 = jax.random.normal(ks[1], (data.n_et, l1)) * 0.4
    h1 = jax.nn.relu(jax.random.normal(ks[2], (data.n_drug, l1)))
    h2 = jax.nn.relu(jax.random.normal(ks[3], (data.n_drug, l1)))
    per_rel = np.array([0, 1, 2, 3, 1, 2])[: data.n_et]
    q_int = np.zeros((data.n_et, 3), np.int32)
    for t, c in enumerate(per_rel):
        q_int[t, :c] = 7
    cnt = jnp.asarray(
        (np.asarray(da) == 0) * per_rel[:, None, None].astype(np.float32)
    )

    def oracle(args):
        w1_, w2_, h1_, h2_ = args
        logits = (h2_ @ w2_.T).T[:, :, None] + (h1_ @ w1_.T).T[:, None, :]
        return jnp.sum(
            jax.nn.softplus(-logits) * da + jax.nn.softplus(logits) * cnt
        )

    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(
            lambda a: dense_bce_nn_sum(
                a[0], a[1], a[2], a[3], dap, jnp.asarray(q_int),
                jax.random.key(3),
            )
        )((w1, w2, h1, h2))
    ov, ograds = jax.value_and_grad(oracle)((w1, w2, h1, h2))
    np.testing.assert_allclose(float(val), float(ov), rtol=2e-5)
    for a, b in zip(grads, ograds):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
    # XLA fallback: same expectation (statistical, as the DistMult test)
    q_real = poisson_neg_thresholds(data.dd_train, data.n_drug)
    vals = np.array([
        float(dense_bce_nn_sum_xla(w1, w2, h1, h2, dap,
                                   jnp.asarray(q_real), jax.random.key(s)))
        for s in range(48)
    ])
    logits = np.asarray(
        (h2 @ w2.T).T[:, :, None] + (h1 @ w1.T).T[:, None, :]
    )
    danp = np.asarray(da)
    m = np.bincount(data.dd_train.edge_type, minlength=data.n_et)
    sp_pos = float(np.sum(np.log1p(np.exp(-logits)) * danp))
    spl = np.log1p(np.exp(logits))
    exp_neg = float(sum(
        m[t] * spl[t][danp[t] == 0].mean() for t in range(data.n_et)
    ))
    se = vals.std() / np.sqrt(len(vals))
    assert abs(vals.mean() - (sp_pos + exp_neg)) < 5 * se + 1e-3


def test_dd_nn_model_fused_path_trains(setup):
    """DR-NN end to end on the fused NN dense BCE (XLA fallback, CPU)."""
    import optax

    from tip_tpu.models.dd import DDConfig, DDModel, make_dd_graph_arrays

    data = setup[0]
    graph, gs = make_dd_graph_arrays(data, chunk=64, dense_dtype="float32")
    cfg = DDConfig(decoder="nn", negatives="poisson", n_embed=8, n_hid1=8,
                   n_hid2=8, num_base=4)
    model = DDModel.for_data(cfg, gs, backend="xla")
    params = model.init(jax.random.key(0))
    loss0 = float(jax.jit(model.loss)(params, graph, jax.random.key(1)))
    assert abs(loss0 - 2 * np.log(2)) < 0.35  # NN decoder init is wider
    opt = optax.adam(0.01)
    ost = opt.init(params)

    @jax.jit
    def step(p, o, k):
        l, g = jax.value_and_grad(lambda q: model.loss(q, graph, k))(p)
        u, o = opt.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    for i in range(8):
        params, ost, l = step(params, ost, jax.random.key(20 + i))
        losses.append(float(l))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
