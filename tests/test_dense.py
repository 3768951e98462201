"""Dense relation-adjacency R-GCN path (data/packing.py:dense_relation_adj,
nn/rgcn.py dense branch): exact parity with the chunked XLA segment path.

The dense path is the production TPU configuration at Decagon scale (645
drugs => the whole [1097, 645, 645] multigraph rides the MXU as one batched
GEMM); these tests pin its math to the streaming implementation the numpy
oracle already validates (tests/test_layers.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tip_tpu.config import ModelConfig
from tip_tpu.data import build_trigraph, synthetic_trigraph
from tip_tpu.data.packing import dense_relation_adj
from tip_tpu.train.model import TIP, dense_rgcn_feasible, make_graph_arrays


@pytest.fixture(scope="module")
def small_data():
    raw = synthetic_trigraph(n_drug=64, n_prot=96, n_et=9, pairs_per_et=60,
                             seed=3)
    return build_trigraph(raw, split_rate=0.9, seed=3)


def test_dense_relation_adj_counts(small_data):
    edges = small_data.dd_train
    da = dense_relation_adj(edges, small_data.n_drug)
    assert da.shape == (edges.n_et, small_data.n_drug, small_data.n_drug)
    src, dst = edges.edge_index
    # row sums per (t, dst) = per-destination in-degree within the relation
    for e in range(0, edges.n_edges, max(1, edges.n_edges // 50)):
        t, s, d = int(edges.edge_type[e]), int(src[e]), int(dst[e])
        assert da[t, d, s] >= 1
    assert int(da.sum()) == edges.n_edges


def test_dense_encode_and_grad_parity(small_data):
    data = small_data
    kw = dict(dd_chunk=64, pp_window=128, pp_chunk=64)
    g0, gs = make_graph_arrays(data, **kw)
    g1, _ = make_graph_arrays(data, dense_dtype="float32", **kw)
    # strict f32 parity targets the dense R-GCN binning; the dense P-P path
    # rounds its streamed operand to bf16 by design (nn/gcn.py) and has its
    # own tolerance test (tests/test_pp_dense.py) — drop it here
    g1 = {k: v for k, v in g1.items() if k not in ("pp_a1", "pp_dinv")}
    # negatives='sampled' pins BOTH graphs to the per-slot sampler so the
    # dense-vs-chunked comparison is exact; the Poissonized dense estimator
    # (the dense default) draws different negatives by design and has its
    # own oracle tests (tests/test_dense_bce.py)
    m = TIP.for_data(
        ModelConfig.tip_cat(negatives="sampled"), data, gs, backend="xla"
    )
    p = m.init(jax.random.key(0))
    z0 = jax.jit(m.encode)(p, g0)
    z1 = jax.jit(m.encode)(p, g1)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=1e-5)

    k = jax.random.key(5)
    l0, grad0 = jax.value_and_grad(lambda q: m.loss(q, g0, k))(p)
    l1, grad1 = jax.value_and_grad(lambda q: m.loss(q, g1, k))(p)
    assert float(jnp.abs(l0 - l1)) < 1e-6
    for a, b in zip(jax.tree.leaves(grad0), jax.tree.leaves(grad1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dense_bf16_close(small_data):
    """bf16 dense adjacency: counts are exact; only x rounds (same contract
    as the bf16 Pallas kernels, see RESULTS.md bf16 verdict)."""
    data = small_data
    kw = dict(dd_chunk=64, pp_window=128, pp_chunk=64)
    g0, gs = make_graph_arrays(data, **kw)
    g1, _ = make_graph_arrays(data, dense_dtype="bfloat16", **kw)
    m = TIP.for_data(ModelConfig.tip_cat(), data, gs, backend="xla")
    p = m.init(jax.random.key(0))
    z0 = np.asarray(jax.jit(m.encode)(p, g0))
    z1 = np.asarray(jax.jit(m.encode)(p, g1))
    np.testing.assert_allclose(z0, z1, atol=5e-2)
    assert (g1["dd_adj_t"] == g1["dd_adj_t"].astype(jnp.float32).astype(
        jnp.bfloat16)).all()


def test_dense_feasible_policy():
    assert dense_rgcn_feasible(645, 1097, "bfloat16")
    assert dense_rgcn_feasible(645, 1097, "float32")
    assert not dense_rgcn_feasible(19081, 1097, "bfloat16")


def test_sym_rgcn_pair_matches_full_pair(small_data):
    """dense_rgcn_pair_apply_sym (strip-packed int8) == dense_rgcn_pair_apply
    (full bf16 pages): same math, reassociated — bf16-input tolerance."""
    import jax.numpy as jnp
    from tip_tpu.data.packing import (
        cast_dense_adj, dense_relation_adj, pad_dense_adj, sym_strip_pack,
    )
    from tip_tpu.nn.rgcn import (
        dense_rgcn_pair_apply, dense_rgcn_pair_apply_sym, rgcn_init,
    )

    data = small_data
    da = dense_relation_adj(data.dd_train, data.n_drug)
    full = jnp.asarray(pad_dense_adj(cast_dense_adj(da, jnp.bfloat16)))
    strips = jnp.asarray(sym_strip_pack(da))
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    p1 = rgcn_init(k1, 12, 10, data.n_et, 4, after_relu=False)
    p2 = rgcn_init(k2, 10, 6, data.n_et, 4, after_relu=True)
    x = jax.random.normal(k3, (data.n_drug, 12)) * 0.5
    deg = jnp.asarray(data.dd_train_deg)

    out_full = dense_rgcn_pair_apply(p1, p2, x, full, deg)
    out_sym = dense_rgcn_pair_apply_sym(p1, p2, x, strips, deg)
    scale = float(jnp.abs(out_full).max())
    np.testing.assert_allclose(
        np.asarray(out_sym), np.asarray(out_full), atol=2e-2 * scale
    )
    g_full = jax.grad(lambda q: jnp.sum(
        dense_rgcn_pair_apply(q, p2, x, full, deg) ** 2))(p1)
    g_sym = jax.grad(lambda q: jnp.sum(
        dense_rgcn_pair_apply_sym(q, p2, x, strips, deg) ** 2))(p1)
    for k in g_full:
        s = float(jnp.abs(g_full[k]).max())
        np.testing.assert_allclose(
            np.asarray(g_sym[k]), np.asarray(g_full[k]),
            atol=3e-2 * max(s, 1e-6), err_msg=k,
        )
