import numpy as np
import jax
import jax.numpy as jnp

from tip_tpu.data import synthetic_trigraph, build_trigraph
from tip_tpu.sampling import typed_negative_sampling


def _graph():
    raw = synthetic_trigraph(n_drug=30, n_prot=40, n_et=4, pairs_per_et=50, seed=9)
    return build_trigraph(raw, split_rate=0.9, seed=9)


def test_negatives_avoid_same_type_positives():
    g = _graph()
    et = jnp.asarray(g.dd_train.edge_type)
    src, dst = typed_negative_sampling(
        jax.random.key(0), et, jnp.asarray(g.dd_train_bitmap), g.n_drug, rounds=8
    )
    src, dst = np.asarray(src), np.asarray(dst)
    assert src.shape == (g.dd_train.n_edges,)
    assert np.all((src >= 0) & (src < g.n_drug))
    assert np.all((dst >= 0) & (dst < g.n_drug))
    cand = (g.dd_train.edge_type.astype(np.int64) * g.n_drug + dst) * g.n_drug + src
    # with 8 rounds on this sparse graph, no collisions should survive
    assert not np.any(np.isin(cand, g.dd_train_keys))


def test_negatives_differ_across_keys_and_are_jittable():
    g = _graph()
    et = jnp.asarray(g.dd_train.edge_type)
    keys = jnp.asarray(g.dd_train_bitmap)
    f = jax.jit(lambda k: typed_negative_sampling(k, et, keys, g.n_drug))
    s1, d1 = f(jax.random.key(1))
    s2, d2 = f(jax.random.key(2))
    assert not (np.array_equal(np.asarray(s1), np.asarray(s2))
                and np.array_equal(np.asarray(d1), np.asarray(d2)))


def test_negative_distribution_covers_nodes():
    g = _graph()
    src, dst = typed_negative_sampling(
        jax.random.key(3), jnp.asarray(g.dd_train.edge_type),
        jnp.asarray(g.dd_train_bitmap), g.n_drug,
    )
    # uniform corruption should touch most nodes on a graph this size
    assert len(np.unique(np.asarray(src))) > g.n_drug * 0.8
