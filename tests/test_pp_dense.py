"""Dense bf16 (A+I) P-P GCN path vs the cached-normalization COO oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from tip_tpu.data import build_trigraph, synthetic_trigraph
from tip_tpu.data.packing import dense_pp_parts
from tip_tpu.nn.encoders import (
    pp_encoder_apply,
    pp_encoder_apply_dense,
    pp_encoder_init,
)


def test_dense_pp_matches_coo():
    raw = synthetic_trigraph(n_drug=20, n_prot=150, n_et=3, pairs_per_et=40, seed=9)
    data = build_trigraph(raw, split_rate=0.9, seed=0)
    a1, dinv = dense_pp_parts(data.pp_norm_index, data.n_prot)

    # factored dense normalization == the cached COO weights
    w_dense = (
        dinv[data.pp_norm_index[1]]
        * dinv[data.pp_norm_index[0]]
    )
    np.testing.assert_allclose(w_dense, data.pp_norm_weight, rtol=1e-6)

    params = pp_encoder_init(jax.random.key(0), data.n_prot, 32, 16)
    want = pp_encoder_apply(
        params, None, jnp.asarray(data.pp_norm_index),
        jnp.asarray(data.pp_norm_weight), data.n_prot,
    )
    got = pp_encoder_apply_dense(params, None, jnp.asarray(a1), jnp.asarray(dinv))
    # dense path rounds the streamed operand to bf16 (matching TPU
    # default-precision matmuls); tolerance covers that rounding only
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_dense_pp_grads_flow():
    raw = synthetic_trigraph(n_drug=10, n_prot=80, n_et=2, pairs_per_et=20, seed=3)
    data = build_trigraph(raw, split_rate=0.9, seed=0)
    a1, dinv = dense_pp_parts(data.pp_norm_index, data.n_prot)
    params = pp_encoder_init(jax.random.key(1), data.n_prot, 8, 4)

    def loss(p):
        return jnp.sum(
            pp_encoder_apply_dense(p, None, jnp.asarray(a1), jnp.asarray(dinv)) ** 2
        )

    g = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


def test_encoder_selects_dense_pp_branch():
    """fm_encoder_apply takes the dense P-P path when pp_a1 is shipped;
    output must match the COO-path encoder within bf16-stream tolerance."""
    import jax.numpy as jnp

    from tip_tpu.config import ModelConfig
    from tip_tpu.train.model import TIP, make_graph_arrays

    raw = synthetic_trigraph(n_drug=24, n_prot=100, n_et=3, pairs_per_et=40, seed=4)
    data = build_trigraph(raw, split_rate=0.9, seed=0)
    g0, gs = make_graph_arrays(data, dd_chunk=64, pp_window=64, pp_chunk=32)
    g1, _ = make_graph_arrays(
        data, dd_chunk=64, pp_window=64, pp_chunk=32, dense_dtype="bfloat16"
    )
    assert "pp_a1" in g1 and "pp_dinv" in g1
    m = TIP.for_data(ModelConfig.tip_cat(), data, gs, backend="xla")
    p = m.init(jax.random.key(0))
    # isolate the P-P branch: drop the D-D dense adjacency from g1
    g1 = {k: v for k, v in g1.items() if k != "dd_adj_t"}
    z0 = np.asarray(jax.jit(m.encode)(p, g0))
    z1 = np.asarray(jax.jit(m.encode)(p, g1))
    np.testing.assert_allclose(z0, z1, atol=2e-2, rtol=2e-2)
    assert not np.array_equal(z0, z1) or np.allclose(z0, 0)  # branch taken
