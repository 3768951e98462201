"""Layer-level parity tests against the per-edge numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.oracle import (
    rgcn_oracle,
    hierarchy_oracle,
    gcn_oracle,
    distmult_oracle,
)
from tip_tpu.data.packing import gcn_normalize
from tip_tpu.nn import (
    gcn_conv_init,
    gcn_conv_apply,
    rgcn_init,
    rgcn_apply,
    hierarchy_conv_init,
    hierarchy_conv_apply,
    distmult_init,
    distmult_apply,
    nn_decoder_init,
    nn_decoder_apply,
)


@pytest.fixture(scope="module")
def nprng():
    return np.random.default_rng(42)


def _typed_edges(nprng, n_nodes, n_et, per_type):
    """(type, dst)-sorted random typed edges."""
    src, dst, et = [], [], []
    for t in range(n_et):
        m = nprng.integers(per_type // 2, per_type)
        s = nprng.integers(0, n_nodes, m)
        d = nprng.integers(0, n_nodes, m)
        o = np.argsort(d, kind="stable")
        src.append(s[o]); dst.append(d[o]); et.append(np.full(m, t))
    return (np.concatenate(src).astype(np.int32),
            np.concatenate(dst).astype(np.int32),
            np.concatenate(et).astype(np.int32))


def test_rgcn_matches_oracle(nprng):
    n_nodes, n_et, n_base, d_in, d_out = 23, 5, 4, 8, 6
    src, dst, et = _typed_edges(nprng, n_nodes, n_et, 40)
    x = nprng.normal(size=(n_nodes, d_in)).astype(np.float32)
    params = rgcn_init(jax.random.key(0), d_in, d_out, n_et, n_base, after_relu=False)
    deg = np.bincount(dst, minlength=n_nodes)
    got = rgcn_apply(params, jnp.asarray(x), src, dst, et, jnp.asarray(deg),
                     n_nodes, n_et)
    want = rgcn_oracle(
        x.astype(np.float64), src, dst, et,
        np.asarray(params["att"], np.float64),
        np.asarray(params["basis"], np.float64),
        np.asarray(params["root"], np.float64),
        n_nodes,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_rgcn_mean_denominator_is_cross_type(nprng):
    """A node receiving edges of two relations divides by TOTAL in-degree."""
    n_nodes, d = 4, 3
    # two edges into node 0, different relations
    src = np.array([1, 2], np.int32)
    dst = np.array([0, 0], np.int32)
    et = np.array([0, 1], np.int32)
    x = np.eye(n_nodes, d).astype(np.float32)
    params = rgcn_init(jax.random.key(1), d, d, 2, 2, after_relu=False)
    deg = np.array([2, 0, 0, 0])
    got = np.asarray(rgcn_apply(params, jnp.asarray(x), src, dst, et,
                                jnp.asarray(deg), n_nodes, 2))
    w = np.einsum("tb,bde->tde", np.asarray(params["att"]), np.asarray(params["basis"]))
    expect0 = 0.5 * (x[1] @ w[0] + x[2] @ w[1]) + x[0] @ np.asarray(params["root"])
    np.testing.assert_allclose(got[0], expect0, atol=1e-5)


def test_hierarchy_matches_oracle(nprng):
    n_src, n_dst, d_in, d_out = 37, 11, 6, 5
    m = 60
    src = nprng.integers(0, n_src, m).astype(np.int32)
    dst = np.sort(nprng.integers(0, n_dst, m)).astype(np.int32)
    x = nprng.normal(size=(n_src, d_in)).astype(np.float32)
    params = hierarchy_conv_init(jax.random.key(2), d_in, d_out)
    deg = np.bincount(dst, minlength=n_dst)
    got = hierarchy_conv_apply(params, jnp.asarray(x), src, dst,
                               jnp.asarray(deg), n_dst)
    want = hierarchy_oracle(x.astype(np.float64), src, dst,
                            np.asarray(params["weight"], np.float64), n_dst)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def _sym_edges(nprng, n, m):
    e = nprng.integers(0, n, size=(2, m), dtype=np.int32)
    e = e[:, e[0] != e[1]]
    e = np.unique(np.stack([np.minimum(e[0], e[1]), np.maximum(e[0], e[1])]), axis=1)
    return np.concatenate([e, e[::-1]], axis=1)


def test_gcn_matches_dense_oracle(nprng):
    n, d_in, d_out = 19, 7, 4
    e = _sym_edges(nprng, n, 50)
    idx, w = gcn_normalize(e, n)
    params = gcn_conv_init(jax.random.key(3), d_in, d_out)
    x = nprng.normal(size=(n, d_in)).astype(np.float32)
    got = gcn_conv_apply(params, jnp.asarray(x), idx, jnp.asarray(w), n)
    want = gcn_oracle(x.astype(np.float64), e, n,
                      np.asarray(params["weight"], np.float64),
                      np.asarray(params["bias"], np.float64))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_gcn_identity_fast_path(nprng):
    """x=None must equal feeding an explicit identity matrix."""
    n, d_out = 13, 5
    e = _sym_edges(nprng, n, 30)
    idx, w = gcn_normalize(e, n)
    params = gcn_conv_init(jax.random.key(4), n, d_out)
    fast = gcn_conv_apply(params, None, idx, jnp.asarray(w), n)
    full = gcn_conv_apply(params, jnp.eye(n), idx, jnp.asarray(w), n)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full), atol=1e-6)


def test_distmult_matches_oracle(nprng):
    n, d, n_et, m = 15, 6, 4, 40
    z = nprng.normal(size=(n, d)).astype(np.float32)
    src = nprng.integers(0, n, m).astype(np.int32)
    dst = nprng.integers(0, n, m).astype(np.int32)
    et = nprng.integers(0, n_et, m).astype(np.int32)
    params = distmult_init(jax.random.key(5), d, n_et)
    got = distmult_apply(params, jnp.asarray(z), src, dst, et)
    want = distmult_oracle(z.astype(np.float64), np.asarray(params["weight"], np.float64),
                           src, dst, et)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_nn_decoder_runs_and_is_in_01(nprng):
    n, d, n_et, m = 15, 6, 4, 40
    z = nprng.normal(size=(n, d)).astype(np.float32)
    src = nprng.integers(0, n, m).astype(np.int32)
    dst = nprng.integers(0, n, m).astype(np.int32)
    et = nprng.integers(0, n_et, m).astype(np.int32)
    params = nn_decoder_init(jax.random.key(6), d, n_et, l1_dim=8)
    s = np.asarray(nn_decoder_apply(params, jnp.asarray(z), src, dst, et))
    assert s.shape == (m,)
    assert np.all((s > 0) & (s < 1))
    # gather/projection commutation sanity: per-edge naive computation
    w1 = np.asarray(params["w1_l1"]); w2 = np.asarray(params["w2_l1"])
    l1 = np.asarray(params["w1_l2"]); l2 = np.asarray(params["w2_l2"])
    d1 = np.maximum(z[src] @ w1, 0)
    d2 = np.maximum(z[dst] @ w2, 0)
    logits = (d1 * l1[et]).sum(1) + (d2 * l2[et]).sum(1)
    np.testing.assert_allclose(s, 1 / (1 + np.exp(-logits)), atol=1e-5)
