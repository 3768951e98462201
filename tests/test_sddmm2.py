"""Two-level-gather DistMult SDDMM kernel vs the XLA oracle (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tip_tpu.data import synthetic_trigraph
from tip_tpu.data.packing import pad_typed_edges, sort_typed_edges, split_typed_edges
from tip_tpu.ops.pallas_sddmm2 import (
    distmult_logits_padded2,
    pack_table_t,
    unpack_table_t,
)


def _xla_logits(z, w, src2d, dst2d, chunk_type, n_nodes):
    chunk = src2d.shape[1]
    src = src2d.reshape(-1)
    dst = dst2d.reshape(-1)
    et = jnp.repeat(chunk_type, chunk)
    zsrc = jnp.where(src[:, None] < n_nodes, z[jnp.minimum(src, n_nodes - 1)], 0.0)
    zdst = jnp.where(dst[:, None] < n_nodes, z[jnp.minimum(dst, n_nodes - 1)], 0.0)
    return jnp.sum(zsrc * zdst * w[et], axis=-1).reshape(src2d.shape)


@pytest.mark.parametrize("n_drug", [40, 300])
def test_pack_unpack_roundtrip(n_drug):
    z = jnp.asarray(np.random.default_rng(0).normal(size=(n_drug, 16)), jnp.float32)
    z2t = pack_table_t(z, n_drug)
    assert z2t.shape == (16 * (n_drug // 128 + 1), 128)
    np.testing.assert_array_equal(np.asarray(unpack_table_t(z2t, n_drug, 16)), np.asarray(z))


@pytest.mark.parametrize("n_drug", [40, 300])
def test_sddmm2_matches_xla(n_drug):
    raw = synthetic_trigraph(n_drug=n_drug, n_prot=10, n_et=5, pairs_per_et=70, seed=2)
    edges, _ = split_typed_edges(raw.dd_pair_list, p=0.95, seed=0)
    edges = sort_typed_edges(edges)
    padded = pad_typed_edges(edges, n_drug, chunk=32)
    n_chunks = padded.chunk_type.shape[0]
    src2d = jnp.asarray(padded.src.reshape(n_chunks, 32))
    dst2d = jnp.asarray(padded.dst.reshape(n_chunks, 32))
    ct = jnp.asarray(padded.chunk_type)
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(n_drug, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(edges.n_et, 16)), jnp.float32)

    want = _xla_logits(z, w, src2d, dst2d, ct, n_drug)
    with pltpu.force_tpu_interpret_mode():
        got = distmult_logits_padded2(z, w, src2d, dst2d, ct, n_drug)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # padding slots must be exactly zero
    valid = padded.valid.reshape(n_chunks, 32)
    assert np.all(np.asarray(got)[~valid.astype(bool)] == 0.0)


def test_sddmm2_grads_match_xla():
    n_drug = 300
    raw = synthetic_trigraph(n_drug=n_drug, n_prot=10, n_et=4, pairs_per_et=60, seed=3)
    edges, _ = split_typed_edges(raw.dd_pair_list, p=0.95, seed=0)
    edges = sort_typed_edges(edges)
    padded = pad_typed_edges(edges, n_drug, chunk=32)
    n_chunks = padded.chunk_type.shape[0]
    src2d = jnp.asarray(padded.src.reshape(n_chunks, 32))
    dst2d = jnp.asarray(padded.dst.reshape(n_chunks, 32))
    ct = jnp.asarray(padded.chunk_type)
    valid = jnp.asarray(padded.valid.reshape(n_chunks, 32).astype(np.float32))
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.normal(size=(n_drug, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(edges.n_et, 16)), jnp.float32)

    def loss_xla(z, w):
        lg = _xla_logits(z, w, src2d, dst2d, ct, n_drug)
        return jnp.sum(jax.nn.softplus(lg) * valid * jnp.cos(lg))

    def loss_p(z, w):
        lg = distmult_logits_padded2(z, w, src2d, dst2d, ct, n_drug)
        return jnp.sum(jax.nn.softplus(lg) * valid * jnp.cos(lg))

    gz_w, gw_w = jax.grad(loss_xla, argnums=(0, 1))(z, w)
    with pltpu.force_tpu_interpret_mode():
        gz_g, gw_g = jax.grad(loss_p, argnums=(0, 1))(z, w)
    # different accumulation orders (per-chunk kernel vs one flat XLA sum)
    # reassociate f32 — tolerance covers that, not a semantic gap
    np.testing.assert_allclose(np.asarray(gz_g), np.asarray(gz_w), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_g), np.asarray(gw_w), atol=1e-3, rtol=1e-3)
