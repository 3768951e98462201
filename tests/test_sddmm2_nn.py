"""Two-level NN-decoder kernel vs the XLA oracle (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tip_tpu.data import synthetic_trigraph
from tip_tpu.data.packing import pad_typed_edges, sort_typed_edges, split_typed_edges
from tip_tpu.ops.pallas_sddmm2 import nn_logits_padded2


def _setup(n_drug=300, n_et=4, l1=16):
    raw = synthetic_trigraph(n_drug=n_drug, n_prot=10, n_et=n_et, pairs_per_et=60, seed=5)
    edges, _ = split_typed_edges(raw.dd_pair_list, p=0.95, seed=0)
    edges = sort_typed_edges(edges)
    padded = pad_typed_edges(edges, n_drug, chunk=32)
    nc = padded.chunk_type.shape[0]
    rng = np.random.default_rng(6)
    return (
        jnp.asarray(padded.src.reshape(nc, 32)),
        jnp.asarray(padded.dst.reshape(nc, 32)),
        jnp.asarray(padded.chunk_type),
        jnp.asarray(padded.valid.reshape(nc, 32).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n_drug, l1)), jnp.float32),
        jnp.asarray(rng.normal(size=(n_drug, l1)), jnp.float32),
        jnp.asarray(rng.normal(size=(edges.n_et, l1)), jnp.float32),
        jnp.asarray(rng.normal(size=(edges.n_et, l1)), jnp.float32),
        n_drug,
    )


def _xla(h1, h2, w1, w2, src2d, dst2d, ct, n):
    chunk = src2d.shape[1]
    src = jnp.minimum(src2d.reshape(-1), n - 1)
    dst = dst2d.reshape(-1)
    et = jnp.repeat(ct, chunk)
    s1 = jnp.sum(h1[src] * w1[et], axis=-1)
    s2 = jnp.where(
        dst < n, jnp.sum(h2[jnp.minimum(dst, n - 1)] * w2[et], axis=-1), 0.0
    )
    return (s1 + s2).reshape(src2d.shape)


def test_nn2_values_and_grads_match_xla():
    src2d, dst2d, ct, valid, h1, h2, w1, w2, n = _setup()

    want = _xla(h1, h2, w1, w2, src2d, dst2d, ct, n)
    with pltpu.force_tpu_interpret_mode():
        got = nn_logits_padded2(h1, h2, w1, w2, src2d, dst2d, ct, n)
    # masked comparison: the pad-src term differs by contract (caller masks)
    np.testing.assert_allclose(
        np.asarray(got * valid), np.asarray(want * valid), atol=1e-5
    )

    def loss(args, fn):
        h1, h2, w1, w2 = args
        lg = fn(h1, h2, w1, w2)
        return jnp.sum(jax.nn.softplus(lg) * valid * jnp.cos(lg))

    g_w = jax.grad(lambda a: loss(
        a, lambda *x: _xla(*x, src2d, dst2d, ct, n)))((h1, h2, w1, w2))
    with pltpu.force_tpu_interpret_mode():
        g_g = jax.grad(lambda a: loss(
            a, lambda *x: nn_logits_padded2(*x, src2d, dst2d, ct, n)))(
            (h1, h2, w1, w2))
    for a, b in zip(g_g, g_w):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3
        )
