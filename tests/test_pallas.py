"""Pallas kernels vs the XLA oracle path (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tip_tpu.data.packing import (
    split_typed_edges,
    sort_typed_edges,
    pad_typed_edges,
)
from tip_tpu.data import synthetic_trigraph
from tip_tpu.ops.segment import typed_neighbor_sum
from tip_tpu.ops.pallas_segment import typed_neighbor_sum_padded_t


@pytest.fixture(scope="module")
def packed():
    raw = synthetic_trigraph(n_drug=40, n_prot=10, n_et=5, pairs_per_et=70, seed=2)
    edges, _ = split_typed_edges(raw.dd_pair_list, p=0.95, seed=0)
    edges = sort_typed_edges(edges)
    padded = pad_typed_edges(edges, raw.n_drug, chunk=32)
    return raw, edges, padded


def _padded_2d(padded):
    n_chunks = padded.chunk_type.shape[0]
    return (
        jnp.asarray(padded.src.reshape(n_chunks, padded.chunk)),
        jnp.asarray(padded.dst.reshape(n_chunks, padded.chunk)),
        jnp.asarray(padded.chunk_type),
    )


def test_typed_neighbor_sum_padded_matches_xla(packed):
    raw, edges, padded = packed
    n, d = raw.n_drug, 16
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, d)), jnp.float32)
    src2d, dst2d, ct = _padded_2d(padded)
    want = typed_neighbor_sum(
        x, edges.edge_index[0], edges.edge_index[1], edges.edge_type, n, edges.n_et
    )
    with pltpu.force_tpu_interpret_mode():
        got = typed_neighbor_sum_padded_t(x, src2d, dst2d, ct, edges.n_et)
    got = jnp.swapaxes(got, 1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gcn_spmm_padded_matches_xla():
    from tip_tpu.data.packing import gcn_normalize, pad_windowed_edges
    from tip_tpu.ops.segment import weighted_gather_sum
    from tip_tpu.ops.pallas_segment import gcn_spmm_padded

    rng = np.random.default_rng(5)
    n, d = 200, 16
    e = rng.integers(0, n, size=(2, 600), dtype=np.int32)
    e = e[:, e[0] != e[1]]
    e = np.unique(np.stack([np.minimum(e[0], e[1]), np.maximum(e[0], e[1])]), axis=1)
    e = np.concatenate([e, e[::-1]], axis=1)
    idx, w = gcn_normalize(e, n)
    win = pad_windowed_edges(idx, w, n, window=64, chunk=32)
    n_chunks = win.chunk_window.shape[0]
    src2d = jnp.asarray(win.src.reshape(n_chunks, win.chunk))
    dstl2d = jnp.asarray(win.dst_local.reshape(n_chunks, win.chunk))
    w2d = jnp.asarray(win.weight.reshape(n_chunks, win.chunk))
    cw = jnp.asarray(win.chunk_window)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)

    want = weighted_gather_sum(x, idx[0], idx[1], jnp.asarray(w), n)
    with pltpu.force_tpu_interpret_mode():
        got = gcn_spmm_padded(x, src2d, dstl2d, w2d, cw, win.n_windows, win.window, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # gradient path (symmetric adjacency => bwd reuses fwd kernel)
    cot = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    g_want = jax.grad(
        lambda x: jnp.vdot(weighted_gather_sum(x, idx[0], idx[1], jnp.asarray(w), n), cot)
    )(x)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(
            lambda x: jnp.vdot(
                gcn_spmm_padded(x, src2d, dstl2d, w2d, cw, win.n_windows, win.window, n),
                cot,
            )
        )(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-4)


def test_model_backend_parity():
    """Full encoder+loss parity: pallas kernels vs XLA segment path."""
    from tip_tpu.config import ModelConfig
    from tip_tpu.data import synthetic_trigraph, build_trigraph
    from tip_tpu.train.model import TIP, make_graph_arrays

    raw = synthetic_trigraph(n_drug=40, n_prot=70, n_et=5, pairs_per_et=50, seed=4)
    data = build_trigraph(raw, split_rate=0.9, seed=4)
    graph, gs = make_graph_arrays(data, dd_chunk=32, pp_window=64, pp_chunk=32)
    cfg = ModelConfig(
        mode="cat", prot_drug_dim=6, n_embed=10, n_hid1=8, n_hid2=6,
        num_base=4, pp_hid1=8, pp_hid2=6,
    )
    m_xla = TIP.for_data(cfg, data, gs, backend="xla")
    m_pal = TIP.for_data(cfg, data, gs, backend="pallas")
    params = m_xla.init(jax.random.key(0))
    k = jax.random.key(1)

    z_xla = m_xla.encode(params, graph)
    with pltpu.force_tpu_interpret_mode():
        z_pal = m_pal.encode(params, graph)
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_xla), atol=1e-4)

    # loss/grad parity with FIXED negatives (the two backends use different
    # sampler streams by design — XLA bitmap gather vs the in-VMEM kernel)
    from tip_tpu.sampling import typed_negative_sampling_chunked

    ns2d, nd2d = typed_negative_sampling_chunked(
        k, graph["dd_chunk_type"], graph["dd_bitmap"], gs.n_drug, gs.n_et,
        gs.dd_chunk, backend="xla",
    )

    def fixed_loss(model):
        def fn(p):
            z = model.encode(p, graph)
            pos = model.score_padded(
                p, z, graph["dd_src2d"], graph["dd_dst2d"],
                graph["dd_chunk_type"], sigmoid=False,
            )
            neg = model.score_padded(
                p, z, ns2d, nd2d, graph["dd_chunk_type"], sigmoid=False,
            )
            v = graph["dd_valid"]
            return (
                jnp.sum(jax.nn.softplus(-pos) * v)
                + jnp.sum(jax.nn.softplus(neg) * v)
            ) / gs.dd_n_valid
        return fn

    import jax.numpy as jnp

    l_xla, g_xla = jax.value_and_grad(fixed_loss(m_xla))(params)
    with pltpu.force_tpu_interpret_mode():
        l_pal, g_pal = jax.value_and_grad(fixed_loss(m_pal))(params)
    np.testing.assert_allclose(float(l_pal), float(l_xla), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        g_pal, g_xla,
    )

    # the pallas sampler itself: same invariants as the XLA path
    with pltpu.force_tpu_interpret_mode():
        ps, pd = typed_negative_sampling_chunked(
            k, graph["dd_chunk_type"], graph["dd_bitmap"], gs.n_drug, gs.n_et,
            gs.dd_chunk, backend="pallas",
        )
    assert 0 <= int(jnp.min(ps)) and int(jnp.max(ps)) < gs.n_drug
    assert 0 <= int(jnp.min(pd)) and int(jnp.max(pd)) < gs.n_drug


def test_typed_neighbor_sum_padded_grad_matches_xla(packed):
    raw, edges, padded = packed
    n, d = raw.n_drug, 8
    x = jnp.asarray(np.random.default_rng(1).normal(size=(n, d)), jnp.float32)
    src2d, dst2d, ct = _padded_2d(padded)
    cot = jnp.asarray(
        np.random.default_rng(2).normal(size=(edges.n_et, n, d)), jnp.float32
    )

    def loss_xla(x):
        p = typed_neighbor_sum(
            x, edges.edge_index[0], edges.edge_index[1], edges.edge_type, n, edges.n_et
        )
        return jnp.vdot(p, cot)

    def loss_pallas(x):
        pt = typed_neighbor_sum_padded_t(x, src2d, dst2d, ct, edges.n_et)
        p = jnp.swapaxes(pt, 1, 2)
        return jnp.vdot(p, cot)

    g_want = jax.grad(loss_xla)(x)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_pallas)(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-4)


def test_nn_decoder_padded_matches_xla(packed):
    """Fused NN-decoder kernel: fwd + grads == the XLA gather path (on the
    valid mask; padding rows differ by convention and are always masked)."""
    from tip_tpu.nn.decoders import nn_decoder_init, nn_decoder_apply_padded

    raw, edges, padded = packed
    n, hid, l1 = raw.n_drug, 6, 8
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(n, hid)), jnp.float32)
    params = nn_decoder_init(jax.random.key(5), hid, edges.n_et, l1)
    src2d, dst2d, ct = _padded_2d(padded)
    valid = jnp.asarray(padded.valid.astype("float32"))

    def masked_sum(backend):
        def fn(params, z):
            logits = nn_decoder_apply_padded(
                params, z, src2d, dst2d, ct, sigmoid=False, backend=backend
            )
            return jnp.sum(jax.nn.softplus(logits) * valid), logits
        return fn

    (s_xla, l_xla), g_xla = jax.value_and_grad(
        masked_sum("xla"), argnums=(0, 1), has_aux=True
    )(params, z)
    import jax.experimental.pallas.tpu as _  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        (s_pal, l_pal), g_pal = jax.value_and_grad(
            masked_sum("pallas"), argnums=(0, 1), has_aux=True
        )(params, z)
    mask = np.asarray(valid) > 0
    np.testing.assert_allclose(
        np.asarray(l_pal)[mask], np.asarray(l_xla)[mask], atol=1e-5
    )
    np.testing.assert_allclose(float(s_pal), float(s_xla), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        g_pal, g_xla,
    )


def test_sampler_two_draw_mode_reaches_off_grid_pairs():
    """Above 4096 nodes (n^2 > 2^24) the kernel draws src and dst with two
    independent 24-bit draws — a single 24-bit fixed-point pair draw could
    only reach ~2^24 of the n^2 pairs (ops/pallas_sampler.py).  Verify the
    sampled pairs land OFF the old single-draw grid."""
    from tip_tpu.ops.pallas_sampler import typed_negative_sampling_padded
    from tip_tpu.sampling.negative import bitmap_stride_bits

    n = 4500  # n^2 ~ 20.25M > 2^24
    n_et, chunk, n_chunks = 1, 256, 8
    bitmap = jnp.zeros(bitmap_stride_bits(n) // 32, jnp.uint32)  # no positives
    ct = jnp.zeros((n_chunks,), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        pair = typed_negative_sampling_padded(
            jax.random.key(7), ct, bitmap, n, n_et, chunk
        )
    pair = np.asarray(pair, np.int64).ravel()
    assert pair.min() >= 0 and pair.max() < n * n
    # old single-draw grid: p reachable iff some k in [0, 2^24) has
    # floor(k * n^2 / 2^24) == p
    g = (n * n) / float(1 << 24)
    k0 = np.ceil(pair / g)
    on_old_grid = k0 * g < pair + 1
    # ~17% of pairs are off-grid at this n; require a robust margin
    assert (~on_old_grid).mean() > 0.05


def test_sampler_rejects_int32_overflow_nodes():
    from tip_tpu.ops.pallas_sampler import typed_negative_sampling_padded

    import pytest

    with pytest.raises(ValueError, match="int32 pair"):
        typed_negative_sampling_padded(
            jax.random.key(0), jnp.zeros((1,), jnp.int32),
            jnp.zeros((8,), jnp.uint32), 50000, 1, 8,
        )
