"""RDMA ring SpMM kernel vs the XLA ppermute ring (interpret mode, CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tip_tpu.data import synthetic_trigraph, build_trigraph
from tip_tpu.ops import weighted_gather_sum
from tip_tpu.ops.pallas_ring import ring_spmm_rdma
from tip_tpu.parallel import make_mesh
from tip_tpu.parallel.mesh import EDGE_AXIS
from tip_tpu.parallel.ring import build_ring_pp, ring_shard_size


@pytest.fixture(scope="module")
def ring_setup():
    raw = synthetic_trigraph(n_drug=40, n_prot=300, n_et=4, pairs_per_et=50, seed=21)
    data = build_trigraph(raw, split_rate=0.9, seed=21)
    k = 4
    n_local = ring_shard_size(data.n_prot, k)
    ring = build_ring_pp(
        data.pp_norm_index, data.pp_norm_weight, data.dp_edge_index,
        data.n_prot, k, pad_multiple=128,
    )
    return data, ring, k, n_local


def _sharded(fn, mesh, n_out_shards):
    return jax.jit(
        shard_map(
            fn, mesh=mesh,
            in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS)),
            out_specs=P(EDGE_AXIS),
            check_vma=False,  # remote-DMA semaphores are untyped for vma
        )
    )


def test_ring_rdma_matches_dense(ring_setup):
    data, ring, k, n_local = ring_setup
    d = 8
    rng = np.random.default_rng(6)
    h = rng.normal(size=(data.n_prot, d)).astype(np.float32)
    want = weighted_gather_sum(
        jnp.asarray(h), jnp.asarray(data.pp_norm_index[0]),
        jnp.asarray(data.pp_norm_index[1]), jnp.asarray(data.pp_norm_weight),
        data.n_prot,
    )
    h_pad = np.zeros((k * n_local, d), np.float32)
    h_pad[: data.n_prot] = h
    mesh = make_mesh(k)

    def local(h_shard, src, dstl, w):
        return ring_spmm_rdma(
            h_shard, src[0], dstl[0], w[0], EDGE_AXIS, 128, True
        )

    got = _sharded(local, mesh, k)(
        jnp.asarray(h_pad), jnp.asarray(ring.src_local),
        jnp.asarray(ring.dst_local), jnp.asarray(ring.weight),
    )
    np.testing.assert_allclose(
        np.asarray(got)[: data.n_prot], np.asarray(want), atol=1e-4
    )


def test_ring_rdma_grad_matches_xla_ring(ring_setup):
    """d(ring_spmm_rdma)/dh == AD through the ppermute ring (symmetric A)."""
    from tip_tpu.parallel.ring import ring_spmm

    data, ring, k, n_local = ring_setup
    d = 8
    rng = np.random.default_rng(7)
    h_pad = np.zeros((k * n_local, d), np.float32)
    h_pad[: data.n_prot] = rng.normal(size=(data.n_prot, d))
    cot = rng.normal(size=(k * n_local, d)).astype(np.float32)
    mesh = make_mesh(k)
    blocks = (
        jnp.asarray(ring.src_local), jnp.asarray(ring.dst_local),
        jnp.asarray(ring.weight),
    )

    def loss_rdma(h_shard, src, dstl, w, cot_shard):
        out = ring_spmm_rdma(h_shard, src[0], dstl[0], w[0], EDGE_AXIS, 128, True)
        return jax.lax.psum(jnp.vdot(out, cot_shard), EDGE_AXIS)

    def loss_xla(h_shard, src, dstl, w, cot_shard):
        out = ring_spmm(h_shard, src[0], dstl[0], w[0], n_local, EDGE_AXIS)
        return jax.lax.psum(jnp.vdot(out, cot_shard), EDGE_AXIS)

    def grad_of(loss):
        return jax.jit(
            shard_map(
                jax.grad(loss), mesh=mesh,
                in_specs=(P(EDGE_AXIS),) * 5,
                out_specs=P(EDGE_AXIS),
                check_vma=False,
            )
        )(jnp.asarray(h_pad), *blocks, jnp.asarray(cot))

    g_rdma = np.asarray(grad_of(loss_rdma))
    g_xla = np.asarray(grad_of(loss_xla))
    np.testing.assert_allclose(g_rdma, g_xla, atol=1e-4)
