"""On-hardware kernel parity (run: scripts/tpu_tests.sh).

Every CPU-lane test exercises the XLA/interpret implementations; this
module pins the Pallas kernels' REAL-MXU behavior against oracles on the
actual chip (round-4 verdict weak #5).  Deterministic configurations are
used wherever the on-chip PRNG would otherwise differ from the host
stream: the sym fused BCE is checked with zeroed thresholds (positives
only) and saturated thresholds (count = 4 on every valid non-positive
cell), both exact in expectation AND realization.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def data():
    from tip_tpu.data import build_trigraph, synthetic_trigraph

    raw = synthetic_trigraph(n_drug=200, n_prot=300, n_et=7,
                             pairs_per_et=200, seed=5)
    return build_trigraph(raw, split_rate=0.9, seed=5)


@pytest.fixture(scope="module")
def wz(data):
    k1, k2 = jax.random.split(jax.random.key(0))
    w = jax.random.normal(k1, (data.n_et, 8)) * 0.3
    z = jax.random.normal(k2, (data.n_drug, 8)) * 0.5
    return w, z


def test_on_tpu():
    assert jax.default_backend() == "tpu"


@pytest.mark.parametrize("mode", ["positives_only", "saturated"])
def test_sym_bce_kernel_vs_oracle_on_hw(data, wz, mode):
    from tip_tpu.data.packing import dense_relation_adj, sym_strip_pack
    from tip_tpu.ops.pallas_dense_bce_sym import dense_bce_sym_sum

    w, z = wz
    da = dense_relation_adj(data.dd_train, data.n_drug)
    pages = jnp.asarray(sym_strip_pack(da))
    qv = 0 if mode == "positives_only" else (1 << 24)
    q8 = jnp.full((data.n_et, 8), qv, jnp.int32)
    key = jax.random.key(7)
    val, (dw, dz) = jax.jit(jax.value_and_grad(
        lambda w, z: dense_bce_sym_sum(w, z, pages, q8, key),
        argnums=(0, 1),
    ))(w, z)

    wn, zn = np.asarray(w, np.float64), np.asarray(z, np.float64)
    dan = np.asarray(da, np.float64)
    L = np.einsum("nf,tf,mf->tnm", zn, wn, zn)
    sp = np.logaddexp(0.0, -L)
    if mode == "positives_only":
        cnt = 0.0
    else:
        # saturated: every valid non-positive STORED cell counts 4; a
        # stored off-diagonal-block cell covers its mirror pair, so the
        # full-matrix-equivalent per-cell count is 4 inside diagonal
        # 128-blocks (both halves processed) and 2 elsewhere
        ii = np.arange(data.n_drug)
        same_block = (ii[:, None] // 128) == (ii[None, :] // 128)
        cnt = np.where(same_block, 4.0, 2.0) * (dan == 0)
    oval = (sp * dan + (sp + L) * cnt).sum()
    g = cnt * 1.0 - (dan + cnt) / (1.0 + np.exp(L))
    odw = np.einsum("tnm,nf,mf->tf", g, zn, zn)
    odz = (np.einsum("tf,tnm,mf->nf", wn, g, zn)
           + np.einsum("tf,tnm,nf->mf", wn, g, zn))
    assert abs(float(val) - oval) / abs(oval) < 1e-4
    np.testing.assert_allclose(np.asarray(dw), odw, atol=2e-2 * np.abs(odw).max())
    np.testing.assert_allclose(np.asarray(dz), odz, atol=2e-2 * np.abs(odz).max())


def test_sym_bce_descent_consistency_on_hw(data, wz):
    """Forward and fused-backward agree on the SAME stochastic count field
    (counts are seed-deterministic): a small gradient step decreases the
    same-key loss by lr * |g|^2 to first order."""
    from tip_tpu.data.packing import (
        dense_relation_adj, poisson_neg_thresholds_sym, sym_strip_pack,
    )
    from tip_tpu.ops.pallas_dense_bce_sym import dense_bce_sym_sum

    w, z = wz
    da = dense_relation_adj(data.dd_train, data.n_drug)
    pages = jnp.asarray(sym_strip_pack(da))
    q8 = jnp.asarray(poisson_neg_thresholds_sym(data.dd_train, data.n_drug))
    key = jax.random.key(3)
    f = jax.jit(lambda w, z: dense_bce_sym_sum(w, z, pages, q8, key))
    val, (dw, dz) = jax.jit(jax.value_and_grad(
        lambda w, z: dense_bce_sym_sum(w, z, pages, q8, key), argnums=(0, 1)
    ))(w, z)
    assert float(f(w, z)) == float(val)  # deterministic per key
    g2 = float(jnp.vdot(dw, dw) + jnp.vdot(dz, dz))
    # lr large enough that the predicted first-order drop dominates the
    # f32 forward-summation noise (~tens of ulps of the total loss)
    lr = 1e-4
    drop = float(val) - float(f(w - lr * dw, z - lr * dz))
    assert abs(drop - lr * g2) < 0.2 * lr * g2, (drop, lr * g2)


def test_segment_kernel_vs_xla_on_hw(data):
    from tip_tpu.data.packing import pad_typed_edges
    from tip_tpu.ops.pallas_segment import typed_neighbor_sum_padded_t

    padded = pad_typed_edges(data.dd_train, data.n_drug, chunk=256)
    n_chunks = padded.chunk_type.shape[0]
    src2d = jnp.asarray(padded.src.reshape(n_chunks, 256))
    dst2d = jnp.asarray(padded.dst.reshape(n_chunks, 256))
    ct = jnp.asarray(padded.chunk_type)
    x = jax.random.normal(jax.random.key(1), (data.n_drug, 16))
    got = jax.jit(lambda x: typed_neighbor_sum_padded_t(
        x, src2d, dst2d, ct, data.n_et, jnp.dtype("float32")
    ))(x)  # [n_et, d, n+1]
    # XLA oracle (the segment-sum formulation of rgcn_apply_padded)
    src = padded.src.reshape(-1)
    dst = padded.dst.reshape(-1)
    et = np.repeat(padded.chunk_type, 256)
    seg = et.astype(np.int64) * (data.n_drug + 1) + dst
    xn = np.asarray(x)
    want = np.zeros((data.n_et * (data.n_drug + 1), 16), np.float32)
    np.add.at(want, seg, xn[src])
    want = want.reshape(data.n_et, data.n_drug + 1, 16)[:, : data.n_drug]
    got_n = np.asarray(got)[:, :, : data.n_drug].transpose(0, 2, 1)
    # default-precision MXU rounds f32 matmul inputs to bf16 on hardware
    # (the one-hots are exact; x loses 8 mantissa bits) — tolerance is
    # bf16-rounding-scaled, not f32 (the CPU lane checks exactness)
    np.testing.assert_allclose(
        got_n, want, atol=3e-2 * float(np.abs(want).max())
    )


def test_sddmm2_logits_vs_xla_on_hw(data, wz):
    from tip_tpu.data.packing import pad_typed_edges
    from tip_tpu.nn.decoders import distmult_apply_padded

    w, z = wz
    params = {"weight": w}
    padded = pad_typed_edges(data.dd_train, data.n_drug, chunk=256)
    n_chunks = padded.chunk_type.shape[0]
    src2d = jnp.asarray(padded.src.reshape(n_chunks, 256))
    dst2d = jnp.asarray(padded.dst.reshape(n_chunks, 256))
    ct = jnp.asarray(padded.chunk_type)
    got = jax.jit(lambda z: distmult_apply_padded(
        params, z, src2d, dst2d, ct, sigmoid=False, backend="pallas",
    ))(z)
    want = jax.jit(lambda z: distmult_apply_padded(
        params, z, src2d, dst2d, ct, sigmoid=False, backend="xla",
    ))(z)
    valid = padded.valid.reshape(got.shape).astype(bool)
    # bf16-input MXU rounding on hardware (see segment test note)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid],
        atol=2e-2 * float(np.abs(np.asarray(want)[valid]).max()),
    )


def test_dense_pp_int8_vs_coo_on_hw(data):
    from tip_tpu.data.packing import dense_pp_parts
    from tip_tpu.nn.gcn import gcn_conv_apply_dense
    from tip_tpu.ops import weighted_gather_sum

    a1, dinv = dense_pp_parts(data.pp_norm_index, data.n_prot)
    assert a1.dtype == np.int8
    wgt = jax.random.normal(jax.random.key(2), (data.n_prot, 16)) * 0.3
    params = {"weight": wgt}
    got = jax.jit(lambda: gcn_conv_apply_dense(
        params, None, jnp.asarray(a1), jnp.asarray(dinv)
    ))()
    want = jax.jit(lambda: weighted_gather_sum(
        wgt, jnp.asarray(data.pp_norm_index[0]),
        jnp.asarray(data.pp_norm_index[1]),
        jnp.asarray(data.pp_norm_weight), data.n_prot,
    ))()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want),
        atol=5e-2 * float(jnp.abs(want).max()),
    )
