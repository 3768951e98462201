"""Symmetric fused dense BCE (ops/pallas_dense_bce_sym.py).

Same strategy as tests/test_dense_bce.py: interpret mode stubs the on-chip
PRNG to zeros, so u24 = 0 and the per-cell count is #{k: q_k > 0} per rate
class — a deterministic field exercising the full kernel math (both BCE
halves, block weights, diag/off-diag rate classes, both backward
contractions) against a plain-JAX full-matrix oracle.  The XLA fallback's
random draws are validated statistically against the full-tile estimator's
expectation, and the packing/threshold hosts against exact enumeration.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tip_tpu.data import build_trigraph, synthetic_trigraph
from tip_tpu.data.packing import (
    dense_relation_adj,
    poisson_neg_thresholds_sym,
    sym_block_layout,
    sym_strip_offsets,
    sym_strip_pack,
)
from tip_tpu.ops.pallas_dense_bce_sym import (
    B,
    dense_bce_sym_sum,
    dense_bce_sym_sum_xla,
)


@pytest.fixture(scope="module")
def setup():
    # n_drug > 128 so the layout has off-diagonal blocks AND ragged edges
    raw = synthetic_trigraph(n_drug=150, n_prot=16, n_et=5, pairs_per_et=120,
                             seed=3)
    data = build_trigraph(raw, split_rate=0.9, seed=3)
    da = dense_relation_adj(data.dd_train, data.n_drug)
    pages = jnp.asarray(sym_strip_pack(da))
    q8 = jnp.asarray(poisson_neg_thresholds_sym(data.dd_train, data.n_drug))
    k1, k2 = jax.random.split(jax.random.key(0))
    w = jax.random.normal(k1, (data.n_et, 8)) * 0.3
    z = jax.random.normal(k2, (data.n_drug, 8)) * 0.5
    return data, np.asarray(da), pages, q8, w, z


def _oracle_sym(w, z, da_full, cnt_s, cnt_d, n):
    """Full-matrix jnp oracle of the symmetric estimator with deterministic
    per-rate-class counts cnt_s/cnt_d on non-positive valid cells."""
    nb, blocks = sym_block_layout(n)
    npad = nb * B
    zb = jnp.pad(z, ((0, npad - n), (0, 0)))
    dap = jnp.pad(jnp.asarray(da_full, jnp.float32),
                  ((0, 0), (0, npad - n), (0, npad - n)))
    logits = jnp.einsum("nf,tf,mf->tnm", zb, w, zb)
    row = np.arange(npad)
    valid = (row[:, None] < n) & (row[None, :] < n)
    total = 0.0
    for (i, j) in blocks:
        sl = (slice(None), slice(i * B, (i + 1) * B), slice(j * B, (j + 1) * B))
        L, da = logits[sl], dap[sl]
        v = valid[sl[1], sl[2]]
        cnt = jnp.where((da > 0) | ~v, 0.0, cnt_s if i == j else cnt_d)
        posw = 1.0 if i == j else 2.0
        sp = jax.nn.softplus(-L)
        total = total + jnp.sum(sp * (posw * da) + (sp + L) * cnt)
    return total


def test_kernel_value_and_grads_match_oracle(setup):
    data, da_full, pages, _, w, z = setup
    # deterministic counts under the interpret-mode PRNG stub (u24 = 0):
    # count = #{k: q_k > 0} per rate class
    per_rel_s = np.array([0, 1, 2, 3, 1])[: data.n_et]
    per_rel_d = np.array([1, 2, 0, 4, 3])[: data.n_et]
    q8 = np.zeros((data.n_et, 8), np.int32)
    for t in range(data.n_et):
        q8[t, : per_rel_s[t]] = 7
        q8[t, 4: 4 + per_rel_d[t]] = 7
    q8 = jnp.asarray(q8)

    with pltpu.force_tpu_interpret_mode():
        val, (dw, dz) = jax.value_and_grad(
            lambda wz: dense_bce_sym_sum(wz[0], wz[1], pages, q8,
                                         jax.random.key(5)),
            argnums=0,
        )((w, z))

    cnt_s = jnp.asarray(per_rel_s, jnp.float32)[:, None, None]
    cnt_d = jnp.asarray(per_rel_d, jnp.float32)[:, None, None]
    oval, (odw, odz) = jax.value_and_grad(
        lambda wz: _oracle_sym(wz[0], wz[1], da_full, cnt_s, cnt_d,
                               data.n_drug),
        argnums=0,
    )((w, z))
    np.testing.assert_allclose(float(val), float(oval), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(odw), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dz), np.asarray(odz), rtol=2e-4,
                               atol=1e-5)


def test_thresholds_sym_exact_tails(setup):
    data, *_ = setup
    q8 = np.asarray(
        poisson_neg_thresholds_sym(data.dd_train, data.n_drug), np.int64
    )
    m = np.bincount(data.dd_train.edge_type, minlength=data.n_et)
    src, dst = data.dd_train.edge_index
    et = data.dd_train.edge_type
    n = data.n_drug
    distinct = [
        len(set(zip(src[et == t].tolist(), dst[et == t].tolist())))
        for t in range(data.n_et)
    ]
    from math import comb

    for t in range(data.n_et):
        nonpos = n * n - distinct[t]
        for rate, off in ((1.0, 0), (2.0, 4)):
            p = min(rate / nonpos, 1.0)
            cdf = 0.0
            for k in range(4):
                cdf += comb(int(m[t]), k) * p**k * (1 - p) ** (int(m[t]) - k)
                want = int(np.floor(max(0.0, 1.0 - cdf) * (1 << 24)))
                assert abs(int(q8[t, off + k]) - want) <= 1, (t, off, k)


def test_xla_fallback_expectation_matches_full_estimator(setup):
    """E[sym loss] == E[full-tile loss] == the analytic expectation: the
    pair-rate construction preserves every per-pair count marginal."""
    data, da_full, pages, q8, w, z = setup
    n = data.n_drug
    # analytic expectation of the negative half: mu_t * (sp + L) summed over
    # non-positive cells, mu_t = m_t / nonpos_t
    m = np.bincount(data.dd_train.edge_type, minlength=data.n_et)
    logits = np.einsum("nf,tf,mf->tnm", z, w, z)
    sp = np.logaddexp(0.0, -logits)
    nonpos_mask = np.asarray(da_full) == 0
    mu = np.array([
        m[t] / nonpos_mask[t].sum() for t in range(data.n_et)
    ])
    expect = float(
        (sp * np.asarray(da_full)).sum()
        + sum(
            mu[t] * ((sp[t] + logits[t]) * nonpos_mask[t]).sum()
            for t in range(data.n_et)
        )
    )
    f = jax.jit(lambda k: dense_bce_sym_sum_xla(w, z, pages, q8, k))
    vals = np.array([float(f(jax.random.key(s))) for s in range(60)])
    # loss variance comes from ~m total draws; 60 seeds give a tight CI
    se = vals.std(ddof=1) / np.sqrt(len(vals))
    assert abs(vals.mean() - expect) < max(5 * se, 2e-3 * abs(expect)), (
        vals.mean(), expect, se,
    )


def test_pack_roundtrip_and_symmetry_guard(setup):
    data, da_full, pages, _, _, _ = setup
    nb, _ = sym_block_layout(data.n_drug)
    offs, widths = sym_strip_offsets(nb)
    packed = np.asarray(pages)
    npad = nb * B
    full = np.zeros((data.n_et, npad, npad), np.int64)
    for i in range(nb):
        strip = packed[:, :, offs[i]:offs[i + 1]]  # [R, B, (nb-i)*B]
        full[:, i * B:(i + 1) * B, i * B:] = strip
        # mirror the off-diagonal part of the strip below the diagonal
        full[:, (i + 1) * B:, i * B:(i + 1) * B] = np.swapaxes(
            strip[:, :, B:], 1, 2
        )
    np.testing.assert_array_equal(
        full[:, : data.n_drug, : data.n_drug], da_full
    )
    bad = da_full.copy()
    bad[0, 0, 1] += 1  # break symmetry
    with pytest.raises(ValueError, match="not symmetric"):
        sym_strip_pack(bad)
