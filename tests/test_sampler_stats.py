"""Statistical validation of the Pallas sampler's marginal distribution.

The kernel's contract (ops/pallas_sampler.py) is that each output slot is
marginally uniform over its relation's NON-positive pairs, with a bounded
accept-leftovers tail at extreme density (reference semantics:
src/neg_sampling.py:5-26 — uniform corruption, rejected against same-type
positives).  The invariant tests check collision-freedom and determinism;
here the distribution itself is tested:

  * (a) a normal-density relation: chi-square of the clean draws against
    uniform over the relation's non-positives;
  * (b) a forced high-density relation (60% of pairs positive) where the
    lane-borrow path PROVABLY fires: the raw kernel output is majority
    sign-flagged, borrow resolves almost all of it, borrowed values are
    copies of clean same-chunk draws (so their marginal inherits the clean
    draws' uniformity), and the residual accepted-collision tail matches
    the ~density^5 bound;
  * (c) the two-draw n > 4096 regime: src/dst marginals uniform and
    independent (chi-square on a binned 2D grid).

Clean draws are i.i.d. across lanes/chunks/seeds (independent PRNG words),
so Pearson chi-square applies exactly; borrowed values are deliberately
EXCLUDED from the chi-square samples because copying clusters counts
(inflating the statistic) without changing the marginal.  Seeds are fixed:
the tests are deterministic, with p-value floors far below any plausible
flake (p > 1e-6) but far above what a real bias produces (p ~ 0).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu
from scipy import stats

from tip_tpu.ops.pallas_sampler import (
    resolve_borrow,
    typed_negative_sampling_padded,
)
from tip_tpu.sampling.negative import bitmap_stride_bits, build_key_bitmap


def _make_bitmap(n, pos_pairs_by_rel):
    """Relation-strided bitmap from explicit per-relation positive pairs."""
    stride = bitmap_stride_bits(n)
    n_et = len(pos_pairs_by_rel)
    bits = np.concatenate(
        [et * stride + np.asarray(p, np.int64)
         for et, p in enumerate(pos_pairs_by_rel)]
    )
    return build_key_bitmap(bits, n_et * stride), n_et


def _raw(seed, chunk_type, bitmap, n, n_et, chunk, rounds=1):
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(
            typed_negative_sampling_padded(
                jax.random.key(seed), jnp.asarray(chunk_type),
                jnp.asarray(bitmap), n, n_et, chunk, rounds=rounds,
                _resolve=False,
            )
        )


def _chisq_uniform(counts):
    """(statistic/df, p) of Pearson chi-square against uniform."""
    stat, p = stats.chisquare(counts)
    return stat / (len(counts) - 1), p


@pytest.fixture(scope="module")
def dense_setup():
    """n=32: relation 0 at ~5% density, relation 1 forced to 60%."""
    n = 32
    rng = np.random.default_rng(7)
    pos0 = rng.choice(n * n, size=51, replace=False)
    pos1 = rng.choice(n * n, size=614, replace=False)
    bitmap, n_et = _make_bitmap(n, [pos0, pos1])
    chunks_per_rel, chunk = 50, 64
    chunk_type = np.repeat(np.arange(2, dtype=np.int32), chunks_per_rel)
    raws = [
        _raw(s, chunk_type, bitmap, n, n_et, chunk) for s in range(8)
    ]
    return n, pos0, pos1, bitmap, chunk_type, chunk, chunks_per_rel, raws


def test_clean_draw_marginal_uniform_normal_density(dense_setup):
    n, pos0, _, _, _, chunk, cpr, raws = dense_setup
    nonpos = np.setdiff1d(np.arange(n * n), pos0)
    clean = np.concatenate([r[:cpr][r[:cpr] >= 0] for r in raws])
    counts = np.bincount(
        np.searchsorted(nonpos, clean), minlength=len(nonpos)
    )
    assert counts.sum() == clean.size and clean.size > 20000
    ratio, p = _chisq_uniform(counts)
    assert p > 1e-6, f"clean-draw marginal not uniform: chi2/df={ratio}, p={p}"


def test_borrow_path_fires_and_is_uniform_at_high_density(dense_setup):
    n, _, pos1, _, _, chunk, cpr, raws = dense_setup
    density = len(pos1) / (n * n)
    nonpos = np.setdiff1d(np.arange(n * n), pos1)
    raw1 = np.stack([r[cpr:] for r in raws])  # [seeds, chunks, chunk]
    flagged = raw1 < 0
    # the borrow path provably fires: the raw kernel output is majority
    # sign-flagged at 60% density (one unconditional round)
    assert abs(flagged.mean() - density) < 0.05
    # clean draws at high density are still uniform over non-positives
    clean = raw1[~flagged]
    counts = np.bincount(np.searchsorted(nonpos, clean), minlength=len(nonpos))
    ratio, p = _chisq_uniform(counts)
    assert p > 1e-6, f"high-density clean marginal: chi2/df={ratio}, p={p}"
    # resolve and check: borrowed slots hold a copy of a clean lane of the
    # SAME chunk (the documented offsets), so their marginal is inherited
    resolved = np.stack([
        np.asarray(resolve_borrow(jnp.asarray(r[cpr:]))) for r in raws
    ])
    borrowed = flagged & ~np.isin(resolved, pos1)
    for s, c in zip(*np.nonzero(borrowed.any(axis=2))):
        lanes = np.nonzero(borrowed[s, c])[0]
        clean_vals = raw1[s, c][raw1[s, c] >= 0]
        assert np.isin(resolved[s, c][lanes], clean_vals).all()
    assert borrowed.mean() > 0.3  # most flagged slots were resolved
    # residual accepted collisions match the bounded ~density^5 tail
    accepted = np.isin(resolved, pos1).mean()
    assert accepted < 3 * density**5 + 0.02
    assert accepted > 0.0  # the tail is real at this density
    # borrowed values' empirical marginal: uniform too (coarse check — the
    # clustering only widens scatter, it cannot move the mean)
    bcounts = np.bincount(
        np.searchsorted(nonpos, resolved[borrowed]), minlength=len(nonpos)
    )
    expect = bcounts.mean()
    assert abs(bcounts.mean() - resolved[borrowed].size / len(nonpos)) < 1e-9
    assert (np.abs(bcounts - expect) < 8 * np.sqrt(expect) + 8).all()


def test_two_draw_regime_marginals_and_independence():
    """n > 4096 switches to independent 24-bit src/dst draws."""
    n = 5000
    assert n * n > (1 << 24)
    rng = np.random.default_rng(11)
    pos = rng.choice(n * n, size=200, replace=False).astype(np.int64)
    bitmap, n_et = _make_bitmap(n, [pos])
    chunk, n_chunks = 128, 15
    chunk_type = np.zeros(n_chunks, np.int32)
    raw = np.concatenate([
        _raw(s, chunk_type, bitmap, n, n_et, chunk).ravel() for s in range(4)
    ])
    assert (raw >= 0).mean() > 0.999  # collisions ~200/25M: essentially none
    raw = raw[raw >= 0]
    src, dst = raw % n, raw // n
    assert src.min() >= 0 and src.max() < n and dst.max() < n
    nbin = 50
    for name, v in (("src", src), ("dst", dst)):
        counts = np.bincount(v * nbin // n, minlength=nbin)
        ratio, p = _chisq_uniform(counts)
        assert p > 1e-6, f"{name} marginal: chi2/df={ratio}, p={p}"
    # independence: chi-square of the joint against the product of the
    # (uniform) marginals on an 8x8 grid
    joint = np.bincount(
        (src * 8 // n) * 8 + (dst * 8 // n), minlength=64
    )
    ratio, p = _chisq_uniform(joint)
    assert p > 1e-6, f"src x dst joint: chi2/df={ratio}, p={p}"
