"""Device metrics vs sklearn, per relation, including tied scores."""

import numpy as np
import jax.numpy as jnp
import pytest
from sklearn import metrics as skm

from tip_tpu.metrics import grouped_ranking_metrics, macro_average


def _sklearn_triplet(y, s):
    auroc = skm.roc_auc_score(y, s)
    ap = skm.average_precision_score(y, s)
    prec, rec, _ = skm.precision_recall_curve(y, s)
    auprc = skm.auc(rec, prec)
    return auprc, auroc, ap


@pytest.mark.parametrize("tied", [False, True])
def test_matches_sklearn_per_type(tied):
    rng = np.random.default_rng(0 if tied else 1)
    n_et = 7
    counts = rng.integers(5, 60, n_et)
    pos, neg, et = [], [], []
    for t, c in enumerate(counts):
        p = rng.normal(size=c) + 0.5
        n = rng.normal(size=c)
        if tied:  # quantize to force ties, including pos/neg score collisions
            p, n = np.round(p * 4) / 4, np.round(n * 4) / 4
        pos.append(1 / (1 + np.exp(-p)))
        neg.append(1 / (1 + np.exp(-n)))
        et.append(np.full(c, t, np.int32))
    pos, neg, et = map(np.concatenate, (pos, neg, et))

    got = grouped_ranking_metrics(
        jnp.asarray(pos, jnp.float32), jnp.asarray(neg, jnp.float32),
        jnp.asarray(et), n_et,
    )
    for t in range(n_et):
        mask = et == t
        y = np.concatenate([np.ones(mask.sum()), np.zeros(mask.sum())])
        s = np.concatenate([pos[mask], neg[mask]]).astype(np.float32)
        auprc, auroc, ap = _sklearn_triplet(y, s)
        assert got["valid"][t]
        np.testing.assert_allclose(float(got["auprc"][t]), auprc, atol=2e-5)
        np.testing.assert_allclose(float(got["auroc"][t]), auroc, atol=2e-5)
        np.testing.assert_allclose(float(got["ap"][t]), ap, atol=2e-5)


def test_empty_type_is_masked():
    pos = np.array([0.9, 0.8], np.float32)
    neg = np.array([0.1, 0.2], np.float32)
    et = np.array([0, 0], np.int32)
    got = grouped_ranking_metrics(jnp.asarray(pos), jnp.asarray(neg),
                                  jnp.asarray(et), 3)
    assert bool(got["valid"][0]) and not bool(got["valid"][1])
    avg = macro_average(got)
    np.testing.assert_allclose(float(avg["auroc"]), 1.0, atol=1e-6)


def test_perfect_and_inverted_ranking():
    pos = np.array([0.9, 0.8, 0.7], np.float32)
    neg = np.array([0.1, 0.2, 0.3], np.float32)
    et = np.zeros(3, np.int32)
    got = grouped_ranking_metrics(jnp.asarray(pos), jnp.asarray(neg),
                                  jnp.asarray(et), 1)
    np.testing.assert_allclose(float(got["auroc"][0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(got["auprc"][0]), 1.0, atol=1e-6)
    got2 = grouped_ranking_metrics(jnp.asarray(neg), jnp.asarray(pos),
                                   jnp.asarray(et), 1)
    np.testing.assert_allclose(float(got2["auroc"][0]), 0.0, atol=1e-6)


def test_macro_average_denominator_semantics():
    """Pin the intentional divergence from the reference on subsets with
    empty relations: the reference divides by n_et (scoring empty relations
    as 0, reference: src/layers.py:371); our default divides by the count of
    valid relations.  Identical when every relation is valid."""
    pos = np.array([0.9, 0.8], np.float32)
    neg = np.array([0.1, 0.2], np.float32)
    et = np.array([0, 0], np.int32)  # relations 1, 2 empty
    got = grouped_ranking_metrics(jnp.asarray(pos), jnp.asarray(neg),
                                  jnp.asarray(et), 3)
    ours = macro_average(got)
    ref = macro_average(got, denominator="n_et")
    np.testing.assert_allclose(float(ours["auroc"]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(ref["auroc"]), 1.0 / 3, atol=1e-6)
    # all-valid case: the two semantics coincide
    et2 = np.array([0, 1], np.int32)
    got2 = grouped_ranking_metrics(jnp.asarray(pos), jnp.asarray(neg),
                                   jnp.asarray(et2), 2)
    a = macro_average(got2)
    b = macro_average(got2, denominator="n_et")
    for k in ("auprc", "auroc", "ap"):
        np.testing.assert_allclose(float(a[k]), float(b[k]), atol=1e-6)
