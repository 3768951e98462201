"""Device-side AUPRC / AUROC / AP, batched over relation types.

The reference computes these metrics with 1,097 sklearn calls per
evaluation, each preceded by a GPU->CPU copy (reference:
src/layers.py:355-375, src/utils.py:86-93).  Here all types are evaluated
at once on device with ONE global stable sort plus segment reductions:

  1. sort all (score, label) rows by (type asc, score desc);
  2. form tie groups (equal score within a type) — sklearn computes its
     curves at distinct thresholds, so all three metrics are exact under
     ties, not just for continuous scores;
  3. per tie-group cumulative TP/FP give the PR and ROC curve points;
     AUPRC is the trapezoid over PR points including the (recall=0,
     precision=1) endpoint sklearn appends, AP is the step-sum
     sum dR * P, AUROC is the tie-averaged rank statistic — each reduced
     per type with a segment-sum.

Validated element-for-element against sklearn in tests/test_metrics.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cummax_int(x):
    return jax.lax.associative_scan(jnp.maximum, x)


def grouped_ranking_metrics(pos_score, neg_score, edge_type, n_et: int):
    """Per-relation (auprc, auroc, ap) plus a validity mask.

    pos_score, neg_score: [E] scores for positive / negative edges.
    edge_type: [E] relation id of each row (shared by pos and neg).
    Returns dict with 'auprc', 'auroc', 'ap' — each [n_et] float32 — and
    'valid' [n_et] bool (False where a relation has no pos or no neg rows).
    """
    s = jnp.concatenate([pos_score, neg_score]).astype(jnp.float32)
    y = jnp.concatenate(
        [jnp.ones_like(pos_score), jnp.zeros_like(neg_score)]
    ).astype(jnp.float32)
    t = jnp.concatenate([edge_type, edge_type]).astype(jnp.int32)
    m = s.shape[0]

    # Stable two-pass sort: by score desc, then (stably) by type asc.
    o1 = jnp.argsort(-s, stable=True)
    order = o1[jnp.argsort(t[o1], stable=True)]
    s, y, t = s[order], y[order], t[order]

    idx = jnp.arange(m, dtype=jnp.int32)
    prev_t = jnp.concatenate([jnp.full((1,), -1, jnp.int32), t[:-1]])
    prev_s = jnp.concatenate([jnp.full((1,), jnp.inf, jnp.float32), s[:-1]])
    is_type_start = t != prev_t
    is_group_start = jnp.logical_or(is_type_start, s != prev_s)
    next_differs = jnp.concatenate(
        [jnp.logical_or(t[1:] != t[:-1], s[1:] != s[:-1]),
         jnp.ones((1,), bool)]
    )
    is_group_end = next_differs

    # Within-type cumulative TP / FP via global cumsum minus type-start offset.
    cum_tp = jnp.cumsum(y)
    excl_tp = cum_tp - y
    off_tp = _cummax_int(jnp.where(is_type_start, excl_tp, 0.0))
    tp = cum_tp - off_tp
    start_idx = _cummax_int(jnp.where(is_type_start, idx, 0))
    pos_in_seg = (idx - start_idx).astype(jnp.float32)
    fp = (pos_in_seg + 1.0) - tp

    # Per-type totals.
    npos = jax.ops.segment_sum(y, t, n_et, indices_are_sorted=True)
    ntot = jax.ops.segment_sum(jnp.ones_like(y), t, n_et, indices_are_sorted=True)
    nneg = ntot - npos
    npos_e = npos[t]
    nneg_e = nneg[t]

    # Per tie-group TP / count (group ids are sorted by construction).
    gid = jnp.cumsum(is_group_start.astype(jnp.int32)) - 1
    g_tp = jax.ops.segment_sum(y, gid, m, indices_are_sorted=True)[gid]
    g_cnt = jax.ops.segment_sum(jnp.ones_like(y), gid, m, indices_are_sorted=True)[gid]
    g_fp = g_cnt - g_tp

    safe = lambda a, b: jnp.where(b > 0, a / jnp.maximum(b, 1.0), 0.0)

    # PR points at group ends; previous point = this group removed.
    recall = safe(tp, npos_e)
    precision = safe(tp, tp + fp)
    tp_prev = tp - g_tp
    fp_prev = fp - g_fp
    recall_prev = safe(tp_prev, npos_e)
    precision_prev = jnp.where(
        tp_prev + fp_prev > 0, safe(tp_prev, tp_prev + fp_prev), 1.0
    )
    d_recall = recall - recall_prev

    end = is_group_end.astype(jnp.float32)
    auprc_c = end * d_recall * 0.5 * (precision + precision_prev)
    ap_c = end * d_recall * precision
    # Tie-averaged rank AUROC: each group's positives sit above
    # (nneg - fp) strictly-lower negatives and half of the group's own.
    auroc_c = end * g_tp * ((nneg_e - fp) + 0.5 * g_fp)

    seg = lambda c: jax.ops.segment_sum(c, t, n_et, indices_are_sorted=True)
    auprc = seg(auprc_c)
    ap = seg(ap_c)
    auroc = safe(seg(auroc_c), npos * nneg)

    valid = jnp.logical_and(npos > 0, nneg > 0)
    zero = jnp.zeros_like(auprc)
    return {
        "auprc": jnp.where(valid, auprc, zero),
        "auroc": jnp.where(valid, auroc, zero),
        "ap": jnp.where(valid, ap, zero),
        "valid": valid,
    }


def macro_average(metrics, denominator: str = "valid"):
    """Macro-mean of the per-relation metrics.

    ``denominator='valid'`` (default) averages over relations that HAVE test
    positives and negatives.  The reference divides by n_et outright
    (reference: src/layers.py:371, model/ddm-df_rgcn.py:139), scoring empty
    relations as 0 — identical on the default Decagon split (all 1,097
    relations valid, pinned by tests/test_metrics.py), lower on band
    subsets with empty test bins; pass ``denominator='n_et'`` for that
    exact semantics when comparing against reference records.
    """
    if denominator == "n_et":
        n = metrics["valid"].shape[0]
    else:
        n = jnp.maximum(jnp.sum(metrics["valid"]), 1)
    return {
        k: jnp.sum(v) / n for k, v in metrics.items() if k != "valid"
    }
