"""Device-side AUPRC / AUROC / AP, batched over relation types.

The reference computes these metrics with 1,097 sklearn calls per
evaluation, each preceded by a GPU->CPU copy (reference:
src/layers.py:355-375, src/utils.py:86-93).  Here all types are evaluated
at once on device with ONE lexicographic sort plus prefix scans:

  1. sort all (score, label) rows by (type asc, score desc) — a single
     two-key ``lax.sort`` carrying the labels;
  2. form tie groups (equal score within a type) — sklearn computes its
     curves at distinct thresholds, so all three metrics are exact under
     ties, not just for continuous scores;
  3. per tie-group cumulative TP/FP give the PR and ROC curve points;
     AUPRC is the trapezoid over PR points including the (recall=0,
     precision=1) endpoint sklearn appends, AP is the step-sum
     sum dR * P, AUROC is the tie-averaged rank statistic.

TPU shaping: large gathers and million-segment scatter reductions are the
slow primitives on TPU (measured ~20 ms per 1.85M-row gather at Decagon
eval scale), so every per-row group/type quantity is computed by PREFIX
SCANS instead — group/type boundary values propagate forward with a
running max and backward with a reversed running min (cumulative counts
are non-decreasing, so the masked extreme IS the boundary value) — and
every per-type reduction is a cumsum read at type-end boundaries located
by ``searchsorted`` (the row order is type-major).  No segment_sum, no
row-space gather anywhere: eval metrics 202 -> ~70 ms at 1.85M rows.

Validated element-for-element against sklearn in tests/test_metrics.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fwd_max(x):
    return jax.lax.associative_scan(jnp.maximum, x)


def _rev_min(x):
    return jax.lax.associative_scan(jnp.minimum, x, reverse=True)


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

    # ONE lexicographic device sort by (type asc, score desc), carrying the
    # labels.
    t, neg_s, y = jax.lax.sort((t, -s, y), num_keys=2, is_stable=True)
    s = -neg_s

    idx = jnp.arange(m, dtype=jnp.int32)
    idx_f = idx.astype(jnp.float32)
    prev_t = jnp.concatenate([jnp.full((1,), -1, jnp.int32), t[:-1]])
    prev_s = jnp.concatenate([jnp.full((1,), jnp.inf, jnp.float32), s[:-1]])
    is_type_start = t != prev_t
    is_group_start = jnp.logical_or(is_type_start, s != prev_s)
    next_differs = jnp.concatenate(
        [jnp.logical_or(t[1:] != t[:-1], s[1:] != s[:-1]),
         jnp.ones((1,), bool)]
    )
    is_group_end = next_differs
    is_type_end = jnp.concatenate([t[1:] != t[:-1], jnp.ones((1,), bool)])

    inf = jnp.float32(jnp.inf)

    # Within-type cumulative TP / FP via global cumsum minus type-start offset.
    cum_tp = jnp.cumsum(y)
    excl_tp = cum_tp - y
    off_tp = _fwd_max(jnp.where(is_type_start, excl_tp, 0.0))
    tp = cum_tp - off_tp
    start_idx = _fwd_max(jnp.where(is_type_start, idx, 0))
    pos_in_seg = (idx - start_idx).astype(jnp.float32)
    fp = (pos_in_seg + 1.0) - tp

    # Per-row TYPE totals: the boundary value propagated backward (cum_tp
    # and idx are non-decreasing, so the masked reverse-min is the value at
    # this row's type end).
    type_end_cum_tp = _rev_min(jnp.where(is_type_end, cum_tp, inf))
    type_end_idx = _rev_min(jnp.where(is_type_end, idx_f, inf))
    npos_e = type_end_cum_tp - off_tp
    ntot_e = type_end_idx - start_idx.astype(jnp.float32) + 1.0
    nneg_e = ntot_e - npos_e

    # Per-row tie-GROUP totals, same propagation at group granularity.
    g_start_excl = _fwd_max(jnp.where(is_group_start, excl_tp, 0.0))
    g_end_cum = _rev_min(jnp.where(is_group_end, cum_tp, inf))
    g_tp = g_end_cum - g_start_excl
    g_start_idx = _fwd_max(jnp.where(is_group_start, idx, 0))
    g_end_idx = _rev_min(jnp.where(is_group_end, idx_f, inf))
    g_cnt = g_end_idx - g_start_idx.astype(jnp.float32) + 1.0
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

    # Per-type reductions: cumsum read at type-end boundaries (searchsorted
    # over the type-major row order), differenced — no segment scatter.
    bounds = jnp.searchsorted(
        t, jnp.arange(n_et + 1, dtype=jnp.int32), side="left"
    )  # [n_et + 1]; type k spans rows [bounds[k], bounds[k+1])
    ntot = (bounds[1:] - bounds[:-1]).astype(jnp.float32)

    def seg(c):
        cs0 = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(c)])
        v = cs0[bounds]  # [n_et + 1] tiny gather
        return v[1:] - v[:-1]

    npos = seg(y)
    nneg = ntot - npos
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
