"""Collate runs/*.json into RESULTS.md — the accuracy-parity evidence.

Reads the run artifacts produced by:
  * python -m tip_tpu.train        (TIP-cat / TIP-add, f32 + bf16)
  * python -m tip_tpu.models       (DR-DF / DR-NN / PR-HMP-NN / PP-GAE)
  * scripts/torch_oracle_tip.py    (reference-algorithm torch runs)
and emits the cross-variant comparison table the reference keeps in
analysis/evaluation.ipynb cell 13.
"""

from __future__ import annotations

import json
import os

RUNS = "runs"


def load(name):
    path = os.path.join(RUNS, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def fmt(run, keys=("auprc", "auroc", "ap")):
    if run is None:
        return ["—"] * len(keys) + ["—"]
    f = run["final"]
    t = f.get("train_time_sec")
    return [f"{f[k]:.4f}" for k in keys] + [f"{t:.0f}s" if t else "—"]


def subset_macro(report_name, nnz_min=1000):
    """Macro AUPRC restricted to relations with nnz >= nnz_min (the
    recorded reference runs used the 963-type nnz>=1000 subset)."""
    rep = load(report_name)
    if rep is None:
        return None
    import scipy.sparse as sp

    base = "/root/reference/data/sym_adj/drug-sparse-adj"
    if not os.path.isdir(base):
        return None
    vals = []
    for r in rep["per_relation"]:
        m = sp.load_npz(f"{base}/type_{int(r['et'])}.npz")
        if m.nnz >= nnz_min:
            vals.append(r["auprc"])
    return sum(vals) / len(vals) if vals else None


def main():
    rows = [
        ("TIP-cat (jax, f32)", "tip_cat_f32.json"),
        ("TIP-cat (jax, bf16 kernels)", "tip_cat_bf16.json"),
        ("TIP-cat (torch oracle = reference algorithm)", "torch_oracle_cat.json"),
        ("TIP-add (jax, f32)", "tip_add_f32.json"),
        ("TIP-add (torch oracle)", "torch_oracle_add.json"),
        ("DR-DF (jax, mono + sqrt feat-norm)", "dr_df_sqrt.json"),
        ("DR-DF (jax, identity features)", "dr_df_id.json"),
        ("DR-NN (jax, mono + sqrt feat-norm)", "dr_nn_sqrt.json"),
        ("DR-NN (jax, identity features)", "dr_nn_id.json"),
        ("PR-HMP-NN (jax)", "pr_hmp_nn.json"),
        ("PP-GAE (jax)", "pp_gae.json"),
    ]
    lines = []
    lines.append("| Model / backend | test AUPRC | test AUROC | AP@50 | wall |")
    lines.append("|---|---|---|---|---|")
    for label, fn in rows:
        vals = fmt(load(fn))
        lines.append(f"| {label} | " + " | ".join(vals) + " |")
    print("\n".join(lines))
    sub = subset_macro("tip_cat_f32_report.json")
    if sub:
        print(f"\nTIP-cat macro AUPRC on the 963-relation (nnz>=1000) subset "
              f"of the recorded reference runs: {sub:.4f}")


if __name__ == "__main__":
    main()
