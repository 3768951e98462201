"""Prediction-provenance exploration: which side effects does the protein
graph explain that drug co-occurrence alone does not?

Equivalent of the shippable half of the reference's ``check_data.ipynb``:

  * cells 0-5 compare a protein-based model's predictions against a
    drug-based model's per side effect and list the side effects the
    protein model gets right where the drug model fails — here done on the
    per-relation report JSONs (analysis/report.py) of any two runs, e.g.
    PR-HMP-NN (protein-based) vs DR-DF (drug-based), or TIP vs DR-DF;
  * cells 9-15 look up the drugs targeting a given protein through the
    drug-protein adjacency and the shipped index maps.

The notebook's second half (GO-term enrichment of those proteins, cells
18-32) downloads ``goa_human.gaf.gz`` and ``go-basic.obo`` from EBI/OBO at
run time; this environment has no network egress, so GO enrichment is an
explicit non-goal (documented in README.md) — the hook is the protein lists
this module produces.

CLI:  python -m tip_tpu.analysis.explain runs/pr_hmp_nn_report.json \
          runs/dr_df_report.json [--top 30]
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from tip_tpu.data.decagon import DEFAULT_DATA_DIR


def _rows_by_et(report_path: str) -> Dict[int, dict]:
    with open(report_path) as f:
        rep = json.load(f)
    if isinstance(rep, dict):  # analysis/report.py layout
        rows = rep.get("per_relation") or rep.get("rows")
    else:
        rows = rep
    return {int(r["et"]): r for r in rows}


def compare_reports(
    report_a: str, report_b: str, metric: str = "auprc", top: int = 30
) -> List[dict]:
    """Side effects ranked by metric(A) - metric(B) over the shared relations.

    A = the model whose explanatory edge is being probed (e.g. the
    protein-based PR-HMP-NN), B = the baseline (e.g. drug-only DR-DF); the
    head of the list is the check_data cell-4 analog — side effects the
    A-graph explains that B alone does not.
    """
    a, b = _rows_by_et(report_a), _rows_by_et(report_b)
    shared = sorted(set(a) & set(b))
    rows = []
    for t in shared:
        rows.append({
            "et": t,
            "name": a[t].get("name", f"type_{t}"),
            f"{metric}_a": a[t][metric],
            f"{metric}_b": b[t][metric],
            "delta": round(a[t][metric] - b[t][metric], 4),
        })
    rows.sort(key=lambda r: -r["delta"])
    return rows[:top]


def drugs_targeting_protein(
    protein_idx: int, data_dir: str = DEFAULT_DATA_DIR
) -> dict:
    """STITCH/gene ids of the drugs targeting one protein (compact index).

    check_data cells 9-15: a column slice of the drug-protein adjacency
    joined through the shipped index maps.
    """
    import scipy.sparse as sp

    dp = sp.load_npz(
        os.path.join(data_dir, "sym_adj", "drug-protein-sparse-adj.npz")
    ).tocsc()
    with open(os.path.join(data_dir, "index_map", "drug-map.pkl"), "rb") as f:
        drug_map = pickle.load(f)
    with open(os.path.join(data_dir, "index_map", "protein-map.pkl"), "rb") as f:
        protein_map = pickle.load(f)
    inv_drug = {v: k for k, v in drug_map.items()}
    inv_prot = {v: k for k, v in protein_map.items()}
    drug_rows = np.nonzero(
        np.asarray(dp[:, protein_idx].todense()).ravel()
    )[0]
    return {
        "protein_idx": int(protein_idx),
        "protein_gene_id": inv_prot.get(int(protein_idx)),
        "n_drugs": int(len(drug_rows)),
        "drug_ids": [inv_drug.get(int(d)) for d in drug_rows],
    }


def proteins_of_side_effect(
    et: int, report_a: str, data_dir: str = DEFAULT_DATA_DIR, top: int = 20
) -> dict:
    """Proteins targeted by the drug pairs of one side-effect relation —
    the hand-off list GO enrichment would consume (check_data cell 33's
    'know mechanism' note).  Counts how many of the relation's drugs target
    each protein and returns the most-shared ones."""
    import scipy.sparse as sp

    adj = sp.load_npz(
        os.path.join(data_dir, "sym_adj", "drug-sparse-adj", f"type_{et}.npz")
    ).tocoo()
    drugs = np.unique(np.concatenate([adj.row, adj.col]))
    dp = sp.load_npz(
        os.path.join(data_dir, "sym_adj", "drug-protein-sparse-adj.npz")
    ).tocsr()
    counts = np.asarray(dp[drugs].sum(axis=0)).ravel()
    order = np.argsort(-counts)[:top]
    with open(os.path.join(data_dir, "index_map", "protein-map.pkl"), "rb") as f:
        protein_map = pickle.load(f)
    inv_prot = {v: k for k, v in protein_map.items()}
    return {
        "et": int(et),
        "n_drugs": int(len(drugs)),
        "proteins": [
            {"protein_idx": int(p), "gene_id": inv_prot.get(int(p)),
             "n_targeting_drugs": int(counts[p])}
            for p in order if counts[p] > 0
        ],
    }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Compare two per-relation reports (check_data analog)"
    )
    ap.add_argument("report_a", help="probe model report (e.g. PR-HMP-NN)")
    ap.add_argument("report_b", help="baseline model report (e.g. DR-DF)")
    ap.add_argument("--metric", default="auprc")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--proteins-for", type=int, default=None, metavar="ET",
                    help="also list the most-shared target proteins of one "
                         "side-effect relation")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = compare_reports(args.report_a, args.report_b,
                           metric=args.metric, top=args.top)
    print(f"{'side effect':42s} {'A':>7s} {'B':>7s} {'delta':>7s}")
    for r in rows:
        print(f"{r['name'][:42]:42s} {r[args.metric + '_a']:7.4f} "
              f"{r[args.metric + '_b']:7.4f} {r['delta']:7.4f}")
    out = {"comparison": rows}
    if args.proteins_for is not None:
        prot = proteins_of_side_effect(args.proteins_for, args.report_a)
        out["proteins"] = prot
        print(f"\ntop shared target proteins of relation {args.proteins_for}:")
        for p in prot["proteins"][:10]:
            print(f"  gene {p['gene_id']}  targeted by "
                  f"{p['n_targeting_drugs']} of {prot['n_drugs']} drugs")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"-> {args.out}")


if __name__ == "__main__":
    main()
