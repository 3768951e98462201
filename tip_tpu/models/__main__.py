"""CLI entry: ``python -m tip_tpu.models --variant dr-df [...]``.

Runs one of the reference's experiment variants on the real Decagon graph
(reference: model/ddm-df_rgcn.py, model/ddm-nn.py, test/pd_net.py,
test/pp_net.py) so the 4-variant comparison table of
analysis/evaluation.ipynb cell 13 is reproducible from the command line.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser(description="Train a TIP model variant")
    parser.add_argument("--variant", required=True,
                        choices=["dr-df", "dr-nn", "pr-hmp-nn", "pp-gae"])
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--seed", type=int, default=1111)
    parser.add_argument("--eval-every", type=int, default=0)
    parser.add_argument("--data-dir", default=None)
    parser.add_argument(
        "--et-band", default=None, metavar="LOW,HIGH",
        help="train only relations with nnz in (LOW, HIGH) (cut_data analog)",
    )
    parser.add_argument("--mono", action="store_true",
                        help="use [identity | mono] drug features "
                             "(reference: model/ddm-*.py mono=True)")
    parser.add_argument(
        "--feat-norm", choices=["ones", "sqrt"], default="ones",
        help="drug-feature row normalization: 'ones' is the reference's "
             "active line (x_norm = ones, model/ddm-df_rgcn.py:28), which "
             "DIVERGES with mono features (epoch-0 loss ~15 -> dead ReLUs); "
             "'sqrt' is its commented alternative (line 29) that trains",
    )
    dims = parser.add_argument_group(
        "dims", "DDConfig dimension overrides (dr-df / dr-nn only); the "
        "recorded reference runs used non-shipped dims, e.g. run dir "
        "dd-rgcn-dist(16-64-32-16) = n_base 16, n_embed 64, hid 32/16")
    for flag in ("n-embed", "n-hid1", "n-hid2", "num-base"):
        dims.add_argument(f"--{flag}", type=int, default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--backend", choices=["auto", "xla", "pallas"], default="auto")
    parser.add_argument("--kernel-dtype", choices=["float32", "bfloat16"],
                        default="float32")
    parser.add_argument("--out", default=None, help="write final metrics JSON here")
    parser.add_argument("--report", default=None,
                        help="write named per-relation metric report (json/csv) here")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tip_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from tip_tpu.data import (
        build_trigraph, cached_trigraph, load_decagon_raw, synthetic_trigraph,
    )
    from tip_tpu.models.runner import build_variant, train_variant

    if args.synthetic:
        raw = synthetic_trigraph()
        data = build_trigraph(raw, seed=args.seed)
    else:
        kw = {"data_dir": args.data_dir} if args.data_dir else {}
        if args.et_band:
            from tip_tpu.data.decagon import et_list_by_nnz_band

            low, high = (int(x) for x in args.et_band.split(","))
            kw["et_list"] = et_list_by_nnz_band(low, high, **kw)
        if args.mono:
            kw["mono"] = True
        raw = load_decagon_raw(**kw)
        data = cached_trigraph(raw, seed=args.seed)
    if args.feat_norm == "sqrt" and data.drug_feat is not None:
        import dataclasses

        import numpy as np

        data = dataclasses.replace(
            data, d_norm=np.sqrt(data.drug_feat.sum(axis=1)).astype(np.float32)
        )
    dim_over = {
        name: getattr(args, name)
        for name in ("n_embed", "n_hid1", "n_hid2", "num_base")
        if getattr(args, name, None) is not None
    }
    model, graph, test = build_variant(
        args.variant, data, backend=args.backend, kernel_dtype=args.kernel_dtype,
        dims=dim_over or None,
    )
    _, result = train_variant(
        model, graph, test,
        epochs=args.epochs, lr=args.lr, seed=args.seed, eval_every=args.eval_every,
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"variant": args.variant, "final": result["final"],
                       "history": result["history"]}, f)
    if args.report and args.variant != "pp-gae":
        from tip_tpu.analysis import (
            load_side_effect_names, per_relation_table, save_report,
        )

        try:
            names = load_side_effect_names(raw.et_ids)
        except (FileNotFoundError, OSError):
            names = None
        rows = per_relation_table(result["per_relation"], raw.et_ids, names)
        save_report(args.report, rows, dict(result["final"]))
        print(f"per-relation report -> {args.report}")


if __name__ == "__main__":
    main()
