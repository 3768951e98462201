"""CLI entry: ``python -m tip_tpu.train [--mode cat|add] [...]``.

The reference's entry script hard-codes everything (reference: tip.py:6-17);
this exposes the same run as flags over the typed configs.
"""

from __future__ import annotations

import argparse
import json

from tip_tpu.config import add_config_flags, configs_from_args


def main() -> None:
    parser = argparse.ArgumentParser(description="Train TIP on the Decagon tri-graph")
    add_config_flags(parser)
    parser.add_argument("--data-dir", default=None, help="reference data dir")
    parser.add_argument(
        "--et-band", default=None, metavar="LOW,HIGH",
        help="train only relations with nnz in (LOW, HIGH) (cut_data analog)",
    )
    parser.add_argument("--mono", action="store_true",
                        help="use mono side-effect drug features")
    parser.add_argument(
        "--feat-norm", choices=["ones", "sqrt"], default="ones",
        help="drug-feature row normalization: 'ones' = the reference's "
             "shipped d_norm (prepare.py:25); 'sqrt' = the commented "
             "sqrt-row-sum alternative (model/ddm-df_rgcn.py:29)",
    )
    parser.add_argument("--synthetic", action="store_true", help="tiny random graph")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument(
        "--backend", choices=["auto", "xla", "pallas"], default="auto",
        help="sparse-ops backend (auto: pallas on TPU, xla elsewhere)",
    )
    parser.add_argument("--profile-dir", default=None)
    parser.add_argument(
        "--split-seed", type=int, default=None,
        help="90/10 split seed (default: the training seed).  Pin this while "
             "varying --seed for seed-replication runs on one split "
             "(reference protocol: one split, tip.py:21-36)",
    )
    parser.add_argument(
        "--resume", default=None, metavar="DIR_OR_PREFIX",
        help="resume from a checkpoint: a --checkpoint-dir (latest epoch "
             "picked) or a specific path prefix like runs/ck/ep49 "
             "(reference restore recipe: test/pd_net.py:236-247)",
    )
    parser.add_argument("--out", default=None, help="write final metrics JSON here")
    parser.add_argument(
        "--report", default=None,
        help="write named per-relation metric report (json/csv) here",
    )
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tip_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from tip_tpu.data import (
        build_trigraph, cached_trigraph, load_decagon_raw, synthetic_trigraph,
    )
    from tip_tpu.train.loop import train

    cfg, tcfg = configs_from_args(args)
    split_seed = tcfg.seed if args.split_seed is None else args.split_seed
    if args.synthetic:
        raw = synthetic_trigraph()
        data = build_trigraph(raw, split_rate=tcfg.split_rate, seed=split_seed)
    else:
        kw = {"data_dir": args.data_dir} if args.data_dir else {}
        if args.et_band:
            from tip_tpu.data.decagon import et_list_by_nnz_band

            low, high = (int(x) for x in args.et_band.split(","))
            kw["et_list"] = et_list_by_nnz_band(low, high, **kw)
        if args.mono:
            kw["mono"] = True
        raw = load_decagon_raw(**kw)
        data = cached_trigraph(raw, split_rate=tcfg.split_rate, seed=split_seed)
    if args.feat_norm == "sqrt" and data.drug_feat is not None:
        import dataclasses

        import numpy as np

        data = dataclasses.replace(
            data, d_norm=np.sqrt(data.drug_feat.sum(axis=1)).astype(np.float32)
        )
    _, result = train(
        cfg, tcfg, data, profile_dir=args.profile_dir, backend=args.backend,
        resume=args.resume,
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"final": result["final"], "history": result["history"]}, f)
    if args.report:
        from tip_tpu.analysis import (
            decagon_rank_comparison,
            load_side_effect_names,
            per_relation_table,
            save_report,
        )

        et_ids = raw.et_ids
        try:
            names = load_side_effect_names(et_ids)
            summary = dict(result["final"])
            summary.update(decagon_rank_comparison(result["per_relation"], et_ids))
        except (FileNotFoundError, OSError):
            names, summary = None, dict(result["final"])
        rows = per_relation_table(result["per_relation"], et_ids, names)
        save_report(args.report, rows, summary)
        print(f"per-relation report -> {args.report}")


if __name__ == "__main__":
    main()
