"""Torch oracle of the reference's 5-relation smoke run (test/dd_net.py).

Reproduces dd_net.py's exact protocol — dims 4 everywhere, MyRGCNConv math,
final ReLU after layer 2 (test/dd_net.py:90-91), UNTYPED negative sampling
(test/dd_net.py:131,160 call the untyped sampler), GLOBAL AUPRC over the
whole concatenated score vector (test/dd_net.py:149-155, NOT the per-type
macro the full model uses), probability loss with EPS — but on tip_tpu's
packed 5-type split so the JAX regression test
(tests/test_golden_smoke.py) can compare against the committed trace
(tests/golden/dd_net_trace.json) on identical data.

Note the comment trace at test/dd_net.py:197-201 (0.564 -> 0.628) does not
reproduce with the shipped code under any seed we tried; this oracle IS the
reproducible ground truth for the shipped semantics.

Usage: python scripts/torch_oracle_dd.py [--epochs 5] [--seeds 5]
       [--out tests/golden/dd_net_trace.json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import torch
from sklearn import metrics as skm

ET_LIST = [20, 34, 38, 41, 42]  # reference: test/dd_net.py:14,34


class DDNet(torch.nn.Module):
    def __init__(self, n_drug, n_et, dim=4):
        super().__init__()
        self.embed = torch.nn.Parameter(torch.randn(n_drug, dim))
        # MyRGCNConv init (src/layers.py:61-71)
        def rgcn(after_relu):
            std = 2 / dim if after_relu else 1 / np.sqrt(dim)
            return torch.nn.ParameterDict({
                "att": torch.nn.Parameter(
                    torch.empty(n_et, dim).normal_(std=1 / np.sqrt(dim))
                ),
                "basis": torch.nn.Parameter(
                    torch.empty(dim, dim, dim).normal_(std=std)
                ),
                "root": torch.nn.Parameter(torch.empty(dim, dim).normal_(std=std)),
            })
        self.rgcn1 = rgcn(False)
        self.rgcn2 = rgcn(True)
        self.dec_w = torch.nn.Parameter(
            torch.empty(n_et, dim).normal_(std=1 / np.sqrt(dim))
        )

    @staticmethod
    def conv(p, x, src, dst, et, deg):
        # per-edge weights (MyRGCNConv.message, src/layers.py:81-86)
        w = torch.einsum("tb,bio->tio", p["att"], p["basis"])
        msgs = torch.einsum("ei,eio->eo", x[src], w[et])
        out = torch.zeros_like(x)
        out.index_add_(0, dst, msgs)
        inv = torch.where(deg > 0, 1.0 / deg.clamp(min=1.0), torch.zeros(()))
        return out * inv[:, None] + x @ p["root"]

    def encode(self, src, dst, et, deg):
        x = self.embed  # identity features @ embed, x_norm = ones
        x = torch.relu(self.conv(self.rgcn1, x, src, dst, et, deg))
        return torch.relu(self.conv(self.rgcn2, x, src, dst, et, deg))

    def score(self, z, src, dst, et):
        return torch.sigmoid((z[src] * z[dst] * self.dec_w[et]).sum(dim=1))


def untyped_negative_sampling(edge_index, n):
    """Reference src/neg_sampling.py:negative_sampling (whole-buffer)."""
    src, dst = np.asarray(edge_index, np.int64)
    pos = np.unique(src * n + dst)
    draw = np.random.randint(0, n * n, src.shape[0])
    mask = np.isin(draw, pos)
    while mask.any():
        draw[mask] = np.random.randint(0, n * n, int(mask.sum()))
        mask = np.isin(draw, pos)
    return draw // n, draw % n


def global_auprc(pos, neg):
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    s = np.concatenate([pos, neg])
    p, r, _ = skm.precision_recall_curve(y, s)
    return skm.auc(r, p)


def run_seed(data, seed, epochs):
    torch.manual_seed(seed)
    np.random.seed(seed)
    n = data.n_drug
    model = DDNet(n, data.n_et)
    opt = torch.optim.Adam(model.parameters(), lr=0.01)
    tr_src = torch.as_tensor(data.dd_train.edge_index[0], dtype=torch.long)
    tr_dst = torch.as_tensor(data.dd_train.edge_index[1], dtype=torch.long)
    tr_et = torch.as_tensor(data.dd_train.edge_type, dtype=torch.long)
    deg = torch.as_tensor(data.dd_train_deg, dtype=torch.float32)
    te_src = torch.as_tensor(data.dd_test.edge_index[0], dtype=torch.long)
    te_dst = torch.as_tensor(data.dd_test.edge_index[1], dtype=torch.long)
    te_et = torch.as_tensor(data.dd_test.edge_type, dtype=torch.long)
    tn = untyped_negative_sampling(data.dd_test.edge_index, n)
    tn = (torch.as_tensor(tn[0]), torch.as_tensor(tn[1]))
    EPS = 1e-13
    train_curve, test_curve = [], []
    for _ in range(epochs):
        opt.zero_grad()
        z = model.encode(tr_src, tr_dst, tr_et, deg)
        ns, nd = untyped_negative_sampling(data.dd_train.edge_index, n)
        pos = model.score(z, tr_src, tr_dst, tr_et)
        neg = model.score(z, torch.as_tensor(ns), torch.as_tensor(nd), tr_et)
        loss = -torch.log(pos + EPS).mean() - torch.log(1 - neg + EPS).mean()
        loss.backward()
        opt.step()
        train_curve.append(global_auprc(pos.detach().numpy(), neg.detach().numpy()))
        with torch.no_grad():
            tp = model.score(z, te_src, te_dst, te_et).numpy()
            tneg = model.score(z, tn[0], tn[1], te_et).numpy()
        test_curve.append(global_auprc(tp, tneg))
    return train_curve, test_curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", default="tests/golden/dd_net_trace.json")
    args = ap.parse_args()

    from tip_tpu.data import load_decagon_raw, build_trigraph

    raw = load_decagon_raw(et_list=ET_LIST)
    data = build_trigraph(raw, split_rate=0.9, seed=1111)
    runs = [run_seed(data, s, args.epochs) for s in range(args.seeds)]
    test_final = np.array([r[1][-1] for r in runs])
    test_first = np.array([r[1][0] for r in runs])
    out = {
        "protocol": "dd_net.py smoke: 5 relations, dims=4, untyped negatives, "
                    "global AUPRC, split seed 1111 (tip_tpu packing)",
        "epochs": args.epochs,
        "seeds": args.seeds,
        "train_auprc": [list(map(float, r[0])) for r in runs],
        "test_auprc": [list(map(float, r[1])) for r in runs],
        "test_auprc_epoch0": [round(float(x), 4) for x in test_first],
        "test_auprc_final": [round(float(x), 4) for x in test_final],
        "test_final_mean": round(float(test_final.mean()), 4),
        "test_final_std": round(float(test_final.std()), 4),
        "reference_comment_trace": [0.5642, 0.5784, 0.5945, 0.6105, 0.6284],
    }
    import os

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("train_auprc", "test_auprc")}, indent=1))


if __name__ == "__main__":
    main()
