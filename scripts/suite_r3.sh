#!/bin/bash
# Round-3 accuracy archaeology: run the DECODED recorded configs from
# /root/reference/analysis/evaluation.ipynb cell 11 run-dir names.
# Decode (one-field diff from each shipped script, declaration order):
#   dd-rgcn-dist(16-64-32-16)      = n_base 16, n_embed 64, n_hid1 32, n_hid2 16
#                                    (shipped model/ddm-df_rgcn.py:31-35 has n_embed 16)
#   fm-(32-16)-(16-16-32-32-16)    = pp (32,16); prot_drug 16, n_embed 16,
#                                    n_base 32, n_hid1 32, n_hid2 16
#                                    (shipped tip.py:14 has n_embed 48)
# All recorded runs used the 963-type set (out/decagon_et.pkl, nnz >= 1000)
# and 100 epochs (evaluation.ipynb cell 12: out[99][0]).
set -x
cd /root/repo
BAND="--et-band 999,1000000000"   # nnz >= 1000 -> the 963-type set

# exact decoded recorded configs @ 100 ep
timeout 1800 python -m tip_tpu.models --variant dr-df --n-embed 64 $BAND \
    --epochs 100 --out runs/dr_df_e64_963.json 2>runs/dr_df_e64_963.err
timeout 1800 python -m tip_tpu.train --mode cat --n-embed 16 $BAND \
    --epochs 100 --out runs/tip_cat_e16_963.json 2>runs/tip_cat_e16_963.err
timeout 1800 python -m tip_tpu.models --variant dr-nn --n-embed 64 $BAND \
    --epochs 100 --out runs/dr_nn_e64_963.json 2>runs/dr_nn_e64_963.err

# same decoded dims on the shipped 1,097 set (isolates dims vs type-set)
timeout 1800 python -m tip_tpu.models --variant dr-df --n-embed 64 \
    --epochs 100 --out runs/dr_df_e64.json 2>runs/dr_df_e64.err
timeout 1800 python -m tip_tpu.train --mode cat --n-embed 16 \
    --epochs 100 --out runs/tip_cat_e16.json 2>runs/tip_cat_e16.err

# controls / VERDICT's literal asks
timeout 1800 python -m tip_tpu.train --mode cat $BAND \
    --epochs 100 --out runs/tip_cat_963.json 2>runs/tip_cat_963.err
timeout 2700 python -m tip_tpu.train --mode cat --n-hid1 64 --n-hid2 32 \
    --epochs 1000 --eval-every 100 \
    --out runs/tip_cat_wide_1000ep.json 2>runs/tip_cat_wide_1000ep.err
timeout 1800 python -m tip_tpu.train --mode cat --mono --feat-norm sqrt \
    --epochs 100 --out runs/tip_cat_mono_sqrt.json 2>runs/tip_cat_mono_sqrt.err
echo SUITE_R3_DONE
