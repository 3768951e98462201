#!/bin/bash
# Round-3 accuracy archaeology, part 2: the runs from suite_r3.sh that the
# round-2 cutoff interrupted, ordered by evidentiary value.
#   - tip_cat_wide_1000ep: VERDICT's literal ask (--n-hid1 64 --n-hid2 32).
#   - dr_df_e64_963: the decoded DR-DF recorded config (dd-rgcn-dist(16-64-32-16))
#     on the 963-type set; recorded value 0.948.
#   - tip_cat_mono_sqrt: mono+sqrt features on full TIP.
#   - tip_cat_963 / dr_df_e64 / tip_cat_e16: controls isolating type-set vs dims.
set -x
cd /root/repo
BAND="--et-band 999,1000000000"   # nnz >= 1000 -> the 963-type set

timeout 3000 python -m tip_tpu.train --mode cat --n-hid1 64 --n-hid2 32 \
    --epochs 1000 --eval-every 100 \
    --out runs/tip_cat_wide_1000ep.json 2>runs/tip_cat_wide_1000ep.err
timeout 1800 python -m tip_tpu.models --variant dr-df --n-embed 64 $BAND \
    --epochs 100 --out runs/dr_df_e64_963.json 2>runs/dr_df_e64_963.err
timeout 1800 python -m tip_tpu.train --mode cat --mono --feat-norm sqrt \
    --epochs 100 --out runs/tip_cat_mono_sqrt.json 2>runs/tip_cat_mono_sqrt.err
timeout 1800 python -m tip_tpu.train --mode cat $BAND \
    --epochs 100 --out runs/tip_cat_963.json 2>runs/tip_cat_963.err
timeout 1800 python -m tip_tpu.models --variant dr-df --n-embed 64 \
    --epochs 100 --out runs/dr_df_e64.json 2>runs/dr_df_e64.err
timeout 1800 python -m tip_tpu.train --mode cat --n-embed 16 \
    --epochs 100 --out runs/tip_cat_e16.json 2>runs/tip_cat_e16.err
echo SUITE_R3B_DONE
