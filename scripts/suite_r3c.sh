#!/bin/bash
# Round-3 accuracy archaeology, part 3: long-horizon (1000-epoch) runs of the
# DECODED recorded configs, to rule out "just needed more epochs" for the
# reference's recorded 0.948 (evaluation.ipynb cell 13).  The narrow shipped
# config plateaus at 0.9121@1000ep and the wide at 0.9175@1000ep; these runs
# extend the decoded dims to the 963-type set the records used.
set -x
cd /root/repo
BAND="--et-band 999,1000000000"   # nnz >= 1000 -> the 963-type set

timeout 3000 python -m tip_tpu.train --mode cat --n-embed 16 $BAND \
    --epochs 1000 --eval-every 100 \
    --out runs/tip_cat_e16_963_1000ep.json 2>runs/tip_cat_e16_963_1000ep.err
timeout 3000 python -m tip_tpu.models --variant dr-df --n-embed 64 $BAND \
    --epochs 1000 --eval-every 100 \
    --out runs/dr_df_e64_963_1000ep.json 2>runs/dr_df_e64_963_1000ep.err
timeout 3000 python -m tip_tpu.train --mode cat --n-hid1 64 --n-hid2 32 $BAND \
    --epochs 1000 --eval-every 100 \
    --out runs/tip_cat_wide_963_1000ep.json 2>runs/tip_cat_wide_963_1000ep.err
echo SUITE_R3C_DONE
