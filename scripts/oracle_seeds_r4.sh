#!/bin/bash
# Round-4 error-bar replication: torch oracle TIP-cat at two extra seeds
# (seed 1111 already committed as runs/torch_oracle_cat.json).
set -e
export PYTHONPATH=/root/repo
for s in 2222 3333; do
  nice -n 19 python scripts/torch_oracle_tip.py --mode cat --epochs 100 \
    --seed $s --eval-every 25 --out runs/torch_oracle_cat_s$s.json \
    > runs/torch_oracle_cat_s$s.log 2>&1
done
