#!/bin/bash
# Error-bar replication (VERDICT r4 #5): TIP-cat at 3 init/sampling seeds on
# the PINNED 1111 split, 100 epochs each, on the real chip.  Seed 1111's
# sampled-estimator run is runs/tip_cat.json (r2) and the poisson run is
# runs/tip_cat_poisson_100ep.json; this adds 2222/3333 plus a profiler
# trace run.
set -e
cd /root/repo
for s in 2222 3333; do
  python -u -m tip_tpu.train --epochs 100 --seed $s --split-seed 1111 \
    --eval-every 50 --log-every 20 --out runs/tip_cat_s$s.json \
    > runs/tip_cat_s$s.log 2>&1
done
# seed 1111 re-run on the current (poisson) default for a like-for-like triple
python -u -m tip_tpu.train --epochs 100 --seed 1111 --split-seed 1111 \
  --eval-every 50 --log-every 20 --out runs/tip_cat_s1111.json \
  > runs/tip_cat_s1111.log 2>&1
