#!/bin/bash
# Round-5 chip queue (serialized — one TPU claimant at a time).
# Each stage is resumable; logs under /tmp/r5_*.log.
set -x
cd /root/repo

# 1) fern: regen dataset WITH NDC depth sidecars, retrain RGB-only,
#    eval with metric-converted depth scoring (fills the null cells)
sleep 20; python tools/distill_bench.py --scenes fern \
  --out docs/DISTILL_BENCH.json > /tmp/r5_fern.log 2>&1 || exit 1

# 2) messytable matrix: 2 scenes, 3 seeds on lego + control column
sleep 20; python tools/messytable_bench.py --scenes lego --seeds 0,1,2 \
  --iters 15000 > /tmp/r5_mtb_lego.log 2>&1 || exit 2
sleep 20; python tools/messytable_bench.py --scenes chair --seeds 0 \
  --iters 15000 > /tmp/r5_mtb_chair.log 2>&1 || exit 3

# 3) messytable at reference length scale (50k, same operating point)
sleep 20; python tools/messytable_bench.py --scenes lego --seeds 0 \
  --iters 50000 > /tmp/r5_mtb_50k.log 2>&1 || exit 4

# 4) trained-glass: 3 seeds at the strong protocol, per-class decomposition
sleep 20; python tools/transparency_trained_check.py --views 64 --size 160 \
  --iters 30000 --batch 16384 --lr-decay 50 \
  --seeds 0,1,2 > /tmp/r5_glass.log 2>&1 || exit 5

echo "round5 queue done"
