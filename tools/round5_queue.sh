#!/bin/bash
# Round-5 chip queue (serialized — one TPU claimant at a time).
# Every stage runs under the stall watchdog (tools/with_watchdog.sh):
# wedge -> kill tree -> wait out recovery -> retry the resumable stage.
set -x
cd /root/repo
WD=tools/with_watchdog.sh

# 0) finish the depth-distilled table with AUTO warmup (PSNR-gated
#    RGB-first phase; materials/drums collapse under depth-from-iter-0)
bash $WD /tmp/r5_distill.log -- \
  python tools/distill_bench.py --scenes materials drums chair lego \
  --depth-loss 0.1 --depth-warmup -1 \
  --out docs/DISTILL_BENCH_DEPTH.json || exit 1

# 1) fern: regen dataset WITH NDC depth sidecars, retrain RGB-only,
#    eval with metric-converted depth scoring (fills the null cells)
sleep 20
bash $WD /tmp/r5_fern.log -- \
  python tools/distill_bench.py --scenes fern \
  --out docs/DISTILL_BENCH.json || exit 2

# 2) messytable matrix: 2 scenes, 3 seeds on lego + control column
sleep 20
bash $WD /tmp/r5_mtb_lego.log -- \
  python tools/messytable_bench.py --scenes lego --seeds 0,1,2 \
  --iters 15000 || exit 3
sleep 20
bash $WD /tmp/r5_mtb_chair.log -- \
  python tools/messytable_bench.py --scenes chair --seeds 0 \
  --iters 15000 || exit 4

# 3) messytable at reference length scale (50k, same operating point)
sleep 20
bash $WD /tmp/r5_mtb_50k.log -- \
  python tools/messytable_bench.py --scenes lego --seeds 0 \
  --iters 50000 || exit 5

# 4) trained-glass: 3 seeds at the strong protocol, per-class decomposition
sleep 20
bash $WD /tmp/r5_glass.log -- \
  python tools/transparency_trained_check.py --views 64 --size 160 \
  --iters 30000 --batch 16384 --lr-decay 50 --seeds 0,1,2 || exit 6

echo "round5 queue done"

# 5) host-store wire A/B on chip (small store: the wire tax per step is
#    store-size independent; the 30 GiB scale itself was proven round 4)
sleep 20
bash $WD /tmp/r5_hostwire.log -- \
  python tools/host_store_scale_probe.py --stage all --hw 400 \
  --bank-views 8 --gb 2.0 --batch 16384 --steps 150 --blocks 3 \
  --samples 32 --workdir /tmp/hssp_chip \
  --out docs/HOST_STORE_WIRE.json || exit 7

# 6) reference-length soak (open-ended tail stage: 100k iters)
sleep 20
bash $WD /tmp/r5_soak.log -- \
  python tools/soak_bench.py --iters 100000 || exit 8

echo "round5 queue FULLY done"
