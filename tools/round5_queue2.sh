#!/bin/bash
set -x
cd /root/repo
WD=tools/with_watchdog.sh

# fern: NDC depth sidecars + retrain + metric depth scoring
bash $WD /tmp/r5_fern.log -- \
  python tools/distill_bench.py --scenes fern \
  --out docs/DISTILL_BENCH.json || exit 2

# glass seed 0 at the strong protocol (per-class decomposition)
sleep 20
bash $WD /tmp/r5_glass.log -- \
  python tools/transparency_trained_check.py --views 64 --size 160 \
  --iters 30000 --batch 16384 --lr-decay 50 --seeds 0 || exit 6

# messytable: 3 seeds lego + chair + control column
sleep 20
bash $WD /tmp/r5_mtb_lego.log -- \
  python tools/messytable_bench.py --scenes lego --seeds 0,1,2 \
  --iters 15000 || exit 3
sleep 20
bash $WD /tmp/r5_mtb_chair.log -- \
  python tools/messytable_bench.py --scenes chair --seeds 0 \
  --iters 15000 || exit 4

# glass seeds 1,2 (multi-seed the headline artifact)
sleep 20
bash $WD /tmp/r5_glass.log -- \
  python tools/transparency_trained_check.py --views 64 --size 160 \
  --iters 30000 --batch 16384 --lr-decay 50 --seeds 0,1,2 || exit 7

# host-store wire A/B on chip
sleep 20
bash $WD /tmp/r5_hostwire.log -- \
  python tools/host_store_scale_probe.py --stage all --hw 400 \
  --bank-views 8 --gb 2.0 --batch 16384 --steps 150 --blocks 3 \
  --samples 32 --workdir /tmp/hssp_chip \
  --out docs/HOST_STORE_WIRE.json || exit 8

# messytable 50k + soak tail
sleep 20
bash $WD /tmp/r5_mtb_50k.log -- \
  python tools/messytable_bench.py --scenes lego --seeds 0 \
  --iters 50000 || exit 5
sleep 20
bash $WD /tmp/r5_soak.log -- \
  python tools/soak_bench.py --iters 100000 || exit 9

echo "round5 queue2 done"
