#!/bin/bash
# Round-5 tail queue: waits for the in-flight soak (the only other TPU
# claimant) to finish — docs/SOAK_100K.json with partial=false and a
# test-set score — then runs the remaining chip stages serialized under
# the stall watchdog, in judge-priority order:
#   1. host-store wire A/B (f32 vs packed vs resident)  -> HOST_STORE_WIRE.json
#   2. trained-glass seeds 1,2 (seed 0 recorded)        -> TRANSPARENCY_TRAINED.json
#   3. messytable lego @50k                             -> MESSYTABLE_CHIP.json
set -x
cd /root/repo
WD=tools/with_watchdog.sh

while true; do
  done_flag=$(python3 - <<'EOF'
import json, os
p = "docs/SOAK_100K.json"
try:
    d = json.load(open(p))
    ok = (not d.get("partial", True)) and d.get("test_set", {}).get("psnr_db")
    print("yes" if ok else "no")
except Exception:
    print("no")
EOF
)
  [ "$done_flag" = "yes" ] && break
  sleep 60
done
sleep 30

bash $WD /tmp/r5_hostwire.log -- \
  python tools/host_store_scale_probe.py --stage all --hw 400 \
  --bank-views 8 --gb 2.0 --batch 16384 --steps 150 --blocks 3 \
  --samples 32 --workdir /tmp/hssp_chip \
  --out docs/HOST_STORE_WIRE.json || exit 1

sleep 20
bash $WD /tmp/r5_glass.log -- \
  python tools/transparency_trained_check.py --views 64 --size 160 \
  --iters 30000 --batch 16384 --lr-decay 50 --seeds 1,2 || exit 2

sleep 20
bash $WD /tmp/r5_mtb_50k.log -- \
  python tools/messytable_bench.py --scenes lego --seeds 0 \
  --iters 50000 || exit 3

echo "round5b queue done"
