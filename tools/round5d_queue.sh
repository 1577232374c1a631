#!/bin/bash
# Round-5 session-3 tail: waits for the restarted 100k soak to COMPLETE
# (docs/SOAK_100K.json partial=false with a test-set score), then runs
# the remaining chip evidence serialized under the watchdog:
#   1. glass seed 2 (seeds 0,1 recorded; tool skips them) -> TRANSPARENCY_TRAINED.json
#   2. messytable lego @50k                               -> MESSYTABLE_CHIP.json
set -x
cd /root/repo
WD=tools/with_watchdog.sh

while true; do
  done_flag=$(python3 - <<'EOF'
import json
try:
    d = json.load(open("docs/SOAK_100K.json"))
    ok = (not d.get("partial", True)) and d.get("test_set", {}).get("psnr_db")
    print("yes" if ok else "no")
except Exception:
    print("no")
EOF
)
  [ "$done_flag" = "yes" ] && break
  sleep 120
done
sleep 30

bash $WD /tmp/r5_glass2.log -- \
  python tools/transparency_trained_check.py --views 64 --size 160 \
  --iters 30000 --batch 16384 --lr-decay 50 --seeds 0,1,2 || exit 2

sleep 20
bash $WD /tmp/r5_mtb_50k.log -- \
  python tools/messytable_bench.py --scenes lego --seeds 0 \
  --iters 50000 || exit 3

echo "round5d queue done"
