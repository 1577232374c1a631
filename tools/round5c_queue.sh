#!/bin/bash
# Round-5 session-3 queue (machine was wiped between sessions; /tmp and
# logs/ are fresh). Chains behind the in-flight host-store wire A/B:
#   1. (running) host-store wire A/B             -> docs/HOST_STORE_WIRE.json
#   2. trained-glass seeds 1,2 (seed 0 recorded) -> docs/TRANSPARENCY_TRAINED.json
# Serialized: one TPU claimant at a time (two wedge the tunnel).
set -x
cd /root/repo
WD=tools/with_watchdog.sh

# wait for the wire probe (PID in /tmp/hostwire.pid) to exit
if [ -f /tmp/hostwire.pid ]; then
  while kill -0 "$(cat /tmp/hostwire.pid)" 2>/dev/null; do sleep 30; done
fi
sleep 20

bash $WD /tmp/r5_glass.log -- \
  python tools/transparency_trained_check.py --views 64 --size 160 \
  --iters 30000 --batch 16384 --lr-decay 50 --seeds 1,2 || exit 2

echo "round5c queue done"
