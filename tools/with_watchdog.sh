#!/bin/bash
# Run a (resumable) chip stage under a stall watchdog.
#
#   tools/with_watchdog.sh LOGFILE -- cmd args...
#
# The remote TPU tunnel wedges sporadically (process alive, zero CPU
# growth, no output — see CLAUDE.md). The watchdog samples the command's
# process tree CPU time every 60 s; after 4 consecutive unchanged
# samples it kills the tree (by PID, never by pattern), sleeps out the
# tunnel recovery (~9 min measured), and retries — stages are resumable
# so completed sub-work is kept. Up to 5 attempts.

LOG="$1"; shift
[ "$1" = "--" ] && shift

descendants() {
  local p=$1
  echo "$p"
  local c
  for c in $(pgrep -P "$p" 2>/dev/null); do
    descendants "$c"
  done
}

tree_cpu() {
  # total CPU seconds of pid + all descendants
  local pids
  pids=$(descendants "$1" | tr '\n' ',' | sed 's/,$//')
  ps -o time= -p "$pids" 2>/dev/null \
    | awk -F: '{ s += $1*3600 + $2*60 + $3 } END { print s+0 }'
}

for attempt in 1 2 3 4 5; do
  echo "== watchdog attempt $attempt: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  prev=-1
  stale=0
  wedged=0
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    cur=$(tree_cpu "$PID")
    if [ "$cur" = "$prev" ]; then
      stale=$((stale + 1))
    else
      stale=0
    fi
    prev=$cur
    if [ "$stale" -ge 12 ]; then
      echo "WATCHDOG: no CPU growth for 8 min — killing tree (attempt $attempt)" >> "$LOG"
      wedged=1
      for p in $(descendants "$PID" | sort -rn); do
        kill "$p" 2>/dev/null
      done
      sleep 5
      for p in $(descendants "$PID" | sort -rn); do
        kill -9 "$p" 2>/dev/null
      done
      break
    fi
  done
  wait "$PID"
  rc=$?
  if [ "$rc" -eq 0 ] && [ "$wedged" -eq 0 ]; then
    exit 0
  fi
  echo "WATCHDOG: stage rc=$rc wedged=$wedged — sleeping 540 s for tunnel recovery" >> "$LOG"
  sleep 540
done
echo "WATCHDOG: giving up after 5 attempts" >> "$LOG"
exit 1
