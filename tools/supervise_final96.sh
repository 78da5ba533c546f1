#!/bin/bash
# Keep the final-protocol sandwich campaign alive until DEADLINE or the
# pair budget is met: run_scaling_v2 exits when --max-attempts is
# exhausted by a long storm; this relaunches it while wall-clock remains.
set -u
cd /root/repo
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH}
WANT=${WANT:-6}
OUT=${OUT:-BENCH/scaling_r4_final96.jsonl}
SEGDIR=${SEGDIR:-BENCH/segmetrics_r4_final96}
LOG=${LOG:-binlog96}
while [ "$(date +%s)" -lt "$DEADLINE_EPOCH" ]; do
  # NB: grep -c prints "0" AND exits 1 on zero matches — `|| echo 0` would
  # yield "0\n0" and break the arithmetic below. Default separately.
  have=$(grep -c '"pair"' "$OUT" 2>/dev/null) || have=0
  if [ "$have" -ge "$WANT" ]; then echo "have $have pairs — done" >&2; break; fi
  if ! pgrep -f "run_scaling_v2.py --sandwich" > /dev/null; then
    left=$(( WANT - have ))
    echo "$(date -u +%H:%M) relaunch: $have pairs so far, want $left more" >&2
    python tools/run_scaling_v2.py --sandwich --log "$LOG" --pairs "$left" \
      --max-attempts 40 \
      --out "$OUT" \
      --segdir "$SEGDIR" >> /tmp/final_campaign.log 2>&1 &
  fi
  sleep 120
done
echo "SUPERVISOR DONE" >&2
