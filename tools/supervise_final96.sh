#!/bin/bash
# Keep the final-protocol sandwich campaign alive until DEADLINE or the
# pair budget is met: run_scaling_v2 exits when --max-attempts is
# exhausted by a long storm; this relaunches it while wall-clock remains.
set -u
cd /root/repo
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH}
WANT=${WANT:-6}
while [ "$(date +%s)" -lt "$DEADLINE_EPOCH" ]; do
  have=$(grep -c '"pair"' BENCH/scaling_r3_final96.jsonl 2>/dev/null || echo 0)
  if [ "$have" -ge "$WANT" ]; then echo "have $have pairs — done" >&2; break; fi
  if ! pgrep -f "run_scaling_v2.py --sandwich" > /dev/null; then
    left=$(( WANT - have ))
    echo "$(date -u +%H:%M) relaunch: $have pairs so far, want $left more" >&2
    python tools/run_scaling_v2.py --sandwich --log binlog96 --pairs "$left" \
      --max-attempts 40 \
      --out BENCH/scaling_r3_final96.jsonl \
      --segdir BENCH/segmetrics_r3_final96 >> /tmp/final96.log 2>&1 &
  fi
  sleep 120
done
echo "SUPERVISOR DONE" >&2
