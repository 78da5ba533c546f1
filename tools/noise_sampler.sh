#!/bin/bash
# Zero-compute host-noise chronicle: timestamped steal/load samples from
# /proc/stat (no probes, no memory traffic) so storm windows can be
# reconstructed next to the campaign supervisor's un-timestamped stderr.
OUT=${1:-/root/repo/BENCH/noise_r4_session4.log}
prev_steal=0; prev_total=0
while true; do
  read -r _ u n s i io irq sirq st _ < /proc/stat
  total=$((u+n+s+i+io+irq+sirq+st))
  if [ "$prev_total" -ne 0 ]; then
    dt=$((total-prev_total)); dst=$((st-prev_steal))
    pct=$(awk -v a="$dst" -v b="$dt" 'BEGIN{if(b>0) printf "%.2f", 100*a/b; else print "0"}')
  else pct="NA"; fi
  prev_steal=$st; prev_total=$total
  echo "$(date -u +%FT%T) steal_pct=$pct load=$(cut -d' ' -f1-3 /proc/loadavg)" >> "$OUT"
  sleep 60
done
