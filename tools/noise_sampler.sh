#!/bin/bash
# Zero-compute host-noise chronicle: timestamped steal/load samples from
# /proc/stat (no probes, no memory traffic) so storm windows can be
# reconstructed next to the campaign supervisor's stderr.
#
# Bounded (round-4 ADVICE): stops after MAX_LINES samples (default 720 =
# 12 h at 1/min) or when a stop-file appears, so a forgotten sampler can
# no longer grow a repo-tracked log unboundedly.
OUT=${1:-/root/repo/BENCH/noise_session.log}
MAX_LINES=${2:-720}
STOPFILE="${OUT}.stop"
prev_steal=0; prev_total=0; n=0
while [ "$n" -lt "$MAX_LINES" ] && [ ! -e "$STOPFILE" ]; do
  read -r _ u n_ s i io irq sirq st _ < /proc/stat
  total=$((u+n_+s+i+io+irq+sirq+st))
  if [ "$prev_total" -ne 0 ]; then
    dt=$((total-prev_total)); dst=$((st-prev_steal))
    pct=$(awk -v a="$dst" -v b="$dt" 'BEGIN{if(b>0) printf "%.2f", 100*a/b; else print "0"}')
  else pct="NA"; fi
  prev_steal=$st; prev_total=$total
  echo "$(date -u +%FT%T) steal_pct=$pct load=$(cut -d' ' -f1-3 /proc/loadavg)" >> "$OUT"
  n=$((n+1))
  sleep 60
done
