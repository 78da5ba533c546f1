#!/bin/bash
# Poll host-noise calibration; when the host yields 4 undisturbed cores
# (quiet_ratio >= 0.9), run ONE interleaved scaling rep (1-exec then
# 4-exec) and append it to BENCH/scaling_r2_quiet.jsonl. Repeats until
# max attempts or max quiet reps collected.
set -u
cd /root/repo
export SPARK_LOCAL_DIRS_OVERRIDE=/tmp/spark_local SPARK_DRIVER_MEM=8g SPARK_BCAST_THRESHOLD=10m
export SPARK_MAX_PARTITION_BYTES=32m
OUT=BENCH/scaling_r2_quiet.jsonl
LOG=/tmp/scalbench/binlog1ep
MAX_POLLS=${MAX_POLLS:-40}
WANT_REPS=${WANT_REPS:-3}
got=0
for i in $(seq 1 $MAX_POLLS); do
  cal=$(python tools/host_calibrate.py)
  ok=$?
  echo "poll $i: $cal" >&2
  if [ $ok -ne 0 ]; then sleep 60; continue; fi
  rep=$((got + 1))
  for e in 1 4; do
    rm -rf /tmp/scalbench/q_${e}
    cat $LOG/*/*.parquet > /dev/null 2>&1
    out=$(SPARK_MASTER_OVERRIDE="local-cluster[${e},1,6144]" \
      python -m agr_loader_spark --workdir /tmp/scalbench \
        --binlog $LOG --table /tmp/scalbench/q_${e} \
        --cores ${e} --n-buckets 64 --warmup 2>/dev/null)
    echo "{\"executors\": ${e}, \"rep\": ${rep}, \"calibration\": ${cal}, \"result\": ${out}}" >> $OUT
    echo "quiet rep${rep} ${e}exec done" >&2
    rm -rf /tmp/scalbench/q_${e}
  done
  got=$rep
  if [ $got -ge $WANT_REPS ]; then break; fi
done
echo "QUIET RUN DONE: ${got} reps" >&2
