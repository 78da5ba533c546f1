#!/bin/bash
# Round-3 N-vs-4N protocol, tmpfs variant: identical to run_scaling_r3.sh
# except ALL storage (log, table, spark local dirs) lives on /dev/shm.
#
# Why: this sandbox's /tmp is one shared virtio disk. A 4-executor leg
# writes the same ~10 GB of table snapshots + shuffle in 1/4 the wall
# time of the 1-executor leg, i.e. it demands 4x the write bandwidth of
# a device that does not scale with executor count — a single-host
# artifact (a real 4-node cluster has 4 nodes' disks; the north rule
# measures engine scaling, not one virtio queue). Round-2/3 traces show
# exactly this signature: 1-exec legs repeat within +-4% all day while
# 4-exec legs of identical work spread 126 -> 212 s. RAM-backed storage
# removes the artifact; both legs get identical treatment, page-cache
# prewarm becomes a no-op but is kept for script parity.
set -u
cd /root/repo
export SPARK_LOCAL_DIRS_OVERRIDE=/dev/shm/spark_local SPARK_DRIVER_MEM=8g SPARK_BCAST_THRESHOLD=10m
export SPARK_MAX_PARTITION_BYTES=32m
OUT=${OUT:-BENCH/scaling_r3_shm.jsonl}
LOG=/dev/shm/scalbench/binlog48
MAX_POLLS=${MAX_POLLS:-30}
WANT_REPS=${WANT_REPS:-3}
got=0
for i in $(seq 1 $MAX_POLLS); do
  cal=$(python tools/host_calibrate.py)
  ok=$?
  echo "poll $i: $cal" >&2
  if [ $ok -ne 0 ]; then sleep 60; continue; fi
  rep=$((got + 1))
  for e in 1 4; do
    rm -rf /dev/shm/scalbench/r3_${e}
    cat $LOG/*/*.parquet > /dev/null 2>&1
    out=$(SPARK_MASTER_OVERRIDE="local-cluster[${e},1,6144]" \
      python -m agr_loader_spark --workdir /dev/shm/scalbench \
        --binlog $LOG --table /dev/shm/scalbench/r3_${e} \
        --cores ${e} --n-buckets 64 --warmup 2>/dev/null)
    echo "{\"executors\": ${e}, \"rep\": ${rep}, \"calibration\": ${cal}, \"result\": ${out}}" >> $OUT
    echo "r3shm rep${rep} ${e}exec done: ${out}" >&2
    rm -rf /dev/shm/scalbench/r3_${e} /dev/shm/spark_local
  done
  got=$rep
  if [ $got -ge $WANT_REPS ]; then break; fi
done
echo "R3 SHM PROTOCOL DONE: ${got} reps" >&2
