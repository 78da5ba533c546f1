#!/bin/bash
# Official N-vs-4N-executor scaling evidence (BENCH/BASELINE.md protocol).
# Generates a 40M-event binlog once, replays it warmed at 4 executor
# configurations (separate executor JVMs via local-cluster), writes raw
# JSON lines to BENCH/scaling_raw.jsonl.
set -u
cd /root/repo
export SPARK_LOCAL_DIRS_OVERRIDE=/tmp/spark_local SPARK_DRIVER_MEM=8g SPARK_BCAST_THRESHOLD=10m
OUT=BENCH/scaling_raw.jsonl
: > $OUT
LOG=/tmp/scalbench/binlog6
mkdir -p /tmp/scalbench

if [ ! -d $LOG ]; then
python - <<'EOF'
from agr_loader_spark.session import get_spark
from agr_loader_spark.generator import generate_binlog
spark = get_spark(cores=16, master="local[16]")
generate_binlog(spark, n_events=24_000_000, n_docs=2_400_000,
                epoch_size=6_000_000, seed=42).write.partitionBy("epoch").parquet("/tmp/scalbench/binlog6")
spark.stop()
EOF
fi
echo "binlog ready: $(du -sh $LOG | cut -f1)" >&2

run () {  # run <execs> <cores_per_exec>
  local e=$1 c=$2 total=$(( $1 * $2 ))
  rm -rf /tmp/scalbench/t_${e}x${c}
  local out
  out=$(SPARK_MASTER_OVERRIDE="local-cluster[${e},${c},6144]" \
    python -m agr_loader_spark --workdir /tmp/scalbench \
      --binlog $LOG --table /tmp/scalbench/t_${e}x${c} \
      --cores $total --n-buckets 64 --warmup 2>/dev/null)
  echo "{\"executors\": ${e}, \"cores_per_executor\": ${c}, \"result\": ${out}}" >> $OUT
  echo "done ${e}x${c}: ${out}" >&2
}

run 1 1
run 4 1
run 1 4
run 4 4
echo "ALL DONE" >&2
