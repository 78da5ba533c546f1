#!/bin/bash
# Regenerate the scaling-protocol binlogs (deterministic; /tmp is wiped
# between sessions). Params are pinned so walls stay comparable with the
# archived runs:
#   binlog48: 48M events / 4.8M docs / single epoch  (round-3 floors:
#             clean 4-exec 129-177 s, 1-exec 395-563 s, pre-fast-plan)
#   binlog96: 96M events / 4.8M docs / single epoch  (final protocol:
#             16M-event commit intervals, same 5 schema events)
# ~6.4G + ~13G parquet, ~10 + ~20 min at local[24].
set -eu
cd /root/repo
mkdir -p /tmp/scalbench
for spec in "48 binlog48" "96 binlog96"; do
  set -- $spec
  M=$1; NAME=$2
  [ -d "/tmp/scalbench/$NAME" ] && { echo "$NAME exists" >&2; continue; }
  python - <<EOF
from agr_loader_spark.session import get_spark
from agr_loader_spark.generator import generate_binlog
spark = get_spark(cores=24, master="local[24]")
generate_binlog(spark, n_events=${M}_000_000, n_docs=4_800_000,
                epoch_size=${M}_000_000, seed=42).write.partitionBy(
    "epoch").parquet("/tmp/scalbench/$NAME")
spark.stop()
EOF
  echo "$NAME done: $(du -sh /tmp/scalbench/$NAME | cut -f1)" >&2
done
