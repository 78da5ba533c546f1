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
# partitions=4*M: the 2026-08-18 host exposed a rare loopback-TCP
# lost-wakeup that wedged one 1M-event/133MB generation task forever
# (python worker in tcp_sendmsg, JVM reader in epoll_wait); 250k-event
# tasks regenerated the same log in 3 min without a hang. Content is
# identical either way (counter-based RNG is partition-invariant).
generate_binlog(spark, n_events=${M}_000_000, n_docs=4_800_000,
                epoch_size=${M}_000_000, seed=42,
                partitions=4 * ${M}).write.partitionBy(
    "epoch").parquet("/tmp/scalbench/$NAME")
spark.stop()
EOF
  echo "$NAME done: $(du -sh /tmp/scalbench/$NAME | cut -f1)" >&2
done
