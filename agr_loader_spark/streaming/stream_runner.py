"""Structured Streaming replay harness (SURVEY.md §2.7).

The batch ReplayRunner drives ordered epochs explicitly; this harness
drives the same merge path from a Structured Streaming source:

    readStream(binlog dir) -> foreachBatch -> per-epoch segments ->
    LakeTable.merge_arrow (exactly-once via the same epoch_key manifest)

``Trigger.AvailableNow`` replays a static log and terminates — the
analog of the reference's one-shot aggregate load; leaving the trigger
continuous tails a growing log directory (binlog tail -> lake upsert).

Exactly-once is enforced at BOTH layers: Spark's checkpoint dedupes
micro-batches on restart, and the table manifest dedupes epoch segments
even if a foreachBatch is re-run after a checkpoint rollback (the
classic foreachBatch at-least-once hole the docs warn about).

Ordering note: within a foreachBatch the segments are applied in epoch/
lsn order; across triggers the parquet file source lists epoch
partitions in lexicographic order, and latestFirst is left false. A
fully order-independent merge (storing the winning lsn per row so a
late lower-lsn event can never overwrite) is the versioned-merge mode
of the batch runner's LWW — events within one epoch are totally
ordered by construction (epoch = lsn // epoch_size), so epoch-grained
delivery order is sufficient for byte-exact replay equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable
from ..schema import EVENT_SCHEMA
from .runner import ReplayRunner


class StreamReplay:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        source_path: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
    ):
        self.spark = spark
        self.table = table
        self.source_path = source_path
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # reuse the batch runner's segment logic on this micro-batch's
        # slice of the log; the manifest makes re-delivered batches no-ops
        runner = ReplayRunner(self.spark, self.table, source_df=batch_df)
        runner.run()

    def start(self, available_now: bool = True):
        reader = (
            self.spark.readStream.schema(EVENT_SCHEMA)
            .option("latestFirst", "false")
        )
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(self.max_files_per_trigger))
        events = reader.parquet(self.source_path)
        writer = (
            events.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_available_now(self) -> None:
        q = self.start(available_now=True)
        q.awaitTermination()
