"""Structured Streaming replay: availableNow over a static log matches
the batch runner; a second pass (after new epochs land) picks up only
the new data (checkpoint + manifest idempotence)."""

import pyspark.sql.functions as F

from agr_loader_spark.generator import generate_binlog
from agr_loader_spark.lake.table import LakeTable
from agr_loader_spark.schema import TOKENS_MERGE_KEY, TOKENS_TABLE_COLUMNS
from agr_loader_spark.streaming.runner import ReplayRunner
from agr_loader_spark.streaming.stream_runner import StreamReplay


def test_stream_replay_matches_batch(spark, tmproot):
    log = generate_binlog(spark, n_events=4000, n_docs=300, epoch_size=1000, seed=3)
    path = tmproot + "/log"
    log.write.partitionBy("epoch").parquet(path)

    batch_table = LakeTable.create(spark, tmproot + "/batch", TOKENS_TABLE_COLUMNS,
                                   key=TOKENS_MERGE_KEY, n_buckets=8)
    ReplayRunner(spark, batch_table, source_path=path).run()

    stream_table = LakeTable.create(spark, tmproot + "/stream", TOKENS_TABLE_COLUMNS,
                                    key=TOKENS_MERGE_KEY, n_buckets=8)
    StreamReplay(spark, stream_table, path, tmproot + "/ckpt").run_available_now()

    a = batch_table.read().orderBy("doc_id").toPandas()
    b = LakeTable.load(spark, stream_table.root).read().orderBy("doc_id").toPandas()
    assert list(a.columns) == list(b.columns)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert all(
        (x is None and y is None) or list(x) == list(y)
        for x, y in zip(a["tokens"], b["tokens"])
    )


def test_stream_tail_picks_up_new_epochs(spark, tmproot):
    path = tmproot + "/log"
    full = generate_binlog(spark, n_events=3000, n_docs=200, epoch_size=1000,
                           seed=5, with_schema_changes=False)
    full.filter(F.col("epoch") < 2).write.partitionBy("epoch").parquet(path)

    table = LakeTable.create(spark, tmproot + "/t", TOKENS_TABLE_COLUMNS,
                             key=TOKENS_MERGE_KEY, n_buckets=8)
    sr = StreamReplay(spark, table, path, tmproot + "/ckpt")
    sr.run_available_now()
    applied_1 = len(LakeTable.load(spark, table.root).applied_epochs())

    # new epoch lands in the tailed directory
    full.filter(F.col("epoch") == 2).write.mode("append").partitionBy("epoch").parquet(path)
    StreamReplay(spark, table, path, tmproot + "/ckpt").run_available_now()

    t2 = LakeTable.load(spark, table.root)
    assert len(t2.applied_epochs()) > applied_1
    # final state equals a clean batch replay of the whole log
    ref = LakeTable.create(spark, tmproot + "/ref", TOKENS_TABLE_COLUMNS,
                           key=TOKENS_MERGE_KEY, n_buckets=8)
    ReplayRunner(spark, ref, source_path=path).run()
    a = ref.read().orderBy("doc_id").toPandas()
    b = t2.read().orderBy("doc_id").toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
