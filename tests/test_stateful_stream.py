"""Stateful streaming LWW compactor (applyInPandasWithState): duplicates
and stale lsns are suppressed, deletes emit tombstones and clear state,
state survives a query restart via the checkpoint."""

import pyspark.sql.functions as F

from agr_loader_spark.schema import EVENT_SCHEMA
from agr_loader_spark.streaming.stateful import latest_state_stream


def _write_events(spark, path, rows, mode="overwrite"):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    df.write.mode(mode).parquet(path)


def _run_pass(spark, src, ckpt, sink: list):
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = latest_state_stream(events)

    def collect(batch_df, batch_id):
        sink.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(collect)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _ev(lsn, op, doc, tokens, epoch=0):
    return {
        "event_lsn": lsn, "epoch": epoch, "op": op, "doc_id": doc,
        "tokens": tokens, "n_tok": None if tokens is None else len(tokens),
        "source": "s1", "lang": None, "schema_change": None, "ts": None,
    }


def test_compactor_dedups_and_survives_restart(spark, tmproot):
    src, ckpt = tmproot + "/src", tmproot + "/ckpt"
    # batch 1: docA insert then update (plus an exact duplicate), docB insert
    _write_events(spark, src, [
        _ev(1, "I", "docA", [1, 2]),
        _ev(3, "U", "docA", [3, 4]),
        _ev(3, "U", "docA", [3, 4]),   # re-delivery
        _ev(2, "I", "docB", [9]),
    ])
    got1: list = []
    _run_pass(spark, src, ckpt, got1)
    by_doc = {r["doc_id"]: r for r in got1}
    assert set(by_doc) == {"docA", "docB"}
    assert by_doc["docA"]["event_lsn"] == 3 and list(by_doc["docA"]["tokens"]) == [3, 4]
    assert by_doc["docB"]["event_lsn"] == 2

    # batch 2 (restart, same checkpoint): stale docA update (no emit),
    # docB delete (tombstone), docC insert
    _write_events(spark, src, [
        _ev(2, "U", "docA", [7, 7]),   # lsn 2 < stored 3 -> suppressed
        _ev(5, "D", "docB", None),
        _ev(4, "I", "docC", [5]),
    ], mode="append")
    got2: list = []
    _run_pass(spark, src, ckpt, got2)
    by_doc2 = {r["doc_id"]: r for r in got2}
    assert "docA" not in by_doc2, "stale lsn must not re-emit (state restored from checkpoint)"
    assert by_doc2["docB"]["op"] == "D" and by_doc2["docB"]["event_lsn"] == 5
    assert by_doc2["docC"]["event_lsn"] == 4

    # batch 3: docB re-inserted after delete (state was cleared -> emits)
    _write_events(spark, src, [_ev(6, "I", "docB", [1])], mode="append")
    got3: list = []
    _run_pass(spark, src, ckpt, got3)
    assert [r["doc_id"] for r in got3] == ["docB"]
    assert got3[0]["event_lsn"] == 6

def test_tombstone_blocks_late_stale_resurrection(spark, tmproot):
    """ADVICE r1: a late/re-delivered STALE event arriving after a delete
    must stay suppressed — the delete leaves a tombstone in state, it
    does not clear it."""
    src, ckpt = tmproot + "/src", tmproot + "/ckpt"
    _write_events(spark, src, [
        _ev(1, "I", "docX", [1]),
        _ev(5, "D", "docX", None),
    ])
    got1: list = []
    _run_pass(spark, src, ckpt, got1)
    assert [(r["doc_id"], r["op"], r["event_lsn"]) for r in got1] == [("docX", "D", 5)]

    # later trigger: duplicate re-delivery of the ORIGINAL insert (lsn 1
    # < tombstone 5). Pre-fix this resurrected docX as a fresh upsert.
    _write_events(spark, src, [_ev(1, "I", "docX", [1])], mode="append")
    got2: list = []
    _run_pass(spark, src, ckpt, got2)
    assert got2 == [], "stale event after delete must not resurrect the key"

    # genuinely NEWER event after the delete does re-create the key
    _write_events(spark, src, [_ev(9, "I", "docX", [2])], mode="append")
    got3: list = []
    _run_pass(spark, src, ckpt, got3)
    assert [(r["doc_id"], r["event_lsn"]) for r in got3] == [("docX", 9)]
