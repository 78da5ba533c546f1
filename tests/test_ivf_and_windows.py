"""IVF ANN: probing every inverted list reproduces brute force exactly;
partial probing keeps recall. Watermarked windowed aggregation: append
mode emits exactly the windows the advancing watermark closes, late
rows beyond the watermark are dropped."""

import datetime

import pyspark.sql.functions as F

from agr_loader_spark.operators.similarity import brute_force_topk, ivf_topk
from agr_loader_spark.schema import EVENT_SCHEMA
from agr_loader_spark.streaming.windows import windowed_ingest_stats


def _emb(spark, sf="/root/testdata/sf0.01"):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def test_ivf_full_probe_equals_brute_force(spark):
    emb = _emb(spark)
    queries = emb.orderBy("vec_id").limit(8)
    bf = brute_force_topk(emb, queries, k=5)
    ivf = ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=8, iters=2)
    a = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in bf.collect()}
    b = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in ivf.collect()}
    assert a == b, "nprobe == n_centroids must be exhaustive (exact)"


def test_ivf_partial_probe_recall(spark):
    emb = _emb(spark)
    queries = emb.orderBy("vec_id").limit(10)
    bf = brute_force_topk(emb, queries, k=5)
    ivf = ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=4, iters=3)
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"IVF recall {recall} below floor"


def _ev(lsn, doc, ts_min, source="FB"):
    return {
        "event_lsn": lsn, "epoch": 0, "op": "I", "doc_id": doc,
        "tokens": [1, 2], "n_tok": 2, "source": source, "lang": None,
        "schema_change": None,
        "ts": datetime.datetime(2024, 1, 1, 10, ts_min, 0),
    }


def test_watermark_closes_windows_and_drops_late(spark, tmproot):
    src, ckpt = tmproot + "/src", tmproot + "/ckpt"
    sink: list = []

    def run_pass():
        ev = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        out = windowed_ingest_stats(ev, window="1 minute", watermark="2 minutes")

        def collect(df, bid):
            sink.extend(df.collect())

        q = (out.writeStream.foreachBatch(collect).outputMode("append")
             .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
        q.awaitTermination()

    # batch 1: events at 10:00 and 10:01
    spark.createDataFrame(
        [_ev(1, "a", 0), _ev(2, "b", 0), _ev(3, "c", 1)], EVENT_SCHEMA
    ).write.mode("overwrite").parquet(src)
    run_pass()
    assert sink == [], "no window can close before the watermark advances"

    # batch 2: an event at 10:10 pushes the watermark to 10:08 -> the
    # 10:00 and 10:01 windows close and emit; a late row at 10:00 in the
    # SAME batch is before the previous watermark state (still 10:01-2m),
    # so it is still included in the closing window per Spark semantics
    spark.createDataFrame([_ev(4, "d", 10)], EVENT_SCHEMA).write.mode("append").parquet(src)
    run_pass()
    by_start = {(r["window_start"].minute, r["source"]): r for r in sink}
    assert (0, "FB") in by_start and by_start[(0, "FB")]["n_events"] == 2
    assert (1, "FB") in by_start and by_start[(1, "FB")]["n_events"] == 1

    # batch 3: a VERY late row at 10:00 (watermark is now 10:08) must be
    # dropped — no duplicate emission of the closed 10:00 window, and the
    # 10:10 window only closes once a later event arrives
    before = len(sink)
    spark.createDataFrame([_ev(5, "z", 0)], EVENT_SCHEMA).write.mode("append").parquet(src)
    run_pass()
    starts_after = [r["window_start"].minute for r in sink[before:]]
    assert 0 not in starts_after, "late data beyond the watermark must not re-open a closed window"
