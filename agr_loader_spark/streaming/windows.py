"""Event-time windowed aggregation with watermark (late-data policy).

The batch replay path needs no watermark — the log is totally ordered
by lsn (SURVEY.md §2.7 "late/duplicate events"). This operator covers
the OTHER streaming consumer: continuous monitoring aggregates over the
change feed (events/sec per source, token volume per window — the
streaming analog of the reference's end-of-run counters,
src/etl/molecular_interaction_etl.py:648-676), where late events are
bounded by the watermark and dropped deterministically after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_ingest_stats(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (event-time window, source): event count, distinct-doc
    estimate, token volume. Works on a streaming OR batch frame; on a
    stream the watermark bounds state and closes windows for append-mode
    sinks once event time passes window_end + watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "source")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("doc_id").alias("n_docs_approx"),
            F.sum(F.coalesce(F.col("n_tok"), F.lit(0))).alias("tok_volume"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "source", "n_events", "n_docs_approx", "tok_volume",
        )
    )
