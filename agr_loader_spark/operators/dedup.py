"""Per-batch dedup by (key, lsn) + last-writer-wins conflict resolution.

Reference semantics being re-expressed (SURVEY.md A3/K3/K4):
- in-batch key dedup via Python sets/dicts
  (src/etl/molecular_interaction_etl.py:601-603,
  src/etl/helpers/experimental_condition_helper.py:78-92);
- "first writer wins" MERGE ON CREATE (src/etl/bgi_etl.py:99-115) /
  "last writer wins" MERGE SET (src/etl/allele_etl.py:142-144) collapsed
  into an ordered-log LWW: the event with the max event_lsn per doc_id is
  the one whose op/payload survives the micro-batch;
- duplicate re-delivery tolerance: the reference requeues failed batches
  and re-applies them (src/transactors/neo4j_transactor.py:108-118),
  relying on MERGE idempotency; here exact (doc_id, event_lsn) duplicates
  are identical rows, so any max_by tie-break is safe.

Three implementations, all vectorized (no per-row Python, per the north
rule):

- ``lww_reduce``       — two-phase salted hash aggregation with
  ``max_by(struct, lsn)``. Phase 1 reduces (key, salt) locally (Spark's
  partial aggregation additionally pre-combines map-side), phase 2
  reduces per key. The explicit salt bounds the per-group row count of
  any single reducer even when one doc_id carries a large share of the
  batch — the skew the reference works around with randomized
  provider-pair scheduling (src/etl/orthology_etl.py:197-225).
  This is the default engine path (JVM-side, whole-stage codegen).
- ``lww_reduce_pandas`` — the same two-phase reduce as grouped
  ``applyInPandas`` Arrow UDFs (north-rule parity implementation; used in
  tests to cross-check the JVM path and available where per-group Python
  logic must be injected).
- ``lww_reduce_window`` — naive row_number() window; kept as the
  readable spec and for small frames. NOT skew-safe: a hot key sorts all
  its rows in one partition.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_redelivery(df: DataFrame, key: str = "doc_id", order_col: str = "event_lsn") -> DataFrame:
    """Drop exact (key, lsn) re-deliveries. Kept separate so metrics can
    count duplicates (A5); LWW itself is also tolerant of them."""
    return df.dropDuplicates([key, order_col])


def lww_reduce(
    df: DataFrame,
    key: str = "doc_id",
    order_col: str = "event_lsn",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep, per key, the full row of the max-``order_col`` event.

    Output has exactly the input columns, one row per key. Two hash
    aggregations: (key, salt) -> key. Both are partial-aggregated
    map-side by Spark, so the shuffle carries at most
    ``salt_buckets`` (then 1) pre-reduced rows per key per map task.
    """
    cols = df.columns
    payload = F.struct(*cols)
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets)))
    local = salted.groupBy(key, "__salt").agg(
        F.max_by(payload, F.col(order_col)).alias("__row"),
        F.max(order_col).alias("__lsn"),
    )
    merged = local.groupBy(key).agg(F.max_by("__row", F.col("__lsn")).alias("__row"))
    return merged.select("__row.*")


def lww_reduce_window(df: DataFrame, key: str = "doc_id", order_col: str = "event_lsn") -> DataFrame:
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lww_reduce_pandas(
    df: DataFrame,
    key: str = "doc_id",
    order_col: str = "event_lsn",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase LWW as grouped Arrow/pandas UDFs (applyInPandas).

    Semantics identical to ``lww_reduce``; each phase receives the whole
    (key[, salt]) group as one pandas frame and keeps idxmax(order_col).
    """
    schema = df.schema

    def keep_last(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.loc[[pdf[order_col].idxmax()]]

    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets)))
    local = salted.groupBy(key, "__salt").applyInPandas(
        lambda pdf: keep_last(pdf), schema=salted.schema
    ).drop("__salt")
    return local.groupBy(key).applyInPandas(keep_last, schema=schema)


def dedup_exact(df: DataFrame, cols: Iterable[str] | None = None) -> DataFrame:
    """Plain distinct-by-columns (SURVEY.md A2, dropDuplicates)."""
    return df.dropDuplicates(list(cols) if cols else None)
