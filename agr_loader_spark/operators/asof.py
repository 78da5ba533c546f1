"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For every left row, attach the latest right row with
``right.ts <= left.ts`` for the same key. Composition of existing ops
(per the build brief's preference order): tag + union + a
last-non-null window over (key, ts) — one shuffle on the key, no
cross/range explosion. The right side's payload rides as a struct
column so the window carries arbitrary columns.

Scale notes: the window sorts each key's (left+right) rows by ts — at
cluster scale pair with bucketing on the key; for pathological per-key
cardinality, pre-aggregate the right side to (key, ts-bucket) grains
first. Equal timestamps: the right row sorts BEFORE the left row
(<= semantics, matching DuckDB/QuestDB ASOF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    rcols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    l_tag = left.withColumn("__r", F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in rcols) + ">"
    )).withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    r_tag = right.select(
        F.col(key),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col("__m").getField(c).alias(f"{prefix}{c}") for c in rcols],
    )
    return out
