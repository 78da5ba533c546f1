"""Count-regression comparison (SURVEY.md A1).

The reference compares freshly-loaded node counts per label against the
previous production release and writes a warning file for every label
that SHRANK (src/etl/node_count_etl.py:20-41: `current < prod` ->
`labels_with_fewer_nodes.txt`). Here the same check is one full-outer
join between two tiny (label, count) frames — but engine-native: the
report is a DataFrame a pipeline can gate on, and the shrink test takes
a tolerance so expected churn doesn't page anyone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_regression_report(
    current: DataFrame,
    baseline: DataFrame,
    label_col: str = "tbl",
    count_col: str = "n_rows",
    tolerance: float = 0.0,
) -> DataFrame:
    """Per-label delta between ``current`` and ``baseline`` count frames.

    Output: (label, n_rows, baseline_rows, delta, shrunk) — one row per
    label present on EITHER side (a label missing from current counts as
    0, mirroring the reference's absent-label warning case). ``shrunk``
    is true when current < baseline * (1 - tolerance).

    Scale: both inputs are label-cardinality (dozens of rows) — the join
    broadcasts; the expensive part is producing the counts, which is one
    metadata-cheap `groupBy().count()` per table upstream.
    """
    cur = current.select(
        F.col(label_col).alias("label"), F.col(count_col).alias("n_rows")
    )
    base = baseline.select(
        F.col(label_col).alias("label"), F.col(count_col).alias("baseline_rows")
    )
    # no broadcast hint: Spark cannot broadcast the build side of a full
    # outer join; both inputs are label-cardinality anyway
    j = cur.join(base, "label", "full_outer")
    n = F.coalesce(F.col("n_rows"), F.lit(0))
    b = F.coalesce(F.col("baseline_rows"), F.lit(0))
    return j.select(
        "label",
        n.alias("n_rows"),
        b.alias("baseline_rows"),
        (n - b).alias("delta"),
        (n < b * (1.0 - float(tolerance))).alias("shrunk"),
    )
