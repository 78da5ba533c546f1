"""Derived-data passes (SURVEY.md §3.2): read previously-loaded lake
tables, compute, merge the results back — the reference's second-pass
ETLs re-expressed:

- ``closure_pass``: ClosureETL (src/etl/closure_etl.py:28-30, 69-81) —
  the reference asks Neo4j's variable-length-path engine for the
  transitive closure and re-ingests it; here the engine computes it
  itself (semi-naive fixpoint) and merges the pairs exactly-once under
  a deterministic composite key.
- ``goslim_rollup``: ExpressionRibbonETL (src/etl/expression_ribbon_etl.py:43-95)
  — roll every term up to its ancestors within a named slim subset
  (`subset =~ goslim_agr`), via a closure join + rlike filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.keys import composite_key
from .lake.table import OP_COL, LakeTable
from .operators.closure import transitive_closure

CLOSURE_COLUMNS = [
    ("pair_key", "string", None),
    ("descendant_id", "string", None),
    ("ancestor_id", "string", None),
]


def closure_pass(
    spark: SparkSession,
    edges: DataFrame,
    out_root: str,
    epoch_key: str = "derived:closure",
    n_buckets: int = 16,
) -> LakeTable:
    """Compute the transitive closure of an edge frame (typically the
    read-back of an ontology edge table) and merge it into a closure
    table keyed by a deterministic pair hash (no uuid4 — SURVEY.md T10)."""
    out = LakeTable.create(spark, out_root, CLOSURE_COLUMNS, key="pair_key",
                           n_buckets=n_buckets, if_not_exists=True)
    pairs = transitive_closure(edges).withColumn(
        "pair_key", composite_key("descendant_id", "ancestor_id")
    )
    changes = pairs.select("pair_key", "descendant_id", "ancestor_id",
                           F.lit("U").alias(OP_COL))
    out.merge(changes, epoch_key=epoch_key)
    return out


def incremental_closure_pass(
    spark: SparkSession,
    out: LakeTable,
    new_edges: DataFrame,
    epoch_key: str,
) -> dict:
    """Incremental derived-view maintenance: fold a batch of NEW ontology
    edges into an existing closure table using `closure_delta` — only
    the newly reachable pairs are computed and merged, never a full
    recompute. This is the CDC-native upgrade of the reference's
    second-pass ClosureETL (src/etl/closure_etl.py:37-45), which rebuilds
    the closure from scratch every load. Deletes require the full
    `closure_pass` rebuild (DRed trade-off, see closure_delta)."""
    from .operators.closure import closure_delta

    existing = out.read().select("descendant_id", "ancestor_id")
    delta = closure_delta(existing, new_edges).withColumn(
        "pair_key", composite_key("descendant_id", "ancestor_id")
    )
    changes = delta.select("pair_key", "descendant_id", "ancestor_id",
                           F.lit("U").alias(OP_COL))
    return out.merge(changes, epoch_key=epoch_key)


def goslim_rollup(
    terms: DataFrame,
    closure: DataFrame,
    slim_pattern: str = "goslim_agr",
) -> DataFrame:
    """(term_id, slim_term_id) pairs: each term mapped to every ancestor
    (or itself) that belongs to the slim subset."""
    slim = terms.filter(
        F.exists(F.col("subsets"), lambda s: s.rlike(slim_pattern))
    ).select(F.col("id").alias("slim_term_id"))
    up = closure.select(
        F.col("descendant_id").alias("term_id"), F.col("ancestor_id").alias("slim_term_id")
    ).unionByName(
        terms.select(F.col("id").alias("term_id"), F.col("id").alias("slim_term_id"))
    )
    return up.join(F.broadcast(slim), on="slim_term_id", how="left_semi").dropDuplicates()
