"""FK-guarded load (SURVEY.md K9) — with observability.

The reference silently drops rows whose referenced entity is absent via a
leading `MATCH (g:Gene {primaryKey:row.x})` (src/etl/allele_etl.py:85-86,
src/etl/orthology_etl.py:29-31, src/etl/go_annot_etl.py:25-26) — ×60
templates, zero visibility into the drop count. Here: a left-semi join
against the dimension (broadcast when small — the planner auto-selects
BHJ under the threshold; `broadcast()` is forced for known-small dims)
plus a counted rejects frame (FIXTURES.md F4: "dropped-and-counted").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_guard(
    facts: DataFrame,
    dim: DataFrame,
    fk: str,
    dim_key: str,
    broadcast_dim: bool = True,
    keep_null_fk: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Return (kept, rejected). kept = facts whose ``fk`` exists in
    ``dim.dim_key`` (left_semi); rejected = the complement (left_anti),
    for the A6-style error tally. ``keep_null_fk`` routes null FKs to
    kept — the reference's no-gene allele path (src/etl/allele_etl.py:109-134).
    """
    keys = dim.select(F.col(dim_key).alias(fk)).dropDuplicates()
    if broadcast_dim:
        keys = F.broadcast(keys)
    if keep_null_fk:
        nulls = facts.filter(F.col(fk).isNull())
        nonnull = facts.filter(F.col(fk).isNotNull())
        kept = nonnull.join(keys, on=fk, how="left_semi").unionByName(nulls)
        rejected = nonnull.join(keys, on=fk, how="left_anti")
    else:
        kept = facts.join(keys, on=fk, how="left_semi")
        rejected = facts.join(keys, on=fk, how="left_anti")
    return kept, rejected


def fk_guard_observed(
    facts: DataFrame,
    dim: DataFrame,
    fk: str,
    dim_key: str,
    obs_name: str,
    broadcast_dim: bool = True,
    keep_null_fk: bool = False,
):
    """One-pass FK guard: returns (kept, observation). The reject count
    is an ``Observation`` on the flagged join, populated by whatever
    action consumes ``kept`` downstream (the merge commit) — no second
    anti-join job per epoch, unlike `fk_guard`'s rejected frame. Read it
    AFTER that action with ``int(obs.get["n_rejected"] or 0)``."""
    from pyspark.sql import Observation

    keys = (
        dim.select(F.col(dim_key).alias(fk))
        .dropDuplicates()
        .withColumn("__fk_ok", F.lit(True))
    )
    if broadcast_dim:
        keys = F.broadcast(keys)
    ok = F.col("__fk_ok").isNotNull()
    if keep_null_fk:
        ok = ok | F.col(fk).isNull()
    obs = Observation(obs_name)
    flagged = facts.join(keys, on=fk, how="left").observe(
        obs, F.sum(F.when(ok, 0).otherwise(1)).alias("n_rejected")
    )
    return flagged.filter(ok).drop("__fk_ok"), obs


def reject_tally(rejected: DataFrame, by: str) -> DataFrame:
    """Error-key tally (SURVEY.md A6; analog of missing_keys/missing_pages
    dicts, src/etl/etl.py:30-46)."""
    return rejected.groupBy(by).agg(F.count("*").alias("n_rejected"))
