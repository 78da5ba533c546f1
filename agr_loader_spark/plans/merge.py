"""MERGE planner: route a deduped event segment into a table changeset.

The reference instantiates ~80 hand-written Cypher MERGE templates, one
per (entity, sub-list) target (e.g. src/etl/bgi_etl.py:91-117,
src/etl/allele_etl.py:88-144). Here a single planner derives the
changeset from the target table's column specs: each column declares the
event payload field that feeds it (``src_field``), so renames are
metadata-only and payload routing survives schema evolution — the field
id stays stable while the column name changes (SURVEY.md §2.7).

Ops routing (SURVEY.md K3-K8):
- I/U -> ``__op = 'U'`` (insert-or-overwrite; LWW has already picked the
  surviving event per key),
- D   -> ``__op = 'D'``,
- S   -> handled by the runner (never reaches the planner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake.table import OP_COL, LakeTable


def plan_changeset(
    events: DataFrame,
    table: LakeTable,
    op_col: str = "op",
    keep_cols: list[str] | None = None,
    columns=None,
) -> DataFrame:
    """events: one row per merge key (post-LWW), EVENT_SCHEMA-shaped.
    Returns current-schema columns + __op, ready for ``LakeTable.merge``.

    Payload fields the target does not (yet) declare are ignored — the
    gate that makes a mid-stream ``add column`` take effect only from its
    lsn onward. ``columns`` overrides the target column specs — the
    runner's prefetch uses it to plan a segment under the schema the
    table WILL have once the intervening schema events commit.
    """
    proj = []
    for c in (columns if columns is not None else table.columns()):
        if c.src_field is not None and c.src_field in events.columns:
            proj.append(F.col(c.src_field).cast(c.type).alias(c.name))
        else:
            proj.append(F.lit(None).cast(c.type).alias(c.name))
    op = F.when(F.col(op_col) == "D", F.lit("D")).otherwise(F.lit("U")).alias(OP_COL)
    extra = [F.col(c) for c in (keep_cols or [])]
    return events.select(*proj, op, *extra)
