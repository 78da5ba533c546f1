"""Transitive closure by fixpoint self-join (SURVEY.md J6).

The reference delegates this to Neo4j's variable-length path operator
(`MATCH (c)-[:PART_OF|IS_A*]->(p) RETURN DISTINCT`,
src/etl/closure_etl.py:28-30, 69-81) and merely relays rows. Catalyst has
no recursive CTE, so the engine runs the classic semi-naive iteration:
frontier ⋈ edges until empty, accumulating distinct pairs.

Scale notes: the frontier is the only growing side; each iteration
shuffles on the join key only (child/parent ids). `localCheckpoint`
truncates the exponentially growing lineage each round (without it the
plan tree doubles per iteration). Depth is bounded by the DAG height
(ontologies: ≤ ~20), so the loop count is small and driver-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child_id",
    parent_col: str = "parent_id",
    max_iterations: int = 50,
) -> DataFrame:
    """All distinct (descendant, ancestor) pairs reachable via 1+ edges."""
    base = edges.select(
        F.col(child_col).alias("descendant_id"), F.col(parent_col).alias("ancestor_id")
    ).dropDuplicates()
    closure = base.localCheckpoint(eager=True)
    frontier = closure
    hop = edges.select(
        F.col(child_col).alias("ancestor_id"), F.col(parent_col).alias("__next")
    )
    for _ in range(max_iterations):
        nxt = (
            frontier.join(hop, on="ancestor_id", how="inner")
            .select("descendant_id", F.col("__next").alias("ancestor_id"))
            .dropDuplicates()
            .join(closure, on=["descendant_id", "ancestor_id"], how="left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(f"closure did not converge in {max_iterations} iterations (cycle?)")
    return closure
