"""Transitive closure by fixpoint self-join (SURVEY.md J6).

The reference delegates this to Neo4j's variable-length path operator
(`MATCH (c)-[:PART_OF|IS_A*]->(p) RETURN DISTINCT`,
src/etl/closure_etl.py:28-30, 69-81) and merely relays rows. Catalyst has
no recursive CTE, so the engine iterates; two strategies:

- "double" (default): path doubling — each round composes the closure
  with itself, so round k holds all paths of length <= 2^k and the loop
  terminates in ceil(log2(depth)) rounds. Ontology DAGs are shallow
  (<= ~20 levels) but each Spark round costs fixed job/stage latency, so
  log-rounds wins decisively (5 rounds instead of 20).
- "frontier": classic semi-naive (frontier ⋈ edges per round). Linear
  rounds but the per-round join is the frontier only — gentler shuffle
  volume for very deep, very large graphs where doubling's
  closure ⋈ closure intermediate (one derivation per midpoint) would
  dominate.

`localCheckpoint` truncates the exponentially growing plan lineage each
round (without it the plan tree doubles per iteration). All joins are
key-shuffled equi-joins; AQE handles hub-node skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child_id",
    parent_col: str = "parent_id",
    max_iterations: int = 50,
    method: str = "double",
) -> DataFrame:
    """All distinct (descendant, ancestor) pairs reachable via 1+ edges."""
    base = edges.select(
        F.col(child_col).alias("descendant_id"), F.col(parent_col).alias("ancestor_id")
    ).dropDuplicates()
    closure = base.localCheckpoint(eager=True)

    # closure is kept as a LAZY union of eagerly-checkpointed deltas: each
    # round materializes only its new pairs; re-materializing the whole
    # accumulated closure every round would double the per-round cost.
    if method == "double":
        for _ in range(max_iterations):
            right = closure.select(
                F.col("descendant_id").alias("ancestor_id"),
                F.col("ancestor_id").alias("__next"),
            )
            nxt = (
                closure.join(right, on="ancestor_id", how="inner")
                .select("descendant_id", F.col("__next").alias("ancestor_id"))
                .dropDuplicates()
                .join(closure, on=["descendant_id", "ancestor_id"], how="left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                return closure
            closure = closure.unionByName(nxt)
        raise RuntimeError(
            f"closure did not converge in {max_iterations} doubling rounds (cycle?)"
        )

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
        closure = closure.unionByName(nxt)
        frontier = nxt
    else:
        raise RuntimeError(f"closure did not converge in {max_iterations} iterations (cycle?)")
    return closure


def _compose(a: DataFrame, b: DataFrame) -> DataFrame:
    """Relational composition: (d, m) ∘ (m, a) -> (d, a)."""
    right = b.select(
        F.col("descendant_id").alias("__m"), F.col("ancestor_id").alias("__a")
    )
    return (
        a.join(right, a["ancestor_id"] == right["__m"])
        .select("descendant_id", F.col("__a").alias("ancestor_id"))
    )


def closure_delta(
    closure: DataFrame,
    new_edges: DataFrame,
    child_col: str = "child_id",
    parent_col: str = "parent_id",
    max_iterations: int = 50,
) -> DataFrame:
    """Incremental closure maintenance for edge INSERTS: the new
    (descendant, ancestor) pairs created by adding ``new_edges`` to a
    graph whose transitive closure is ``closure`` — without touching the
    old edge set.

    Each new path decomposes into Δ-edge segments padded by existing
    closure hops, so ``ext = (C∪I)∘Δ∘(C∪I)`` covers every 1-Δ path and
    composing ``ext`` with itself covers k-Δ paths; the loop runs once
    per extra Δ edge on the longest new shortest-path (normally 1-2
    rounds for an ontology update batch). Work is O(|Δ| * fan-out),
    never O(closure) recompute. Deletes invalidate paths and need the
    full recompute (`transitive_closure`) — the classic DRed trade-off.
    """
    delta = new_edges.select(
        F.col(child_col).alias("descendant_id"), F.col(parent_col).alias("ancestor_id")
    ).dropDuplicates()
    # ext = Δ padded by existing reachability on both sides
    ext = delta.unionByName(_compose(closure, delta))
    ext = ext.unionByName(_compose(ext, closure)).dropDuplicates().localCheckpoint(eager=True)

    anti = ["descendant_id", "ancestor_id"]
    new = ext.join(closure, on=anti, how="left_anti").localCheckpoint(eager=True)
    frontier = new
    for _ in range(max_iterations):
        nxt = (
            _compose(frontier, ext)
            .dropDuplicates()
            .join(closure, on=anti, how="left_anti")
            .join(new, on=anti, how="left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            return new
        new = new.unionByName(nxt)
        frontier = nxt
    raise RuntimeError(f"closure delta did not converge in {max_iterations} rounds (cycle?)")
