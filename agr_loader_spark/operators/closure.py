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
from pyspark.storagelevel import StorageLevel

# checkpoints go to DISK_ONLY: the fixpoint leaves its per-round delta
# blocks in the caching subsystem for the lifetime of the returned
# frame, and MEMORY_AND_DISK blocks from repeated closure runs were
# measurable unified-memory pressure on every LATER query in a long
# session (round-6 bench: the CDC replay at the end of the 24-query
# sequence ran ~25% slower than isolated). Disk blocks cost one
# serialized re-read per round and nothing when idle.
_CKPT = dict(eager=True, storageLevel=StorageLevel.DISK_ONLY)


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
    closure = base.localCheckpoint(**_CKPT)

    # closure is kept as a LAZY union of eagerly-checkpointed deltas: each
    # round materializes only its new pairs; re-materializing the whole
    # accumulated closure every round would double the per-round cost.
    if method == "double":
        # SEMI-NAIVE doubling: compose only the FRONTIER (pairs first
        # discovered last round, min-distance in (2^(k-1), 2^k]) with the
        # full closure, not closure∘closure. Complete by the standard
        # split argument: a minimal path of length L in (2^k, 2^(k+1)]
        # cut at position 2^k gives a first segment whose min-distance
        # must exceed 2^(k-1) (else the whole path wasn't minimal) — i.e.
        # a frontier pair — and a remainder already in the closure. Same
        # fixpoint in the same ceil(log2(depth)) rounds, but the compose
        # no longer re-derives every known pair through every midpoint
        # each round (the dominant join volume of the full-doubling
        # variant; guide §2.3 "shuffle fewer bytes" at the algorithm
        # level).
        frontier = closure
        for _ in range(max_iterations):
            right = closure.select(
                F.col("descendant_id").alias("ancestor_id"),
                F.col("ancestor_id").alias("__next"),
            )
            nxt = (
                frontier.join(right, on="ancestor_id", how="inner")
                .select("descendant_id", F.col("__next").alias("ancestor_id"))
                .dropDuplicates()
                .join(closure, on=["descendant_id", "ancestor_id"], how="left_anti")
                .localCheckpoint(**_CKPT)
            )
            if nxt.isEmpty():
                return closure
            closure = closure.unionByName(nxt)
            frontier = nxt
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
            .localCheckpoint(**_CKPT)
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
    never O(closure) recompute. For edge DELETES use `closure_delete`
    (DRed over-delete + re-derive).
    """
    delta = new_edges.select(
        F.col(child_col).alias("descendant_id"), F.col(parent_col).alias("ancestor_id")
    ).dropDuplicates()
    # ext = Δ padded by existing reachability on both sides
    ext = delta.unionByName(_compose(closure, delta))
    ext = ext.unionByName(_compose(ext, closure)).dropDuplicates().localCheckpoint(**_CKPT)

    anti = ["descendant_id", "ancestor_id"]
    new = ext.join(closure, on=anti, how="left_anti").localCheckpoint(**_CKPT)
    frontier = new
    for _ in range(max_iterations):
        nxt = (
            _compose(frontier, ext)
            .dropDuplicates()
            .join(closure, on=anti, how="left_anti")
            .join(new, on=anti, how="left_anti")
            .localCheckpoint(**_CKPT)
        )
        if nxt.isEmpty():
            return new
        new = new.unionByName(nxt)
        frontier = nxt
    raise RuntimeError(f"closure delta did not converge in {max_iterations} rounds (cycle?)")


def closure_delete(
    closure: DataFrame,
    remaining_edges: DataFrame,
    deleted_edges: DataFrame,
    child_col: str = "child_id",
    parent_col: str = "parent_id",
    max_iterations: int = 50,
) -> DataFrame:
    """DRed-style incremental closure maintenance for edge DELETES: the
    new closure of ``remaining_edges`` given the old ``closure`` and the
    removed ``deleted_edges`` — without a from-scratch fixpoint over the
    whole graph (Gupta/Mumick/Subrahmanian delete-and-rederive).

    1. OVER-DELETE: a pair (d, a) is *suspect* iff some old derivation
       could thread a deleted edge (u, v): d reaches u (or d = u) and v
       reaches a (or v = a), per the OLD closure. Everything else in the
       old closure is untouched by the delete and is kept as-is — for a
       churned 100-TB ontology the suspect set is the neighborhood of
       the deleted edges, not the graph.
    2. RE-DERIVE: semi-naive fixpoint RESTRICTED to suspect pairs over
       the remaining edge set, seeded by surviving one-hop edges and
       edge∘kept compositions; each round prepends one remaining edge
       to the re-derived frontier. Work is O(|suspect| * fan-in), and
       rounds are bounded by the longest re-derived path.

    Result = kept ∪ re-derived ≡ ``transitive_closure(remaining_edges)``
    (asserted on chain-breaking deletions in test_incremental_closure).
    """
    anti = ["descendant_id", "ancestor_id"]
    dd = deleted_edges.select(
        F.col(child_col).alias("__u"), F.col(parent_col).alias("__v")
    ).dropDuplicates()
    # d ⇝ u (including d = u) per the OLD closure
    left = closure.select("descendant_id", F.col("ancestor_id").alias("__u")).unionByName(
        dd.select(F.col("__u").alias("descendant_id"), "__u").dropDuplicates()
    )
    # v ⇝ a (including v = a)
    right = closure.select(
        F.col("descendant_id").alias("__v"), "ancestor_id"
    ).unionByName(dd.select("__v", F.col("__v").alias("ancestor_id")).dropDuplicates())
    suspect = (
        left.join(dd, on="__u")
        .join(right, on="__v")
        .select(*anti)
        .dropDuplicates()
        .join(closure, on=anti, how="left_semi")
        .localCheckpoint(**_CKPT)
    )
    kept = closure.join(suspect, on=anti, how="left_anti").localCheckpoint(**_CKPT)

    ebase = remaining_edges.select(
        F.col(child_col).alias("descendant_id"), F.col(parent_col).alias("ancestor_id")
    ).dropDuplicates()
    onehop = ebase.join(suspect, on=anti, how="left_semi")
    via_kept = _compose(ebase, kept).join(suspect, on=anti, how="left_semi")
    red = onehop.unionByName(via_kept).dropDuplicates().localCheckpoint(**_CKPT)
    frontier = red
    for _ in range(max_iterations):
        nxt = (
            _compose(ebase, frontier)
            .dropDuplicates()
            .join(suspect, on=anti, how="left_semi")
            .join(red, on=anti, how="left_anti")
            .localCheckpoint(**_CKPT)
        )
        if nxt.isEmpty():
            return kept.unionByName(red)
        red = red.unionByName(nxt)
        frontier = nxt
    raise RuntimeError(f"closure delete did not converge in {max_iterations} rounds (cycle?)")
