"""Near-duplicate CLUSTER resolution — pairs -> components -> keep set.

The dedup operators (`dedup_docs`, `similarity.cosine_near_dup_pairs`)
emit similar PAIRS; a pipeline acts on CLUSTERS: "these 7 docs are one
duplicate group — keep one, drop six". Pairs are edges of an undirected
graph; clusters are its connected components; the kept doc is a
deterministic canonical pick per component.

Spark-first design (the part that must hold at 100 TB):

- `connected_components` is the alternating LARGE-STAR / SMALL-STAR
  algorithm (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14): each round is two groupBy-min shuffles over the
  edge list, edges only ever point toward smaller ids, and the graph
  contracts to stars (every node -> its component minimum) in
  O(log^2 n) rounds — ~3-5 in practice. No vertex ever materializes its
  whole component (hash-to-min's failure mode); per-round state is the
  edge list itself, hash-partitioned. `localCheckpoint` truncates the
  per-round lineage exactly as `transitive_closure` does.
- `dedup_corpus` joins components back to the corpus and keeps the
  min-id doc per cluster plus every unpaired doc: one broadcast-or-
  shuffled equi-join + a groupBy on component.

The reference has no analog (its Neo4j MERGE collapses exact keys only);
this implements the build brief's "near-dup pair -> cluster resolution"
requirement. Oracle: a DuckDB recursive CTE computing min-reachable-id
per node over the same pair list (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _checksum(edges: DataFrame) -> tuple[int, int]:
    """(n_edges, order-insensitive hash) — one job per convergence check.
    The hash sum accumulates in decimal(38,0): a long sum of xxhash64
    values overflows (and ANSI mode rightly raises)."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Components of the undirected pair graph.

    Returns (node, component) for every node that appears in ``pairs``,
    where component = the smallest node id in its component (ids compare
    by their natural type ordering — long or string both work and both
    are deterministic).

    Each round:
      large-star: for every node u, hang u's LARGER neighbors onto
                  m(u) = min(N(u) ∪ {u})   — long chains fold in half;
      small-star: for every node u, hang u's SMALLER-or-equal structure
                  onto m(u) over smaller neighbors — stars flatten.
    Edges strictly decrease in potential; convergence = the edge list is
    unchanged (checked with one count+hash aggregate per round).
    """
    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    prev = _checksum(e)
    for _ in range(max_rounds):
        # ---- large-star: group on u over BOTH orientations
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.min("v").alias("__mn")).select(
            "u", F.least(F.col("__mn"), F.col("u")).alias("m")
        )
        large = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates()
        )
        # ---- small-star: orient every edge larger -> smaller
        d = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        ms = d.groupBy("u").agg(F.min("v").alias("m"))
        joined = d.join(ms, "u")
        small = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(joined.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates()
            .localCheckpoint(eager=True)
        )
        cur = _checksum(small)
        e = small
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")

    # converged: every edge points node -> component min. Centers appear
    # only on the right; they are their own component.
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    centers = (
        e.select(F.col("v").alias("node"))
        .dropDuplicates()
        .join(e.select(F.col("u").alias("node")).dropDuplicates(), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return members.unionByName(centers)


def dedup_corpus(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    keep: str = "min_id",
) -> DataFrame:
    """Resolve near-dup pairs into a kept/dropped verdict per document.

    Returns ``docs`` columns + (component, is_kept): every unpaired doc
    is its own component and kept; within a duplicate cluster only the
    canonical doc (min id — the only implemented ``keep`` policy, and
    the same one `exact_dedup` uses) survives.

    Scale: components is O(paired docs) — tiny next to the corpus — so
    the join back is broadcast-able when pairs are sparse (the common
    case after LSH verification); the component groupBy only shuffles
    paired docs.
    """
    if keep != "min_id":
        raise ValueError(f"unknown keep policy {keep!r}")
    comp = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "node", id_col
    )
    out = docs.join(comp, id_col, "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )
    return out.withColumn(
        "is_kept", F.col(id_col) == F.col("component")
    )
