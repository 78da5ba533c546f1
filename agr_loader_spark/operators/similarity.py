"""Similarity search over an embedding column (array<float>).

Two paths per the build brief:

- brute_force_topk: exact cosine top-k. The dot product is a JVM-side
  `aggregate(zip_with(...))` fold — no Python; the k-selection is a
  window over (query, rounded score desc, neighbor asc). Quadratic:
  the correctness baseline and the DuckDB-oracle-checkable query.
- lsh_topk: random-hyperplane LSH. Hyperplane signs come from
  deterministic hashes (no RNG state), bucket join produces candidates,
  exact cosine re-ranks within buckets — the scale path (shuffle keys
  are (plane_band, bucket), never a cross product). Multi-probe via
  multiple independent bands keeps recall up.

Scores are computed in float64 from the float32 inputs and rounded to
6dp so Spark and DuckDB rank identically; ties break by neighbor id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _cosine(a, b) -> F.Column:
    av = F.transform(a, lambda x: x.cast("double"))
    bv = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(av, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bv, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def _norm(v) -> F.Column:
    """sqrt(sum x^2) in float64 — the identical subexpression _cosine
    folds per pair, exposed so callers can evaluate it once per ROW
    before a join instead of once per PAIR (these higher-order array
    folds run interpreted, so per-pair norm recomputation dominates
    brute-force scoring; same ops on the same doubles, so the quotient
    is bit-identical)."""
    vd = F.transform(v, lambda x: x.cast("double"))
    return F.sqrt(F.aggregate(vd, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b) -> F.Column:
    av = F.transform(a, lambda x: x.cast("double"))
    bv = F.transform(b, lambda x: x.cast("double"))
    return F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query row. Output: (query_id,
    neighbor_id, cos_sim, rank). Self-matches excluded.

    The queries side is broadcast (small by construction); Catalyst
    turns the cross into BroadcastNestedLoopJoin so the big side never
    shuffles.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
                       _norm(F.col(vec_col)).alias("q_norm"))
    )
    # norms once per row (not per pair), and fan the big side out of the
    # fixture file's single scan partition before the nested-loop probe
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_norm"),
    ).repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
    scored = (
        q.crossJoin(e)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


@pandas_udf(T.ArrayType(T.IntegerType()))
def _hyperplane_signs(vec: pd.Series, meta: pd.Series) -> pd.Series:
    """Sign bits of <v, H_p> for deterministic pseudo-random hyperplanes.

    meta packs (seed, n_planes, dim). Hyperplane components are
    counter-hash-derived N(0,1)-ish values (sum of 4 uniforms - 2), so
    every executor regenerates the identical planes with no broadcast
    of RNG state. Vectorized: one matmul per Arrow batch.
    """
    if len(vec) == 0:
        return pd.Series([], dtype=object)
    seed, n_planes, dim = (int(x) for x in meta.iloc[0].split(":"))
    u64 = np.uint64

    def splitmix(x):
        x = x + u64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> u64(30))) * u64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> u64(27))) * u64(0x94D049BB133111EB)
        return x ^ (x >> u64(31))

    idx = np.arange(n_planes * dim * 4, dtype=np.uint64)
    h = splitmix(idx ^ splitmix(np.array([seed], dtype=np.uint64))[0])
    uni = (h >> u64(11)).astype(np.float64) / float(1 << 53)
    planes = (uni.reshape(n_planes, dim, 4).sum(axis=2) - 2.0)  # approx N(0,1)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in vec])
    signs = (mat @ planes.T) > 0
    return pd.Series([row.astype(np.int32) for row in signs.astype(np.int32)])


def rademacher_planes(seed: int, n_planes: int, dim: int) -> list[list[float]]:
    """±1 hyperplane components from md5 — engine-independent: any engine
    (including the DuckDB oracle-SQL generator) rebuilds the identical
    planes from (seed, p, i) alone. Component (p, i) = +1.0 iff the
    first hex digit of md5("lshplane:{seed}:{p}:{i}") is even. Sign-LSH
    with Rademacher planes has the same collision S-curve as Gaussian
    planes (Achlioptas-style sparse/signed projections)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"lshplane:{seed}:{p}:{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_method: str = "hash",
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets -> candidate
    equi-join -> exact cosine re-rank. Recall grows with ``bands``
    (independent 4-plane bands, multi-probe by union).

    plane_method='hash' (default): counter-hash N(0,1)-ish planes inside
    a pandas_udf, bucket = xxhash64 of the band's sign bits — the
    production path. plane_method='rademacher': md5-derived ±1 planes as
    inlined literal arrays folded JVM-side, bucket = the band's sign
    bits as a little-endian integer — bit-for-bit reproducible outside
    Spark, which is what makes the DuckDB values-oracle possible."""
    dim_row = embeddings.select(F.size(vec_col)).first()
    if dim_row is None:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double, rank int"
        )
    dim = dim_row[0]
    meta = F.lit(f"{seed}:{n_planes}:{dim}")
    r = n_planes // bands
    planes = (
        rademacher_planes(seed, n_planes, dim) if plane_method == "rademacher" else None
    )

    def with_buckets(df, side):
        if planes is not None:
            vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
            signs = F.array(*[
                (
                    F.aggregate(
                        F.zip_with(vec_d, F.array(*[F.lit(c) for c in pl]),
                                   lambda x, y: x * y),
                        F.lit(0.0), lambda acc, x: acc + x,
                    ) >= 0
                ).cast("int")
                for pl in planes
            ])
        else:
            signs = _hyperplane_signs(F.col(vec_col), meta)
        d = df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_vec"),
            signs.alias("signs"),
        )
        if planes is not None:
            band_bucket = [
                sum(F.col("signs").getItem(b * r + j) * F.lit(1 << j) for j in range(r))
                for b in range(bands)
            ]
        else:
            band_bucket = [
                F.xxhash64(*[F.col("signs").getItem(b * r + j) for j in range(r)])
                for b in range(bands)
            ]
        bucket = F.posexplode(F.array(*band_bucket))
        return d.select(f"{side}_id", f"{side}_vec", bucket.alias("band", "bucket"))

    qb = with_buckets(queries, "query")
    eb = with_buckets(embeddings, "neighbor")
    candidates = (
        qb.join(eb, on=["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_vec", "neighbor_id", "neighbor_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id", "neighbor_id",
        F.round(_cosine(F.col("query_vec"), F.col("neighbor_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    n_planes: int = 64,
    bands: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Output: (id_a, id_b,
    cos_sim) with id_a < id_b, cos_sim rounded to 6dp, >= threshold.

    method='lsh' (default — the scale path): random-hyperplane sign
    buckets per band (deterministic counter-hash planes, no RNG state),
    candidate pairs from a self-equi-join on (band, bucket) — shuffle
    keys only, never a cross product — then EXACT cosine verification,
    so false positives are impossible and recall is the standard banding
    S-curve: a pair at angle θ collides per band with (1-θ/π)^r,
    r = n_planes/bands. The 32-band x 2-plane default puts the miss
    probability below 1e-7 at cos 0.4 and ~1e-13 at cos 0.9.

    method='brute': exact all-pairs crossJoin — O(n^2), the verification
    oracle for small corpora (and the shape DuckDB can mirror).
    """
    if method == "brute":
        a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(_cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
        )
    if method != "lsh":
        raise ValueError(f"unknown method {method!r}")
    head = embeddings.select(F.size(vec_col)).first()
    if head is None:  # empty frame: no pairs (brute path handles this natively)
        return embeddings.sparkSession.createDataFrame(
            [], "id_a string, id_b string, cos_sim double"
        )
    dim = head[0]
    meta = F.lit(f"{seed}:{n_planes}:{dim}")
    r = n_planes // bands
    signs = _hyperplane_signs(F.col(vec_col), meta)
    bucketed = embeddings.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"), signs.alias("signs")
    ).select(
        "__id", "__vec",
        F.posexplode(
            F.array(*[
                F.xxhash64(*[F.col("signs").getItem(b * r + j) for j in range(r)])
                for b in range(bands)
            ])
        ).alias("band", "bucket"),
    )
    ca = bucketed.select(F.col("__id").alias("id_a"), F.col("__vec").alias("va"),
                         "band", "bucket")
    cb = bucketed.select(F.col("__id").alias("id_b"), F.col("__vec").alias("vb"),
                         "band", "bucket")
    return (
        ca.join(cb, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b",
                F.round(_cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


# --------------------------------------------------------------------- IVF
def _normalize(vec) -> F.Column:
    v = F.transform(vec, lambda x: x.cast("double"))
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.transform(v, lambda x: x / n)


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means on unit-normalized vectors (the IVF
    coarse quantizer). Init = the n_centroids rows with the smallest
    xxhash64(id) (a seedless deterministic sample); each iteration is
    assign (broadcast centroids, argmin by window) + element-wise mean
    (posexplode -> groupBy(cluster, pos) -> re-assemble). All JVM.
    Returns (cluster, centroid: array<double>)."""
    vecs = embeddings.select(
        F.col(id_col).alias("__id"), _normalize(F.col(vec_col)).alias("__v")
    ).localCheckpoint(eager=True)
    centroids = (
        vecs.orderBy(F.xxhash64(F.col("__id")))
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy(F.xxhash64(F.col("__id")))).alias("cluster"),
            F.col("__v").alias("centroid"),
        )
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = _assign_to_centroid(vecs, centroids)
        centroids = (
            assigned.join(vecs, "__id")
            .select("cluster", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("centroid")
            )
            .select("cluster", _normalize(F.col("centroid")).alias("centroid"))
        ).localCheckpoint(eager=True)
    return centroids


def _assign_to_centroid(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """(__id, cluster) of the nearest centroid; on unit vectors max-dot
    == min-L2, ties broken by cluster id."""
    dot = F.aggregate(
        F.zip_with(F.col("__v"), F.col("centroid"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    scored = vecs.crossJoin(F.broadcast(centroids)).select(
        "__id", "cluster", dot.alias("dot")
    )
    w = Window.partitionBy("__id").orderBy(F.desc("dot"), F.asc("cluster"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("__id", "cluster")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into
    n_centroids inverted lists, probe the nprobe nearest lists per
    query, exact-cosine re-rank inside them. Output matches
    brute_force_topk's shape (query_id, neighbor_id, cos_sim, rank) and
    EQUALS it when nprobe == n_centroids (probing every list makes the
    re-rank exhaustive — tested).

    Scale: the corpus-side work is one equi-join on `cluster` (the
    inverted-list probe) — candidates are |corpus| * nprobe/n_centroids
    per query on balanced lists, never a cross product; list skew is
    AQE-splittable. Centroids broadcast (n_centroids rows).
    """
    centroids = train_ivf_centroids(embeddings, n_centroids, iters, id_col, vec_col)
    corpus = embeddings.select(
        F.col(id_col).alias("__id"), _normalize(F.col(vec_col)).alias("__v")
    )
    lists = _assign_to_centroid(corpus, centroids).withColumnRenamed("__id", "neighbor_id")

    qv = queries.select(
        F.col(id_col).alias("query_id"), _normalize(F.col(vec_col)).alias("__v")
    )
    dot = F.aggregate(
        F.zip_with(F.col("__v"), F.col("centroid"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("cluster"))
    probes = (
        qv.crossJoin(F.broadcast(centroids))
        .select("query_id", "cluster", dot.alias("dot"))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cluster")
    )
    cand = probes.join(lists, "cluster").filter(F.col("query_id") != F.col("neighbor_id"))
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    qfull = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored = (
        cand.join(F.broadcast(qfull), "query_id")
        .join(e, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            F.round(_cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
