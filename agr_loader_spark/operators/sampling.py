"""Deterministic dataset splitting, sampling, and sequence packing for
training-data pipelines.

First-class engine components beyond the reference's own operator set
(build brief): every large-scale training pipeline needs (a) stable
train/val/test assignment that never shifts when the corpus is
re-partitioned or re-run, (b) per-stratum downsampling (e.g. cap a
dominant source/language), and (c) packing of variable-length token
sequences into fixed context windows.

Determinism stance: all assignment is a pure function of the row KEY —
hash-based, no RNG state, no uuid (the same no-uuid rule the CDC engine
enforces, SURVEY.md T10; the reference's uuid4 keys are exactly what
breaks reproducibility, src/etl/bgi_etl.py:509). Two hash backends:

- ``xxhash64`` (default): JVM-side, fastest — the production path.
- ``md5``: byte-identical in every engine (Spark, DuckDB, Python), so
  the DuckDB oracle can recompute assignments exactly. Both backends
  are uniform over their bucket range; md5 costs ~2x xxhash64 but is
  still whole-stage codegen, no Python.

Scale design: splits and samples are stateless row-local expressions
(no shuffle at all — they survive any partitioning); packing windows
are PER GROUP (partitioned window / grouped applyInPandas), never a
global ordered cumsum, so the shuffle is one hash partition by group
and each group's window is independent.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _hash_bucket(key: Column, salt: str, method: str) -> tuple[Column, int]:
    """Uniform (bucket, n_buckets) from (salt, key). ``md5`` uses the
    first 5 hex digits of md5(salt||key) — byte-identical in DuckDB via
    ``('0x'||substr(md5(...),1,5))::BIGINT``, so the oracle recomputes
    assignments exactly; ``xxhash64`` is the fast JVM path."""
    if method == "md5":
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 5), 16, 10
        )
        return h.cast("long"), 16 ** 5
    if method == "xxhash64":
        return (
            F.pmod(F.xxhash64(F.lit(salt), key.cast("string")), F.lit(1_048_576)),
            1_048_576,
        )
    raise ValueError(f"unknown hash method {method!r}")


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "split",
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic split assignment: adds a ``split`` column with one
    of ``weights``' keys, proportional to the weights, as a pure
    function of (salt, key). Re-running, re-partitioning, or growing
    the corpus NEVER moves an existing row between splits (the property
    random() sampling lacks). No shuffle: a row-local expression."""
    total = float(sum(weights.values()))
    b, n_buckets = _hash_bucket(F.col(key), salt, method)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total * n_buckets
        cond = b < F.lit(int(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    strata_col: str,
    default_fraction: float = 1.0,
    salt: str = "sample",
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-stratum downsample: keep a row iff its hash
    bucket falls under its stratum's fraction (e.g. cap a dominant
    source at 10% while keeping the rest). Row-local, no shuffle, and
    stable under re-runs — the sample is a fixed subset, not a fresh
    draw. Strata not listed keep ``default_fraction``."""
    b, n_buckets = _hash_bucket(F.col(key), salt, method)
    thr = None
    for stratum, f in fractions.items():
        cond = F.col(strata_col) == stratum
        cut = F.lit(int(f * n_buckets))
        thr = F.when(cond, cut) if thr is None else thr.when(cond, cut)
    thr = (F.lit(int(default_fraction * n_buckets)) if thr is None
           else thr.otherwise(F.lit(int(default_fraction * n_buckets))))
    return df.filter(b < thr)


def pack_concat_chunks(
    docs: DataFrame,
    group_col: str,
    len_col: str,
    id_col: str = "doc_id",
    max_len: int = 2048,
) -> DataFrame:
    """GPT-style concat-and-chunk packing plan: within each group, docs
    are concatenated in (id) order and cut into fixed ``max_len``
    windows; a doc may span a boundary. Emits per doc:
    (id, group, chunk_id of its first token, offset in that chunk,
    spans_boundary). Pure window math — running sum per group — so it
    is exactly expressible in SQL (the oracle recomputes it) and needs
    ONE shuffle (by group). Groups are independent: at 100 TB the
    group is a shard (source, date, ...) and no global order exists."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum(F.col(len_col)).over(w)
    start = end - F.col(len_col)
    return docs.select(
        F.col(id_col),
        F.col(group_col),
        F.col(len_col),
        F.floor(start / max_len).cast("long").alias("chunk_id"),
        F.pmod(start, F.lit(max_len)).cast("long").alias("chunk_offset"),
        (F.floor((end - 1) / max_len) > F.floor(start / max_len)).alias("spans_boundary"),
    )


def _pack_schema(docs: DataFrame, id_col: str, group_col: str) -> T.StructType:
    """Output schema follows the caller's id/group types (a string doc
    id packs as well as a long one)."""
    f = {x.name: x.dataType for x in docs.schema.fields}
    return T.StructType(
        [
            T.StructField("doc_id", f[id_col]),
            T.StructField("group", f[group_col]),
            T.StructField("bin_id", T.LongType()),
            T.StructField("bin_fill", T.LongType()),
        ]
    )


def pack_sequences_nextfit(
    docs: DataFrame,
    group_col: str,
    len_col: str,
    id_col: str = "doc_id",
    max_len: int = 2048,
) -> DataFrame:
    """No-split bin packing (SFT-style: a doc never crosses a window):
    within each group, docs in (id) order go into the current bin until
    the next doc would overflow ``max_len``, then a new bin starts.
    Docs longer than max_len get a singleton bin (truncation is the
    caller's policy). The greedy recurrence is inherently sequential
    per group, so it runs as one vectorized pass per group via
    applyInPandas — groups pack in parallel, state never leaves the
    group. Output: (doc_id, group, bin_id, bin_fill-after-placement)."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        lens = pdf[len_col].to_numpy()
        bin_id, fill = 0, 0
        bins, fills = [], []
        for ln in lens:
            if fill > 0 and fill + ln > max_len:
                bin_id += 1
                fill = 0
            fill += int(ln)
            bins.append(bin_id)
            fills.append(fill)
        return pd.DataFrame(
            {
                "doc_id": pdf[id_col].to_numpy(),
                "group": pdf[group_col].to_numpy(),
                "bin_id": bins,
                "bin_fill": fills,
            }
        )

    return (
        docs.select(id_col, group_col, len_col)
        .groupBy(group_col)
        .applyInPandas(pack, schema=_pack_schema(docs, id_col, group_col))
    )
