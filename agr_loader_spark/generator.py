"""Deterministic synthetic binlog generator (FIXTURES.md F2).

The reference consumes downloaded snapshot files and slices them into 10k
record generator batches (src/data_manager/data_type_config.py:20-21,
src/etl/bgi_etl.py:426-559). Our engine consumes an ordered change-event
log; this module synthesizes one at any scale, deterministically:

- every random draw is a counter-based hash of (seed, stream, event_lsn) —
  splitmix64 over numpy uint64 vectors — so the log is identical no matter
  how Spark partitions the generation (no RNG state, no uuid4: the
  reference's per-row uuid.uuid4() (src/etl/bgi_etl.py:509) is exactly what
  breaks replay determinism, SURVEY.md T10);
- generation itself is distributed: ``spark.range(n_events)`` +
  ``mapInPandas`` (Arrow-vectorized), so a 10^10-event log never
  materializes on the driver;
- skew dial: doc choice is bounded-zipf via inverse CDF (hot doc_id gets a
  few percent of all events — the analog of the reference's hot Gene nodes
  that force its randomized provider-pair scheduling,
  src/etl/orthology_etl.py:197-225);
- duplicate re-delivery: a deterministic ~2% of events are emitted twice
  with the same (doc_id, event_lsn) in the same epoch (the analog of the
  sink's requeue-on-error double-apply, src/transactors/neo4j_transactor.py:108-118);
- 5 schema-change events at fixed fractional positions: add ``lang``,
  rename ``source -> origin``, widen ``n_tok int -> bigint``, then
  drop ``lang`` and re-add it (field-id no-resurrection end-to-end).
"""

from __future__ import annotations

import datetime as _dt
import functools
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .schema import EVENT_SCHEMA, LANGS, SOURCES

_U64 = np.uint64
_BASE_TS = _dt.datetime(2024, 1, 1)  # fixed epoch base; no wall clock
_VOCAB = 50257


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def _hash64(seed: int, stream: int, ids: np.ndarray) -> np.ndarray:
    h = _splitmix64(np.asarray(ids, dtype=np.uint64) ^ _splitmix64(np.array([seed], dtype=np.uint64))[0])
    return _splitmix64(h ^ _splitmix64(np.array([stream], dtype=np.uint64))[0])


def _uniform(seed: int, stream: int, ids: np.ndarray) -> np.ndarray:
    """U[0,1) from the top 53 bits of the counter hash."""
    return (_hash64(seed, stream, ids) >> _U64(11)).astype(np.float64) / float(1 << 53)


@functools.lru_cache(maxsize=8)
def _zipf_cdf(n_docs: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_docs + 1, dtype=np.float64), s)
    cdf = np.cumsum(w)
    return cdf / cdf[-1]


def doc_id_str(rank: int) -> str:
    return f"doc:{SOURCES[rank % len(SOURCES)]}:{rank:08d}"


def schema_change_plan(n_events: int) -> list[dict]:
    """The 3 fixed schema-change events (lsn, payload). Reserved lsns carry
    no data event. Applied mid-stream by the runner in lsn order."""
    if n_events < 20:
        return []
    return [
        {
            "event_lsn": int(n_events * 0.35),
            "schema_change": {"kind": "add", "column": "lang", "new_name": None,
                              "new_type": "string", "src_field": "lang"},
        },
        {
            "event_lsn": int(n_events * 0.55),
            "schema_change": {"kind": "rename", "column": "source", "new_name": "origin",
                              "new_type": None, "src_field": None},
        },
        {
            "event_lsn": int(n_events * 0.75),
            "schema_change": {"kind": "widen", "column": "n_tok", "new_name": None,
                              "new_type": "bigint", "src_field": None},
        },
        # add -> drop -> re-add of `lang`: exercises Iceberg field-id
        # no-resurrection end-to-end (the re-added column gets a NEW field
        # id, so rows last upserted before the re-add must read NULL even
        # though old files physically still hold the dropped values).
        {
            "event_lsn": int(n_events * 0.85),
            "schema_change": {"kind": "drop", "column": "lang", "new_name": None,
                              "new_type": None, "src_field": None},
        },
        {
            "event_lsn": int(n_events * 0.92),
            "schema_change": {"kind": "add", "column": "lang", "new_name": None,
                              "new_type": "string", "src_field": "lang"},
        },
    ]


def _make_batch(
    lsns: np.ndarray,
    seed: int,
    n_docs: int,
    zipf_s: float,
    epoch_size: int,
    mean_tok: int,
    max_tok: int,
) -> pd.DataFrame:
    n = len(lsns)
    cdf = _zipf_cdf(n_docs, zipf_s)
    ranks = np.searchsorted(cdf, _uniform(seed, 1, lsns), side="right")
    u_op = _uniform(seed, 2, lsns)
    # update:insert:delete = 70:20:10 (F2); inserts and updates are both
    # upserts under MERGE semantics, mirroring ON CREATE / SET
    # (src/etl/bgi_etl.py:99-115 vs src/etl/allele_etl.py:142-144).
    ops = np.where(u_op < 0.70, "U", np.where(u_op < 0.90, "I", "D"))

    # token lengths ~ geometric(mean) clipped to max (F2)
    p = 1.0 / mean_tok
    u_len = _uniform(seed, 3, lsns)
    lens = np.minimum(1 + np.floor(np.log1p(-u_len) / np.log1p(-p)).astype(np.int64), max_tok)
    lens = np.where(ops == "D", 0, lens)

    # flat token values: hash of (lsn, intra-offset) — per-row deterministic
    total = int(lens.sum())
    rep_lsn = np.repeat(lsns.astype(np.uint64), lens)
    offs = np.arange(total, dtype=np.uint64) - np.repeat(np.cumsum(lens) - lens, lens).astype(np.uint64)
    flat = (_hash64(seed, 4, rep_lsn * _U64(0x100000001) ^ offs) % _U64(_VOCAB)).astype(np.int32)
    bounds = np.cumsum(lens)[:-1]
    token_arrays = np.split(flat, bounds)

    langs = np.array(LANGS)[(_hash64(seed, 5, lsns) % _U64(len(LANGS))).astype(np.int64)]
    ts = pd.to_datetime(
        np.datetime64(_BASE_TS)
        + lsns.astype("timedelta64[ms]") * 1000
        + (_hash64(seed, 6, lsns) % _U64(999)).astype("timedelta64[ms]")
    )
    is_del = ops == "D"
    pdf = pd.DataFrame(
        {
            "event_lsn": lsns.astype(np.int64),
            "epoch": (lsns // epoch_size).astype(np.int32),
            "op": ops,
            "doc_id": pd.Series([doc_id_str(int(r)) for r in ranks], dtype=object),
            "tokens": pd.Series([None if d else a for d, a in zip(is_del, token_arrays)], dtype=object),
            "n_tok": pd.array(np.where(is_del, 0, lens), dtype=pd.Int32Dtype()),
            "source": pd.Series([SOURCES[int(r) % len(SOURCES)] for r in ranks], dtype=object),
            "lang": langs,
            "ts": ts,
        }
    )
    pdf.loc[is_del, "n_tok"] = None
    pdf.loc[is_del, "source"] = None
    pdf.loc[is_del, "lang"] = None
    pdf["schema_change"] = None
    return pdf[[f.name for f in EVENT_SCHEMA.fields]]


def generate_binlog(
    spark: SparkSession,
    n_events: int = 100_000,
    n_docs: int = 10_000,
    seed: int = 42,
    epoch_size: int = 10_000,
    zipf_s: float = 1.05,
    dup_rate: float = 0.02,
    mean_tok: int = 64,
    max_tok: int = 2048,
    with_schema_changes: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic event log as a DataFrame (EVENT_SCHEMA).

    epoch_size mirrors the reference's generator/commit batch of 10k
    (src/data_manager/data_type_config.py:20-21).
    """
    plan = schema_change_plan(n_events) if with_schema_changes else []
    reserved = {p["event_lsn"] for p in plan}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            lsns = b["id"].to_numpy()
            if reserved:
                lsns = lsns[~np.isin(lsns, list(reserved))]
            if len(lsns) == 0:
                continue
            pdf = _make_batch(lsns, seed, n_docs, zipf_s, epoch_size, mean_tok, max_tok)
            if dup_rate > 0:
                dup_mask = _uniform(seed, 7, lsns) < dup_rate
                if dup_mask.any():
                    pdf = pd.concat([pdf, pdf[dup_mask]], ignore_index=True)
            yield pdf

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_events, numPartitions=partitions)
    events = base.mapInPandas(gen, schema=EVENT_SCHEMA)

    if plan:
        rows = [
            {
                "event_lsn": p["event_lsn"],
                "epoch": p["event_lsn"] // epoch_size,
                "op": "S",
                "doc_id": None,
                "tokens": None,
                "n_tok": None,
                "source": None,
                "lang": None,
                "schema_change": p["schema_change"],
                "ts": _BASE_TS + _dt.timedelta(seconds=p["event_lsn"]),
            }
            for p in plan
        ]
        events = events.unionByName(spark.createDataFrame(rows, schema=EVENT_SCHEMA))
    return events


def write_binlog(spark: SparkSession, path: str, **kwargs) -> None:
    """Materialize a log to parquet partitioned by epoch — the replayable
    source layout (epoch dir = micro-batch = the reference's commit unit)."""
    generate_binlog(spark, **kwargs).write.mode("overwrite").partitionBy("epoch").parquet(path)
