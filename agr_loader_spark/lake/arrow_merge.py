"""Arrow-native state-colocated MERGE — the engine's fast sink path.

The pure-JVM merge (LakeTable.merge) expresses the upsert as winners-agg
+ semi-join + full-outer join + repartition: ~8 stages per micro-batch,
and at micro-batch cadence the inter-stage barriers dominate wall time
(measured: ~2s of scheduling gaps per segment vs ~1.7s of work at 16
cores). This module collapses the whole merge into TWO stages:

  stage 1: scan the segment's events, project the changeset columns,
           hash-shuffle by target bucket (pmod(xxhash64(key), N) — the
           same function that lays out the table, so a batch row lands
           exactly where its state row lives);
  stage 2: one ``applyInPandas`` task per touched bucket:
           - reads the bucket's CURRENT state parquet directly with
             pyarrow (the state never crosses the JVM at all),
           - projects old-schema files onto the current schema by field
             id (rename/null-fill/widen — Iceberg-style),
           - LWW-folds state (lsn = -1) + batch rows per key
             (vectorized idxmax; exact (key, lsn) re-delivery dedup is
             free because bucket co-location puts all copies in the
             same group),
           - applies deletes, writes the new bucket file itself
             (atomic tmp+rename), and returns a one-row manifest.

This IS the north rule's "salted repartitioning + two-phase local/
global merge-apply in vectorized Arrow/pandas UDFs": phase 1 routes
globally by bucket, phase 2 merge-applies locally. The reference analog
is the per-provider-pair routed, conflict-free scheduled load
(src/etl/orthology_etl.py:142-153, 197-225) — re-expressed so the
"schedule" is just a hash partitioner.

Scale notes: one shuffle of the batch (never the state), state I/O is
bucket-local and embarrassingly parallel, and task count == touched
buckets, so a 1000-executor cluster keeps every core on its own bucket
set. Task retries are safe: files land under the not-yet-committed
snapshot dir with deterministic names; the commit references only what
the driver collected.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

if TYPE_CHECKING:  # pragma: no cover
    from .table import ColumnSpec

MANIFEST_SCHEMA = (
    "bucket int, path string, n_rows long, n_upserts long, n_deletes long, "
    "min_lsn long, max_lsn long"
)

_ARROW_TYPES = {
    "string": pa.string(),
    "int": pa.int32(),
    "bigint": pa.int64(),
    "long": pa.int64(),
    "double": pa.float64(),
    "float": pa.float32(),
    "boolean": pa.bool_(),
    "array<int>": pa.list_(pa.int32()),
    "array<bigint>": pa.list_(pa.int64()),
    "array<string>": pa.list_(pa.string()),
    "array<float>": pa.list_(pa.float32()),
    "array<double>": pa.list_(pa.float64()),
}


def arrow_type(ddl: str) -> pa.DataType:
    try:
        return _ARROW_TYPES[ddl.strip().lower()]
    except KeyError:
        raise ValueError(f"unsupported column type for arrow sink: {ddl!r}")


def arrow_schema(cols: list) -> pa.Schema:
    return pa.schema([pa.field(c.name, arrow_type(c.type)) for c in cols])


def read_bucket_state(
    files: list[dict],
    schema_versions: dict[int, list],
    current: list,
    root: str,
) -> pa.Table | None:
    """Read a bucket's parquet files, projecting each onto the current
    schema by field id (rename / null-fill / widen)."""
    out_schema = arrow_schema(current)
    tables = []
    for fe in files:
        t = pq.read_table(os.path.join(root, fe["path"]))
        old_cols = {c.id: c for c in schema_versions[fe["schema_version"]]}
        arrays = []
        for c in current:
            o = old_cols.get(c.id)
            if o is None:
                arrays.append(pa.nulls(len(t), arrow_type(c.type)))
            else:
                arrays.append(t.column(o.name).cast(arrow_type(c.type)))
        tables.append(pa.Table.from_arrays(arrays, schema=out_schema))
    if not tables:
        return None
    return pa.concat_tables(tables)


def make_bucket_fold(
    root: str,
    stage_rel: str,
    key: str,
    current: list,
    schema_versions: dict[int, list],
    bucket_files: dict[int, list[dict]],
    op_col: str,
    lsn_col: str,
    bucket_col: str,
    update_only: bool = False,
):
    """Build the applyInPandas function for one micro-batch merge.

    Everything captured here is tiny metadata (column specs + file
    lists); the heavy inputs (batch rows, state files) stay distributed.
    """
    names = [c.name for c in current]
    out_pa_schema = arrow_schema(current)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf[bucket_col].iloc[0])
        # per-partition lineage: the source-offset range this bucket
        # absorbed in this micro-batch (north rule: offset -> snapshot)
        b_min_lsn = int(pdf[lsn_col].min())
        b_max_lsn = int(pdf[lsn_col].max())
        # exact re-delivery dedup: co-location guarantees all copies of a
        # (key, lsn) pair are in this group
        pdf = pdf.drop_duplicates(subset=[key, lsn_col])

        state = read_bucket_state(bucket_files.get(bucket, []), schema_versions,
                                  current, root)
        state_keys = None
        if state is not None and len(state):
            sdf = state.to_pandas(types_mapper=None)
            if update_only:
                state_keys = set(sdf[key])
            sdf[op_col] = "U"
            sdf[lsn_col] = -1
            pdf = pd.concat([sdf, pdf[names + [op_col, lsn_col]]], ignore_index=True)
        else:
            pdf = pdf[names + [op_col, lsn_col]]

        # LWW: keep the max-lsn row per key (state rows at lsn=-1 lose to
        # any event), then drop keys whose winning op is a delete
        win = pdf.loc[pdf.groupby(key, sort=False)[lsn_col].idxmax()]
        n_deletes_applied = int((win[op_col] == "D").sum())
        win = win[win[op_col] == "U"][names]
        if update_only:
            # matched-only patch: a winning upsert for a key NOT already
            # in this bucket's state is dropped, never inserted
            win = win[win[key].isin(state_keys)] if state_keys else win.iloc[0:0]

        bdir = os.path.join(root, stage_rel, f"{bucket_col}={bucket}")
        os.makedirs(bdir, exist_ok=True)
        rel_path = None
        if len(win):
            # deterministic name + atomic rename: a retried task simply
            # replaces the identical file
            final = os.path.join(bdir, "part-0.parquet")
            tmp = final + ".inprogress"
            table = pa.Table.from_pandas(win, schema=out_pa_schema,
                                         preserve_index=False)
            pq.write_table(table, tmp, compression="snappy")
            os.replace(tmp, final)
            rel_path = os.path.join(stage_rel, f"{bucket_col}={bucket}", "part-0.parquet")
        return pd.DataFrame(
            {
                "bucket": pd.array([bucket], dtype="int32"),
                "path": [rel_path],
                "n_rows": pd.array([len(win)], dtype="int64"),
                "n_upserts": pd.array([int((pdf[op_col] == "U").sum()
                                            - (len(state) if state is not None else 0))],
                                      dtype="int64"),
                "n_deletes": pd.array([n_deletes_applied], dtype="int64"),
                "min_lsn": pd.array([b_min_lsn], dtype="int64"),
                "max_lsn": pd.array([b_max_lsn], dtype="int64"),
            }
        )

    return fold


def numpy_tokens_equal(a, b) -> bool:
    """Exact token-array equality helper (tests)."""
    if a is None or b is None:
        return a is None and b is None
    return np.array_equal(np.asarray(a), np.asarray(b))
