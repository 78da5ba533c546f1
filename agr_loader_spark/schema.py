"""Event-log and target-table schemas (FIXTURES.md F1/F2).

The reference's data model is implicit/dynamic Python dicts
(src/etl/bgi_etl.py:495-516 — `.get()` with defaulting everywhere); here
every frame has an explicit StructType and schema change is an explicit,
ordered event in the log (SURVEY.md §2.7) rather than a silent `SET` of a
new property (src/etl/helpers/etl_helper.py:107-124).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# F2: binlog/WAL-shaped change-event log, totally ordered by event_lsn.
# Analog of the reference's generator batches of flat row dicts
# (src/etl/bgi_etl.py:426-559) plus the ordered etl_groups barrier schedule
# (src/aggregate_loader.py:122-159) collapsed into one ordered log.
# ---------------------------------------------------------------------------

SCHEMA_CHANGE_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),       # add | rename | widen
        T.StructField("column", T.StringType()),     # target column (current name)
        T.StructField("new_name", T.StringType()),   # for rename
        T.StructField("new_type", T.StringType()),   # for add/widen (DDL string)
        T.StructField("src_field", T.StringType()),  # event payload field feeding an added column
    ]
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_lsn", T.LongType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),  # I | U | D | S
        T.StructField("doc_id", T.StringType()),     # merge key; null for S
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),       # present in log; target gains it via an `add` event
        T.StructField("schema_change", SCHEMA_CHANGE_TYPE),
        T.StructField("ts", T.TimestampType()),
    ]
)

# ---------------------------------------------------------------------------
# F1: target tokens table (BASELINE.json input_hint). Merge key: doc_id.
# Column spec format used by the lake layer: (name, spark DDL type, src_field)
# where src_field names the event payload column that feeds it.
# ---------------------------------------------------------------------------

TOKENS_TABLE_COLUMNS = [
    ("doc_id", "string", "doc_id"),
    ("tokens", "array<int>", "tokens"),
    ("n_tok", "int", "n_tok"),
    ("source", "string", "source"),
]

TOKENS_MERGE_KEY = "doc_id"

# Reference-style provider tags (src/config/test.yml BGI list).
SOURCES = ["FB", "SGD", "WB", "ZFIN", "RGD", "MGI", "HGNC", "XB"]

LANGS = ["en", "de", "fr", "es", "zh"]


def ddl_to_type(ddl: str) -> T.DataType:
    """Parse a DDL type string ('array<int>', 'bigint', ...) to a DataType."""
    return T.StructType.fromDDL(f"c {ddl}")[0].dataType
