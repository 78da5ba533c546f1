"""Iceberg sink SQL generation (runs without Iceberg jars): DDL with the
bucket transform, MERGE branch structure per mode, evolution statements,
and the availability gate."""

from agr_loader_spark.lake.iceberg_sink import (
    create_table_sql,
    evolve_sql,
    is_available,
    merge_sql,
    time_travel_sql,
)

COLS = ["doc_id", "tokens", "n_tok", "source"]


def test_create_table_has_bucket_transform():
    sql = create_table_sql(
        "lake.db.tokens",
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"),
         ("source", "string")],
        key="doc_id", n_buckets=64,
    )
    assert "PARTITIONED BY (bucket(64, doc_id))" in sql
    assert "'format-version'='2'" in sql
    assert "USING iceberg" in sql


def test_merge_sql_lww_has_all_three_branches():
    sql = merge_sql("lake.db.tokens", "chg", "doc_id", COLS, mode="lww")
    assert "MERGE INTO lake.db.tokens t USING chg s ON t.doc_id = s.doc_id" in sql
    assert "WHEN MATCHED AND s.__op = 'D' THEN DELETE" in sql
    assert "WHEN MATCHED AND s.__op = 'U' THEN UPDATE SET" in sql
    assert "t.tokens = s.tokens" in sql and "t.doc_id = s.doc_id," not in sql.split("UPDATE SET")[1].split("WHEN")[0]
    assert "WHEN NOT MATCHED AND s.__op <> 'D' THEN INSERT" in sql


def test_merge_sql_insert_if_absent_drops_update_branch():
    sql = merge_sql("t", "chg", "doc_id", COLS, mode="insert_if_absent")
    assert "UPDATE SET" not in sql
    assert "THEN DELETE" in sql  # deletes still apply (reference K7)
    assert "THEN INSERT" in sql


def test_evolution_statements():
    assert evolve_sql("t", "add", "lang", new_type="string") == \
        "ALTER TABLE t ADD COLUMN lang string"
    assert evolve_sql("t", "rename", "source", new_name="origin") == \
        "ALTER TABLE t RENAME COLUMN source TO origin"
    assert evolve_sql("t", "widen", "n_tok", new_type="bigint") == \
        "ALTER TABLE t ALTER COLUMN n_tok TYPE bigint"
    assert evolve_sql("t", "drop", "legacy") == "ALTER TABLE t DROP COLUMN legacy"
    assert "VERSION AS OF 7" in time_travel_sql("t", 7)


def test_availability_gate_false_in_sandbox(spark):
    assert is_available(spark, "lake") is False
