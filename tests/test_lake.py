"""LakeTable unit tests: merge semantics, exactly-once, evolution, COW."""

import pyspark.sql.functions as F
import pytest

from agr_loader_spark.lake.table import OP_COL, LakeTable

COLS = [("doc_id", "string", "doc_id"), ("tokens", "array<int>", "tokens"),
        ("n_tok", "int", "n_tok"), ("source", "string", "source")]


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, __op string"
    )


def _mk(spark, tmproot, n_buckets=8):
    return LakeTable.create(spark, tmproot + "/t", COLS, key="doc_id", n_buckets=n_buckets)


def test_merge_upsert_delete_roundtrip(spark, tmproot):
    t = _mk(spark, tmproot)
    t.merge(_changes(spark, [("a", [1, 2], 2, "FB", "U"), ("b", [3], 1, "WB", "U")]), "0:0")
    t.merge(_changes(spark, [("a", [9], 1, "FB", "U"), ("b", None, None, None, "D"),
                             ("c", [7, 7], 2, "MGI", "U")]), "1:0")
    rows = {r["doc_id"]: r.asDict() for r in t.read().collect()}
    assert set(rows) == {"a", "c"}
    assert rows["a"]["tokens"] == [9] and rows["a"]["n_tok"] == 1
    assert rows["c"]["tokens"] == [7, 7]


def test_exactly_once_skip(spark, tmproot):
    t = _mk(spark, tmproot)
    r1 = t.merge(_changes(spark, [("a", [1], 1, "FB", "U")]), "0:0")
    assert not r1["skipped"]
    r2 = t.merge(_changes(spark, [("a", [999], 1, "FB", "U")]), "0:0")
    assert r2["skipped"]
    assert [r["tokens"] for r in t.read().collect()] == [[1]]
    # reload from disk sees the same applied epoch set
    t2 = LakeTable.load(spark, t.root)
    assert "0:0" in t2.applied_epochs()


def test_copy_on_write_touches_only_changed_buckets(spark, tmproot):
    t = _mk(spark, tmproot, n_buckets=8)
    many = [(f"d{i}", [i], 1, "FB", "U") for i in range(100)]
    t.merge(_changes(spark, many), "0:0")
    before = dict(t._m["buckets"])
    r = t.merge(_changes(spark, [("d1", [42], 1, "FB", "U")]), "1:0")
    assert len(r["buckets_touched"]) == 1
    after = t._m["buckets"]
    unchanged = [b for b in after if int(b) not in r["buckets_touched"]]
    assert unchanged and all(after[b] == before[b] for b in unchanged)
    assert t.read().count() == 100


def test_schema_evolution_metadata_only(spark, tmproot):
    t = _mk(spark, tmproot)
    t.merge(_changes(spark, [("a", [1], 1, "FB", "U")]), "0:0")
    files_before = sorted(f["path"] for fs in t._m["buckets"].values() for f in fs)
    t.add_column("lang", "string", src_field="lang", epoch_key="1:0")
    t.rename_column("source", "origin", epoch_key="1:1")
    t.widen_column("n_tok", "bigint", epoch_key="1:2")
    files_after = sorted(f["path"] for fs in t._m["buckets"].values() for f in fs)
    assert files_before == files_after  # no data rewrite
    df = t.read()
    assert df.columns == ["doc_id", "tokens", "n_tok", "origin", "lang"]
    assert dict(df.dtypes)["n_tok"] == "bigint"
    row = df.collect()[0]
    assert row["origin"] == "FB" and row["lang"] is None and row["n_tok"] == 1
    # evolution commits are idempotent under epoch_key too
    assert t.add_column("x", "int", epoch_key="1:0")["skipped"]


def test_widen_rejects_narrowing(spark, tmproot):
    t = _mk(spark, tmproot)
    with pytest.raises(ValueError):
        t.widen_column("doc_id", "int")


def test_merge_after_rename_routes_by_src_field(spark, tmproot):
    t = _mk(spark, tmproot)
    t.merge(_changes(spark, [("a", [1], 1, "FB", "U")]), "0:0")
    t.rename_column("source", "origin", epoch_key="0:1")
    ch = _changes(spark, [("b", [2], 1, "WB", "U")]).withColumnRenamed("source", "origin")
    t.merge(ch, "1:0")
    got = {r["doc_id"]: r["origin"] for r in t.read().collect()}
    assert got == {"a": "FB", "b": "WB"}


def test_insert_if_absent_mode(spark, tmproot):
    """First-writer-wins (reference default MERGE ON CREATE SET)."""
    t = _mk(spark, tmproot)
    t.merge(_changes(spark, [("a", [1], 1, "FB", "U")]), "0:0", mode="insert_if_absent")
    t.merge(_changes(spark, [("a", [999], 1, "WB", "U"), ("b", [2], 1, "WB", "U")]),
            "1:0", mode="insert_if_absent")
    rows = {r["doc_id"]: r.asDict() for r in t.read().collect()}
    assert rows["a"]["tokens"] == [1] and rows["a"]["source"] == "FB"  # first writer kept
    assert rows["b"]["tokens"] == [2]
    # deletes still apply in FWW mode (K7)
    t.merge(_changes(spark, [("a", None, None, None, "D")]), "2:0", mode="insert_if_absent")
    assert {r["doc_id"] for r in t.read().collect()} == {"b"}


def test_time_travel_and_lineage_lookup(spark, tmproot):
    t = _mk(spark, tmproot)
    t.merge(_changes(spark, [("a", [1], 1, "FB", "U")]), "0:0")
    sid1 = t.snapshot_id
    t.merge(_changes(spark, [("a", [2], 1, "FB", "U"), ("b", [3], 1, "WB", "U")]), "1:0")
    # current state
    assert {r["doc_id"]: r["tokens"] for r in t.read().collect()} == {"a": [2], "b": [3]}
    # as-of earlier snapshot
    old = t.at_snapshot(sid1)
    assert {r["doc_id"]: r["tokens"] for r in old.read().collect()} == {"a": [1]}
    # lineage: epoch -> snapshot
    assert t.snapshot_for_epoch("0:0") == sid1
    assert t.at_snapshot(t.snapshot_for_epoch("1:0")).read().count() == 2


def test_key_uniqueness_invariant(spark, tmproot):
    t = _mk(spark, tmproot)
    for e in range(3):
        t.merge(_changes(spark, [(f"d{i % 5}", [e], 1, "FB", "U") for i in range(5)]), f"{e}:0")
    dup = t.read().groupBy("doc_id").count().filter(F.col("count") > 1).count()
    assert dup == 0


def test_drop_column_metadata_only(spark, tmproot):
    t = _mk(spark, tmproot)
    t.merge(_changes(spark, [("a", [1, 2], 2, "FB", "U")]), "0:0")
    files_before = sorted(f["path"] for fs in t._m["buckets"].values() for f in fs)
    t.drop_column("source", epoch_key="1:0")
    assert sorted(f["path"] for fs in t._m["buckets"].values() for f in fs) == files_before
    df = t.read()
    assert df.columns == ["doc_id", "tokens", "n_tok"]
    assert df.collect()[0]["tokens"] == [1, 2]
    # dropping the merge key or a missing column is rejected
    with pytest.raises(ValueError):
        t.drop_column("doc_id")
    with pytest.raises(ValueError):
        t.drop_column("nope")
    # a later re-add under the SAME name gets a NEW field id: old files
    # must NOT leak their dropped values into the reborn column
    t.add_column("source", "string", src_field="source", epoch_key="2:0")
    assert t.read().collect()[0]["source"] is None


def test_update_only_mode_jvm_sink(spark, tmproot):
    """K6: matched-only patch — absent keys must NOT be inserted."""
    t = _mk(spark, tmproot)
    t.merge(_changes(spark, [("a", [1], 1, "FB", "U"), ("b", [2], 1, "WB", "U")]), "0:0")
    r = t.merge(
        _changes(spark, [("a", [9], 1, "FB", "U"),      # matched -> patched
                         ("ghost", [5], 1, "ZFIN", "U"),  # absent -> dropped
                         ("b", None, None, None, "D")]),  # matched delete applies
        "1:0", mode="update_only",
    )
    assert not r["skipped"]
    rows = {x["doc_id"]: x.asDict() for x in t.read().collect()}
    assert set(rows) == {"a"}
    assert rows["a"]["tokens"] == [9]


def test_update_only_mode_arrow_sink(spark, tmproot):
    t = _mk(spark, tmproot)

    def _ch(rows):
        return spark.createDataFrame(
            rows,
            "doc_id string, tokens array<int>, n_tok int, source string,"
            " __op string, event_lsn long",
        )

    t.merge_arrow(_ch([("a", [1], 1, "FB", "U", 1), ("b", [2], 1, "WB", "U", 2)]),
                  "0:0", lsn_col="event_lsn")
    t.merge_arrow(
        _ch([("a", [9], 1, "FB", "U", 10),
             ("ghost", [5], 1, "ZFIN", "U", 11),
             ("b", None, None, None, "D", 12)]),
        "1:0", lsn_col="event_lsn", mode="update_only",
    )
    rows = {x["doc_id"]: x.asDict() for x in t.read().collect()}
    assert set(rows) == {"a"}
    assert rows["a"]["tokens"] == [9]
    with pytest.raises(ValueError, match="unknown merge mode"):
        t.merge_arrow(_ch([]), "2:0", lsn_col="event_lsn", mode="nope")


def test_delete_where_predicate(spark, tmproot):
    """K7: predicate-conditional delete — epoch-keyed, bucket-COW,
    NULL-predicate rows kept (three-valued logic)."""
    t = _mk(spark, tmproot, n_buckets=8)
    rows = [(f"d{i}", [i], i % 5, "FB" if i % 2 else "WB", "U") for i in range(40)]
    rows.append(("dnull", [0], None, "FB", "U"))  # n_tok NULL -> predicate NULL
    t.merge(_changes(spark, rows), "0:0")
    before_buckets = dict(t._m["buckets"])

    r = t.delete_where("n_tok = 0 AND source = 'WB'", epoch_key="1:0")
    assert not r["skipped"]
    expect_deleted = {f"d{i}" for i in range(40) if i % 5 == 0 and i % 2 == 0}
    assert r["n_deletes"] == len(expect_deleted)
    left = {x["doc_id"] for x in t.read().collect()}
    assert left == ({f"d{i}" for i in range(40)} | {"dnull"}) - expect_deleted
    assert "dnull" in left, "NULL predicate must keep the row"
    # only buckets containing matches were rewritten
    untouched = [b for b in t._m["buckets"] if int(b) not in r["buckets_touched"]]
    assert untouched and all(t._m["buckets"][b] == before_buckets[b] for b in untouched)
    # exactly-once: same epoch key is a no-op
    assert t.delete_where("true", epoch_key="1:0")["skipped"]
    # no matches -> noop commit, state intact
    r2 = t.delete_where("source = 'NOPE'", epoch_key="2:0")
    assert r2["n_deletes"] == 0 and t.read().count() == len(left)


def test_audit_changes_dry_run(spark, tmproot):
    """K11: changeset classification without commit; state untouched."""
    t = _mk(spark, tmproot)
    t.merge(_changes(spark, [("a", [1], 1, "FB", "U"), ("b", [2], 1, "WB", "U")]), "0:0")
    sid = t.snapshot_id
    audit = t.audit_changes(
        _changes(spark, [("a", [9], 1, "FB", "U"),     # update
                         ("c", [3], 1, "MGI", "U"),    # insert
                         ("b", None, None, None, "D"),  # delete
                         ("zz", None, None, None, "D")]),  # delete_absent
        audit_path=tmproot + "/audit",
    )
    got = {r["doc_id"]: r["action"] for r in audit.collect()}
    assert got == {"a": "update", "c": "insert", "b": "delete", "zz": "delete_absent"}
    # nothing committed
    assert t.snapshot_id == sid
    assert {r["doc_id"] for r in t.read().collect()} == {"a", "b"}
    # audit parquet persisted for offline review
    assert spark.read.parquet(tmproot + "/audit").count() == 4


def test_arrow_and_pandas_folds_equal(spark, tmproot, monkeypatch):
    """The applyInArrow fold and the pandas fold must produce identical
    table state and manifests for the same change stream: re-delivered
    (key, lsn) duplicates, interleaved deletes, winner-by-max-lsn,
    empty buckets, and a schema-evolved old-schema state file."""

    def _ch(rows):
        return spark.createDataFrame(
            rows,
            "doc_id string, tokens array<int>, n_tok int, source string,"
            " __op string, event_lsn long",
        )

    batches = [
        # seed state incl. a doc that later gets deleted
        [("a", [1, 2], 2, "FB", "U", 1), ("b", [3], 1, "WB", "U", 2),
         ("c", [4], 1, "MGI", "U", 3)],
        # re-delivery of (a, 10) + out-of-order older event + delete
        [("a", [9], 1, "FB", "U", 10), ("a", [9], 1, "FB", "U", 10),
         ("a", [8], 1, "FB", "U", 5), ("b", None, None, None, "D", 11),
         ("d", [6, 6], 2, "ZFIN", "U", 12)],
    ]

    states, metas = [], []
    for engine in ("arrow", "pandas"):
        monkeypatch.setenv("SPARK_GRAFT_FOLD", engine)
        t = LakeTable.create(spark, f"{tmproot}/{engine}", COLS,
                             key="doc_id", n_buckets=4)
        m = []
        for i, rows in enumerate(batches):
            m.append(t.merge_arrow(_ch(rows), f"{i}:0", lsn_col="event_lsn"))
        # schema evolution between merges: old-schema file projection
        t.add_column("lang", "string", src_field="lang")
        m.append(t.merge_arrow(
            spark.createDataFrame(
                [("c", [4, 4], 2, "MGI", "en", "U", 20)],
                "doc_id string, tokens array<int>, n_tok int, source string,"
                " lang string, __op string, event_lsn long",
            ),
            "2:0", lsn_col="event_lsn",
        ))
        states.append({r["doc_id"]: r.asDict() for r in t.read().collect()})
        metas.append([{k: v for k, v in r.items()
                       if k not in ("snapshot_id", "sec_job")}
                      for r in m])

    assert states[0] == states[1]
    assert states[0]["a"]["tokens"] == [9]          # max-lsn wins, dup collapsed
    assert "b" not in states[0]                      # delete applied
    assert states[0]["d"]["lang"] is None            # evolved col null-filled
    assert states[0]["c"]["lang"] == "en"
    assert metas[0] == metas[1]                      # upsert/delete/lineage counts


def test_evolve_lineage_in_side_log_and_commit_order(spark, tmproot):
    """Evolve commits route lineage through _lineage.jsonl like every
    other commit path (r3 ADVICE): lineage() must come back in true
    commit order when evolves interleave with merges, and the manifest's
    legacy in-line list must stay empty (O(1) commit metadata)."""
    import json as _json
    import os as _os

    t = _mk(spark, tmproot)
    t.merge(_changes(spark, [("a", [1], 1, "FB", "U")]), "0:0")
    t.add_column("lang", "string", epoch_key="0:1")
    ch2 = spark.createDataFrame(
        [("b", [2], 1, "FB", "en", "U")],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "lang string, __op string")
    t.merge(ch2, "1:0")
    keys = [lin["epoch_key"] for lin in t.lineage()]
    assert keys == ["0:0", "0:1", "1:0"]
    assert t.snapshot_for_epoch("0:1") == 2
    # nothing accumulates inside the manifest itself
    assert t._m["lineage"] == []
    # every row lives in the side log
    with open(_os.path.join(t.root, "_lineage.jsonl")) as f:
        side = [_json.loads(line) for line in f if line.strip()]
    assert [r["epoch_key"] for r in side] == ["0:0", "0:1", "1:0"]
    assert side[1]["operation"] == "evolve"


def test_lineage_side_log_cache_invalidation(spark, tmproot):
    """The parsed side log is cached per (mtime, size); an append must
    invalidate it so readers never see stale lineage."""
    t = _mk(spark, tmproot)
    t.merge(_changes(spark, [("a", [1], 1, "FB", "U")]), "0:0")
    assert len(t.lineage()) == 1
    first = t._lineage_rows()
    assert t._lineage_rows() is first  # cache hit, same object
    t.merge(_changes(spark, [("b", [2], 1, "FB", "U")]), "1:0")
    assert [lin["epoch_key"] for lin in t.lineage()] == ["0:0", "1:0"]


def test_fold_partitions_sparse_cap(spark, tmproot):
    """CDC trickle regime: a tiny segment must not pay a full wave of
    Arrow round-trips. With 64 touched buckets and 100 rows the fold is
    one task; steady-state segments (>= cores x SPARSE_FOLD_ROWS rows)
    keep the one-balanced-wave plan unchanged."""
    t = _mk(spark, tmproot, n_buckets=64)
    cores = spark.sparkContext.defaultParallelism
    wave = t.fold_partitions(64, n_rows=cores * t.SPARSE_FOLD_ROWS)
    # sparse: capped by rows, not by wave
    assert t.fold_partitions(64, n_rows=100) == 1
    assert t.fold_partitions(64, n_rows=t.SPARSE_FOLD_ROWS * 3) == 3
    # steady state: unchanged full wave (bounded by touched buckets)
    assert wave == min(64, cores)
    # unknown row count: conservative, no cap applied
    assert t.fold_partitions(64) == min(64, cores)


def test_fold_partitions_sparse_cap_state_floor(spark, tmproot):
    """A trickle patch over a table whose buckets already CARRY state
    must keep the state rewrites parallel: each fold task re-reads and
    rewrites its buckets' existing files, so the cap is floored at
    ceil(state_buckets / per-task budget) even when the changeset is
    100 rows (the advice-flagged serialization regression)."""
    t = _mk(spark, tmproot, n_buckets=8)
    # seed every bucket with state
    t.merge(_changes(spark, [(f"d{i}", [i], 1, "FB", "U") for i in range(64)]),
            "0:0")
    n_state = sum(1 for f in t._m["buckets"].values() if f)
    assert n_state >= 7  # 64 keys over 8 buckets: all or nearly all carry state
    # 100-row trickle: floored by state buckets / budget (2), not 1 task
    assert t.fold_partitions(8, n_rows=100) == -(-n_state // 2)
    # fresh table (no state): the pure-sparse cap still collapses to 1
    t2 = _mk(spark, tmproot + "/fresh", n_buckets=8)
    assert t2.fold_partitions(8, n_rows=100) == 1
