"""LakeTable — Iceberg-semantics keyed table on hash-bucketed parquet.

The sandbox has no Iceberg runtime jars, so the engine keeps the sink
behind this thin table abstraction (SURVEY.md §7.0): snapshot manifests +
copy-on-write ``merge`` give the same externally observable semantics as
``MERGE INTO ... ON t.key = s.key`` against an Iceberg table partitioned
by ``bucket(N, key)``. On a cluster with Iceberg available, ``merge``
maps 1:1 onto Iceberg's MERGE and the manifest collapses into snapshot
summary properties.

Reference semantics re-expressed here (SURVEY.md §2.2):
- node-label uniqueness constraints (src/etl/helpers/neo4j_helper.py:59-126)
  -> declared merge key; every commit preserves key uniqueness;
- `MERGE ... ON CREATE SET` / `SET` / `DETACH DELETE`
  (src/etl/bgi_etl.py:99-115, src/etl/allele_etl.py:142-144,
  src/etl/disease_etl.py:238-248) -> a single upsert/delete changeset per
  micro-batch, routed by an ``__op`` column;
- `LOAD CSV ... IN TRANSACTIONS of 10000 ROWS` batched commits
  (src/etl/bgi_etl.py:91-117) -> one atomic snapshot per micro-batch;
- the unbounded requeue-retry sink (src/transactors/neo4j_transactor.py:108-118)
  -> exactly-once: each commit carries an ``epoch_key``; re-applying an
  already-committed epoch is a metadata no-op (idempotent commit
  manifest, BASELINE.json north_rule);
- pre-created constraints/indexes (src/aggregate_loader.py:254-256) ->
  the bucket spec declared at table create time.

Scale design (the part that must hold at 10^10 events / 100 TB):
- state is bucketed by ``pmod(xxhash64(key), n_buckets)``; a micro-batch
  rewrites ONLY the buckets its keys hash into (copy-on-write at bucket
  granularity), so merge cost is O(touched state) not O(total state);
- the anti-join that drops overwritten rows joins per-bucket data that is
  already co-partitioned by the same hash function — on a real cluster
  with Iceberg bucket transforms this is a storage-partitioned join with
  no shuffle of the big side; here Spark shuffles both sides but each
  bucket's data is bounded (state_size / n_buckets);
- schema evolution is metadata-only (field-id mapping, no data rewrite),
  exactly like Iceberg: old files are read through a projection that
  renames/casts/nulls by field id.

Single-writer per table is assumed (the runner is a sequential epoch
loop; the reference's analog is its hard group barriers,
src/aggregate_loader.py:188-219).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import ddl_to_type

OP_COL = "__op"
BUCKET_COL = "__bucket"
LINEAGE_LOG = "_lineage.jsonl"


def _resolve_lineage(lineage: dict | None) -> dict:
    """Callers may pass deferred lineage values (zero-arg callables, e.g.
    an ``Observation`` read) that are only valid AFTER the commit's write
    action ran — resolve them here, at the post-action lineage build."""
    return {k: (v() if callable(v) else v) for k, v in (lineage or {}).items()}


@dataclass
class ColumnSpec:
    id: int
    name: str
    type: str  # spark DDL string
    src_field: str | None = None  # event payload field feeding this column

    def to_json(self) -> dict:
        return {"id": self.id, "name": self.name, "type": self.type, "src_field": self.src_field}

    @staticmethod
    def from_json(d: dict) -> "ColumnSpec":
        return ColumnSpec(d["id"], d["name"], d["type"], d.get("src_field"))


def _atomic_write(path: str, text: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class LakeTable:
    def __init__(self, spark: SparkSession, root: str, manifest: dict):
        self.spark = spark
        self.root = root
        self._m = manifest

    # ------------------------------------------------------------------ DDL
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        columns: Sequence[tuple[str, str, str | None]],
        key: str,
        n_buckets: int = 32,
        if_not_exists: bool = False,
    ) -> "LakeTable":
        """columns: (name, ddl_type, src_field). Analog of the up-front
        constraint/index DDL (src/etl/helpers/neo4j_helper.py:54-196):
        declare the merge key + bucket layout before any load."""
        if os.path.exists(os.path.join(root, "_current")):
            if if_not_exists:
                return cls.load(spark, root)
            raise FileExistsError(root)
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        specs = [ColumnSpec(i + 1, n, t, s) for i, (n, t, s) in enumerate(columns)]
        names = [c.name for c in specs]
        if key not in names:
            raise ValueError(f"merge key {key!r} not among columns {names}")
        manifest = {
            "snapshot_id": 0,
            "parent": None,
            "epoch_key": None,
            "operation": "create",
            "key": key,
            "n_buckets": n_buckets,
            "next_field_id": len(specs) + 1,
            "schema_version": 0,
            "schema_versions": {"0": [c.to_json() for c in specs]},
            "buckets": {},
            "applied_epochs": [],
            "lineage": [],
        }
        t = cls(spark, root, manifest)
        t._commit(manifest)
        return t

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeTable":
        with open(os.path.join(root, "_current")) as f:
            sid = int(f.read().strip())
        with open(os.path.join(root, "snapshots", f"{sid}.json")) as f:
            return cls(spark, root, json.load(f))

    # ------------------------------------------------------------- metadata
    @property
    def key(self) -> str:
        return self._m["key"]

    @property
    def n_buckets(self) -> int:
        return self._m["n_buckets"]

    @property
    def snapshot_id(self) -> int:
        return self._m["snapshot_id"]

    def columns(self, version: int | None = None) -> list[ColumnSpec]:
        v = self._m["schema_version"] if version is None else version
        return [ColumnSpec.from_json(d) for d in self._m["schema_versions"][str(v)]]

    def spark_schema(self):
        from pyspark.sql import types as T

        return T.StructType(
            [T.StructField(c.name, ddl_to_type(c.type)) for c in self.columns()]
        )

    def applied_epochs(self) -> set[str]:
        return set(self._m["applied_epochs"])

    def lineage(self) -> list[dict]:
        """Per-commit lineage rows (source offsets -> snapshot id), in
        commit order.

        Lineage lives in an APPEND-ONLY side log (`_lineage.jsonl`),
        not inside the snapshot manifest: a manifest that embeds its
        full lineage history makes every commit write O(history) bytes
        — quadratic over a replay, ruinous at 10^10 events with
        thousands of commits (Iceberg keeps snapshot history out of
        the table metadata's hot path the same way). Rows are appended
        BEFORE the manifest pointer flips, so a crash between the two
        leaves an orphan row for a never-committed snapshot; readers
        drop rows with snapshot_id > current, and a retried commit
        re-appends under the SAME snapshot id (epoch replay is ordered,
        so the retried epoch gets the same parent snapshot) — last
        occurrence wins. Rows from the manifest's legacy in-line list
        (pre-side-log tables) are kept for compatibility."""
        out = list(self._m["lineage"])
        cur = self.snapshot_id
        by_sid: dict[int, dict] = {}
        order: list[int] = []
        for d in self._lineage_rows():
            sid = d.get("snapshot_id")
            if sid is None or int(sid) > cur:
                continue  # crash orphan: appended, never committed
            sid = int(sid)
            if sid not in by_sid:
                order.append(sid)
            by_sid[sid] = d
        out.extend(by_sid[s] for s in order)
        return out

    def completed_epochs(self) -> set[int]:
        """Epochs whose FINAL segment committed — the replay runner stamps
        ``epoch_final`` into the last data segment's lineage row, and its
        resume fast path prunes these epochs from the planning scan (the
        binlog's epoch partitions are immutable once fully applied)."""
        out: set[int] = set()
        for r in self.lineage():
            k = r.get("epoch_key")
            if r.get("epoch_final") and k:
                try:
                    out.add(int(str(k).split(":", 1)[0]))
                except ValueError:
                    pass
        return out

    def _lineage_rows(self) -> list[dict]:
        """Raw parsed side-log rows, cached per (mtime_ns, size): a caller
        looping snapshot_for_epoch over thousands of epochs would
        otherwise re-open and re-json-parse the whole log per lookup —
        O(commits²) IO over a replay's worth of commits. The stat
        signature invalidates on every append (our own or a concurrent
        writer's)."""
        path = os.path.join(self.root, LINEAGE_LOG)
        try:
            st = os.stat(path)
        except FileNotFoundError:
            return []
        sig = (st.st_mtime_ns, st.st_size)
        cached = getattr(self, "_lineage_cache", None)
        if cached is not None and cached[0] == sig:
            return cached[1]
        rows = []
        with open(path) as f:
            for line in f:
                if line.strip():
                    rows.append(json.loads(line))
        self._lineage_cache = (sig, rows)
        return rows

    def _append_lineage(self, lin: dict) -> None:
        """Append one lineage row to the side log (fsync'd so the row is
        durable before the manifest commit that references it)."""
        with open(os.path.join(self.root, LINEAGE_LOG), "a") as f:
            f.write(json.dumps(lin, default=str) + "\n")
            f.flush()
            os.fsync(f.fileno())

    # ----------------------------------------------------------------- read
    def _bucket_expr(self, key_col):
        return F.pmod(F.xxhash64(key_col), F.lit(self.n_buckets)).cast("int")

    def read(self, buckets: Sequence[int] | None = None) -> DataFrame:
        """Current state under the current schema. Old-schema files are
        projected by field id (rename/widen/null-fill) — metadata-only
        evolution, no rewrite (Iceberg-style). Buckets carrying MOR
        delta files (merge_delta) are LWW-resolved transparently — the
        classic merge-on-read cost, paid until compact() collapses
        them."""
        cur = self.columns()
        sel_buckets = self._m["buckets"]
        if buckets is not None:
            want = {str(b) for b in buckets}
            sel_buckets = {b: fs for b, fs in sel_buckets.items() if b in want}
        if any(fe.get("kind") == "delta" for fs in sel_buckets.values() for fe in fs):
            names = [c.name for c in cur]
            return (
                self._read_mor(sel_buckets, cur)
                .filter(F.col(OP_COL) == "U")
                .select(*names)
            )
        by_version: dict[int, list[str]] = {}
        for files in sel_buckets.values():
            for fe in files:
                by_version.setdefault(fe["schema_version"], []).append(
                    os.path.join(self.root, fe["path"])
                )
        frames = []
        for v, paths in by_version.items():
            old = {c.id: c for c in self.columns(v)}
            raw = self.spark.read.parquet(*paths)
            proj = []
            for c in cur:
                o = old.get(c.id)
                if o is None:
                    proj.append(F.lit(None).cast(c.type).alias(c.name))
                else:
                    proj.append(F.col(o.name).cast(c.type).alias(c.name))
            frames.append(raw.select(*proj))
        if not frames:
            return self.spark.createDataFrame([], self.spark_schema())
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf)
        return out

    def _read_mor(self, sel_buckets: dict, cur: list) -> DataFrame:
        """Merge-on-read resolution over base + delta files: one JVM-side
        max_by per key ordered by (__lsn, __seq) — base rows rank as
        (-1, -1), so any delta event beats them, later commits break
        (key, lsn) ties. Returns current columns + __op + __lsn
        (tombstone winners INCLUDED — callers filter or compact them).
        One extra hash shuffle vs the base-only read: the standard MOR
        read amplification that compact() amortizes away."""
        from .arrow_merge import DELTA_LSN, DELTA_SEQ

        by_group: dict[tuple[int, str], list[str]] = {}
        for files in sel_buckets.values():
            for fe in files:
                by_group.setdefault(
                    (fe["schema_version"], fe.get("kind", "base")), []
                ).append(os.path.join(self.root, fe["path"]))
        names = [c.name for c in cur]
        frames = []
        for (v, kind), paths in sorted(by_group.items()):
            old = {c.id: c for c in self.columns(v)}
            raw = self.spark.read.parquet(*paths)
            proj = []
            for c in cur:
                o = old.get(c.id)
                if o is None:
                    proj.append(F.lit(None).cast(c.type).alias(c.name))
                else:
                    proj.append(F.col(o.name).cast(c.type).alias(c.name))
            if kind == "delta":
                proj += [F.col(OP_COL), F.col(DELTA_LSN), F.col(DELTA_SEQ)]
            else:
                proj += [
                    F.lit("U").alias(OP_COL),
                    F.lit(-1).cast("long").alias(DELTA_LSN),
                    F.lit(-1).cast("long").alias(DELTA_SEQ),
                ]
            frames.append(raw.select(*proj))
        if not frames:
            schema = self.spark_schema().add(OP_COL, "string") \
                .add(DELTA_LSN, "long").add(DELTA_SEQ, "long")
            empty = self.spark.createDataFrame([], schema)
            return empty.drop(DELTA_SEQ)
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf)
        val = F.struct(*[F.col(n) for n in names], F.col(OP_COL), F.col(DELTA_LSN))
        order = F.struct(F.col(DELTA_LSN), F.col(DELTA_SEQ))
        return (
            out.groupBy(self.key)
            .agg(F.max_by(val, order).alias("__w"))
            .select("__w.*")
        )

    # ---------------------------------------------------------------- merge
    def merge(
        self,
        changes: DataFrame,
        epoch_key: str,
        lineage: dict | None = None,
        touched_buckets: Sequence[int] | None = None,
        mode: str = "lww",  # "lww" | "insert_if_absent" | "update_only"
    ) -> dict:
        """Apply one micro-batch changeset atomically, exactly once.

        ``changes`` must have one row per key (the LWW reduce guarantees
        this — Iceberg likewise rejects duplicate source keys in MERGE)
        with columns = current table columns + ``__op`` in {'U','D'}.
        'U' upserts the row (insert-or-overwrite = MERGE WHEN MATCHED
        UPDATE SET * / WHEN NOT MATCHED INSERT *); 'D' deletes the key.

        Only buckets containing changed keys are rewritten; all other
        buckets carry forward by manifest reference. The merge itself is
        ONE full-outer join between the touched state and the changeset
        (the changeset subtree is referenced exactly once, so its
        dedup/LWW shuffles run once, with op metrics collected by
        observe() during the same action — 2 Spark jobs per micro-batch
        including the caller's stats pass). ``touched_buckets`` lets the
        caller supply the bucket set from a stats pass it already ran.
        """
        from pyspark.sql import Observation

        if mode not in ("lww", "insert_if_absent", "update_only"):
            raise ValueError(f"unknown merge mode {mode!r}")
        if epoch_key in self.applied_epochs():
            return {"skipped": True, "epoch_key": epoch_key, "snapshot_id": self.snapshot_id}

        cur = self.columns()
        changes = changes.select(
            *[F.col(c.name).cast(c.type).alias(c.name) for c in cur], F.col(OP_COL)
        )
        if touched_buckets is None:
            touched_buckets = [
                r[0]
                for r in changes.select(
                    self._bucket_expr(F.col(self.key)).alias("b")
                ).distinct().collect()
            ]
        touched = sorted(int(b) for b in touched_buckets)
        if not touched:
            return self._commit_noop(epoch_key, lineage)

        obs = Observation()
        changes = changes.observe(
            obs,
            F.sum(F.when(F.col(OP_COL) == "U", 1).otherwise(0)).alias("n_upserts"),
            F.sum(F.when(F.col(OP_COL) == "D", 1).otherwise(0)).alias("n_deletes"),
        )
        s = changes.select(
            F.col(self.key).alias("__s_key"),
            F.col(OP_COL),
            *[F.col(c.name).alias(f"__s_{c.name}") for c in cur if c.name != self.key],
        )
        existing = self.read(buckets=touched)
        joined = existing.join(s, existing[self.key] == s["__s_key"], "full_outer")
        # row survives unless its latest op is a delete; in 'lww' mode a
        # changed row takes the source payload (MERGE WHEN MATCHED UPDATE
        # SET *, src/etl/allele_etl.py:142-144); in 'insert_if_absent'
        # mode the existing payload wins (the reference's default
        # MERGE ... ON CREATE SET, src/etl/bgi_etl.py:99-115 — first
        # writer wins, later re-sends are no-ops)
        if mode == "insert_if_absent":
            def pick(c):
                return (F.when(F.col(self.key).isNotNull(), F.col(c.name))
                        .otherwise(F.col(f"__s_{c.name}")).alias(c.name))
        else:
            def pick(c):
                return (F.when(F.col(OP_COL).isNull(), F.col(c.name))
                        .otherwise(F.col(f"__s_{c.name}")).alias(c.name))
        keep = F.col(OP_COL).isNull() | (F.col(OP_COL) == "U")
        if mode == "update_only":
            # matched-only patch (MERGE WHEN MATCHED UPDATE, no insert
            # branch — the reference's `MATCH (e {primaryKey}) SET ...`,
            # src/etl/ecomap_etl.py:22-30): source rows whose key is
            # absent from the table are dropped, not inserted
            keep = keep & F.col(self.key).isNotNull()
        merged = joined.filter(keep).select(
            F.coalesce(F.col(self.key), F.col("__s_key")).alias(self.key),
            *[pick(c) for c in cur if c.name != self.key],
        ).select(*[c.name for c in cur])
        new_state = merged.withColumn(BUCKET_COL, self._bucket_expr(F.col(self.key)))

        new_sid = self.snapshot_id + 1
        stage_rel = os.path.join("data", str(new_sid))
        stage = os.path.join(self.root, stage_rel)
        # one write task per touched bucket: bounded files, co-located keys
        new_state.repartition(max(len(touched), 1), F.col(BUCKET_COL)).write.partitionBy(
            BUCKET_COL
        ).mode("overwrite").parquet(stage)
        op_stats = obs.get

        sv = self._m["schema_version"]
        new_buckets = dict(self._m["buckets"])
        for b in touched:
            bdir = os.path.join(stage, f"{BUCKET_COL}={b}")
            files = []
            if os.path.isdir(bdir):
                files = [
                    {
                        "path": os.path.join(stage_rel, f"{BUCKET_COL}={b}", fn),
                        "schema_version": sv,
                    }
                    for fn in sorted(os.listdir(bdir))
                    if fn.endswith(".parquet")
                ]
            new_buckets[str(b)] = files

        lin = _resolve_lineage(lineage)
        lin.update(
            {
                "epoch_key": epoch_key,
                "snapshot_id": new_sid,
                "n_upserts": int(op_stats.get("n_upserts") or 0),
                "n_deletes": int(op_stats.get("n_deletes") or 0),
                "buckets_touched": touched,
            }
        )
        m = self._child_manifest(new_sid, "merge", epoch_key)
        m["buckets"] = new_buckets
        self._append_lineage(lin)
        self._commit(m)
        self._m = m
        return {"skipped": False, **lin}

    # per-fold-task row budget: keeps the applyInPandas task's pandas
    # working set bounded (~a few hundred MB) independent of commit
    # interval, so large segments amortize the per-commit floor WITHOUT
    # spilling small executors (the 12M-event-epoch spill in
    # BENCH/BASELINE.md). Beyond n_buckets tasks the unit of fold
    # granularity is exhausted — at that point the production knob is a
    # larger n_buckets, not more partitions.
    ROWS_PER_FOLD_TASK = 600_000
    # minimum rows to justify an extra fold task on sparse segments (each
    # task costs a python-worker round-trip + a parquet open/write)
    SPARSE_FOLD_ROWS = 1024

    def fold_partitions(self, n_touched: int, n_rows: int | None = None) -> int:
        """Fold task granularity: one wave of cores (wave_mult x cores;
        default 1) bumped so per-task rows stay under ROWS_PER_FOLD_TASK
        (spill-aware), but never more than the touched-bucket count (each
        extra task is an Arrow round-trip). Default 1: with the BALANCED
        bucket->partition placement below every partition carries an
        equal bucket count, so the straggler insurance extra waves used
        to buy is gone while their per-task fixed cost (python worker
        round-trip + a parquet open/write per task) remains — measured
        interleaved at local[32]/64 buckets/4M events: wave_mult 1 walls
        [17.3, 16.6, 14.6] vs wave_mult 4 [20.4, 18.4, 17.5], a ~10% win,
        3/3 adjacent pairs (BENCH/BASELINE.md round-4 fold-wave note).
        bench.py re-verifies with a wave_mult=4 probe rep every run.
        Hot-BUCKET skew (not hot keys — those hash-spread) is the case
        extra waves still help; env-tunable for that and for
        measurement."""
        import os

        cores = self.spark.sparkContext.defaultParallelism
        want = int(os.environ.get("SPARK_FOLD_WAVE_MULT", "1")) * cores
        if n_rows:
            want = max(want, -(-int(n_rows) // self.ROWS_PER_FOLD_TASK))
            # sparse cap (CDC trickle regime): when the whole segment is
            # smaller than one wave's worth of minimum-sized tasks, a
            # full wave is pure fixed cost — e.g. a 100-row update-only
            # patch paying 32 python-worker round-trips + 32 parquet
            # opens. Cap tasks at ~SPARSE_FOLD_ROWS rows each so tiny
            # segments fold in O(1) tasks. A segment with at least
            # SPARSE_FOLD_ROWS rows per task of the full wave (wave_mult
            # included, since sparse >= want disables the cap) keeps its
            # steady-state plan. The cap is FLOORED by the table's
            # state-carrying buckets: each fold task also rewrites its
            # buckets' existing files, so collapsing a 100-row trickle
            # over a LARGE table into one task would serialize up to
            # n_buckets full state rewrites — the changeset being tiny
            # says nothing about the state volume. Buckets-with-state
            # comes straight from the manifest; the per-task rewrite
            # budget is env-tunable.
            sparse = -(-int(n_rows) // self.SPARSE_FOLD_ROWS)
            if sparse < want:
                per_task = max(1, int(os.environ.get(
                    "SPARK_SPARSE_FOLD_BUCKETS_PER_TASK", "2")))
                n_state = sum(1 for f in self._m["buckets"].values() if f)
                state_floor = -(-min(n_state, n_touched) // per_task)
                want = min(want, max(sparse, state_floor))
        return max(1, min(n_touched, want))

    def _partition_salts(self, p: int) -> list[int] | None:
        """For each shuffle partition i in [0, p): an int value v with
        pmod(murmur3(v), p) == i. Spark's DataFrame repartition cannot
        place by value directly — HashPartitioning re-hashes the
        expression — so we probe Spark's own hash once (tiny driver-side
        job, cached per (session, p)) and salt through it. Lets the fold
        put EXACTLY ceil(touched/p) buckets in every partition instead
        of the ~2x spread of hashing 64 small distinct keys, which was
        the fold stage's wave-tail at high parallelism."""
        cache = getattr(self, "_salt_cache", None)
        if cache is not None and cache[0] == p:
            return cache[1]
        need = p
        found: dict[int, int] = {}
        probe = 0
        while len(found) < need and probe < 64 * p:
            batch = list(range(probe, probe + 8 * p))
            probe += 8 * p
            rows = self.spark.createDataFrame(
                [(v,) for v in batch], "v int"
            ).select("v", F.pmod(F.hash(F.col("v")), F.lit(p)).alias("t")).collect()
            for r in rows:
                found.setdefault(int(r["t"]), int(r["v"]))
        if len(found) < need:
            # Probe budget exhausted (astronomically unlikely for murmur3
            # over 64p consecutive ints, but fail loud-and-clear rather
            # than with an opaque KeyError mid-merge). Caller falls back
            # to the plain bucket-hash repartition.
            self._salt_cache = (p, None)
            return None
        salts = [found[i] for i in range(p)]
        self._salt_cache = (p, salts)
        return salts

    def balanced_fold_repartition(
        self, df: DataFrame, n_touched: int, n_rows: int | None = None
    ) -> DataFrame:
        """Repartition a prepared changeset for the bucket fold with a
        BALANCED bucket->partition assignment: bucket b goes to partition
        b % p (via the salt probe above), so fold waves have no
        straggler partitions carrying 2-3x the buckets of others."""
        p = self.fold_partitions(n_touched, n_rows)
        if p <= 1:
            return df.repartition(1)
        salts = self._partition_salts(p)
        if salts is None:  # probe exhausted: plain bucket-hash placement
            return df.repartition(p, F.col(BUCKET_COL))
        by_bucket = F.array(*[F.lit(salts[b % p]) for b in range(self.n_buckets)])
        # __pk is kept as a COLUMN and later leads the fold's groupBy:
        # HashPartitioning([__pk]) then satisfies ClusteredDistribution(
        # [__pk, bucket]) — same one-shuffle plan, balanced placement.
        return df.withColumn("__pk", F.element_at(by_bucket, F.col(BUCKET_COL) + 1)) \
                 .repartition(p, F.col("__pk"))

    def prepare_changes(self, changes: DataFrame, lsn_col: str, n_touched: int,
                        n_rows: int | None = None) -> DataFrame:
        """Stage-1 of the arrow merge as a standalone frame: cast to the
        current schema, add the bucket column, repartition for the fold.
        Used by the runner to PIPELINE the next micro-batch's scan+shuffle
        under the current micro-batch's fold (persist + materialize on a
        second thread; pure compute, no commit, so exactly-once is
        untouched)."""
        cur = self.columns()
        prepared = changes.select(
            *[F.col(c.name).cast(c.type).alias(c.name) for c in cur],
            F.col(OP_COL),
            F.col(lsn_col).cast("long").alias(lsn_col),
        ).withColumn(BUCKET_COL, self._bucket_expr(F.col(self.key)))
        return prepared.repartition(
            self.fold_partitions(n_touched, n_rows), F.col(BUCKET_COL)
        )

    def merge_arrow(
        self,
        changes: DataFrame,
        epoch_key: str,
        lsn_col: str,
        lineage: dict | None = None,
        touched_buckets: Sequence[int] | None = None,
        prepared: bool = False,
        mode: str = "lww",  # "lww" | "update_only"
        replace_state: bool = False,
        precombined: bool = False,
    ) -> dict:
        """Two-stage Arrow-native merge (see lake/arrow_merge.py).

        ``changes`` carries current columns + ``__op`` + ``lsn_col`` and
        need NOT be pre-reduced: LWW (incl. re-delivery dedup) happens
        inside the bucket fold, so the caller's whole pipeline is
        scan -> project -> one shuffle -> fold/write. ``mode=
        'update_only'`` patches matched keys only (no insert branch).
        ``replace_state=True`` ignores the buckets' existing files and
        rewrites each touched bucket purely from ``changes`` — the
        compaction path, where ``changes`` IS the resolved state.
        ``precombined=True``: ``changes`` went through
        operators.dedup.precombine_lww (one winner row per key + exact
        counter columns) — requires ``prepared=True``; the fold reads
        the counters instead of re-deduping.
        """
        from .arrow_merge import (
            MANIFEST_SCHEMA,
            make_bucket_fold,
            make_bucket_fold_arrow,
        )

        if mode not in ("lww", "update_only"):
            raise ValueError(f"unknown merge mode {mode!r}")
        if precombined and not prepared:
            raise ValueError("precombined changesets must arrive prepared "
                             "(combine + repartition happen upstream)")
        if epoch_key in self.applied_epochs():
            return {"skipped": True, "epoch_key": epoch_key, "snapshot_id": self.snapshot_id}

        cur = self.columns()
        if touched_buckets is None:
            if not prepared:
                changes = self.prepare_changes(changes, lsn_col, self.n_buckets)
                prepared = True
            touched_buckets = [
                r[0] for r in changes.select(BUCKET_COL).distinct().collect()
            ]
        touched = sorted(int(b) for b in touched_buckets)
        if not touched:
            return self._commit_noop(epoch_key, lineage)
        if not prepared:
            changes = self.prepare_changes(changes, lsn_col, len(touched))

        new_sid = self.snapshot_id + 1
        stage_rel = os.path.join("data", str(new_sid))
        # fold engine: pandas (applyInPandas) is the measured default —
        # the applyInArrow variant (make_bucket_fold_arrow, payload never
        # converted to pandas) proved state+manifest-identical but ~5%
        # SLOWER on clean 48M-event replay legs (BENCH/ab_fold_*.jsonl:
        # pandas 153.6/168.8 s vs arrow 179.5/160.7 s, 4-exec) and at
        # parity in-process: bucket fold cost is dominated by parquet
        # IO, not by the pandas conversion. Kept selectable for
        # future shapes where payload boxing dominates (very wide or
        # deeply nested rows).
        use_arrow_fold = (
            os.environ.get("SPARK_GRAFT_FOLD", "pandas").lower() == "arrow"
        )
        make_fold = make_bucket_fold_arrow if use_arrow_fold else make_bucket_fold
        fold = make_fold(
            root=self.root,
            stage_rel=stage_rel,
            key=self.key,
            current=cur,
            schema_versions={
                int(v): [ColumnSpec.from_json(d) for d in cols]
                for v, cols in self._m["schema_versions"].items()
            },
            bucket_files={} if replace_state else {
                int(b): fs
                for b, fs in self._m["buckets"].items()
                if int(b) in set(touched)
            },
            op_col=OP_COL,
            lsn_col=lsn_col,
            bucket_col=BUCKET_COL,
            update_only=(mode == "update_only"),
            precombined=precombined,
        )
        # the prepared partitioning satisfies the groupBy's clustered
        # distribution (hash(bucket) directly, or hash(__pk) leading the
        # grouping for the balanced layout), so no second shuffle here.
        group_cols = (["__pk"] if "__pk" in changes.columns else []) + [BUCKET_COL]
        grouped = changes.groupBy(*group_cols)
        folded = (
            grouped.applyInArrow(fold, schema=MANIFEST_SCHEMA)
            if use_arrow_fold
            else grouped.applyInPandas(fold, schema=MANIFEST_SCHEMA)
        )
        _tj = time.monotonic()
        manifests = folded.collect()
        sec_job = round(time.monotonic() - _tj, 4)

        sv = self._m["schema_version"]
        new_buckets = dict(self._m["buckets"])
        n_upserts = n_deletes = n_dups = 0
        per_bucket = {}
        for r in manifests:
            files = []
            if r["path"] is not None:
                files = [{"path": r["path"], "schema_version": sv}]
            new_buckets[str(int(r["bucket"]))] = files
            n_upserts += int(r["n_upserts"])
            n_deletes += int(r["n_deletes"])
            n_dups += int(r["n_dups"])
            # per-partition lineage: source-offset range absorbed by this
            # bucket in this commit (north rule: offset -> snapshot id)
            per_bucket[str(int(r["bucket"]))] = {
                "min_lsn": int(r["min_lsn"]), "max_lsn": int(r["max_lsn"]),
            }

        lin = _resolve_lineage(lineage)
        # precombined changesets: the fold cannot see re-delivery
        # multiplicity (the map-local combine dropped the copies). The
        # runner either measured exact counts in its planning pass
        # (exact_counts=True -> n_upserts_exact / n_dups_exact overrides)
        # or sent approx counters plus the counters_precombined marker —
        # then the fold's dup sum is meaningless (always 0) and is
        # OMITTED rather than recorded as a false zero; n_upserts counts
        # APPLIED upserts (winner rows written), which the fold still
        # measures exactly (runner._apply_data_segment).
        exact_u = lin.pop("n_upserts_exact", None)
        exact_dups = lin.pop("n_dups_exact", None)
        pre_approx = bool(lin.pop("counters_precombined", False))
        lin.update(
            {
                "epoch_key": epoch_key,
                "snapshot_id": new_sid,
                "n_upserts": n_upserts if exact_u is None else int(exact_u),
                "n_deletes": n_deletes,
                # actual touched set (buckets that received rows), not the
                # caller's declared superset — fast-plan passes all buckets
                "buckets_touched": sorted(int(r["bucket"]) for r in manifests),
                "per_bucket_offsets": per_bucket,
            }
        )
        if not pre_approx or exact_dups is not None:
            # EXACT re-delivery dedup count, measured where the dedup
            # happens (the bucket fold), or — precombined exact mode —
            # in the runner's narrow planning pass
            lin["n_duplicates_dropped"] = (
                n_dups if exact_dups is None else int(exact_dups)
            )
        m = self._child_manifest(
            new_sid, "compact" if replace_state else "merge-arrow", epoch_key
        )
        m["buckets"] = new_buckets
        self._append_lineage(lin)
        self._commit(m)
        self._m = m
        # sec_job isolates the Spark job wall from the driver turn around
        # it (plan build + manifest bookkeeping) — the per-commit fixed
        # floor decomposition in BENCH/BASELINE.md reads these fields
        return {"skipped": False, "sec_job": sec_job, **lin}

    def merge_delta(
        self,
        changes: DataFrame,
        epoch_key: str,
        lsn_col: str,
        lineage: dict | None = None,
        touched_buckets: Sequence[int] | None = None,
        prepared: bool = False,
    ) -> dict:
        """Write-optimized MERGE-ON-READ commit (Hudi-MOR / Paimon-LSM
        analog; see arrow_merge.make_bucket_delta_fold): the micro-batch
        is LWW-reduced within itself and APPENDED as per-bucket delta
        files — existing state is never read, so ingest cost is
        O(batch) with zero read amplification and the sink scales as
        pure writes. read() resolves LWW across base+deltas by
        (__lsn, __seq); compact() collapses buckets back to base files.
        Same exactly-once manifest commit as merge_arrow."""
        from .arrow_merge import MANIFEST_SCHEMA, make_bucket_delta_fold

        if epoch_key in self.applied_epochs():
            return {"skipped": True, "epoch_key": epoch_key,
                    "snapshot_id": self.snapshot_id}
        cur = self.columns()
        if touched_buckets is None:
            if not prepared:
                changes = self.prepare_changes(changes, lsn_col, self.n_buckets)
                prepared = True
            touched_buckets = [
                r[0] for r in changes.select(BUCKET_COL).distinct().collect()
            ]
        touched = sorted(int(b) for b in touched_buckets)
        if not touched:
            return self._commit_noop(epoch_key, lineage)
        if not prepared:
            changes = self.prepare_changes(changes, lsn_col, len(touched))

        new_sid = self.snapshot_id + 1
        stage_rel = os.path.join("data", str(new_sid))
        fold = make_bucket_delta_fold(
            root=self.root, stage_rel=stage_rel, key=self.key, current=cur,
            op_col=OP_COL, lsn_col=lsn_col, bucket_col=BUCKET_COL, seq=new_sid,
        )
        group_cols = (["__pk"] if "__pk" in changes.columns else []) + [BUCKET_COL]
        manifests = (
            changes.groupBy(*group_cols)
            .applyInPandas(fold, schema=MANIFEST_SCHEMA)
            .collect()
        )

        sv = self._m["schema_version"]
        new_buckets = dict(self._m["buckets"])
        n_upserts = n_deletes = n_dups = 0
        per_bucket = {}
        for r in manifests:
            b = str(int(r["bucket"]))
            if r["path"] is not None:
                new_buckets[b] = list(new_buckets.get(b, [])) + [
                    {"path": r["path"], "schema_version": sv,
                     "kind": "delta", "seq": new_sid}
                ]
            n_upserts += int(r["n_upserts"])
            n_deletes += int(r["n_deletes"])
            n_dups += int(r["n_dups"])
            per_bucket[b] = {"min_lsn": int(r["min_lsn"]),
                             "max_lsn": int(r["max_lsn"])}

        lin = _resolve_lineage(lineage)
        lin.update(
            {
                "epoch_key": epoch_key,
                "snapshot_id": new_sid,
                "n_upserts": n_upserts,
                "n_deletes": n_deletes,
                "n_duplicates_dropped": n_dups,
                "buckets_touched": sorted(int(r["bucket"]) for r in manifests),
                "per_bucket_offsets": per_bucket,
            }
        )
        m = self._child_manifest(new_sid, "merge-delta", epoch_key)
        m["buckets"] = new_buckets
        self._append_lineage(lin)
        self._commit(m)
        self._m = m
        return {"skipped": False, **lin}

    def compact(self, buckets: Sequence[int] | None = None,
                epoch_key: str | None = None) -> dict:
        """Collapse MOR delta files back to one base file per bucket:
        resolve LWW once (the same _read_mor the readers use — tombstone
        winners included so deleted keys vanish physically), then
        rewrite the touched buckets from the resolved rows via the COW
        fold with ``replace_state=True``. No-op if the selected buckets
        carry no deltas. The maintenance analog of Iceberg/Hudi
        compaction; run it when read amplification (delta files per
        bucket) exceeds the read-path budget."""
        from .arrow_merge import DELTA_LSN

        sel: dict[str, list] = {}
        want = None if buckets is None else {int(b) for b in buckets}
        for b, fs in self._m["buckets"].items():
            if want is not None and int(b) not in want:
                continue
            if any(fe.get("kind") == "delta" for fe in fs):
                sel[b] = fs
        if not sel:
            return {"skipped": True, "reason": "no delta files",
                    "snapshot_id": self.snapshot_id}
        cur = self.columns()
        names = [c.name for c in cur]
        resolved = self._read_mor(sel, cur)
        changes = resolved.select(*names, F.col(OP_COL), F.col(DELTA_LSN))
        touched = sorted(int(b) for b in sel)
        return self.merge_arrow(
            changes,
            epoch_key=epoch_key or f"compact:{self.snapshot_id + 1}",
            lsn_col=DELTA_LSN,
            touched_buckets=touched,
            replace_state=True,
        )

    def audit_changes(
        self, changes: DataFrame, audit_path: str | None = None
    ) -> DataFrame:
        """K11 dry-run sink: classify a changeset against CURRENT state
        without committing anything — the engine's answer to the
        reference's CSV staging hop, where every would-be mutation is a
        file a human can inspect before the DB load
        (src/transactors/csv_transactor.py:14-57). Returns one row per
        change: (__op, <key>, bucket, action) with action in
        {insert, update, delete, delete_absent}; ``audit_path`` persists
        the audit frame as parquet for offline review.

        Scale: reads only the buckets the changeset touches and joins
        just the key column (left join on co-hashed keys), so the audit
        costs O(changeset + touched-bucket keys), not O(state)."""
        s = changes.select(
            F.col(self.key), F.col(OP_COL),
            self._bucket_expr(F.col(self.key)).alias("bucket"),
        )
        touched = [r[0] for r in s.select("bucket").distinct().collect()]
        existing = self.read(buckets=touched).select(
            F.col(self.key), F.lit(True).alias("__matched")
        )
        out = (
            s.join(existing, self.key, "left")
            .select(
                OP_COL, self.key, "bucket",
                F.when((F.col(OP_COL) == "D") & F.col("__matched").isNotNull(), "delete")
                .when(F.col(OP_COL) == "D", "delete_absent")
                .when(F.col("__matched").isNotNull(), "update")
                .otherwise("insert")
                .alias("action"),
            )
        )
        if audit_path is not None:
            out.write.mode("overwrite").parquet(audit_path)
            out = self.spark.read.parquet(audit_path)
        return out

    def delete_where(self, predicate, epoch_key: str,
                     lineage: dict | None = None) -> dict:
        """Predicate-conditional delete: remove every current row whose
        payload satisfies ``predicate`` (a SQL string or Column over the
        table's columns) — `MERGE ... WHEN MATCHED AND <pred> THEN
        DELETE` / the reference's `MATCH ... WHERE <pred> DETACH DELETE`
        empty-node sweep (src/etl/disease_etl.py:238-248). Epoch-keyed,
        exactly-once, atomic like every other commit.

        Three-valued logic: rows where the predicate evaluates NULL are
        KEPT (only predicate IS TRUE deletes). Scale: one stats pass
        finds the buckets containing matches; only those buckets are
        rewritten (copy-on-write at bucket granularity, like merge).
        """
        if epoch_key in self.applied_epochs():
            return {"skipped": True, "epoch_key": epoch_key, "snapshot_id": self.snapshot_id}
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        hit = F.coalesce(cond, F.lit(False))

        state = self.read().withColumn(BUCKET_COL, self._bucket_expr(F.col(self.key)))
        per_bucket = (
            state.filter(hit).groupBy(BUCKET_COL).count().collect()
        )
        touched = sorted(int(r[BUCKET_COL]) for r in per_bucket)
        n_deletes = sum(int(r["count"]) for r in per_bucket)
        if not touched:
            return self._commit_noop(epoch_key, lineage)

        cur = self.columns()
        keep = (
            self.read(buckets=touched)
            .filter(~hit)
            .select(*[c.name for c in cur])
            .withColumn(BUCKET_COL, self._bucket_expr(F.col(self.key)))
        )
        new_sid = self.snapshot_id + 1
        stage_rel = os.path.join("data", str(new_sid))
        stage = os.path.join(self.root, stage_rel)
        keep.repartition(max(len(touched), 1), F.col(BUCKET_COL)).write.partitionBy(
            BUCKET_COL
        ).mode("overwrite").parquet(stage)

        sv = self._m["schema_version"]
        new_buckets = dict(self._m["buckets"])
        for b in touched:
            bdir = os.path.join(stage, f"{BUCKET_COL}={b}")
            files = []
            if os.path.isdir(bdir):
                files = [
                    {"path": os.path.join(stage_rel, f"{BUCKET_COL}={b}", fn),
                     "schema_version": sv}
                    for fn in sorted(os.listdir(bdir))
                    if fn.endswith(".parquet")
                ]
            new_buckets[str(b)] = files

        lin = _resolve_lineage(lineage)
        lin.update({
            "epoch_key": epoch_key, "snapshot_id": new_sid,
            "n_upserts": 0, "n_deletes": n_deletes, "buckets_touched": touched,
        })
        m = self._child_manifest(new_sid, "delete-where", epoch_key)
        m["buckets"] = new_buckets
        self._append_lineage(lin)
        self._commit(m)
        self._m = m
        return {"skipped": False, **lin}

    def _commit_noop(self, epoch_key: str, lineage: dict | None) -> dict:
        new_sid = self.snapshot_id + 1
        # deferred lineage values are NOT resolved here: a noop commit ran
        # no action, so an Observation-backed callable would block forever
        lin = {k: (None if callable(v) else v)
               for k, v in (lineage or {}).items()
               if k not in ("n_upserts_exact", "n_dups_exact",
                            "counters_precombined")}
        lin.update({"epoch_key": epoch_key, "snapshot_id": new_sid,
                    "n_upserts": 0, "n_deletes": 0, "buckets_touched": []})
        m = self._child_manifest(new_sid, "merge-noop", epoch_key)
        self._append_lineage(lin)
        self._commit(m)
        self._m = m
        return {"skipped": False, **lin}

    # ------------------------------------------------------ schema evolution
    def _evolve(self, epoch_key: str | None, mutate) -> dict:
        """Metadata-only schema commit (Iceberg ALTER TABLE analog,
        SURVEY.md §2.7/§4.4). Idempotent under epoch_key for resume."""
        if epoch_key is not None and epoch_key in self.applied_epochs():
            return {"skipped": True, "epoch_key": epoch_key, "snapshot_id": self.snapshot_id}
        new_sid = self.snapshot_id + 1
        m = self._child_manifest(new_sid, "evolve", epoch_key)
        cols = [ColumnSpec.from_json(d) for d in m["schema_versions"][str(m["schema_version"])]]
        cols = mutate(m, cols)
        new_v = m["schema_version"] + 1
        m["schema_version"] = new_v
        m["schema_versions"][str(new_v)] = [c.to_json() for c in cols]
        if epoch_key is not None:
            # through the side log like every other commit path: keeps
            # evolve commits O(1) (no manifest growth), keeps lineage()
            # in true commit order when evolves interleave with merges,
            # and lets last-wins supersede a crash-orphan row whose
            # snapshot id this evolve consumes
            self._append_lineage({"epoch_key": epoch_key, "snapshot_id": new_sid,
                                  "operation": "evolve"})
        self._commit(m)
        self._m = m
        return {"skipped": False, "epoch_key": epoch_key, "snapshot_id": new_sid}

    def add_column(self, name: str, ddl_type: str, src_field: str | None = None,
                   epoch_key: str | None = None) -> dict:
        def mut(m, cols):
            if any(c.name == name for c in cols):
                raise ValueError(f"column {name!r} exists")
            fid = m["next_field_id"]
            m["next_field_id"] = fid + 1
            return cols + [ColumnSpec(fid, name, ddl_type, src_field)]

        return self._evolve(epoch_key, mut)

    def rename_column(self, old: str, new: str, epoch_key: str | None = None) -> dict:
        def mut(m, cols):
            hit = [c for c in cols if c.name == old]
            if not hit:
                raise ValueError(f"no column {old!r}")
            return [ColumnSpec(c.id, new if c.name == old else c.name, c.type, c.src_field)
                    for c in cols]

        return self._evolve(epoch_key, mut)

    def drop_column(self, name: str, epoch_key: str | None = None) -> dict:
        """Metadata-only drop (Iceberg ALTER TABLE ... DROP COLUMN): the
        field id disappears from the current schema; old files simply
        stop projecting it. The merge key cannot be dropped."""
        def mut(m, cols):
            if name == self.key:
                raise ValueError(f"cannot drop merge key {name!r}")
            if not any(c.name == name for c in cols):
                raise ValueError(f"no column {name!r}")
            return [c for c in cols if c.name != name]

        return self._evolve(epoch_key, mut)

    def widen_column(self, name: str, new_type: str, epoch_key: str | None = None) -> dict:
        _WIDEN_OK = {("int", "bigint"), ("int", "long"), ("float", "double"),
                     ("array<int>", "array<bigint>"), ("smallint", "int"),
                     ("smallint", "bigint")}

        def mut(m, cols):
            hit = [c for c in cols if c.name == name]
            if not hit:
                raise ValueError(f"no column {name!r}")
            old_t = hit[0].type
            if (old_t, new_type) not in _WIDEN_OK:
                raise ValueError(f"not a widening: {old_t} -> {new_type}")
            return [ColumnSpec(c.id, c.name, new_type if c.name == name else c.type, c.src_field)
                    for c in cols]

        return self._evolve(epoch_key, mut)

    # -------------------------------------------------------------- internals
    def _child_manifest(self, new_sid: int, operation: str, epoch_key: str | None) -> dict:
        m = json.loads(json.dumps(self._m))  # deep copy
        m["parent"] = self._m["snapshot_id"]
        m["snapshot_id"] = new_sid
        m["operation"] = operation
        m["epoch_key"] = epoch_key
        if epoch_key is not None:
            m["applied_epochs"] = m["applied_epochs"] + [epoch_key]
        return m

    def _commit(self, manifest: dict) -> None:
        """Write snapshot manifest, then atomically flip the _current
        pointer (os.replace). A crash before the flip leaves orphan data
        files that no manifest references — same failure model as
        Iceberg; a crash after the flip is a completed commit and the
        epoch_key makes any retry a no-op."""
        sid = manifest["snapshot_id"]
        _atomic_write(os.path.join(self.root, "snapshots", f"{sid}.json"),
                      json.dumps(manifest, indent=1, default=str))
        _atomic_write(os.path.join(self.root, "_current"), str(sid))

    def expire_snapshots(self, keep_last: int = 10) -> dict:
        """Maintenance (Iceberg expire_snapshots analog): delete manifest
        files and data directories referenced ONLY by snapshots older
        than the last ``keep_last``. Time travel to expired snapshots
        stops working (as in Iceberg); applied_epochs/lineage live in the
        current manifest, so exactly-once is unaffected."""
        import shutil

        chain = []
        sid = self.snapshot_id
        while sid is not None:
            with open(os.path.join(self.root, "snapshots", f"{sid}.json")) as f:
                m = json.load(f)
            chain.append(m)
            sid = m["parent"]
        keep = chain[:keep_last]
        expire = chain[keep_last:]
        live_files = {
            fe["path"] for m in keep for fs in m["buckets"].values() for fe in fs
        }
        live_dirs = {p.split(os.sep)[1] for p in live_files if p.startswith("data")}
        removed_snapshots, removed_dirs = 0, 0
        for m in expire:
            os.remove(os.path.join(self.root, "snapshots", f"{m['snapshot_id']}.json"))
            removed_snapshots += 1
        data_root = os.path.join(self.root, "data")
        for d in os.listdir(data_root):
            if d not in live_dirs:
                shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                removed_dirs += 1
        # keep the chain walkable: the oldest kept snapshot becomes a root
        if expire and keep:
            oldest = keep[-1]
            oldest["parent"] = None
            _atomic_write(
                os.path.join(self.root, "snapshots", f"{oldest['snapshot_id']}.json"),
                json.dumps(oldest, indent=1, default=str),
            )
        return {"removed_snapshots": removed_snapshots, "removed_data_dirs": removed_dirs}

    def lookup(self, keys: Sequence) -> DataFrame:
        """Point lookup: read ONLY the buckets the keys hash into —
        O(|keys| * state/n_buckets) I/O, never a full-table scan. The
        analog of the reference's indexed `MATCH {primaryKey: ...}`
        probes (uniqueness-constraint index,
        src/etl/helpers/neo4j_helper.py:59-126); here the "index" is the
        bucket layout itself."""
        probe = self.spark.createDataFrame(
            [(k,) for k in keys], f"{self.key} {dict((c.name, c.type) for c in self.columns())[self.key]}"
        )
        buckets = [
            r[0] for r in probe.select(self._bucket_expr(F.col(self.key)).alias("b"))
            .distinct().collect()
        ]
        vals = [r[0] for r in probe.collect()]
        return self.read(buckets=buckets).filter(F.col(self.key).isin(vals))

    def changes_between(self, from_snapshot: int, to_snapshot: int) -> DataFrame:
        """Incremental changelog scan (Iceberg CDC-read analog): the NET
        per-key change between two committed snapshots, as rows shaped
        (__op in {'I','U','D'}, <current columns of the TO snapshot>).

        Scale: buckets whose manifest file lists are identical in both
        snapshots are skipped entirely (metadata-only pruning), so the
        diff reads O(changed buckets), not O(state). Old-snapshot rows
        are projected onto the TO schema by field id, so the diff is
        well-defined across schema evolution.
        """
        t_from = self.at_snapshot(from_snapshot)
        t_to = self.at_snapshot(to_snapshot)
        changed = [
            b for b in set(t_from._m["buckets"]) | set(t_to._m["buckets"])
            if t_from._m["buckets"].get(b) != t_to._m["buckets"].get(b)
        ]
        cur = t_to.columns()
        to_types = {c.name: c.type for c in cur}
        # project the FROM state onto the TO schema by field id
        from_by_id = {c.id: c for c in t_from.columns()}
        old = t_from.read(buckets=changed).select(
            *[
                (F.col(from_by_id[c.id].name) if c.id in from_by_id
                 else F.lit(None)).cast(c.type).alias(c.name)
                for c in cur
            ]
        )
        new = t_to.read(buckets=changed)
        names = [c.name for c in cur]
        non_key = [n for n in names if n != self.key]
        o = old.select(
            F.col(self.key).alias("__o_key"),
            *[F.col(n).alias(f"__o_{n}") for n in non_key],
        )
        j = new.join(o, new[self.key] == o["__o_key"], "full_outer")
        # null-safe per-column equality. NOT xxhash64 over the column
        # list: Spark's hash functions SKIP null inputs, so a row whose
        # values shift between columns null-compensatingly (colA 5->null
        # while colB null->5) would hash equal and silently vanish from
        # the changelog. A key-only table has no payload to differ on.
        if non_key:
            same = F.lit(True)
            for n in non_key:
                same = same & F.col(n).eqNullSafe(F.col(f"__o_{n}"))
        else:
            same = F.lit(True)
        op = (
            F.when(F.col("__o_key").isNull(), F.lit("I"))
            .when(F.col(self.key).isNull(), F.lit("D"))
            .when(same, F.lit(None))  # unchanged -> dropped below
            .otherwise(F.lit("U"))
        )
        return (
            j.select(
                op.alias(OP_COL),
                F.coalesce(F.col(self.key), F.col("__o_key")).alias(self.key),
                # deletes carry the OLD payload (tombstone with last value)
                *[
                    F.when(F.col(self.key).isNull(), F.col(f"__o_{n}"))
                    .otherwise(F.col(n)).cast(to_types[n]).alias(n)
                    for n in non_key
                ],
            )
            .filter(F.col(OP_COL).isNotNull())
        )

    def at_snapshot(self, snapshot_id: int) -> "LakeTable":
        """Time travel: a read view of the table as of an earlier commit
        (Iceberg VERSION AS OF). Every snapshot manifest is immutable, so
        this is just loading the old manifest; the returned table shares
        data files and must not be written to."""
        path = os.path.join(self.root, "snapshots", f"{snapshot_id}.json")
        with open(path) as f:
            return LakeTable(self.spark, self.root, json.load(f))

    def snapshot_for_epoch(self, epoch_key: str) -> int | None:
        """Lineage lookup: the snapshot a given micro-batch committed.
        Reads the lineage side log (see :meth:`lineage`)."""
        for lin in self.lineage():
            if lin.get("epoch_key") == epoch_key:
                return int(lin["snapshot_id"])
        return None

    def metrics_df(self) -> DataFrame:
        """The per-micro-batch metrics stream (<root>/_metrics.jsonl,
        emitted by the replay runner) as a queryable DataFrame — the
        engine-native version of the reference's end-of-run counter logs
        (src/etl/molecular_interaction_etl.py:648-676)."""
        path = os.path.join(self.root, "_metrics.jsonl")
        if not os.path.exists(path):
            return self.spark.createDataFrame(
                [], "epoch_key string, snapshot_id long, n_events long"
            )
        # leading-underscore files are invisible to Spark's file source
        # (metadata-file convention), and the stream is driver-local and
        # tiny (one line per micro-batch) — parse as a json-lines dataset
        with open(path) as f:
            lines = f.read().splitlines()
        return self.spark.read.json(self.spark.sparkContext.parallelize(lines, 1))

    def history(self) -> list[dict]:
        out = []
        sid = self.snapshot_id
        while sid is not None:
            with open(os.path.join(self.root, "snapshots", f"{sid}.json")) as f:
                m = json.load(f)
            out.append({"snapshot_id": m["snapshot_id"], "operation": m["operation"],
                        "epoch_key": m["epoch_key"], "schema_version": m["schema_version"]})
            sid = m["parent"]
        return list(reversed(out))
