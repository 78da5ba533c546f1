"""Multi-entity replay (FIXTURES.md F4): gene / allele / disease_annotation.

Re-expresses the reference's dependency-ordered, FK-guarded multi-table
load (etl_groups BGI -> ALLELE -> DAF, src/aggregate_loader.py:129-138;
silent `MATCH` FK guards, src/etl/allele_etl.py:85-86) as a staged
per-epoch replay:

  per epoch: merge genes -> merge alleles (FK gene_id -> gene, nulls
  allowed: the reference's no-gene allele route,
  src/etl/allele_etl.py:109-134) -> merge disease annotations
  (FK object_id -> gene ∪ allele; merge key = deterministic composite
  hash of object+association+DO+sorted(withs), mirroring
  disease_unique_key src/etl/disease_etl.py:479-495; negated
  association types flipped per src/etl/disease_etl.py:383-400).

Epoch barriers are the group barriers; FK rejects are counted into the
lineage (the reference drops them silently). Exactly-once per
(table, epoch) via the same manifest mechanism as the tokens table.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.keys import composite_key, sorted_array_key
from .functions.text import negation_flip
from .lake.table import OP_COL, LakeTable
from .operators.dedup import lww_reduce
from .operators.fk_guard import fk_guard_observed
from .schema import SOURCES

ENTITY_EVENT_SCHEMA = T.StructType([
    T.StructField("event_lsn", T.LongType(), False),
    T.StructField("epoch", T.IntegerType(), False),
    T.StructField("op", T.StringType(), False),      # I | U | D
    T.StructField("entity", T.StringType(), False),  # gene | allele | disease_annotation
    T.StructField("primary_id", T.StringType()),
    T.StructField("symbol", T.StringType()),
    T.StructField("taxon_id", T.StringType()),
    T.StructField("so_term_id", T.StringType()),
    T.StructField("synonyms", T.ArrayType(T.StringType())),
    T.StructField("gene_id", T.StringType()),
    T.StructField("object_id", T.StringType()),
    T.StructField("object_type", T.StringType()),
    T.StructField("do_id", T.StringType()),
    T.StructField("association_type", T.StringType()),
    T.StructField("negation", T.StringType()),
    T.StructField("evidence_codes", T.ArrayType(T.StringType())),
    T.StructField("publication_id", T.StringType()),
    T.StructField("with_genes", T.ArrayType(T.StringType())),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("ts", T.TimestampType()),
])

GENE_COLUMNS = [
    ("primary_id", "string", None), ("symbol", "string", None),
    ("taxon_id", "string", None), ("so_term_id", "string", None),
    ("synonyms", "array<string>", None), ("tokens", "array<int>", None),
]
ALLELE_COLUMNS = [
    ("primary_id", "string", None), ("symbol", "string", None),
    ("gene_id", "string", None), ("taxon_id", "string", None),
    ("tokens", "array<int>", None),
]
DISEASE_COLUMNS = [
    ("annotation_key", "string", None), ("object_id", "string", None),
    ("object_type", "string", None), ("do_id", "string", None),
    ("association_type", "string", None), ("negation", "string", None),
    ("evidence_codes", "array<string>", None), ("publication_id", "string", None),
    ("with_genes", "array<string>", None), ("tokens", "array<int>", None),
]

NEGATION_FLIPS = {
    "IS_IMPLICATED_IN": "IS_NOT_IMPLICATED_IN",
    "IS_MODEL_OF": "IS_NOT_MODEL_OF",
    "IS_MARKER_FOR": "IS_NOT_MARKER_FOR",
}


def create_entity_tables(spark: SparkSession, root: str, n_buckets: int = 16):
    return {
        "gene": LakeTable.create(spark, f"{root}/gene", GENE_COLUMNS,
                                 key="primary_id", n_buckets=n_buckets, if_not_exists=True),
        "allele": LakeTable.create(spark, f"{root}/allele", ALLELE_COLUMNS,
                                   key="primary_id", n_buckets=n_buckets, if_not_exists=True),
        "disease_annotation": LakeTable.create(spark, f"{root}/disease_annotation",
                                               DISEASE_COLUMNS, key="annotation_key",
                                               n_buckets=n_buckets, if_not_exists=True),
    }


def disease_annotation_key() -> F.Column:
    """disease_unique_key analog: object + association + DO + sorted withs
    (raw association type, pre-negation-flip, as the reference does)."""
    return composite_key(
        "object_id", "association_type", "do_id", sorted_array_key("with_genes")
    )


def _changeset(events: DataFrame, table_cols: list) -> DataFrame:
    latest = lww_reduce(events, key="primary_id", order_col="event_lsn")
    names = [c for c, _, _ in table_cols]
    op = F.when(F.col("op") == "D", "D").otherwise("U").alias(OP_COL)
    return latest.select(*[F.col(c).alias(c) for c in names], op)


class MultiEntityRunner:
    """Staged per-epoch replay across the three entity tables."""

    def __init__(self, spark: SparkSession, tables: dict[str, LakeTable],
                 source_df: DataFrame):
        self.spark = spark
        self.tables = tables
        self.source = source_df

    def run(self) -> list[dict]:
        epochs = [r[0] for r in
                  self.source.select("epoch").distinct().orderBy("epoch").collect()]
        out = []
        for e in epochs:
            ev = self.source.filter(F.col("epoch") == e)
            out.append(self._merge_gene(e, ev))
            out.append(self._merge_allele(e, ev))
            out.append(self._merge_disease(e, ev))
        return out

    def _merge_gene(self, epoch: int, ev: DataFrame) -> dict:
        t = self.tables["gene"]
        key = f"{epoch}:gene"
        if key in t.applied_epochs():
            return {"epoch_key": key, "skipped": True}
        g = ev.filter(F.col("entity") == "gene")
        changes = _changeset(g, GENE_COLUMNS)
        return t.merge(changes, epoch_key=key, lineage={"table": "gene"})

    def _merge_allele(self, epoch: int, ev: DataFrame) -> dict:
        t = self.tables["allele"]
        key = f"{epoch}:allele"
        if key in t.applied_epochs():
            return {"epoch_key": key, "skipped": True}
        a = ev.filter(F.col("entity") == "allele")
        latest = lww_reduce(a, key="primary_id", order_col="event_lsn")
        # one stats pass: the changeset's own buckets (handed to merge so
        # it skips its touched-bucket collect) AND the gene-dim buckets the
        # FK values hash into (so the guard reads only touched dim buckets,
        # not the whole gene table — at 100 TB the dim scan dominates)
        gene_t = self.tables["gene"]
        stats = latest.agg(
            F.collect_set(t._bucket_expr(F.col("primary_id"))).alias("kb"),
            F.collect_set(F.when(F.col("op") != "D",
                                 gene_t._bucket_expr(F.col("gene_id")))).alias("fb"),
        ).first()
        # FK guard on the surviving upsert rows; deletes always pass.
        # Reject count rides the merge's write action as an Observation —
        # no separate count job per epoch.
        ups = latest.filter(F.col("op") != "D")
        dels = latest.filter(F.col("op") == "D")
        kept, obs = fk_guard_observed(
            ups, gene_t.read(buckets=stats["fb"]), fk="gene_id",
            dim_key="primary_id", obs_name=f"fk_{key}", keep_null_fk=True)
        names = [c for c, _, _ in ALLELE_COLUMNS]
        op = F.when(F.col("op") == "D", "D").otherwise("U").alias(OP_COL)
        changes = kept.unionByName(dels).select(*names, op)
        return t.merge(
            changes, epoch_key=key, touched_buckets=stats["kb"],
            lineage={"table": "allele",
                     "n_fk_rejected": lambda: int(obs.get["n_rejected"] or 0)})

    def _merge_disease(self, epoch: int, ev: DataFrame) -> dict:
        t = self.tables["disease_annotation"]
        key = f"{epoch}:disease_annotation"
        if key in t.applied_epochs():
            return {"epoch_key": key, "skipped": True}
        d = (
            ev.filter(F.col("entity") == "disease_annotation")
            .withColumn("annotation_key", disease_annotation_key())
            .withColumn(
                "association_type",
                negation_flip("association_type", "negation", NEGATION_FLIPS),
            )
        )
        latest = lww_reduce(d, key="annotation_key", order_col="event_lsn")
        gene_t, allele_t = self.tables["gene"], self.tables["allele"]
        stats = latest.agg(
            F.collect_set(t._bucket_expr(F.col("annotation_key"))).alias("kb"),
            F.collect_set(F.when(F.col("op") != "D",
                                 gene_t._bucket_expr(F.col("object_id")))).alias("gb"),
            F.collect_set(F.when(F.col("op") != "D",
                                 allele_t._bucket_expr(F.col("object_id")))).alias("ab"),
        ).first()
        ups = latest.filter(F.col("op") != "D")
        dels = latest.filter(F.col("op") == "D")
        dim = (
            gene_t.read(buckets=stats["gb"]).select(F.col("primary_id"))
            .unionByName(allele_t.read(buckets=stats["ab"]).select(F.col("primary_id")))
        )
        kept, obs = fk_guard_observed(ups, dim, fk="object_id",
                                      dim_key="primary_id", obs_name=f"fk_{key}")
        names = [c for c, _, _ in DISEASE_COLUMNS]
        op = F.when(F.col("op") == "D", "D").otherwise("U").alias(OP_COL)
        changes = kept.unionByName(dels).select(*names, op)
        return t.merge(
            changes, epoch_key=key, touched_buckets=stats["kb"],
            lineage={"table": "disease_annotation",
                     "n_fk_rejected": lambda: int(obs.get["n_rejected"] or 0)})


# ---------------------------------------------------------------- generator
def generate_entity_log(
    spark: SparkSession,
    n_events: int = 6_000,
    seed: int = 42,
    epoch_size: int = 1_000,
    n_genes: int = 300,
    n_alleles: int = 200,
    n_annotations: int = 200,
    fk_miss_rate: float = 0.08,
) -> DataFrame:
    """Deterministic multi-entity change log (driver-built — test scale;
    the tokens-table generator shows the distributed pattern)."""
    rng = np.random.default_rng(seed)
    base = _dt.datetime(2024, 1, 1)
    gene_ids = [f"{SOURCES[i % len(SOURCES)]}:g{i:05d}" for i in range(n_genes)]
    allele_ids = [f"{SOURCES[i % len(SOURCES)]}:a{i:05d}" for i in range(n_alleles)]
    do_ids = [f"DOID:{1000 + i}" for i in range(40)]
    assoc = list(NEGATION_FLIPS)
    rows = []
    for lsn in range(n_events):
        u = rng.random()
        op = "D" if u < 0.08 else ("I" if u < 0.35 else "U")
        kind = rng.choice(["gene", "allele", "disease_annotation"],
                          p=[0.4, 0.3, 0.3])
        tokens = rng.integers(0, 50257, rng.integers(4, 40)).astype(np.int32).tolist()
        r = {f.name: None for f in ENTITY_EVENT_SCHEMA.fields}
        r.update(event_lsn=lsn, epoch=lsn // epoch_size, op=op, entity=str(kind),
                 ts=base + _dt.timedelta(seconds=lsn), tokens=None if op == "D" else tokens)
        if kind == "gene":
            gid = gene_ids[int(rng.integers(n_genes))]
            r.update(primary_id=gid, symbol=f"sym-{gid[-5:]}",
                     taxon_id="NCBITaxon:10090", so_term_id="SO:0001217",
                     synonyms=sorted(rng.choice(
                         ["syn1", "syn2", "syn3", "syn4"],
                         rng.integers(0, 3), replace=False).tolist()))
        elif kind == "allele":
            aid = allele_ids[int(rng.integers(n_alleles))]
            miss = rng.random() < fk_miss_rate
            gene_fk = (None if rng.random() < 0.1
                       else (f"MISSING:g{int(rng.integers(999)):05d}" if miss
                             else gene_ids[int(rng.integers(n_genes))]))
            r.update(primary_id=aid, symbol=f"al-{aid[-5:]}", gene_id=gene_fk,
                     taxon_id="NCBITaxon:10090")
        else:
            miss = rng.random() < fk_miss_rate
            obj = (f"MISSING:x{int(rng.integers(999)):05d}" if miss
                   else (gene_ids[int(rng.integers(n_genes))] if rng.random() < 0.7
                         else allele_ids[int(rng.integers(n_alleles))]))
            idx = int(rng.integers(n_annotations))
            r.update(object_id=obj,
                     object_type="gene" if obj in gene_ids else "allele",
                     do_id=do_ids[idx % len(do_ids)],
                     association_type=assoc[idx % len(assoc)],
                     negation="NOT" if rng.random() < 0.15 else "",
                     evidence_codes=[f"ECO:{7000 + int(rng.integers(5))}"],
                     publication_id=f"PMID:{100000 + idx}",
                     with_genes=sorted(rng.choice(gene_ids[:20],
                                                  rng.integers(0, 3),
                                                  replace=False).tolist()))
        rows.append(r)
    return spark.createDataFrame(rows, schema=ENTITY_EVENT_SCHEMA)
