"""File-format scans (SURVEY.md §2.1, S3-S9) as native Spark readers.

The reference hand-parses every format row-by-row in Python
(csv.reader, inline line parsers, ontobio). Here each format is a
declarative scan — comment filtering, attribute-map parsing, and column
typing all stay in the JVM scan + expression layer so predicate
pushdown/column pruning apply, and the only Python is the OBO stanza
regrouping (mapInPandas over partition-contiguous lines).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_commented_tsv(
    spark: SparkSession, path: str, comment: str = "#", schema: str | None = None,
) -> DataFrame:
    """S3: tab CSV skipping comment lines (src/files/csv_file.py:20-28 +
    src/files/comment_file.py). Spark's csv reader handles the comment
    char natively — the filter happens during the scan."""
    r = spark.read.option("sep", "\t").option("comment", comment)
    if schema:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "false")
    return r.csv(path)


GAF_COLUMNS = [
    "db", "db_object_id", "db_object_symbol", "qualifier", "go_id", "db_reference",
    "evidence_code", "with_or_from", "aspect", "db_object_name", "db_object_synonym",
    "db_object_type", "taxon", "date", "assigned_by", "annotation_extension",
    "gene_product_form_id",
]


def read_gaf(spark: SparkSession, path: str) -> DataFrame:
    """S4: GAF TSV with '!' comments; gene ids prefixed with the db
    column the way the reference does (src/etl/go_annot_etl.py:85-117)."""
    df = read_commented_tsv(spark, path, comment="!")
    df = df.toDF(*GAF_COLUMNS[: len(df.columns)])
    return df.withColumn(
        "gene_id",
        F.when(
            F.col("db_object_id").contains(":"), F.col("db_object_id")
        ).otherwise(F.concat_ws(":", F.col("db"), F.col("db_object_id"))),
    )


GFF3_SCHEMA = (
    "seqid string, source string, type string, start int, end int, "
    "score string, strand string, phase string, attributes string"
)


def read_gff3(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """S5: GFF3 -> (features with attr map, header directives).

    The reference's 210-line inline parser (src/etl/transcript_etl.py:219-428)
    becomes: csv scan with comment='#' for features + a text scan filtered
    to '#!' for header metadata. The 9th column becomes a real MapType via
    str_to_map, so downstream does `attrs['ID']` instead of regex."""
    feats = (
        spark.read.option("sep", "\t").option("comment", "#").schema(GFF3_SCHEMA).csv(path)
        .withColumn("attrs", F.expr("str_to_map(attributes, ';', '=')"))
        .drop("attributes")
    )
    headers = (
        spark.read.text(path)
        .filter(F.col("value").startswith("#!"))
        .select(
            F.regexp_extract("value", r"^#!(\S+)\s+(.*)$", 1).alias("key"),
            F.regexp_extract("value", r"^#!(\S+)\s+(.*)$", 2).alias("val"),
        )
    )
    return feats, headers


def read_kv_attr_table(
    spark: SparkSession, path: str, schema: str, attr_col: str,
    comment: str = "#", sep: str = "\t",
) -> DataFrame:
    """S9 (VEP-style): TSV whose last column is `KEY=value;KEY=value`
    (src/etl/vep_etl.py:81-141). Returns the frame with `attrs` map."""
    df = spark.read.option("sep", sep).option("comment", comment).schema(schema).csv(path)
    return df.withColumn("attrs", F.expr(f"str_to_map({attr_col}, ';', '=')"))


OBO_TERM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("namespace", T.StringType()),
        T.StructField("is_obsolete", T.BooleanType()),
        T.StructField("is_a", T.ArrayType(T.StringType())),
        T.StructField("synonyms", T.ArrayType(T.StringType())),
        T.StructField("subsets", T.ArrayType(T.StringType())),
    ]
)


def read_obo_terms(spark: SparkSession, path: str) -> DataFrame:
    """S6: OBO `[Term]` stanza scan (src/etl/helpers/obo_helper.py:218-278).

    wholeTextFiles-free: `spark.read.text` with line numbers would split
    stanzas across partitions, so stanza regrouping runs in mapInPandas
    over whole files read as binaryFile (OBO files are single-digit MB;
    for a truly huge ontology, pre-split by stanza offset). Output: one
    row per term with typed arrays.
    """
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for content in b["content"]:
                text = content.decode("utf-8", errors="replace")
                for stanza in text.split("\n[")[0:]:
                    header, _, body = stanza.partition("\n")
                    if not header.strip().strip("[]").startswith("Term"):
                        continue
                    term = {"id": None, "name": None, "namespace": None,
                            "is_obsolete": False, "is_a": [], "synonyms": [], "subsets": []}
                    for line in body.splitlines():
                        k, _, v = line.partition(":")
                        v = v.strip()
                        if k == "id":
                            term["id"] = v
                        elif k == "name":
                            term["name"] = v
                        elif k == "namespace":
                            term["namespace"] = v
                        elif k == "is_obsolete":
                            term["is_obsolete"] = v == "true"
                        elif k == "is_a":
                            term["is_a"].append(v.split("!")[0].strip())
                        elif k == "synonym":
                            term["synonyms"].append(v)
                        elif k == "subset":
                            term["subsets"].append(v)
                    if term["id"]:
                        rows.append(term)
            yield pd.DataFrame(rows, columns=[f.name for f in OBO_TERM_SCHEMA.fields])

    return raw.mapInPandas(parse, schema=OBO_TERM_SCHEMA)


def read_xml_records(
    spark: SparkSession, path_glob: str, record_tag: str
) -> DataFrame:
    """Distributed XML record scan (SURVEY.md S11 — the reference
    xmltodict-parses NCBI eutils IdLists and Expression Atlas sitemaps
    whole on the driver, src/etl/geo_xref_etl.py:57-72,
    src/etl/expression_atlas_etl.py:84-100). XML is not line-splittable,
    so parallelism is per FILE: a binaryFile scan feeds an Arrow-batched
    mapInPandas that parses each document with stdlib ElementTree and
    emits one row per ``record_tag`` element:

        (src_file, text, attrs map<string,string>,
         children map<string,string>)

    ``record_tag`` matches on the local name (namespace-insensitive),
    which covers both eutils ``<Id>`` lists and namespaced sitemap
    ``<url>`` entries. For a single multi-GB XML file, split upstream
    (the reference's inputs are many small-to-medium files)."""
    import xml.etree.ElementTree as ET

    files = spark.read.format("binaryFile").load(path_glob)

    def _local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"src_file": [], "text": [], "attrs": [], "children": []}
            for path, content in zip(b["path"], b["content"]):
                root = ET.fromstring(bytes(content))
                for el in root.iter():
                    if _local(el.tag) != record_tag:
                        continue
                    out["src_file"].append(path)
                    out["text"].append((el.text or "").strip() or None)
                    out["attrs"].append(dict(el.attrib))
                    out["children"].append(
                        {
                            _local(c.tag): (c.text or "").strip()
                            for c in el
                            if _local(c.tag)
                        }
                    )
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("src_file", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
            T.StructField("children", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    return files.select("path", "content").mapInPandas(parse, schema=schema)


# --------------------------------------------------------------- PSI-MI TAB
MITAB_COLUMNS = [
    "id_a", "id_b", "alt_id_a", "alt_id_b", "alias_a", "alias_b",
    "detection_method", "first_author", "publication_ids", "taxid_a",
    "taxid_b", "interaction_types", "source_databases", "interaction_ids",
    "confidence", "expansion", "bio_role_a", "bio_role_b", "exp_role_a",
    "exp_role_b", "type_a", "type_b", "xref_a", "xref_b", "xref_interaction",
]


def mi_curie(col, default: str | None = None):
    """The quoted MI identifier inside a PSI-MI field —
    `psi-mi:"MI:0469"(name)` -> `MI:0469` (the reference greps
    r'\"([^\"]*)\"' per row and falls back to a default on IndexError,
    src/etl/molecular_interaction_etl.py:504-533)."""
    c = F.col(col) if isinstance(col, str) else col
    hit = F.regexp_extract(c, r'"([^"]*)"', 1)
    out = F.when(hit != "", hit)
    return out.otherwise(F.lit(default)) if default is not None else out


def taxon_curie(col):
    """`taxid:7227(fly)` -> `NCBITaxon:7227`
    (molecular_interaction_etl.py:485-492)."""
    c = F.col(col) if isinstance(col, str) else col
    digits = F.regexp_extract(c, r"(\d+)", 1)
    return F.when(digits != "", F.concat(F.lit("NCBITaxon:"), digits))


def split_multivalue(col):
    """Pipe-separated PSI-MI multi-value field -> array ('-' and empty ->
    empty array), for explode() consumers."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | (c == "-") | (c == ""), F.array().cast("array<string>")
    ).otherwise(F.split(c, r"\|"))


def read_psimi_tab(spark: SparkSession, path: str) -> DataFrame:
    """S8: PSI-MI TAB (mitab 2.5/2.7) scan with the reference's field
    semantics packaged as columns (src/etl/molecular_interaction_etl.py:
    460-560): '#' comment rows skipped in-scan, quoted-MI extraction
    with the reference's defaults (detection 'MI:0686', roles/types
    'MI:0499'), taxon curies with the '-' -> self-interaction fallback,
    and publication resolution via the T19 regex cascade. Multi-value
    columns stay raw; use `split_multivalue` + explode downstream.
    """
    from ..functions.text import publication_id

    df = spark.read.option("sep", "\t").option("comment", "#").csv(path)
    df = df.toDF(*MITAB_COLUMNS[: len(df.columns)],
                 *[f"extra_{i}" for i in range(max(0, len(df.columns) - len(MITAB_COLUMNS)))])
    taxon_a = taxon_curie("taxid_a")
    out = df.withColumns({
        "detection_mi": mi_curie("detection_method", default="MI:0686"),
        "source_db_mi": mi_curie("source_databases"),
        "interaction_type_mi": mi_curie("interaction_types"),
        "taxon_a_curie": taxon_a,
        "taxon_b_curie": F.when(
            F.col("taxid_b") == "-", taxon_a
        ).otherwise(taxon_curie("taxid_b")),
        "publication": publication_id(F.col("publication_ids")),
    })
    if "exp_role_a" in out.columns:
        out = out.withColumns({
            "role_a_mi": mi_curie("exp_role_a", default="MI:0499"),
            "role_b_mi": mi_curie("exp_role_b", default="MI:0499"),
            "type_a_mi": mi_curie("type_a", default="MI:0499"),
            "type_b_mi": mi_curie("type_b", default="MI:0499"),
        })
    return out
