"""YAML scans (SURVEY.md S12) + resource-descriptor machinery (T13).

S12: the reference loads species.yaml / resourceDescriptors.yaml on the
driver with yaml.safe_load and loops stanzas in Python
(src/etl/species_etl.py:66-95). YAML is a config-scale format (KBs) —
the right Spark shape is: parse ONCE driver-side, then hand Spark a
DataFrame so every downstream step (explode of commonNames, broadcast
joins) is distributed and declarative.

T13: the resource-descriptor map (src/etl/helpers/
resource_descriptor_helper_2.py:60-336) — alias-keyed db entries with
default_url / gid_pattern / per-page urls — becomes a small descriptor
DataFrame that BROADCAST-joins against xref tables:
`[%s]` substitution is a replace expression, gid validation an rlike,
and the reference's warn-once tallies (missing key, missing page, bad
regex) become a per-status column the caller can `groupBy('status')` —
the engine's reject_tally pattern instead of driver-side counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_yaml(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """S12: YAML document (a LIST of stanzas, like species.yaml) ->
    DataFrame with the given schema. Parsed driver-side (config-scale
    input), distributed from there."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    if not isinstance(data, list):
        raise ValueError(f"expected a top-level YAML list in {path}")
    return spark.createDataFrame(data, schema)


def species_frames(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """The species.yaml shape (species_etl.py:66-95): returns
    (species, synonyms) — synonyms = one row per (taxonId, commonName),
    derived with explode, not a Python loop."""
    schema = (
        "taxonId string, fullName string, shortName string, "
        "commonNames array<string>, "
        "primaryDataProvider struct<dataProviderFullName:string,"
        "dataProviderShortName:string>, phylogenicOrder int"
    )
    raw = read_yaml(spark, path, schema)
    species = raw.select(
        "taxonId",
        F.col("fullName").alias("name"),
        "shortName",
        "commonNames",
        F.col("primaryDataProvider.dataProviderFullName").alias("dataProviderFullName"),
        F.col("primaryDataProvider.dataProviderShortName").alias("dataProviderShortName"),
        F.col("phylogenicOrder").alias("phylogeneticOrder"),
    )
    synonyms = raw.select(
        "taxonId", F.explode("commonNames").alias("synonym")
    )
    return species, synonyms


DESCRIPTOR_SCHEMA = (
    "db_prefix string, default_url string, gid_pattern string, "
    "aliases array<string>, pages map<string,string>, no_url boolean"
)


def read_resource_descriptors(spark: SparkSession, path: str) -> DataFrame:
    """T13: resourceDescriptors.yaml -> descriptor frame
    (resource_descriptor_helper_2.py:60-120 builds the same dict)."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    rows = []
    for st in data:
        rows.append({
            "db_prefix": st.get("db_prefix"),
            "default_url": st.get("default_url"),
            "gid_pattern": st.get("gid_pattern"),
            "aliases": st.get("aliases") or [],
            "pages": {p["name"]: p["url"] for p in (st.get("pages") or [])},
            "no_url": bool(st.get("no_url", False)),
        })
    return spark.createDataFrame(rows, DESCRIPTOR_SCHEMA)


def resolve_urls(
    xrefs: DataFrame,
    descriptors: DataFrame,
    id_col: str = "identifier",
    page_col: str | None = None,
) -> DataFrame:
    """Vectorized `return_url_from_identifier`
    (resource_descriptor_helper_2.py:244-336).

    Splits each identifier into prefix:local, normalizes the prefix
    through the alias table (case-insensitive), substitutes the local id
    into the page url or default_url (`[%s]`), validates against
    gid_pattern, and classifies every row:

        ok | no_url | missing_key | missing_page | missing_gid | bad_gid

    The reference logs-and-counts each failure class in driver dicts;
    here the caller gets the same tallies with
    `out.groupBy('status').count()` — distributed and queryable.
    Descriptor cardinality is tiny -> both joins broadcast.
    """
    alias_map = descriptors.select(
        F.col("db_prefix").alias("__key"),
        F.explode(
            F.array_union(F.array(F.col("db_prefix")), F.col("aliases"))
        ).alias("__alias"),
    ).select(F.lower(F.col("__alias")).alias("__alias_lc"), "__key")

    prefix = F.element_at(F.split(F.col(id_col), ":", 2), 1)
    local = F.element_at(F.split(F.col(id_col), ":", 2), 2)
    x = xrefs.withColumn("__prefix", prefix).withColumn("__local", local)
    x = x.join(
        F.broadcast(alias_map),
        F.lower(F.col("__prefix")) == F.col("__alias_lc"),
        "left",
    )
    x = x.join(F.broadcast(descriptors), x["__key"] == descriptors["db_prefix"], "left")

    page = F.lit(None).cast("string") if page_col is None else F.col(page_col)
    page_url = F.element_at(F.col("pages"), page)
    template = F.when(page.isNotNull(), page_url).otherwise(F.col("default_url"))
    url = F.replace(template, F.lit("[%s]"), F.trim(F.col("__local")))
    gid_ok = F.regexp_like(
        F.concat_ws(":", F.col("__key"), F.col("__local")),
        F.concat(F.lit("(?i)"), F.col("gid_pattern")),
    )
    status = (
        F.when(F.col("__key").isNull(), "missing_key")
        .when(F.col("no_url"), "no_url")
        .when(template.isNull(), "missing_page")  # requested page absent OR no default_url
        .when(F.col("gid_pattern").isNull(), "missing_gid")
        .when(~gid_ok, "bad_gid")
        .otherwise("ok")
    )
    return (
        x.withColumn("status", status)
        .withColumn("url", F.when(F.col("status") == "ok", url))
        .drop("__alias_lc", "__key", "__prefix", "__local",
              "db_prefix", "default_url", "gid_pattern", "aliases", "pages", "no_url")
    )
