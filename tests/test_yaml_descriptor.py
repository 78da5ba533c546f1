"""S12 YAML scan + T13 resource-descriptor URL machinery."""

import pyspark.sql.functions as F

from agr_loader_spark.sources.yaml_source import (
    read_resource_descriptors,
    resolve_urls,
    species_frames,
)

SPECIES_YAML = """
- taxonId: "NCBITaxon:7227"
  fullName: "Drosophila melanogaster"
  shortName: "Dmel"
  commonNames: ["fly", "fruit fly"]
  primaryDataProvider:
    dataProviderFullName: "FlyBase"
    dataProviderShortName: "FB"
  phylogenicOrder: 60
- taxonId: "NCBITaxon:6239"
  fullName: "Caenorhabditis elegans"
  shortName: "Cele"
  commonNames: ["worm"]
  primaryDataProvider:
    dataProviderFullName: "WormBase"
    dataProviderShortName: "WB"
  phylogenicOrder: 50
"""

DESCRIPTOR_YAML = """
- db_prefix: RGD
  default_url: "https://rgd.example/id/[%s]"
  gid_pattern: "^RGD:\\\\d+$"
  pages:
    - name: gene
      url: "https://rgd.example/gene/[%s]"
- db_prefix: MGI
  gid_pattern: "^MGI:\\\\d+$"
  aliases: ["MGD", "JAX"]
  default_url: "https://mgi.example/[%s]"
- db_prefix: SILENT
  no_url: true
  gid_pattern: "^SILENT:.*$"
- db_prefix: NOPAT
  default_url: "https://nopat.example/[%s]"
"""


def test_species_yaml_frames(spark, tmproot):
    p = tmproot + "/species.yaml"
    open(p, "w").write(SPECIES_YAML)
    species, synonyms = species_frames(spark, p)
    rows = {r["taxonId"]: r.asDict() for r in species.collect()}
    assert rows["NCBITaxon:7227"]["dataProviderShortName"] == "FB"
    assert rows["NCBITaxon:7227"]["commonNames"] == ["fly", "fruit fly"]
    assert rows["NCBITaxon:6239"]["phylogeneticOrder"] == 50
    syn = {(r["taxonId"], r["synonym"]) for r in synonyms.collect()}
    assert syn == {("NCBITaxon:7227", "fly"), ("NCBITaxon:7227", "fruit fly"),
                   ("NCBITaxon:6239", "worm")}


def test_resource_descriptor_url_resolution(spark, tmproot):
    p = tmproot + "/resourceDescriptors.yaml"
    open(p, "w").write(DESCRIPTOR_YAML)
    desc = read_resource_descriptors(spark, p)
    xrefs = spark.createDataFrame(
        [("RGD:1311419", None), ("rgd:7", None), ("MGD:80863", None),
         ("jax:5", None), ("SILENT:x", None), ("UNKNOWN:1", None),
         ("RGD:notdigits", None), ("NOPAT:9", None)],
        "identifier string, page string",
    )
    out = {r["identifier"]: r.asDict()
           for r in resolve_urls(xrefs, desc).collect()}
    assert out["RGD:1311419"]["status"] == "ok"
    assert out["RGD:1311419"]["url"] == "https://rgd.example/id/1311419"
    assert out["rgd:7"]["status"] == "ok", "prefix match is case-insensitive"
    assert out["MGD:80863"]["status"] == "ok", "alias resolves to MGI"
    assert out["MGD:80863"]["url"] == "https://mgi.example/80863"
    assert out["jax:5"]["url"] == "https://mgi.example/5"
    assert out["SILENT:x"]["status"] == "no_url" and out["SILENT:x"]["url"] is None
    assert out["UNKNOWN:1"]["status"] == "missing_key"
    assert out["RGD:notdigits"]["status"] == "bad_gid"
    assert out["NOPAT:9"]["status"] == "missing_gid"
    # per-page resolution + missing-page tally
    paged = spark.createDataFrame(
        [("RGD:12", "gene"), ("RGD:12", "allele"), ("MGI:3", "gene")],
        "identifier string, page string",
    )
    pout = resolve_urls(paged, desc, page_col="page").collect()
    by = {(r["identifier"], r["page"]): r.asDict() for r in pout}
    assert by[("RGD:12", "gene")]["url"] == "https://rgd.example/gene/12"
    assert by[("RGD:12", "allele")]["status"] == "missing_page"
    assert by[("MGI:3", "gene")]["status"] == "missing_page"
    # driver-free tallies: one groupBy gives the reference's counters
    tally = {r["status"]: r["count"]
             for r in resolve_urls(xrefs, desc).groupBy("status").count().collect()}
    assert tally == {"ok": 4, "no_url": 1, "missing_key": 1,
                     "bad_gid": 1, "missing_gid": 1}
