"""Derived passes: closure write-back + GO-slim rollup from an OBO file."""

from agr_loader_spark.derived import closure_pass, goslim_rollup
from agr_loader_spark.sources.formats import read_obo_terms

import pyspark.sql.functions as F

OBO = """format-version: 1.2

[Term]
id: GO:1
name: root
subset: goslim_agr

[Term]
id: GO:2
name: mid
is_a: GO:1

[Term]
id: GO:3
name: leaf-a
is_a: GO:2
subset: goslim_agr

[Term]
id: GO:4
name: leaf-b
is_a: GO:2
is_a: GO:3

[Term]
id: GO:5
name: island
"""


def test_obo_to_closure_to_rollup(spark, tmproot, tmp_path):
    f = tmp_path / "mini.obo"
    f.write_text(OBO)
    terms = read_obo_terms(spark, str(f))
    edges = terms.select(
        F.col("id").alias("child_id"), F.explode("is_a").alias("parent_id")
    )
    table = closure_pass(spark, edges, tmproot + "/closure")
    got = {(r["descendant_id"], r["ancestor_id"]) for r in table.read().collect()}
    assert got == {
        ("GO:2", "GO:1"),
        ("GO:3", "GO:2"), ("GO:3", "GO:1"),
        ("GO:4", "GO:2"), ("GO:4", "GO:3"), ("GO:4", "GO:1"),
    }
    # re-running the derived pass is a no-op (exactly-once)
    t2 = closure_pass(spark, edges, tmproot + "/closure")
    assert t2.snapshot_id == table.snapshot_id

    roll = {
        (r["term_id"], r["slim_term_id"])
        for r in goslim_rollup(terms, table.read()).collect()
    }
    # every term maps to its slim ancestors (or itself if in the slim)
    assert roll == {
        ("GO:1", "GO:1"),
        ("GO:2", "GO:1"),
        ("GO:3", "GO:1"), ("GO:3", "GO:3"),
        ("GO:4", "GO:1"), ("GO:4", "GO:3"),
    }


def test_count_regression_report(spark):
    """A1: per-label delta + shrink flag; labels missing on either side."""
    from agr_loader_spark.operators.counts import count_regression_report

    cur = spark.createDataFrame(
        [("gene", 100), ("allele", 80), ("new_label", 5)], "tbl string, n_rows long"
    )
    base = spark.createDataFrame(
        [("gene", 90), ("allele", 100), ("gone_label", 7)], "tbl string, n_rows long"
    )
    got = {r["label"]: r.asDict() for r in
           count_regression_report(cur, base).collect()}
    assert got["gene"]["delta"] == 10 and not got["gene"]["shrunk"]
    assert got["allele"]["delta"] == -20 and got["allele"]["shrunk"]
    assert got["new_label"]["baseline_rows"] == 0 and not got["new_label"]["shrunk"]
    assert got["gone_label"]["n_rows"] == 0 and got["gone_label"]["shrunk"]
    # 10% tolerance forgives a 5% shrink
    tol = {r["label"]: r["shrunk"] for r in
           count_regression_report(cur, base, tolerance=0.25).collect()}
    assert not tol["allele"]
