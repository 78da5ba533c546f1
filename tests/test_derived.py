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
