"""Operator unit tests: closure, FK guard, functions, format scans."""

import pyspark.sql.functions as F

from agr_loader_spark.functions.dates import normalize_date
from agr_loader_spark.functions.keys import composite_key
from agr_loader_spark.functions.text import negation_flip, split_curie, strip_html
from agr_loader_spark.operators.closure import transitive_closure
from agr_loader_spark.operators.fk_guard import fk_guard, reject_tally


def test_transitive_closure_matches_python_oracle(spark):
    edges = [("b", "a"), ("c", "b"), ("d", "b"), ("e", "c"), ("f", "a"), ("e", "d")]
    df = spark.createDataFrame(edges, "child_id string, parent_id string")
    got = {(r["descendant_id"], r["ancestor_id"]) for r in transitive_closure(df).collect()}
    # python fixpoint oracle
    exp = set(edges)
    changed = True
    while changed:
        new = {(c, a2) for (c, a) in exp for (c2, a2) in edges if c2 == a} - exp
        changed = bool(new)
        exp |= new
    assert got == exp


def test_fk_guard_counts(spark):
    facts = spark.createDataFrame(
        [(1, "g1"), (2, "g2"), (3, "gX"), (4, None)], "id int, gene_id string"
    )
    dim = spark.createDataFrame([("g1",), ("g2",)], "primary_id string")
    kept, rejected = fk_guard(facts, dim, fk="gene_id", dim_key="primary_id")
    assert {r["id"] for r in kept.collect()} == {1, 2}
    assert {r["id"] for r in rejected.collect()} == {3, 4}
    kept2, rej2 = fk_guard(facts, dim, fk="gene_id", dim_key="primary_id", keep_null_fk=True)
    assert {r["id"] for r in kept2.collect()} == {1, 2, 4}
    tally = {r["gene_id"]: r["n_rejected"] for r in reject_tally(rej2, "gene_id").collect()}
    assert tally == {"gX": 1}


def test_fk_guard_observed_one_pass(spark):
    """One-pass variant: kept matches fk_guard; reject count arrives via
    the Observation populated by whatever action consumes kept (no extra
    count job)."""
    from agr_loader_spark.operators.fk_guard import fk_guard_observed

    facts = spark.createDataFrame(
        [(1, "g1"), (2, "g2"), (3, "gX"), (4, None)], "id int, gene_id string"
    )
    dim = spark.createDataFrame([("g1",), ("g2",)], "primary_id string")
    kept, obs = fk_guard_observed(facts, dim, fk="gene_id",
                                  dim_key="primary_id", obs_name="fk_t1")
    assert {r["id"] for r in kept.collect()} == {1, 2}
    assert int(obs.get["n_rejected"]) == 2
    kept2, obs2 = fk_guard_observed(facts, dim, fk="gene_id",
                                    dim_key="primary_id", obs_name="fk_t2",
                                    keep_null_fk=True)
    assert {r["id"] for r in kept2.collect()} == {1, 2, 4}
    assert int(obs2.get["n_rejected"]) == 1


def test_composite_key_is_order_stable_for_arrays(spark):
    from agr_loader_spark.functions.keys import sorted_array_key

    df = spark.createDataFrame(
        [("o1", ["b", "a"]), ("o2", ["a", "b"])], "oid string, withs array<string>"
    )
    keys = df.select(composite_key(F.lit("X"), sorted_array_key("withs")).alias("k")).collect()
    assert keys[0]["k"] == keys[1]["k"]


def test_normalize_date_cascade(spark):
    df = spark.createDataFrame(
        [("2024-03-05 10:11:12",), ("2024/03/05",), ("03/05/2024",), ("garbage",)],
        "d string",
    )
    got = [r["n"] for r in df.select(normalize_date("d").alias("n")).collect()]
    assert got == [
        "2024-03-05T10:11:12Z", "2024-03-05T00:00:00Z", "2024-03-05T00:00:00Z", None,
    ]


def test_text_transforms(spark):
    df = spark.createDataFrame([("MGI:123:x", "<i>gene</i> desc", "IS_IMPLICATED_IN", "NOT")],
                               "curie string, html string, assoc string, neg string")
    p, l = split_curie("curie")
    row = df.select(
        p.alias("prefix"), l.alias("local"),
        strip_html("html").alias("clean"),
        negation_flip("assoc", "neg", {"IS_IMPLICATED_IN": "IS_NOT_IMPLICATED_IN"}).alias("a"),
    ).collect()[0]
    assert row["prefix"] == "MGI" and row["local"] == "123:x"
    assert row["clean"] == "gene desc"
    assert row["a"] == "IS_NOT_IMPLICATED_IN"


def test_format_scans(spark, tmp_path):
    from agr_loader_spark.sources.formats import (
        read_commented_tsv, read_gaf, read_gff3, read_obo_terms,
    )

    tsv = tmp_path / "x.tsv"
    tsv.write_text("# comment\na\t1\nb\t2\n")
    df = read_commented_tsv(spark, str(tsv), schema="name string, v int")
    assert df.count() == 2

    gaf = tmp_path / "x.gaf"
    gaf.write_text("!gaf-version: 2.2\nMGI\t97490\tPax6\t\tGO:0007275\tPMID:1\tIEA\n")
    g = read_gaf(spark, str(gaf))
    assert g.select("gene_id").collect()[0][0] == "MGI:97490"

    gff = tmp_path / "x.gff3"
    gff.write_text(
        "##gff-version 3\n#!assembly GRCm39\n"
        "chr1\tNCBI\tgene\t100\t200\t.\t+\t.\tID=gene1;Name=Pax6\n"
        "chr1\tNCBI\tmRNA\t100\t200\t.\t+\t.\tID=t1;Parent=gene1\n"
    )
    feats, headers = read_gff3(spark, str(gff))
    assert feats.count() == 2
    row = feats.filter(F.col("type") == "gene").collect()[0]
    assert row["attrs"]["ID"] == "gene1" and row["start"] == 100
    assert {r["key"]: r["val"] for r in headers.collect()} == {"assembly": "GRCm39"}

    obo = tmp_path / "x.obo"
    obo.write_text(
        "format-version: 1.2\n\n[Term]\nid: GO:1\nname: root\n\n"
        "[Term]\nid: GO:2\nname: child\nis_a: GO:1 ! root\nsubset: goslim_agr\n\n"
        "[Typedef]\nid: part_of\n"
    )
    terms = read_obo_terms(spark, str(obo))
    rows = {r["id"]: r for r in terms.collect()}
    assert set(rows) == {"GO:1", "GO:2"}
    assert rows["GO:2"]["is_a"] == ["GO:1"] and rows["GO:2"]["subsets"] == ["goslim_agr"]


def test_hgvs_nomenclature_matches_reference_semantics(spark):
    """T14: column cascade reproduces get_hgvs_nomenclature
    (src/etl/variation_etl.py:194-237) for all 5 SO families, the
    unknown-type empty result, and null position/sequence formatting."""
    from agr_loader_spark.functions.hgvs import hgvs_nomenclature, hgvs_synonym

    rows = [
        # (refseq, vtype, start, end, ref, var, expect_hgvs, expect_syn)
        ("RefSeq:NM_1", "SO:1000002", 10, 10, "A", "T", "NM_1:g.10A>T", "(R6)2L:10A>T"),
        ("RefSeq:NM_2", "SO:1000008", 7, 7, "G", "C", "NM_2:g.7G>C", "(R6)2L:7G>C"),
        ("RefSeq:NM_3", "SO:0000667", 5, 6, "A", "GG", "NM_3:g.5_6insGG", "(R6)2L:5_6insGG"),
        ("RefSeq:NM_4", "SO:0000159", 5, 9, "ACGTA", None, "NM_4:g.5_9del", "(R6)2L:5_9del"),
        ("RefSeq:NM_5", "SO:0002007", 5, 7, "ACG", "TTT", "NM_5:g.5_7delinsTTT", "(R6)2L:5_7delinsTTT"),
        ("RefSeq:NM_6", "SO:1000032", 5, 7, "ACG", "TT", "NM_6:g.5_7delinsTT", "(R6)2L:5_7delinsTT"),
        ("RefSeq:NM_7", "SO:9999999", 5, 7, "A", "T", "", ""),
        ("RefSeq:NM_8", "SO:1000002", None, None, None, None, "NM_8:g.>", "(R6)2L:>"),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows],
        "refseq string, vt string, s int, e int, ref string, var string",
    )
    got = df.select(
        hgvs_nomenclature("refseq", "vt", "s", "e", "ref", "var").alias("h"),
        hgvs_synonym(F.lit("R6"), F.lit("2L"), "vt", "s", "e", "ref", "var").alias("syn"),
    ).collect()
    for r, g in zip(rows, got):
        assert g["h"] == r[6], r[0]
        assert g["syn"] == r[7], r[0]
