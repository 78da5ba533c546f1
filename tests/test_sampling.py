"""Split / sample / packing operators (training-data pipeline suite)."""

import pyspark.sql.functions as F

from agr_loader_spark.operators.sampling import (
    hash_split,
    pack_concat_chunks,
    pack_sequences_nextfit,
    stratified_sample,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(900)) + 1).alias("n_tok"),
    )


def test_hash_split_is_deterministic_and_proportional(spark):
    d = _docs(spark)
    s1 = hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    assert sum(counts.values()) == 400
    # stability: same assignment on a re-partitioned, re-built frame
    s2 = hash_split(d.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    # growing the corpus never moves an existing row
    s3 = hash_split(_docs(spark, 800), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    joined = s1.alias("a").join(s3.alias("b"), "doc_id").filter("a.split <> b.split")
    assert joined.count() == 0


def test_hash_split_md5_matches_python(spark):
    import hashlib

    rows = hash_split(_docs(spark, 50), "doc_id",
                      {"train": 0.8, "val": 0.1, "test": 0.1},
                      method="md5").collect()
    for r in rows:
        b = int(hashlib.md5(f"split{r['doc_id']}".encode()).hexdigest()[:5], 16)
        exp = "train" if b < int(0.8 * 16**5) else (
            "val" if b < int(0.9 * 16**5) else "test")
        assert r["split"] == exp


def test_stratified_sample_caps_only_named_strata(spark):
    d = _docs(spark).withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de"))
    out = stratified_sample(d, "doc_id", {"en": 0.2}, strata_col="lang")
    n_en = out.filter("lang = 'en'").count()
    n_de = out.filter("lang = 'de'").count()
    assert n_de == 200          # default fraction 1.0 keeps everything
    assert 10 <= n_en <= 80     # ~0.2 * 200 with hash variance
    # subset property: sampled rows are a subset of the input
    assert out.exceptAll(d).count() == 0


def test_pack_concat_chunks_window_math(spark):
    out = pack_concat_chunks(_docs(spark, 60), group_col="grp",
                             len_col="n_tok", max_len=1000).collect()
    by_grp = {}
    for r in sorted(out, key=lambda r: (r["grp"], r["doc_id"])):
        start = by_grp.get(r["grp"], 0)
        assert r["chunk_id"] == start // 1000
        assert r["chunk_offset"] == start % 1000
        end = start + r["n_tok"]
        assert r["spans_boundary"] == ((end - 1) // 1000 > start // 1000)
        by_grp[r["grp"]] = end


def test_pack_nextfit_invariants(spark):
    d = _docs(spark, 200)
    out = pack_sequences_nextfit(d, group_col="grp", len_col="n_tok",
                                 max_len=1000)
    rows = out.collect()
    assert len(rows) == 200  # every doc placed exactly once
    # no bin overflows unless it is a singleton oversized doc
    fills = (
        out.groupBy("group", "bin_id")
        .agg(F.sum(F.lit(0)).alias("z"))  # existence only
        .count()
    )
    assert fills > 0
    per_bin = {}
    for r in rows:
        per_bin.setdefault((r["group"], r["bin_id"]), []).append(r)
    lens = {r["doc_id"]: r["n_tok"] for r in d.collect()}
    for (_, _), members in per_bin.items():
        tot = sum(lens[m["doc_id"]] for m in members)
        assert tot <= 1000 or len(members) == 1
    # deterministic across re-partitioning
    out2 = pack_sequences_nextfit(d.repartition(13), group_col="grp",
                                  len_col="n_tok", max_len=1000)
    assert out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0


def test_contamination_pairs_detects_overlap(spark):
    from agr_loader_spark.operators.dedup_docs import contamination_pairs

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text here now"),
         (3, "quick brown fox appears again verbatim"),
         (4, "x")],  # sub-n-token doc: must not crash, never pairs
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], "doc_id long, text string")
    got = {(r["train_id"], r["n_common"]): r["containment"]
           for r in contamination_pairs(train, ev, n=2, min_common=2).collect()}
    # doc 1 shares "the quick","quick brown","brown fox","fox jumps" -> 4 of 5
    assert (1, 4) in got and abs(got[(1, 4)] - 0.8) < 1e-6
    # doc 3 shares "quick brown","brown fox" -> 2 of 5
    assert (3, 2) in got and abs(got[(3, 2)] - 0.4) < 1e-6
    assert not any(t == 2 or t == 4 for (t, _) in got)


def test_token_histogram_counts(spark):
    from agr_loader_spark.operators.textqc import token_histogram

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a  c"), (3, "")], "doc_id long, text string")
    got = {r["token"]: (r["n_occurrences"], r["n_docs"])
           for r in token_histogram(docs).collect()}
    assert got["a"] == (3, 2) and got["b"] == (1, 1) and got["c"] == (1, 1)
    assert "" not in got


def test_pack_nextfit_string_ids(spark):
    d = spark.createDataFrame(
        [("a", "g", 400), ("b", "g", 700), ("c", "g", 300)],
        "doc_id string, grp string, n_tok int")
    rows = {r["doc_id"]: r["bin_id"] for r in
            pack_sequences_nextfit(d, group_col="grp", len_col="n_tok",
                                   max_len=1000).collect()}
    assert rows == {"a": 0, "b": 1, "c": 1}
