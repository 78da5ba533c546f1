"""Sequence-slice operators (S10/T15/T16 analogs): chunked random access
equals direct substring; reverse-complement; codon translation."""

import pyspark.sql.functions as F

from agr_loader_spark.operators.sequence import (
    chunk_contigs,
    reverse_complement,
    slice_intervals,
    translate_cds,
)


def _contigs(spark, n=20, seed_len=500):
    # deterministic fake "genome": per-contig repeated ACGT-ish pattern,
    # contig lengths NOT multiples of the chunk size
    return spark.range(n).select(
        F.concat(F.lit("chr"), F.col("id")).alias("contig"),
        F.repeat(
            F.concat(F.lit("ACGTTGCA"), F.conv(F.col("id") % 16, 10, 4)), 80
        ).substr(
            F.lit(1), (seed_len + (F.col("id") * 37) % 113).cast("int")
        ).alias("seq"),
    )


def test_slice_matches_substring_oracle(spark):
    contigs = _contigs(spark)
    chunks = chunk_contigs(contigs, chunk_size=64)
    # intervals spanning 1..3+ chunks, including chunk-boundary hits
    intervals = contigs.select(
        F.concat(F.lit("iv_"), F.col("contig")).alias("interval_id"),
        "contig",
        (1 + F.abs(F.xxhash64("contig")) % 150).alias("start"),
    ).withColumn("end", F.col("start") + 1 + F.abs(F.xxhash64("contig", F.lit(2))) % 200)
    got = slice_intervals(chunks, intervals, chunk_size=64)
    oracle = intervals.join(contigs, "contig").select(
        "interval_id",
        F.col("seq").substr(F.col("start"), F.col("end") - F.col("start") + 1).alias("want"),
    )
    cmp = got.join(oracle, "interval_id")
    assert cmp.count() == 20
    assert cmp.filter(F.col("seq") != F.col("want")).count() == 0
    # boundary-exact case: slice exactly one whole chunk
    one = spark.createDataFrame(
        [("x", "chr1", 65, 128)], "interval_id string, contig string, start int, end int"
    )
    row = slice_intervals(chunks, one, chunk_size=64).collect()[0]
    want = contigs.filter("contig='chr1'").select(
        F.substring("seq", 65, 64).alias("w")
    ).collect()[0]["w"]
    assert row["seq"] == want


def test_reverse_complement_involution(spark):
    df = spark.createDataFrame([("ACGTNacgt",)], "seq string")
    rc = df.select(reverse_complement("seq").alias("rc"))
    assert rc.collect()[0]["rc"] == "acgtNACGT"
    # applying twice returns the original
    twice = df.select(reverse_complement(reverse_complement("seq")).alias("s"))
    assert twice.collect()[0]["s"] == "ACGTNacgt"


def test_translate_cds_known_codons(spark):
    df = spark.createDataFrame(
        [("ATGGCCTAA",), ("atggcc",), ("ATGGC",), (None,)], "cds string"
    )
    out = [r["p"] for r in df.select(translate_cds("cds").alias("p")).collect()]
    assert out == ["MA*", "MA", "M", None]


def test_degenerate_inputs_yield_zero_rows(spark):
    """ADVICE r1: empty sequences and inverted intervals must produce
    NOTHING deterministically — not spurious rows from a descending
    sequence() range."""
    from agr_loader_spark.operators.sequence import chunk_contigs, slice_intervals

    contigs = spark.createDataFrame(
        [("empty", ""), ("chrZ", "ACGTACGTACGT")], "contig string, seq string"
    )
    chunks = chunk_contigs(contigs, chunk_size=4)
    rows = chunks.collect()
    assert all(r["contig"] == "chrZ" for r in rows)
    assert sorted(r["chunk_idx"] for r in rows) == [0, 1, 2]
    # inverted interval (end < start) -> zero output rows
    bad = spark.createDataFrame(
        [("inv", "chrZ", 9, 4), ("ok", "chrZ", 5, 8)],
        "interval_id string, contig string, start int, end int",
    )
    out = slice_intervals(chunks, bad, chunk_size=4).collect()
    assert len(out) == 1 and out[0]["interval_id"] == "ok"
    assert out[0]["seq"] == "ACGT"
