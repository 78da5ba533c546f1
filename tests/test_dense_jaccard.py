"""Round-6 dense-vocab fast path: the blocked indicator-GEMM kernel in
dedup_docs must (a) engage on small-vocab corpora, (b) produce rows
identical to the hashed-shingle join path, and (c) fall back cleanly
when its caps trip."""

import os

import pyspark.sql.functions as F
import pytest

from agr_loader_spark.operators.dedup_docs import (
    _dense_set_index,
    _shingle_sets,
    contamination_pairs,
    ngram_jaccard_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _legacy(monkeypatch_env, fn):
    os.environ["SPARK_JACCARD_DENSE"] = "0"
    try:
        return fn()
    finally:
        os.environ.pop("SPARK_JACCARD_DENSE", None)


def test_dense_index_engages_on_small_vocab(spark, docs):
    sets = _shingle_sets(docs, "text", "doc_id", 2)
    index, _ = _dense_set_index(sets, "doc_id")
    assert index is not None
    vocab, ids, ns, indptr, flat = index
    assert len(ids) == docs.count()
    assert int(ns.sum()) == int(len(flat))
    # every per-doc entry resolves inside the vocab
    assert flat.min() >= 0 and flat.max() < len(vocab)


def test_dense_pairs_equal_join_path(spark, docs):
    dense = _rows(ngram_jaccard_pairs(docs, threshold=0.5, n=2))
    legacy = _legacy(None, lambda: _rows(
        ngram_jaccard_pairs(docs, threshold=0.5, n=2)))
    assert dense == legacy and len(dense) > 0


def test_dense_contamination_equals_join_path(spark, docs):
    ev = docs.filter(F.col("doc_id") % 101 == 0)
    dense = _rows(contamination_pairs(docs, ev, n=2, min_common=2))
    legacy = _legacy(None, lambda: _rows(
        contamination_pairs(docs, ev, n=2, min_common=2)))
    assert dense == legacy and len(dense) > 0


def test_dense_plan_is_map_in_arrow(spark, docs):
    plan = ngram_jaccard_pairs(docs, threshold=0.5, n=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "MapInArrow" in plan


def test_vocab_cap_falls_back_to_join_path(spark, docs):
    os.environ["SPARK_JACCARD_DENSE_VOCAB_CAP"] = "4"
    try:
        # cap is read at import time for the default but the helper
        # re-reads env? no — module constant; patch the module instead
        import agr_loader_spark.operators.dedup_docs as dd

        old = dd._DENSE_VOCAB_CAP
        dd._DENSE_VOCAB_CAP = 4
        try:
            sets = _shingle_sets(docs, "text", "doc_id", 2)
            assert _dense_set_index(sets, "doc_id")[0] is None
            plan = ngram_jaccard_pairs(docs, threshold=0.5)._jdf.queryExecution(
            ).executedPlan().toString()
            assert "MapInArrow" not in plan
        finally:
            dd._DENSE_VOCAB_CAP = old
    finally:
        os.environ.pop("SPARK_JACCARD_DENSE_VOCAB_CAP", None)


def test_max_df_keeps_join_path(spark, docs):
    plan = ngram_jaccard_pairs(docs, threshold=0.5, max_df=50)._jdf\
        .queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan
