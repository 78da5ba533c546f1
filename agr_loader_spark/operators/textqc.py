"""Text analysis for training-data pipelines over a `documents` table.

First-class engine components beyond the reference's own operators (per
the build brief): language-ID (marker-word heuristic), quality scoring,
token counting, document fingerprinting. Everything except the rolling
-hash fingerprint is a pure Column expression (JVM-side); the
fingerprint is a vectorized pandas UDF (Arrow batches, no per-row
Python interpreter dispatch).

Every computation here is intentionally expressible in ANSI SQL too, so
the DuckDB oracle can verify it bit-for-bit (floats are rounded to 6dp
on both sides before comparison).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# marker words per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "a", "and"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
    "zh": ["de5", "shi4", "le5"],
}

STOPWORDS = ["the", "a", "and", "of", "to"]


def tokens_col(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(t), "\\s+")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the 'BPE-ish' baseline tokenizer)."""
    return F.size(tokens_col(text))


def _marker_hits(toks: Column, words: list[str]) -> Column:
    """Count of tokens in the marker set — one filter lambda per call
    (multiple `x == lit` lambdas combined in one expression tree
    mis-bind their lambda variables in pyspark 4; set-membership via
    array_contains sidesteps that and matches the oracle's `x IN (...)`)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def lang_id(text: Column | str) -> Column:
    """argmax over per-language marker-word hit counts; ties break by
    language code ascending (deterministic)."""
    toks = tokens_col(text)
    scored = F.array(
        *[
            F.struct(
                _marker_hits(toks, ws).alias("hits"),
                F.lit(code).alias("code"),
            )
            for code, ws in sorted(LANG_MARKERS.items())
        ]
    )
    # max by (hits, reversed-code) -> highest hits, lowest code on ties
    best = F.array_sort(
        scored,
        lambda a, b: F.when(a["hits"] != b["hits"], b["hits"] - a["hits"]).otherwise(
            F.when(a["code"] < b["code"], F.lit(-1)).otherwise(F.lit(1))
        ),
    ).getItem(0)
    return best["code"]


def quality_score(text: Column | str, n_chars: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: length + punctuation +
    stopword-density components, rounded to 6dp for oracle comparison."""
    t = F.col(text) if isinstance(text, str) else text
    nc = (F.col(n_chars) if isinstance(n_chars, str) else n_chars).cast("double")
    toks = tokens_col(t)
    n_tok = F.size(toks).cast("double")
    punct_ratio = F.length(F.regexp_replace(t, "[a-z0-9 ]", "")).cast("double") / nc
    stop_ratio = _marker_hits(toks, STOPWORDS).cast("double") / n_tok
    score = (
        F.lit(0.4) * F.least(nc / F.lit(500.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * stop_ratio
    )
    return F.round(score, 6)


_FP_BASE = np.uint64(1099511628211)  # FNV prime; arithmetic mod 2^64


def rolling_fingerprint_str(s: str | None) -> int:
    """Scalar reference implementation (used by the pytest oracle)."""
    if s is None:
        return 0
    h = 0
    for byte in s.encode("utf-8"):
        h = (h * int(_FP_BASE) + byte) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 64) if h >= (1 << 63) else h


@pandas_udf(T.LongType())
def doc_fingerprint(text: pd.Series) -> pd.Series:
    """Polynomial rolling hash of the whole document, mod 2^64.

    Vectorized per Arrow batch: uint64 wraparound makes cumprod the
    power table, so the per-document fold is pure numpy (no Python
    per-character loop) — the scale path for content-addressed
    fingerprinting where a cryptographic hash is overkill.
    """
    out = np.zeros(len(text), dtype=np.uint64)
    for i, s in enumerate(text):
        if s is None:
            continue
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) == 0:
            continue
        pows = np.cumprod(np.full(len(b), _FP_BASE, dtype=np.uint64), dtype=np.uint64)
        pows = np.concatenate(([np.uint64(1)], pows[:-1]))  # base^0..base^(n-1)
        out[i] = np.sum(b * pows[::-1], dtype=np.uint64)
    return pd.Series(out.view(np.int64))


def document_profile(docs: DataFrame) -> DataFrame:
    """One-pass QC projection over a documents table."""
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tok"),
        lang_id("text").alias("lang_pred"),
        quality_score("text", "n_chars").alias("quality"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
    )


def token_histogram(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_freq: int = 1,
) -> DataFrame:
    """Corpus token-frequency table: (token, n_occurrences, n_docs).
    The vocabulary/frequency pass every tokenizer-training or
    stopword-mining pipeline runs. One explode + one groupBy shuffle;
    partial (map-side) aggregation collapses each partition's repeats
    before the shuffle, so the shuffle volume is bounded by
    distinct-tokens-per-partition, not corpus tokens."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("token")
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_freq)
    )
