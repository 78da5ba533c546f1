"""Identifier / text column transforms (SURVEY.md T5-T7, T11-T13, T18).

All pure Column expressions — the reference does these per-row in Python
(e.g. CURIE split src/etl/bgi_etl.py:283, HTML strip
src/etl/helpers/text_processing_helper.py:8-17, provider renames
src/etl/helpers/etl_helper.py:184-213)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_curie(c: Column | str) -> tuple[Column, Column]:
    """'MGI:123' -> ('MGI', '123'); local part keeps any further colons
    (split limit 2, matching split_identifier,
    src/etl/helpers/resource_descriptor_helper_2.py:203-231)."""
    col = F.col(c) if isinstance(c, str) else c
    parts = F.split(col, ":", 2)
    return parts.getItem(0), parts.getItem(1)


def has_curie_shape(c: Column | str) -> Column:
    """The reference's `':' not in id` guard (src/etl/bgi_etl.py:287-288)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.contains(":")


def normalize_prefix(c: Column | str, renames: dict[str, str]) -> Column:
    """Provider prefix renames (XB->Xenbase etc., src/etl/etl.py:126-128)
    as a when/otherwise chain over the prefix."""
    col = F.col(c) if isinstance(c, str) else c
    prefix, local = split_curie(col)
    out = prefix
    for old, new in renames.items():
        out = F.when(prefix == old, F.lit(new)).otherwise(out)
    return F.concat_ws(":", out, local)


def strip_html(c: Column | str) -> Column:
    """Remove closing then any tags — the reference's two regex passes
    (src/etl/helpers/text_processing_helper.py:8-17)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.regexp_replace(col, "</.*?>", ""), "<.*?>", "")


def decorate_symbol(symbol: Column | str, species: Column | str) -> Column:
    """`symbol (shortSpecies)` (src/etl/bgi_etl.py:497)."""
    s = F.col(symbol) if isinstance(symbol, str) else symbol
    sp = F.col(species) if isinstance(species, str) else species
    return F.format_string("%s (%s)", s, sp)


def negation_flip(assoc: Column | str, negation: Column | str, flips: dict[str, str]) -> Column:
    """IS_IMPLICATED_IN -> IS_NOT_IMPLICATED_IN when negated
    (src/etl/disease_etl.py:383-400)."""
    a = F.col(assoc) if isinstance(assoc, str) else assoc
    n = F.col(negation) if isinstance(negation, str) else negation
    negated = a
    for pos, neg in flips.items():
        negated = F.when(a == pos, F.lit(neg)).otherwise(negated)
    return F.when(n.isNotNull() & (n != ""), negated).otherwise(a)


def publication_id(c: Column | str) -> Column:
    """T19: publication-id regex cascade. The reference tries, in order,
    pubmed / DOI / FBrf patterns case-insensitively and rewrites the
    scheme token of the first hit (src/etl/molecular_interaction_etl.py:
    406-428: ('pubmed...'->'PMID', 'DOI'->'doi', 'flybase'->'FB'));
    unresolvable -> NULL (the reference skips the row and tallies it).
    One deviation, deliberate: the scheme rewrite here is
    case-insensitive too (the reference's str.replace would leave
    'PubMed:1' unrewritten after a case-insensitive match — a quirk, not
    a semantic)."""
    col = F.col(c) if isinstance(c, str) else c
    pm = F.regexp_extract(col, r"(?i)(pubmed:\d+)", 1)
    doi = F.regexp_extract(col, r"(?i)^((?:DOI:)?\d{2}\.\d{4}.*)$", 1)
    fb = F.regexp_extract(col, r"(?i)^(flybase:FBrf\d+)", 1)
    return (
        F.when(pm != "", F.regexp_replace(pm, r"(?i)pubmed", "PMID"))
        .when(doi != "", F.regexp_replace(doi, r"(?i)DOI", "doi"))
        .when(fb != "", F.regexp_replace(fb, r"(?i)flybase", "FB"))
        .otherwise(F.lit(None).cast("string"))
    )
