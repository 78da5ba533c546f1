"""HGVS nomenclature builder (SURVEY.md T14).

The reference assembles genomic HGVS names and their assembly-prefixed
synonyms per row in Python (src/etl/variation_etl.py:194-237:
`get_hgvs_nomenclature`), switching on the SO variant-type term. Here
the same cascade is a pure Column when/otherwise + concat chain —
JVM-side, whole-stage codegen, no UDF — applied to whole variant
tables at once.

Null handling mirrors the reference exactly: null positions/sequences
format as empty strings; an unrecognized variant type yields ''.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# SO term -> suffix family (src/etl/variation_etl.py:216-232)
POINT_TYPES = ("SO:1000002", "SO:1000008")   # point mutation / substitution
INSERTION = "SO:0000667"
DELETION = "SO:0000159"
DELINS_TYPES = ("SO:0002007", "SO:1000032")  # MNV / delin


def _s(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(col.cast("string"), F.lit(""))


def _suffix(variant_type, end_position, reference_sequence, variant_sequence) -> Column:
    vt = F.col(variant_type) if isinstance(variant_type, str) else variant_type
    end_s = _s(end_position)
    ref_s = _s(reference_sequence)
    var_s = _s(variant_sequence)
    return (
        F.when(vt.isin(*POINT_TYPES), F.concat(ref_s, F.lit(">"), var_s))
        .when(vt == INSERTION, F.concat(F.lit("_"), end_s, F.lit("ins"), var_s))
        .when(vt == DELETION, F.concat(F.lit("_"), end_s, F.lit("del")))
        .when(vt.isin(*DELINS_TYPES), F.concat(F.lit("_"), end_s, F.lit("delins"), var_s))
    )


def hgvs_nomenclature(
    refseq_id: Column | str,
    variant_type: Column | str,
    start_position: Column | str,
    end_position: Column | str,
    reference_sequence: Column | str,
    variant_sequence: Column | str,
) -> Column:
    """`<refseq curie local part>:g.<start><type suffix>` — '' for
    unrecognized variant types (reference behavior)."""
    rid = F.col(refseq_id) if isinstance(refseq_id, str) else refseq_id
    base = F.concat(
        F.element_at(F.split(rid, ":"), 2), F.lit(":g."), _s(start_position)
    )
    sfx = _suffix(variant_type, end_position, reference_sequence, variant_sequence)
    return F.when(sfx.isNotNull(), F.concat(base, sfx)).otherwise(F.lit(""))


def hgvs_synonym(
    assembly: Column | str,
    chromosome: Column | str,
    variant_type: Column | str,
    start_position: Column | str,
    end_position: Column | str,
    reference_sequence: Column | str,
    variant_sequence: Column | str,
) -> Column:
    """`(<assembly>)<chromosome>:<start><type suffix>` — the synonym
    twin of `hgvs_nomenclature` (variation_etl.py:215)."""
    base = F.concat(
        F.lit("("), _s(assembly), F.lit(")"), _s(chromosome), F.lit(":"),
        _s(start_position),
    )
    sfx = _suffix(variant_type, end_position, reference_sequence, variant_sequence)
    return F.when(sfx.isNotNull(), F.concat(base, sfx)).otherwise(F.lit(""))
