"""Deterministic key derivation (SURVEY.md T9/T10).

The reference builds composite uniqueness keys by raw string concat —
`disease_unique_key` = objectId + conditions + associationType + DOid +
sorted(withs) (src/etl/disease_etl.py:479-495), VEP key = hgvs +
consequence + impact + geneId (src/etl/vep_etl.py:131) — and elsewhere
mints `uuid.uuid4()` per row (src/etl/bgi_etl.py:509), which breaks
replay determinism (SURVEY.md §7.5). The engine always derives: sort any
set-valued parts, concat with an unambiguous separator, sha2.
All pure Column expressions (JVM-side, codegen).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def composite_key(*parts: Column | str, bits: int = 256) -> Column:
    """sha2 hash of '\\x1f'-joined SCALAR parts (nulls encode as '').
    Set-valued parts must be pre-canonicalized with `sorted_array_key`
    (the reference's sorted(with_record), src/etl/disease_etl.py:421) —
    a Column carries no schema pre-analysis, so array handling is the
    caller's explicit choice, not a silent guess."""
    cols = []
    for p in parts:
        c = F.col(p) if isinstance(p, str) else p
        cols.append(F.when(c.isNull(), F.lit("")).otherwise(c.cast("string")))
    return F.sha2(F.concat_ws("\x1f", *cols), bits)


def sorted_array_key(c: Column | str) -> Column:
    """Canonical string form of an array part for composite_key."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(col.isNull(), F.lit("")).otherwise(F.array_join(F.array_sort(col), "\x1e"))
