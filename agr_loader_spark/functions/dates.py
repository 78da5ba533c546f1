"""Multi-format date normalization (SURVEY.md T8).

The reference tries ISO then 6 strptime formats per value in Python
(ETLHelper.check_date_format, src/etl/helpers/etl_helper.py:303-340).
Spark-first: one `coalesce` over `try_to_timestamp` with each format —
a single JVM-side expression, no Python, null-safe (unparseable values
yield null instead of raising, which the caller counts as rejects)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the reference's format list, re-expressed as Spark datetime patterns
_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "MM/dd/yyyy",
    "yyyyMMdd",
    "yyyy",
]


def normalize_date(c: Column | str, formats: list[str] | None = None) -> Column:
    """Parse a string through the format cascade; emit canonical
    ISO-8601 `yyyy-MM-dd'T'HH:mm:ssZ` (the reference's canonical form,
    src/etl/helpers/etl_helper.py:338) or null."""
    col = F.col(c) if isinstance(c, str) else c
    parsed = F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in (formats or _FORMATS)])
    return F.date_format(parsed, "yyyy-MM-dd'T'HH:mm:ss'Z'")
