"""Key-generation expressions for dimensional modelling.

Byte-compatible with the reference's key scheme so surrogate keys survive a
migration: 12-hex-char MD5 over '|'-joined natural key parts
(reference: base_transformer.py:53-56) and integer yyyyMMdd date keys
(base_transformer.py:58-61). Pure Column expressions — codegen'd JVM-side,
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_key(*cols: Column | str) -> Column:
    """First 12 hex chars of md5('part1|part2|...'). Deterministic and
    idempotent, so re-running a build regenerates identical keys."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.substring(F.md5(F.concat_ws("|", *parts)), 1, 12)


def date_key(col: Column | str) -> Column:
    """Integer yyyyMMdd key from a date/timestamp/ISO-string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.to_date(F.substring(c.cast("string"), 1, 10)), "yyyyMMdd").cast("int")
