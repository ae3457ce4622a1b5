"""Skew-mitigation join: salt the fact side, replicate the build side.

A shuffled join on a skewed key sends every row of the hot key to ONE
reducer — the straggler that turns a 10-minute job into a 10-hour one.
Two production answers, in preference order:

1. **AQE skew-join splitting** (``spark.sql.adaptive.skewJoin.enabled``,
   on in session.get_spark): Spark detects oversized partitions at
   runtime and splits them. Use this first — it needs no code change.
2. **Explicit salting** (this module): when AQE can't help — e.g. the
   skewed side feeds a sort-merge join whose other side is too big to
   broadcast but small enough to replicate ``n_salts`` times — spread
   each hot key across ``n_salts`` reducers deterministically.

``salted_join`` decorates the probe (skewed) side with a deterministic
salt derived from its OTHER columns (same-key rows scatter, replay is
reproducible — no RNG), replicates the build side once per salt value
(cost: |build| × n_salts, the explicit price of de-skewing), and joins on
(key, salt). Row-for-row identical output to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n_salts: int, *, exclude: list[str] | None = None) -> DataFrame:
    """Add a deterministic salt in [0, n_salts): xxhash64 of every column
    except ``exclude`` (normally the join key — salting must not depend on
    it, or hot-key rows would all hash alike)."""
    cols = [c for c in df.columns if c not in set(exclude or [])]
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    )


def replicate_per_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Cross the build side with salts 0..n_salts-1 (explode of a literal
    sequence — no shuffle; each row simply appears n_salts times)."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the probe side's hot keys are spread over
    ``n_salts`` reducers. Output columns and rows are identical to
    ``probe.join(build, on, how)``; only the shuffle distribution
    changes. ``how`` is limited to inner/left joins (build-side
    replication would duplicate unmatched right rows otherwise)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    p = with_salt(probe, n_salts, exclude=on)
    b = replicate_per_salt(build, n_salts)
    return p.join(b, [*on, SALT_COL], how).drop(SALT_COL)
