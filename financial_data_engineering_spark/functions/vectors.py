"""Vector (embedding-column) expressions: dot product, norms, cosine.

Built on Spark's higher-order array functions (``zip_with`` + ``aggregate``)
so the math runs JVM-side inside codegen — no Python, no UDF, usable in any
join/filter/window. Inputs are ``array<float>``; math is done in double.

For very wide vectors (>4k dims) a vectorized Pandas UDF over Arrow batches
becomes competitive; these expressions are the default because they keep
the whole plan in one codegen stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise product folded left-to-right (matches DuckDB
    list_dot_product fold order to within float associativity)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))
