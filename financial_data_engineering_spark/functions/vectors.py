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


# -- Fixed-dimension unrolled variants ---------------------------------------
#
# Spark's array lambdas (zip_with/aggregate) are CodegenFallback: they run
# interpreted, with per-call allocation, and the optimizer happily inlines
# them into join conditions — per-PAIR interpreted evaluation that turns an
# O(n²) similarity join from seconds into hours. When the dimension is known
# (embedding columns always have one), unrolling into flat element_at
# arithmetic keeps the whole expression inside whole-stage codegen at ~100×
# the throughput. The summation order (left-to-right) is identical to the
# fold above, so both produce bit-identical doubles.
#
# The unrolled tree is built as ONE SQL string handed to a single F.expr
# call when the operand is a column NAME: composing ~200 Column objects
# through py4j costs ~2 s of driver time per expression (one JVM round
# trip per node), which dominated small-corpus similarity queries. The
# parsed tree is identical — SQL + and * are left-associative — so results
# are bit-for-bit the same as the Column-composed form, which remains the
# fallback for arbitrary Column operands.


def _term_sql(a: str, b: str, j: int) -> str:
    return (
        f"(CAST(element_at({a}, {j}) AS DOUBLE) * "
        f"CAST(element_at({b}, {j}) AS DOUBLE))"
    )


def _quote(name: str) -> str:
    return f"`{name}`"


def dot_product_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Unrolled dot product for vectors of known length ``dim``. Pass
    column names (not Columns) in hot paths — see module note."""
    if isinstance(a, str) and isinstance(b, str):
        qa, qb = _quote(a), _quote(b)
        return F.expr(
            " + ".join(_term_sql(qa, qb, j) for j in range(1, dim + 1))
        )
    total = None
    for j in range(1, dim + 1):
        term = F.element_at(a, j).cast("double") * F.element_at(b, j).cast("double")
        total = term if total is None else total + term
    return total


def int_dot_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Unrolled INTEGER dot product of two long-array columns of known
    length ``dim`` — exact int64 (codes are bounded, e.g. int8 codes
    give terms ≤ 255² and 64-dim sums ≤ 4.2e6), fully codegen'd. The
    first-pass scorer of quantized retrieval: no float enters, so the
    score is hash-comparable across engines."""
    if isinstance(a, str) and isinstance(b, str):
        qa, qb = _quote(a), _quote(b)
        return F.expr(
            " + ".join(
                f"(element_at({qa}, {j}) * element_at({qb}, {j}))"
                for j in range(1, dim + 1)
            )
        )
    total = None
    for j in range(1, dim + 1):
        term = F.element_at(a, j) * F.element_at(b, j)
        total = term if total is None else total + term
    return total


def l2_norm_fixed(a: Column | str, dim: int) -> Column:
    return F.sqrt(dot_product_fixed(a, a, dim))


def cosine_similarity_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Unrolled cosine similarity; 0.0 when either norm is zero."""
    denom = l2_norm_fixed(a, dim) * l2_norm_fixed(b, dim)
    return F.when(denom > 0, dot_product_fixed(a, b, dim) / denom).otherwise(
        F.lit(0.0)
    )
