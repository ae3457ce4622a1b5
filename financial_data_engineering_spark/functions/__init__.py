from financial_data_engineering_spark.functions.keys import date_key, surrogate_key
from financial_data_engineering_spark.functions.text import (
    fingerprint,
    lang_score,
    punct_ratio,
    quality_score,
    stopword_hits,
    token_count,
)
from financial_data_engineering_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "cosine_similarity",
    "date_key",
    "dot_product",
    "fingerprint",
    "l2_norm",
    "lang_score",
    "punct_ratio",
    "quality_score",
    "stopword_hits",
    "surrogate_key",
    "token_count",
]
