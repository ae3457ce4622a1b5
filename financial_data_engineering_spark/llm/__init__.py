"""LLM training-data operators: dedup, similarity search (+ persisted
IVF index lifecycle in :mod:`.index`), multimodal, quantization, and BPE
tokenizer training (:mod:`.bpe`). Operators that persist internal
intermediates route them through :mod:`.caching`; call
:func:`release_intermediates` after materializing results in long-lived
sessions."""

from financial_data_engineering_spark.llm.caching import (
    persist_tracked,
    release_intermediates,
)

__all__ = ["persist_tracked", "release_intermediates"]
