"""Registration machinery for the query/oracle inventory.

Every implemented operator from SURVEY.md §2 is declared once, as a function
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
string over the same parquet tables. The driver hash-compares the two at
sf=0.01, so determinism rules apply to every entry:

- any LIMIT is preceded by a total order (unique tiebreak column);
- floating-point aggregates are rounded identically on both sides (different
  accumulation orders legally differ in the last bits);
- column names/aliases match the oracle exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str | None


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def decorator(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__)
        return fn

    return decorator


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]


def reorder(front: list[str]) -> None:
    """Move ``front`` (in order) to the head of the registry.

    Registry order is driver gate order, and the driver verifies a bounded
    window from the head — this makes the window an explicit, reviewable
    list instead of a side effect of module import order. Names not in
    ``front`` keep their relative order after it.
    """
    missing = sorted(set(front) - set(_REGISTRY))
    if missing:
        raise KeyError(f"reorder names not registered: {missing}")
    dupes = sorted({n for n in front if front.count(n) > 1})
    if dupes:
        raise ValueError(f"duplicate names in reorder front: {dupes}")
    head = set(front)
    ordered = {n: _REGISTRY[n] for n in front}
    ordered.update({n: s for n, s in _REGISTRY.items() if n not in head})
    _REGISTRY.clear()
    _REGISTRY.update(ordered)


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None
    }
