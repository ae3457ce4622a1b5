"""``spark.read.format("fdes_rest")`` — a Python Data Source (DSv2)
wrapper around the REST extraction layer, with filter pushdown into
request query parameters and distributed page fan-out.

Why a DataSource on top of :mod:`base_client` (SURVEY §7.2's remaining
candidate): the BaseClient subclasses are imperative extract() flows —
right for quota-bounded, response-chained APIs — but a declarative
``spark.read`` path lets Catalyst drive the source like any other scan:
filters the user writes as ``.filter(col("x") == lit)`` arrive through
:meth:`RestReader.pushFilters` and become query parameters the SERVER
evaluates, so the transferred payload shrinks before it ever crosses
the wire (the REST analog of parquet predicate pushdown). Reference
parity note: the reference has no DSv2 surface; this wraps the same
retry ladder its BaseClient defines (reference
src/extractors/base_client.py:153-245) behind Spark's source API.

Pushdown contract (``param_map`` option, JSON):

    {"column": {"eq": "param", "in": "param",
                "gte": "param", "lte": "param"}}

- ``EqualTo(column, v)``       → ``param=v``         (key ``eq``)
- ``In(column, (v1, v2, …))``  → ``param=v1,v2,…``   (key ``in``)
- ``GreaterThanOrEqual``       → ``param=v``         (key ``gte``)
- ``LessThanOrEqual``          → ``param=v``         (key ``lte``)

Anything unmapped (other columns, GreaterThan/LessThan/IsNull/Not/…) is
returned to Spark from ``pushFilters`` and evaluated post-scan, so the
result is correct regardless of how much the server accepts — the map
only widens what gets pushed. LIMIT pushdown: the Python DS API exposes
no ``pushLimit`` hook (only partitions/pushFilters/read as of PySpark
4.1), so row caps ride the explicit ``page_size``/``max_pages`` options
instead — documented, not silently missing.

Scale shape: each page is an :class:`~pyspark.sql.datasource.InputPartition`,
so a ``max_pages=N`` read is an N-task executor-side fan-out (same
placement as world_bank.py's mapPartitions fan-out) — the driver never
proxies payload bytes. Each task runs the executor retry ladder
(:func:`~financial_data_engineering_spark.sources.base_client.executor_get`:
429 → Retry-After, 5xx/conn → exponential backoff, other 4xx → raise);
a lost page fails the task rather than silently shrinking the result.
Empty pages yield nothing, so over-provisioned ``max_pages`` is safe
(tasks that fetch an empty tail page cost one request each).

Options:

- ``url``            (required) — request URL.
- ``records_path``   — dot path from the JSON root to the list of
  records (envelope unwrap); empty/absent means the root IS the list.
- ``page_param``     — query-parameter name for the 1-based page
  number; absent means a single unpaginated request (one partition).
- ``page_size_param`` / ``page_size`` — emitted together when both set.
- ``max_pages``      — pages to fan out (default 1).
- ``params``         — JSON object of static query parameters.
- ``param_map``      — the pushdown contract above.

Schema comes from ``.schema(...)`` (DDL or StructType); there is no
sampling inference — a production scan must not spend a request on
schema guessing. Values are drawn from each record dict by FIELD NAME
and coerced with the same tolerant casts the record normalizer uses
(int/float/str; absent keys → NULL).
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThanOrEqual,
)
from pyspark.sql import types as T


FORMAT_NAME = "fdes_rest"


class PagePartition(InputPartition):
    """One HTTP request: the fully-resolved query-parameter dict."""

    def __init__(self, params: dict[str, str]):
        self.params = params


def _walk(payload: Any, path: str) -> list:
    """Envelope unwrap: follow a dot path of dict keys / int indexes to
    the record list (world_bank's ``payload[1]`` envelope is path "1")."""
    node = payload
    if path:
        for step in path.split("."):
            node = node[int(step)] if isinstance(node, list) else node[step]
    if not isinstance(node, list):
        raise ValueError(
            f"records_path {path!r} resolved to {type(node).__name__}, "
            "expected a list of records"
        )
    return node


def _coerce(value: Any, dtype: T.DataType) -> Any:
    """Tolerant scalar cast (record-normalize semantics): bad or absent
    values become NULL rather than failing the page."""
    if value is None:
        return None
    try:
        if isinstance(dtype, (T.LongType, T.IntegerType)):
            return int(value)
        if isinstance(dtype, (T.DoubleType, T.FloatType)):
            return float(value)
        if isinstance(dtype, T.StringType):
            return str(value)
        if isinstance(dtype, T.BooleanType):
            return bool(value)
    except (TypeError, ValueError):
        return None
    return value


class RestReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.url = options.get("url")
        if not self.url:
            raise ValueError(f"{FORMAT_NAME}: 'url' option is required")
        self.records_path = options.get("records_path", "")
        self.page_param = options.get("page_param")
        self.page_size_param = options.get("page_size_param")
        self.page_size = options.get("page_size")
        self.max_pages = int(options.get("max_pages", "1"))
        self.base_params: dict[str, str] = {
            k: str(v) for k, v in json.loads(options.get("params", "{}")).items()
        }
        self.param_map: dict[str, dict[str, str]] = json.loads(
            options.get("param_map", "{}")
        )
        self.pushed_params: dict[str, str] = {}

    def _claim(self, key: str, value: str) -> bool:
        """Claim ``key`` for one filter. A query-parameter key carries at
        most ONE pushed conjunct: Catalyst does not merge redundant range
        conjuncts, so ``x >= 5 AND x >= 10`` arrives as two filters that
        would both target the ``gte`` param — last-wins overwriting could
        replace the tighter bound with the looser one while Spark trusts
        both as server-evaluated. First filter wins the key; duplicates
        are yielded back for post-scan evaluation (always correct: the
        server applies the claimed conjunct, Spark re-checks the rest)."""
        if key in self.pushed_params:
            return False
        self.pushed_params[key] = value
        return True

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Translate mapped filters into query params; yield the rest
        back to Spark for post-scan evaluation."""
        for f in filters:
            spec = (
                self.param_map.get(f.attribute[0])
                if len(f.attribute) == 1
                else None
            )
            if spec and isinstance(f, EqualTo) and "eq" in spec:
                if self._claim(spec["eq"], str(f.value)):
                    continue
            elif spec and isinstance(f, In) and "in" in spec:
                values = [str(v) for v in f.value]
                # A value containing the list delimiter would produce an
                # ambiguous server-side param (e.g. In("a,b") vs
                # In("a","b")) — leave such filters entirely to Spark.
                if not any("," in v for v in values):
                    if self._claim(spec["in"], ",".join(values)):
                        continue
            elif spec and isinstance(f, GreaterThanOrEqual) and "gte" in spec:
                if self._claim(spec["gte"], str(f.value)):
                    continue
            elif spec and isinstance(f, LessThanOrEqual) and "lte" in spec:
                if self._claim(spec["lte"], str(f.value)):
                    continue
            yield f

    def partitions(self) -> Sequence[PagePartition]:
        base = dict(self.base_params)
        base.update(self.pushed_params)
        if self.page_size_param and self.page_size:
            base[self.page_size_param] = str(self.page_size)
        if not self.page_param:
            return [PagePartition(base)]
        return [
            PagePartition({**base, self.page_param: str(page)})
            for page in range(1, self.max_pages + 1)
        ]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        # Executor-side: one request per partition through the shared
        # retry ladder; a failed page fails the task (no silent shrink).
        import requests

        from financial_data_engineering_spark.sources.base_client import (
            executor_get,
        )

        with requests.Session() as sess:
            payload = executor_get(sess, self.url, partition.params)
        fields = [(f.name, f.dataType) for f in self.schema.fields]
        for rec in _walk(payload, self.records_path):
            yield tuple(_coerce(rec.get(name), dt) for name, dt in fields)


class RestDataSource(DataSource):
    """``spark.read.format("fdes_rest")`` entry point (module docstring
    has the full option/pushdown contract)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        # No inference: a scan must not spend requests guessing. The
        # user passes .schema(...); reaching here without one is an
        # explicit contract error.
        raise ValueError(
            f"{FORMAT_NAME}: pass an explicit schema via .schema(ddl) — "
            "this source does not sample the API to infer one"
        )

    def reader(self, schema: T.StructType) -> RestReader:
        return RestReader(schema, dict(self.options))


def register_rest_datasource(spark) -> None:
    """Idempotent ``spark.dataSource.register`` of :class:`RestDataSource`."""
    spark.dataSource.register(RestDataSource)
