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

Streaming twin (``spark.readStream.format("fdes_rest")``): micro-batch
polling over the same paginated contract — page-number offsets, one
driver probe per trigger for the server's record count (``total_path``
option), a ``max_pages_per_trigger`` throttle, executor-side page
partitions through the same retry ladder. Full offset/replay contract
in :class:`RestStreamReader`.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
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
        fields = [(f.name, f.dataType) for f in self.schema.fields]
        for rec in _fetch_page(self.url, partition.params, self.records_path):
            yield tuple(_coerce(rec.get(name), dt) for name, dt in fields)


def _fetch_page(
    url: str, params: dict[str, str], records_path: str
) -> list:
    """One HTTP GET through the shared executor retry ladder, unwrapped
    to the record list. Used by both the batch partition read and the
    streaming driver probe (same ladder: a lost request raises, never
    silently shrinks)."""
    import requests

    from financial_data_engineering_spark.sources.base_client import (
        executor_get,
    )

    with requests.Session() as sess:
        payload = executor_get(sess, url, params)
    return _walk(payload, records_path)


class StreamPagePartition(InputPartition):
    """One page request plus the global-record-index window [lo, hi)
    this partition owns. The window matters when a batch boundary fell
    inside a page: a previously PARTIAL page is re-fetched by the next
    batch and trimmed to only the records past the committed cursor —
    page-number offsets alone would silently skip rows appended to that
    page (found by test: row 6 landing in already-consumed page 3)."""

    def __init__(self, params: dict[str, str], lo: int, hi: int, size: int):
        self.params = params
        self.lo = lo
        self.hi = hi
        self.size = size


class RestStreamReader(DataSourceStreamReader):
    """Micro-batch polling twin of :class:`RestReader` (SURVEY §2.A2's
    streaming analog): the offset is a RECORD CURSOR (count of records
    consumed from the head of a cursor-paged, APPEND-ONLY collection),
    so replay is deterministic exactly when the server never reorders
    or rewrites records before the cursor — the contract every
    offset-based replay over an external collection carries. A record
    cursor, not a page number: a batch boundary can fall mid-page, and
    the next batch must re-fetch that page and keep only the tail
    (records appended to a partial page after it was read).

    Per trigger, the driver makes ONE probe request (page 1) and reads
    the total record count from ``total_path`` (dot path into the
    envelope, e.g. ``meta.n``); once the reader knows its cursor, the
    batch end is min(total, cursor + max_pages_per_trigger * page_size)
    — the ``maxOffsetsPerTrigger`` throttle, emulating the ReadLimit
    hook the Python DS API lacks. The FIRST offset a reader emits (no
    cursor known yet — Spark calls latestOffset before initialOffset)
    is the collection total, uncapped: a lower guess could regress
    below a checkpointed cursor and, once committed to the offset log,
    make a later restart re-emit committed records. Correctness is
    exact; pacing is best-effort from the second trigger on.
    The cursor range is carved into page-aligned
    :class:`StreamPagePartition`s read EXECUTOR-side through the retry
    ladder (the driver never proxies payload bytes; same placement as
    the batch reader). Poll cadence is the query's trigger interval —
    rate limiting beyond the per-trigger cap belongs to the trigger,
    not the source.

    Streaming-only required options: ``page_param``, ``page_size_param``
    + ``page_size``, ``total_path``. No filter pushdown here (the
    Python DS streaming API has no pushFilters hook as of PySpark 4.1 —
    filters stay Spark-side, still correct).
    """

    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.url = options.get("url")
        if not self.url:
            raise ValueError(f"{FORMAT_NAME}: 'url' option is required")
        self.records_path = options.get("records_path", "")
        self.page_param = options.get("page_param")
        self.page_size_param = options.get("page_size_param")
        self.page_size = int(options.get("page_size", "0") or "0")
        self.total_path = options.get("total_path")
        if not (
            self.page_param
            and self.page_size_param
            and self.page_size > 0
            and self.total_path
        ):
            raise ValueError(
                f"{FORMAT_NAME} streaming needs page_param, "
                "page_size_param, page_size and total_path (offsets are "
                "page numbers; the driver probe reads the total count)"
            )
        self.max_pages_per_trigger = int(
            options.get("max_pages_per_trigger", "10")
        )
        self.base_params: dict[str, str] = {
            k: str(v) for k, v in json.loads(options.get("params", "{}")).items()
        }

    def initialOffset(self) -> dict:
        # Spark calls this only on fresh starts — but AFTER the first
        # latestOffset() (observed order: latestOffset, initialOffset,
        # partitions), so it must only SEED the driver-local cursor,
        # never regress one a previous call already advanced.
        if getattr(self, "_last_offset", None) is None:
            self._last_offset = {"cursor": 0}
        return {"cursor": 0}  # records consumed from the head; 0 = none

    def _probe_total(self) -> int:
        """Driver-side: ONE request for page 1, following ``total_path``
        through the raw payload to the collection's record count."""
        import requests

        from financial_data_engineering_spark.sources.base_client import (
            executor_get,
        )

        params = dict(self.base_params)
        params[self.page_param] = "1"
        params[self.page_size_param] = str(self.page_size)
        with requests.Session() as sess:
            payload = executor_get(sess, self.url, params)
        node: Any = payload
        for step in self.total_path.split("."):
            node = node[int(step)] if isinstance(node, list) else node[step]
        return int(node)

    def latestOffset(self) -> dict:
        start = getattr(self, "_last_offset", None)
        total = self._probe_total()
        if start is None:
            # No driver-local cursor: this reader has not yet seen
            # initialOffset (fresh start — Spark's observed call order
            # is latestOffset FIRST) or any partitions() replay (which
            # on a checkpoint restart teaches the committed cursor
            # before this runs). Whatever end is returned here becomes
            # a durable offset-log entry, and an entry BELOW the
            # committed cursor is forever poisonous: a later restart
            # would re-plan from it and re-emit committed records.
            # The only end that can never regress below an UNKNOWN
            # committed cursor of an append-only collection is the
            # collection total — the Kafka-style answer (report the
            # true latest; pacing is an emulation of the missing
            # ReadLimit hook, applied only when the cursor is known).
            # Cost: one uncapped batch when this path is ever planned.
            end = {"cursor": total}
            self._last_offset = end
            return end
        # latestOffset is called once per trigger with no args; track
        # the previous end locally so the per-trigger cap is relative
        # (Spark replays committed offsets through partitions(), so
        # this driver-local cursor only shapes batch SIZE, never data).
        last = start["cursor"]
        capped = min(total, last + self.max_pages_per_trigger * self.page_size)
        end = {"cursor": max(capped, last)}
        self._last_offset = end
        return end

    def partitions(self, start: dict, end: dict) -> Sequence[StreamPagePartition]:
        # Every offset latestOffset() emits is monotone by construction
        # (the unknown-cursor path returns the collection total, which
        # for an append-only collection is >= every committed cursor),
        # so no regressed range is ever planned or committed and no
        # driver-local "floor" state is needed — the r13 floor design
        # kept the committed cursor only in reader memory, which a
        # second restart inside the regressed-commit window would lose
        # (ADVICE r13). Recording max(lo, hi) here additionally teaches
        # a RESTARTED reader the committed cursor (Spark replays the
        # last logged batch through partitions() before its first
        # latestOffset), so post-restart pacing stays capped.
        lo, hi = start["cursor"], end["cursor"]
        self._last_offset = {"cursor": max(lo, hi)}
        if hi <= lo:
            return []
        base = dict(self.base_params)
        base[self.page_size_param] = str(self.page_size)
        size = self.page_size
        first_page = lo // size + 1
        last_page = (hi - 1) // size + 1
        return [
            StreamPagePartition(
                {**base, self.page_param: str(page)},
                max(lo, (page - 1) * size),
                min(hi, page * size),
                size,
            )
            for page in range(first_page, last_page + 1)
        ]

    def read(self, partition: StreamPagePartition) -> Iterator[tuple]:
        # Executor-side, same shape as the batch reader's read(). Each
        # record's GLOBAL index is (page-1)*size + position-in-page;
        # only [lo, hi) is this partition's — re-fetched rows before lo
        # were emitted by the batch that committed the cursor there.
        fields = [(f.name, f.dataType) for f in self.schema.fields]
        page = int(partition.params[self.page_param])
        base_idx = (page - 1) * partition.size
        recs = _fetch_page(self.url, partition.params, self.records_path)
        for i, rec in enumerate(recs):
            gidx = base_idx + i
            if partition.lo <= gidx < partition.hi:
                yield tuple(
                    _coerce(rec.get(name), dt) for name, dt in fields
                )

    def commit(self, end: dict) -> None:
        pass  # nothing to ack server-side; offsets live in the checkpoint

    def stop(self) -> None:
        pass


class RestDataSource(DataSource):
    """``spark.read.format("fdes_rest")`` / ``spark.readStream.format(
    "fdes_rest")`` entry point (module docstring has the full option/
    pushdown contract; RestStreamReader's docstring has the streaming
    offset contract)."""

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

    def streamReader(self, schema: T.StructType) -> RestStreamReader:
        return RestStreamReader(schema, dict(self.options))


def register_rest_datasource(spark) -> None:
    """Idempotent ``spark.dataSource.register`` of :class:`RestDataSource`."""
    spark.dataSource.register(RestDataSource)
