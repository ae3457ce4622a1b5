"""DSv2 REST connector tests: a real local HTTP server (executors run
in separate worker processes, so driver-side mocks cannot reach the
``read()`` path — the server is the only honest test double here).

What is pinned:
- filter pushdown BECOMES a query parameter the server sees, and the
  scan trusts it (the server's filtering is authoritative — Spark does
  not re-apply a fully-pushed filter);
- unmapped filters come back from ``pushFilters`` and Spark evaluates
  them post-scan (correct results even when the server ignores them);
- page fan-out: ``max_pages`` pages become that many input partitions,
  empty tail pages contribute zero rows;
- envelope unwrap via ``records_path`` and tolerant scalar coercion.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F

from financial_data_engineering_spark.sources.rest_datasource import (
    register_rest_datasource,
)

ROWS = [
    {"item_id": 1, "kind": "a", "score": 1.5},
    {"item_id": 2, "kind": "b", "score": 2.5},
    {"item_id": 3, "kind": "a", "score": 3.5},
    {"item_id": 4, "kind": "c", "score": "bad-float"},
    {"item_id": 5, "kind": "a"},
]

SCHEMA = "item_id long, kind string, score double"


class _Handler(BaseHTTPRequestHandler):
    requests_seen: list[dict] = []

    def log_message(self, *args):  # quiet
        pass

    def do_GET(self):
        q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
        type(self).requests_seen.append(q)
        rows = ROWS
        if "kind" in q:  # server-side filtering — the pushdown target
            rows = [r for r in rows if r["kind"] == q["kind"]]
        if "min_id" in q:  # range pushdown target (gte)
            rows = [r for r in rows if r["item_id"] >= int(q["min_id"])]
        if "page" in q:  # page-number pagination, 2 rows per page
            p = int(q["page"])
            rows = rows[(p - 1) * 2 : p * 2]
        body = json.dumps({"meta": {"n": len(rows)}, "data": rows}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def api_server():
    _Handler.requests_seen = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/items"
    srv.shutdown()


def _reader(spark, url, **opts):
    register_rest_datasource(spark)
    r = (
        spark.read.format("fdes_rest")
        .schema(SCHEMA)
        .option("url", url)
        .option("records_path", "data")
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r


def test_basic_read_unwraps_envelope_and_coerces(spark, api_server):
    got = {r["item_id"]: r for r in _reader(spark, api_server).load().collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[4]["score"] is None  # "bad-float" → NULL, page survives
    assert got[5]["score"] is None  # absent key → NULL
    assert got[1]["kind"] == "a" and got[1]["score"] == 1.5


def test_equality_filter_pushes_into_query_param(spark, api_server):
    _Handler.requests_seen = []
    df = (
        _reader(spark, api_server, param_map=json.dumps({"kind": {"eq": "kind"}}))
        .load()
        .filter(F.col("kind") == "a")
    )
    ids = sorted(r["item_id"] for r in df.collect())
    assert ids == [1, 3, 5]
    # The server saw the param — the filter ran server-side.
    assert any(q.get("kind") == "a" for q in _Handler.requests_seen)


def test_unmapped_filter_stays_spark_side(spark, api_server):
    _Handler.requests_seen = []
    # score has no param_map entry; the server ignores it entirely, so
    # correctness here proves Spark re-applied the returned filter.
    df = _reader(spark, api_server).load().filter(F.col("score") >= 2.0)
    assert sorted(r["item_id"] for r in df.collect()) == [2, 3]
    assert all("score" not in q and "kind" not in q for q in _Handler.requests_seen)


def test_pushed_filter_is_trusted_not_reapplied(spark, api_server):
    # Push kind='zzz' — the server returns [] for it. If Spark ALSO
    # kept the filter, the plan would carry a redundant Filter node;
    # prove trust structurally: no Filter on 'kind' post-scan.
    df = (
        _reader(spark, api_server, param_map=json.dumps({"kind": {"eq": "kind"}}))
        .load()
        .filter(F.col("kind") == "zzz")
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "zzz" not in plan  # the literal lives in the source, not a Filter
    assert df.count() == 0


def test_page_fanout_partitions_and_empty_tail(spark, api_server):
    _Handler.requests_seen = []
    df = _reader(
        spark,
        api_server,
        page_param="page",
        max_pages="5",  # pages 4-5 are empty: over-provisioning is safe
    ).load()
    assert df.rdd.getNumPartitions() == 5
    assert sorted(r["item_id"] for r in df.collect()) == [1, 2, 3, 4, 5]
    pages = sorted(int(q["page"]) for q in _Handler.requests_seen if "page" in q)
    assert pages == [1, 2, 3, 4, 5]


def test_duplicate_range_conjuncts_keep_both_bounds(spark, api_server):
    # x >= 2 AND x >= 4: Catalyst does not merge redundant range
    # conjuncts, so both arrive as GreaterThanOrEqual targeting the
    # same 'min_id' param. One is claimed server-side; the other MUST
    # come back to Spark — a last-wins overwrite that replaced the
    # tighter bound with the looser one would return rows 2-3 here.
    _Handler.requests_seen = []
    df = (
        _reader(
            spark,
            api_server,
            param_map=json.dumps({"item_id": {"gte": "min_id"}}),
        )
        .load()
        .filter(F.col("item_id") >= 2)
        .filter(F.col("item_id") >= 4)
    )
    assert sorted(r["item_id"] for r in df.collect()) == [4, 5]
    pushed = {q["min_id"] for q in _Handler.requests_seen if "min_id" in q}
    assert len(pushed) == 1  # exactly one conjunct was claimed


def test_pushfilters_unit_duplicate_key_and_comma_in_values():
    # Unit-level pin of the claim rules, independent of how Catalyst
    # happens to order/merge conjuncts in any Spark version.
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In
    from pyspark.sql import types as T

    from financial_data_engineering_spark.sources.rest_datasource import (
        RestReader,
    )

    schema = T.StructType([T.StructField("kind", T.StringType())])
    opts = {
        "url": "http://unit.test/",
        "param_map": json.dumps(
            {"kind": {"eq": "kind", "in": "kinds", "gte": "min_kind"}}
        ),
    }
    r = RestReader(schema, dict(opts))
    returned = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("kind",), "5"),
                GreaterThanOrEqual(("kind",), "9"),  # same param key
                EqualTo(("kind",), "a"),
            ]
        )
    )
    # first gte claimed; duplicate yielded back; eq claimed (own key)
    assert r.pushed_params == {"min_kind": "5", "kind": "a"}
    assert returned == [GreaterThanOrEqual(("kind",), "9")]

    r2 = RestReader(schema, dict(opts))
    comma_in = In(("kind",), ("a,b", "c"))
    # a value containing the list delimiter is ambiguous server-side —
    # the whole filter stays with Spark
    assert list(r2.pushFilters([comma_in])) == [comma_in]
    assert r2.pushed_params == {}
    r3 = RestReader(schema, dict(opts))
    clean_in = In(("kind",), ("a", "c"))
    assert list(r3.pushFilters([clean_in])) == []
    assert r3.pushed_params == {"kinds": "a,c"}


def test_missing_schema_and_url_raise(spark, api_server):
    register_rest_datasource(spark)
    with pytest.raises(Exception, match="explicit schema"):
        spark.read.format("fdes_rest").option("url", api_server).load().collect()
    with pytest.raises(Exception, match="url"):
        spark.read.format("fdes_rest").schema(SCHEMA).load().collect()


# --- streaming twin: micro-batch polling over page-number offsets ----


class _GrowingHandler(BaseHTTPRequestHandler):
    """Append-only collection: page slices of the CURRENT rows plus the
    total count in the envelope (meta.n) — the streaming probe target."""

    rows: list[dict] = []
    requests_seen: list[dict] = []

    def log_message(self, *args):  # quiet
        pass

    def do_GET(self):
        q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
        type(self).requests_seen.append(q)
        rows = type(self).rows
        total = len(rows)
        size = int(q.get("page_size", "2"))
        if "page" in q:
            p = int(q["page"])
            rows = rows[(p - 1) * size : p * size]
        body = json.dumps({"meta": {"n": total}, "data": rows}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def growing_server():
    _GrowingHandler.rows = [
        {"item_id": i, "kind": "a", "score": float(i)} for i in range(1, 6)
    ]
    _GrowingHandler.requests_seen = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _GrowingHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/items"
    srv.shutdown()


def test_stream_polls_pages_with_per_trigger_throttle(
    spark, growing_server, tmp_path
):
    register_rest_datasource(spark)
    stream = (
        spark.readStream.format("fdes_rest")
        .schema(SCHEMA)
        .option("url", growing_server)
        .option("records_path", "data")
        .option("total_path", "meta.n")
        .option("page_param", "page")
        .option("page_size_param", "page_size")
        .option("page_size", "2")
        .option("max_pages_per_trigger", "2")
        .load()
    )
    query = (
        stream.writeStream.format("memory")
        .queryName("rest_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        got = {
            r["item_id"]
            for r in spark.sql("SELECT * FROM rest_stream").collect()
        }
        assert got == {1, 2, 3, 4, 5}
        # the FIRST batch is deliberately uncapped (the reader's first
        # latestOffset precedes any cursor knowledge and must report
        # the collection total — a capped guess could regress below a
        # checkpointed cursor); the drain is still page-partitioned
        n_first = len(_GrowingHandler.rows)
        # each page fetched exactly once (the batch's pages fan out to
        # PARALLEL executor tasks, so arrival order is not defined)
        pages = [
            int(q["page"])
            for q in _GrowingHandler.requests_seen
            if "page" in q and int(q["page"]) > 1
        ]
        assert sorted(pages) == sorted(set(pages)) == [2, 3]
        # the collection grows; the tail arrives in CAPPED batches —
        # 6 new rows / (2 pages * 2 records per trigger) >= 2 batches
        for i in range(6, 12):
            _GrowingHandler.rows.append(
                {"item_id": i, "kind": "b", "score": float(i)}
            )
        query.processAllAvailable()
        got2 = {
            r["item_id"]
            for r in spark.sql("SELECT * FROM rest_stream").collect()
        }
        assert got2 == set(range(1, 12))
        batches = [
            p["numInputRows"]
            for p in (query.recentProgress or [])
            if p["numInputRows"] > 0
        ]
        assert batches[0] == n_first  # the uncapped initial drain
        tail_batches = batches[1:]
        assert tail_batches and max(tail_batches) <= 4
        assert len(tail_batches) >= 2
    finally:
        query.stop()


def test_stream_restart_from_checkpoint_never_duplicates(
    spark, growing_server, tmp_path
):
    """Kill-and-resume replay contract: run to a committed cursor LARGER
    than one trigger's cap, stop, restart from the checkpoint, append.
    A restarted reader has no driver-local cursor (initialOffset is
    only called on fresh starts), so its first latestOffset() must
    return the collection TOTAL — never a capped end computed from 0,
    which would regress below the committed start and, once committed,
    make a second restart re-emit the gap (duplicates in the sink)."""
    register_rest_datasource(spark)
    first_run: list[int] = []
    second_run: list[int] = []

    def _stream():
        return (
            spark.readStream.format("fdes_rest")
            .schema(SCHEMA)
            .option("url", growing_server)
            .option("records_path", "data")
            .option("total_path", "meta.n")
            .option("page_param", "page")
            .option("page_size_param", "page_size")
            .option("page_size", "2")
            .option("max_pages_per_trigger", "1")  # cap 2 records/trigger
            .load()
        )

    ckpt = str(tmp_path / "ckpt")
    q1 = (
        _stream()
        .writeStream.foreachBatch(
            lambda df, _: first_run.extend(r["item_id"] for r in df.collect())
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    assert sorted(first_run) == [1, 2, 3, 4, 5]  # committed cursor 5 > cap 2

    _GrowingHandler.rows.append({"item_id": 6, "kind": "b", "score": 6.0})
    _GrowingHandler.rows.append({"item_id": 7, "kind": "b", "score": 7.0})
    q2 = (
        _stream()
        .writeStream.foreachBatch(
            lambda df, _: second_run.extend(r["item_id"] for r in df.collect())
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    # ONLY the appended tail — items 3..5 (below the pre-restart cursor,
    # above the regressed offset) must not be re-emitted
    assert sorted(second_run) == [6, 7]


def test_stream_offsets_monotone_across_double_restart(monkeypatch):
    """Protocol-level contract (no Spark): offsets a reader emits can
    never regress below ANY cursor a previous incarnation could have
    committed — even when the query dies immediately after the first
    post-restart batch and restarts AGAIN (the window the old
    driver-local floor could not survive: the floor lived only in the
    first restarted reader's memory while Spark had already committed
    its regressed end into the checkpoint)."""
    from financial_data_engineering_spark.sources.rest_datasource import (
        RestStreamReader,
    )

    opts = {
        "url": "http://unit-test.invalid/items",
        "page_param": "page",
        "page_size_param": "page_size",
        "page_size": "2",
        "total_path": "meta.n",
        "max_pages_per_trigger": "1",
    }

    def make_reader(total: int) -> RestStreamReader:
        r = RestStreamReader(schema=None, options=opts)
        monkeypatch.setattr(r, "_probe_total", lambda: total)
        return r

    # fresh start: initialOffset marks the reader, pacing stays capped
    r1 = make_reader(total=10)
    assert r1.initialOffset() == {"cursor": 0}
    assert r1.latestOffset() == {"cursor": 2}  # cap = 1 page * 2 records
    assert r1.latestOffset() == {"cursor": 4}
    committed = 4  # suppose Spark committed cursor=4, then the query died

    # restart 1: no initialOffset call; the first end must be >= any
    # committed cursor — the reader returns the total, not a capped 2
    r2 = make_reader(total=10)
    end2 = r2.latestOffset()
    assert end2["cursor"] == 10 >= committed
    # Spark plans (committed, end2); the batch covers exactly the gap
    parts = r2.partitions({"cursor": committed}, end2)
    covered = sorted((p.lo, p.hi) for p in parts)
    assert covered[0][0] == committed and covered[-1][1] == 10
    # ... and suppose the query dies RIGHT after committing end2

    # restart 2: again no regression — a second restart cannot re-open
    # the [capped, committed) gap because no capped end was ever emitted
    r3 = make_reader(total=10)
    assert r3.latestOffset()["cursor"] == 10
    assert r3.partitions({"cursor": 10}, {"cursor": 10}) == []
    # subsequent triggers resume bounded pacing from the restart total
    assert r3.latestOffset() == {"cursor": 10}  # nothing new yet
    monkeypatch.setattr(r3, "_probe_total", lambda: 13)
    assert r3.latestOffset() == {"cursor": 12}  # capped tail pickup


def test_stream_requires_paging_contract(spark, growing_server):
    # the contract error surfaces asynchronously through the stream
    # thread, so assert on the query's terminal exception
    register_rest_datasource(spark)
    query = (
        spark.readStream.format("fdes_rest")
        .schema(SCHEMA)
        .option("url", growing_server)
        .load()
        .writeStream.format("noop")
        .start()
    )
    try:
        with pytest.raises(Exception, match="streaming needs"):
            query.processAllAvailable()
            if query.exception():
                raise query.exception()
    finally:
        query.stop()
