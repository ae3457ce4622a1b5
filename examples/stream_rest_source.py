"""Streaming REST polling source — end-to-end demo of the DSv2
micro-batch twin (``spark.readStream.format("fdes_rest")``).

Spins up a LOCAL fixture HTTP server exposing an append-only paginated
collection (``GET /items?page=N&page_size=K`` with the total count in
the ``meta.n`` envelope — the contract RestStreamReader's record-cursor
offsets require), then demonstrates the three replay properties the
connector tests pin:

  1. paced polling: once the reader knows its cursor, each trigger
     is capped at ``max_pages_per_trigger`` pages (the very FIRST
     batch is uncapped by design — the reader's first offset must be
     the collection total, never a guess that could regress below a
     checkpointed cursor);
  2. tail pickup: rows appended after a batch committed — including
     rows landing INSIDE an already-consumed partial page — arrive
     exactly once (record-cursor offsets re-fetch and trim the page);
  3. restart safety: resuming from the checkpoint after a stop never
     re-emits committed records (monotone restart offsets — the first
     post-restart end is the collection total, never a regressed cap).

Every payload byte is fetched EXECUTOR-side through the shared retry
ladder; the driver sends one probe request per trigger. On a real
cluster the same code polls any cursor-paged REST API; the trigger
interval is the rate limit.

Run: python examples/stream_rest_source.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.sources.rest_datasource import (
    register_rest_datasource,
)

SCHEMA = "item_id long, kind string, score double"


class _CollectionHandler(BaseHTTPRequestHandler):
    """Append-only collection: page slices of the CURRENT rows plus the
    total count in the envelope — the streaming probe target."""

    rows: list[dict] = []

    def log_message(self, *args):  # quiet
        pass

    def do_GET(self):
        q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
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


def start_fixture_server(rows: list[dict]):
    """Serve ``rows`` on an ephemeral port; returns (url, shutdown)."""
    _CollectionHandler.rows = list(rows)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CollectionHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{srv.server_address[1]}/items", srv.shutdown


def _open_stream(spark, url: str):
    return (
        spark.readStream.format("fdes_rest")
        .schema(SCHEMA)
        .option("url", url)
        .option("records_path", "data")
        .option("total_path", "meta.n")
        .option("page_param", "page")
        .option("page_size_param", "page_size")
        .option("page_size", "2")
        .option("max_pages_per_trigger", "1")  # throttle: 2 records/trigger
        .load()
    )


def main(spark=None, checkpoint_dir: str | None = None) -> dict:
    """Returns {"first_run": [...ids], "appended_run": [...], "resumed":
    [...]} so the offline test can assert the replay properties."""
    spark = spark or get_spark("stream-rest-example")
    register_rest_datasource(spark)
    url, shutdown = start_fixture_server(
        [{"item_id": i, "kind": "a", "score": float(i)} for i in range(1, 6)]
    )
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="rest_stream_ckpt_")
    out: dict[str, list[int]] = {"first_run": [], "appended_run": [], "resumed": []}
    sink: list[int] = []

    def run(phase: str):
        sink.clear()
        q = (
            _open_stream(spark, url)
            .writeStream.foreachBatch(
                lambda df, _: sink.extend(r["item_id"] for r in df.collect())
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out[phase] = sorted(sink)

    try:
        run("first_run")  # 5 rows drain page-parallel (first batch uncapped)
        _CollectionHandler.rows.append({"item_id": 6, "kind": "b", "score": 6.0})
        _CollectionHandler.rows.append({"item_id": 7, "kind": "b", "score": 7.0})
        run("appended_run")  # only the tail — 6 landed mid-page, trimmed
        run("resumed")  # restart from checkpoint: nothing to re-emit
    finally:
        shutdown()
    print(f"first run (full drain):    {out['first_run']}")
    print(f"after append (tail only):  {out['appended_run']}")
    print(f"restart from checkpoint:   {out['resumed']}")
    return out


if __name__ == "__main__":
    main()
