"""Per-query empirical profiler (guide §1): run named queries with the
Spark UI enabled, time the noop-sink action, then scrape the UI REST API
for per-job and per-stage breakdowns (durations, shuffle read/write
bytes, task counts) so the expensive part of each query is identified by
measurement, not guesswork.

Usage:
    python tools/profile_queries.py [--sf DIR] [--runs N] q1 q2 ...

Prints, per query: total wall seconds, then each job (description,
duration) and its heaviest stages (name, duration, shuffle R/W bytes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_data_engineering_spark import queries as q
from financial_data_engineering_spark.llm.caching import release_intermediates
from financial_data_engineering_spark.queries.graph import release_shared_edges
from financial_data_engineering_spark.session import get_spark


def _api(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024:
            return f"{n:.0f}{unit}"
        n /= 1024
    return f"{n:.1f}TB"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--min-job-ms", type=int, default=50)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1]) if sc.uiWebUrl else 4040
    app_id = sc.applicationId
    registry = q.all_queries()

    # same warmup discipline as bench.py
    spark.range(1).count()
    from financial_data_engineering_spark.schemas import TPCH_TABLES

    for t in TPCH_TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).limit(1).count()
            with open(path, "rb") as f:
                while f.read(1 << 22):
                    pass
    spark.range(8).mapInPandas(lambda it: it, schema="id long").count()
    warm_dir = "/root/testdata/sf0.001"
    for name in args.names:
        if name in registry and os.path.isdir(warm_dir):
            try:
                registry[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001
                pass
            release_intermediates()
            release_shared_edges()
            spark.catalog.clearCache()

    for name in args.names:
        if name not in registry:
            print(f"SKIP {name}", file=sys.stderr)
            continue
        for run in range(args.runs):
            jobs_before = {j["jobId"] for j in _api(port, f"applications/{app_id}/jobs")}
            sc.setJobDescription(f"{name}#run{run}")
            t0 = time.perf_counter()
            try:
                registry[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            finally:
                wall = time.perf_counter() - t0
                sc.setJobDescription(None)
                release_intermediates()
                release_shared_edges()
                spark.catalog.clearCache()
            jobs = [
                j
                for j in _api(port, f"applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            jobs.sort(key=lambda j: j["jobId"])
            print(f"\n===== {name} run{run}: {wall:.3f}s  ({len(jobs)} jobs) =====")
            stages = {
                s["stageId"]: s
                for s in _api(port, f"applications/{app_id}/stages")
            }
            for j in jobs:
                sub = j.get("submissionTime", "")
                comp = j.get("completionTime", "")
                try:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    dur = (
                        datetime.strptime(comp, fmt)
                        - datetime.strptime(sub, fmt)
                    ).total_seconds()
                except Exception:  # noqa: BLE001
                    dur = -1
                if dur * 1000 < args.min_job_ms:
                    continue
                desc = (j.get("description") or "")[:60]
                print(f"  job {j['jobId']:>4} {dur:7.3f}s  tasks={j['numCompletedTasks']:<5} {desc}")
                for sid in sorted(j.get("stageIds", [])):
                    s = stages.get(sid)
                    if not s or s.get("status") == "SKIPPED":
                        continue
                    sdur = (s.get("executorRunTime") or 0) / 1000
                    if sdur < 0.05:
                        continue
                    nm = (s.get("name") or "")[:50]
                    print(
                        f"    stage {sid:>5} exec={sdur:7.2f}s tasks={s.get('numCompleteTasks', 0):<4}"
                        f" shufR={_fmt_bytes(s.get('shuffleReadBytes', 0))}"
                        f" shufW={_fmt_bytes(s.get('shuffleWriteBytes', 0))}"
                        f" in={_fmt_bytes(s.get('inputBytes', 0))}  {nm}"
                    )
    spark.stop()


if __name__ == "__main__":
    main()
