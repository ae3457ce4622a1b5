"""Split-process variant of the correctness gate for huge-SF oracle
evidence runs.

check_correctness.py runs both halves in ONE process, so the Spark
JVM's shuffle/blockmgr files (~60 GB on an sf10 graph query under
FDES_MATERIALIZE_LEVEL=DISK_ONLY) still occupy /tmp while the DuckDB
oracle spills into the SAME ~78 GB disk — at sf10 the two cannot
coexist (three round-12 triangles attempts died on "No space left on
device" with a correct, bounded oracle plan). This tool runs the
Spark half in a SUBPROCESS that exits (freeing every Spark temp file)
before the oracle starts, giving DuckDB the whole disk.

The comparison is check_correctness's own: same value_hash, same
dtype-class checks, same STRICT float repr, same OracleRunner retry
ladder — only the process boundary differs, and the verdict line says
``split-gate`` so a log reader can tell which apparatus produced it.

Usage:
    python tools/split_gate.py [--strict] SF_DIR QUERY [QUERY...]
    python tools/split_gate.py [--strict] --oracle-only SF_DIR QUERY PKL
    # env: SPARK_DRIVER_MEMORY / FDES_MATERIALIZE_LEVEL for the Spark
    # half; FDES_DUCKDB_MEM / FDES_DUCKDB_MEM_RETRY for the oracle.

``--oracle-only`` replays JUST the oracle against a previously saved
Spark-half pickle (the spark phase leaves one behind when the oracle
half is killed — SIGTERM skips the cleanup ``finally``). This is the
resume path when an sf10 oracle needs a different DuckDB configuration
(e.g. a no-spill memory cap once the whole box is free): the 10-60
Spark minutes are not re-paid. The pickle must come from the SAME
query at the SAME sf_dir and engine code — spark_phase embeds
{query, sf_dir, git HEAD} provenance, and oracle_phase REFUSES a
pickle whose query or sf_dir differs and warns loudly on a different
git HEAD or a legacy provenance-free pickle (the engine/oracle code
may have changed since; the caller owns that residual discipline).
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")


#: Refuse to hand results bigger than this across the process boundary.
#: This tool exists for |V|-sized grouped results (graph/rollup oracles);
#: a fact-table-sized result would both strain driver memory and rewrite
#: the pickled payload onto the very disk the split exists to relieve —
#: fail loudly instead of masquerading as an apparatus failure.
MAX_ROWS = int(os.environ.get("FDES_SPLIT_GATE_MAX_ROWS", "10000000"))


def spark_phase(sf_dir: str, name: str, out_path: str) -> None:
    """Subprocess entry: run ONE query's Spark half, pickle
    (cols, dtypes, rows), exit — taking every Spark temp file with it.
    Rows stream through ``toLocalIterator`` so the guard trips before
    the driver materializes an over-cap result."""
    from financial_data_engineering_spark import queries as q
    from financial_data_engineering_spark.session import get_spark

    spark = get_spark("split-gate-spark")
    level = os.environ.get("FDES_MATERIALIZE_LEVEL")
    if level:
        spark.conf.set("spark.fdes.materialize.storageLevel", level)
    fn = q.all_queries()[name]
    sdf = fn(spark, sf_dir)
    rows: list[tuple] = []
    for r in sdf.toLocalIterator():
        rows.append(tuple(r))
        if len(rows) > MAX_ROWS:
            raise SystemExit(
                f"split_gate: {name} exceeds {MAX_ROWS} rows — this tool "
                "is for small (grouped) oracle results; run "
                "check_correctness.py or raise FDES_SPLIT_GATE_MAX_ROWS "
                "if the result genuinely fits the disk"
            )
    payload = {
        "cols": sdf.columns,
        "dtypes": sdf.dtypes,
        "rows": rows,
        "provenance": {
            "query": name,
            "sf_dir": os.path.abspath(sf_dir),
            "git_head": _git_head(),
        },
    }
    with open(out_path, "wb") as f:
        pickle.dump(payload, f)
    spark.stop()


def _git_head() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True,
                text=True,
                timeout=10,
            ).stdout.strip()
            or "unknown"
        )
    except Exception:  # noqa: BLE001 — provenance is best-effort
        return "unknown"


def oracle_phase(sf_dir: str, name: str, in_path: str, strict: bool) -> bool:
    """Run the oracle against the saved Spark half; print the verdict."""
    import tools.check_correctness as cc

    cc.STRICT = strict
    from financial_data_engineering_spark import queries as q

    with open(in_path, "rb") as f:
        saved = pickle.load(f)
    prov = saved.get("provenance")
    if prov is None:
        print(
            f"WARN  {name}: pickle has NO provenance (pre-r14 spark "
            "phase) — cannot verify it matches this query/sf_dir/code; "
            "a stale or mismatched Spark half would green-wash the gate"
        )
    else:
        # wrong query or sf_dir = comparing against the wrong Spark
        # half outright — refuse; a different git HEAD only MIGHT
        # invalidate the half (the relevant code may be untouched), so
        # warn and let the caller own that judgment.
        mismatches = [
            f"{k}: pickled {prov[k]!r} != invoked {v!r}"
            for k, v in (
                ("query", name),
                ("sf_dir", os.path.abspath(sf_dir)),
            )
            if prov.get(k) != v
        ]
        if mismatches:
            print(f"FAIL  {name} (split-gate): stale pickle — "
                  + "; ".join(mismatches))
            return False
        head = _git_head()
        if prov.get("git_head") != head:
            print(
                f"WARN  {name}: pickle from git {prov.get('git_head')} "
                f"but HEAD is {head} — valid only if the query's engine "
                "and oracle code are unchanged between the two"
            )
    s_cols, s_dtypes, s_rows = saved["cols"], saved["dtypes"], saved["rows"]
    runner = cc.OracleRunner(sf_dir)
    o_cols, o_types, o_rows, retried = runner.run(q.all_oracles()[name])
    if retried:
        print(f"      {name}: oracle green after escalation retry")
    problems = []
    if len(s_rows) != len(o_rows):
        problems.append(f"rows {len(s_rows)} vs {len(o_rows)}")
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"cols {sorted(s_cols)} vs {sorted(o_cols)}")
    else:
        problems.extend(cc._dtype_problems(s_dtypes, o_cols, o_types))
        if cc.value_hash(s_rows, s_cols) != cc.value_hash(o_rows, o_cols):
            problems.append("value hash mismatch")
    if problems:
        print(f"FAIL  {name} (split-gate): {'; '.join(problems)}")
        return False
    print(f"OK    {name} ({len(s_rows)} rows, split-gate)")
    return True


def main() -> int:
    args = sys.argv[1:]
    strict = False
    if args and args[0] == "--strict":
        strict = True
        args = args[1:]
    if args and args[0] == "--spark-phase":
        # internal re-entry: --spark-phase SF_DIR NAME OUT_PATH
        # (strict only affects the oracle comparison, not this half)
        spark_phase(args[1], args[2], args[3])
        return 0
    if args and args[0] == "--oracle-only":
        if len(args) != 4:
            print(__doc__)
            return 2
        ok = oracle_phase(args[1], args[2], args[3], strict)
        print("\nall green" if ok else "\n1 failures")
        return 0 if ok else 1
    if len(args) < 2:
        print(__doc__)
        return 2
    sf_dir, names = args[0], args[1:]
    # Hand-off pickles live under the repo's .tmp (or TMPDIR), NOT the
    # default /tmp — that is the same contended disk the Spark half
    # just vacated, but .tmp is ours to clean and the result-size guard
    # above bounds the payload anyway.
    pickle_dir = os.environ.get("TMPDIR") or ".tmp"
    os.makedirs(pickle_dir, exist_ok=True)
    failures = 0
    for name in names:
        with tempfile.NamedTemporaryFile(
            prefix=f"split_gate_{name}_",
            suffix=".pkl",
            dir=pickle_dir,
            delete=False,
        ) as tf:
            out_path = tf.name
        keep_pickle = False
        try:
            cmd = [sys.executable, os.path.abspath(__file__)]
            cmd += ["--spark-phase", sf_dir, name, out_path]
            rc = subprocess.run(cmd, cwd=os.getcwd()).returncode
            if rc != 0:
                print(f"FAIL  {name}: spark phase exited {rc}")
                failures += 1
                continue
            try:
                if not oracle_phase(sf_dir, name, out_path, strict):
                    failures += 1
            except Exception as exc:  # noqa: BLE001 — isolate per query
                # an oracle crash (e.g. an untracked std::bad_alloc)
                # must not abort the remaining queries' evidence runs —
                # and the PAID Spark half must survive it, so a retry at
                # different DuckDB caps is --oracle-only, not a rerun
                # (the r14 kcore_exact OOM deleted a 35-minute half)
                keep_pickle = True
                print(f"FAIL  {name}: oracle error: {str(exc)[:200]}")
                print(
                    f"      spark half preserved: --oracle-only "
                    f"{sf_dir} {name} {out_path}"
                )
                failures += 1
        finally:
            if not keep_pickle:
                try:
                    os.unlink(out_path)
                except OSError:
                    pass
    print(f"\n{failures} failures" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
