"""Capture ``explain("formatted")`` for named queries into plans/<dir>/.

Usage:
    python tools/capture_plans.py --out plans/r14 --tag before [--sf DIR] q1 q2 ...

Writes plans/<out>/<query>_<tag>.txt for each query. Building a query's
DataFrame may execute eager materialize() rounds (iterative operators),
so this is not free — run it on an otherwise idle host.

The captured text is the full formatted explain of the FINAL returned
frame (pre-execution, so AQE shows isFinalPlan=false); for iterative
operators whose rounds are localCheckpointed during construction the
final frame's plan is the last round over checkpointed RDDs — the
per-round plan shape is what the operator docstrings and
tests/test_plan_registry.py pin.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_data_engineering_spark import queries as q
from financial_data_engineering_spark.llm.caching import release_intermediates
from financial_data_engineering_spark.plans.inspect import _formatted
from financial_data_engineering_spark.queries.graph import release_shared_edges
from financial_data_engineering_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("capture-plans")
    registry = q.all_queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        if name not in registry:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = registry[name](spark, args.sf)
            text = _formatted(df)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}", file=sys.stderr)
            continue
        finally:
            release_intermediates()
            release_shared_edges()
            spark.catalog.clearCache()
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = text.count("Exchange")
        print(f"OK {name}: {len(text)} bytes, {n_ex} Exchange mentions -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
