"""Generate the published sample report artifacts under ``reports/samples/``.

The reference ships example output artifacts (reference reports/samples —
rendered PDF reports); this engine's analog is machine-readable validation
and profiling reports generated straight from the benchmark tables: one
quality-validation report per audited table (JSON + printable text) and a
corpus-curation summary. Re-running this script regenerates every artifact
deterministically from ``$SPARK_GRAFT_SF_DIR``.

Usage: python examples/generate_sample_reports.py [out_dir]
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_data_engineering_spark.quality.rules import (
    CompletenessRule,
    CustomRule,
    PatternRule,
    RangeRule,
    UniquenessRule,
)
from financial_data_engineering_spark.quality.validator import DataValidator
from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def orders_report(spark, sf_dir):
    v = DataValidator("orders_quality")
    v.add_rules(
        [
            CompletenessRule(["o_orderkey", "o_custkey", "o_orderdate"]),
            UniquenessRule(["o_orderkey"]),
            RangeRule("o_totalprice", min_val=0),
            PatternRule("o_orderpriority", r"^\d-"),
        ]
    )
    return v.validate(load(spark, "orders", sf_dir))


def lineitem_report(spark, sf_dir):
    v = DataValidator("lineitem_quality")
    v.add_rules(
        [
            CompletenessRule(["l_orderkey", "l_partkey", "l_quantity"]),
            RangeRule("l_quantity", min_val=1, max_val=50),
            RangeRule("l_discount", min_val=0.0, max_val=0.1),
            CustomRule(
                lambda df: (
                    (n := df.filter(F.col("l_extendedprice") < 0).count()) == 0,
                    {"negative_price_rows": n},
                ),
                name="nonnegative_extendedprice",
                column="l_extendedprice",
            ),
        ]
    )
    return v.validate(load(spark, "lineitem", sf_dir))


def documents_report(spark, sf_dir):
    v = DataValidator("documents_quality")
    v.add_rules(
        [
            CompletenessRule(["doc_id", "text", "source"]),
            UniquenessRule(["doc_id"]),
            CustomRule(
                lambda df: (
                    (n := df.filter(F.length(F.trim(F.col("text"))) == 0).count())
                    == 0,
                    {"blank_text_rows": n},
                ),
                name="nonempty_text",
                column="text",
            ),
        ]
    )
    return v.validate(load(spark, "documents", sf_dir))


def corpus_profile(spark, sf_dir) -> dict:
    """Per-source corpus profile: doc counts, token volume, length spread —
    the at-a-glance numbers a curation run reports before training."""
    docs = load(spark, "documents", sf_dir)
    rows = (
        docs.select(
            "source",
            F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_tokens"),
            F.length("text").alias("n_chars"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
        .collect()
    )
    return {
        "name": "corpus_profile",
        "sf_dir": os.path.basename(sf_dir.rstrip("/")),
        "sources": [r.asDict() for r in rows],
    }


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "reports",
        "samples",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("sample-reports")

    for build in (orders_report, lineitem_report, documents_report):
        report = build(spark, SF_DIR)
        base = os.path.join(out_dir, report.name)
        with open(base + ".json", "w") as f:
            json.dump(report.to_dict(), f, indent=2)
        with open(base + ".txt", "w") as f:
            f.write("\n".join(report.summary_lines() + report.failure_lines()))
            f.write("\n")
        print(f"wrote {base}.json / .txt ({report.pass_count}/{report.total_rules} rules passed)")

    profile = corpus_profile(spark, SF_DIR)
    path = os.path.join(out_dir, "corpus_profile.json")
    with open(path, "w") as f:
        json.dump(profile, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
