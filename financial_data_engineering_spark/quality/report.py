"""Validation reporting — structured results with pass/fail rollups.

Driver-side control plane (same role as the reference's report surface,
src/quality/report.py:14-99): the data never leaves the cluster, only rule
outcomes do.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from financial_data_engineering_spark.quality.rules import RuleResult


@dataclass
class ValidationReport:
    """Outcome of a validation run over one DataFrame."""

    name: str
    results: list[RuleResult]
    row_count: int
    column_count: int

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.results)

    @property
    def pass_count(self) -> int:
        return sum(1 for r in self.results if r.passed)

    @property
    def fail_count(self) -> int:
        return sum(1 for r in self.results if not r.passed)

    @property
    def total_rules(self) -> int:
        return len(self.results)

    @property
    def failures(self) -> list[RuleResult]:
        return [r for r in self.results if not r.passed]

    def to_dict(self) -> dict[str, Any]:
        """JSON-safe serialization of the full report."""
        return {
            "name": self.name,
            "passed": self.passed,
            "summary": {
                "total_rules": self.total_rules,
                "passed": self.pass_count,
                "failed": self.fail_count,
                "rows_checked": self.row_count,
                "columns_checked": self.column_count,
            },
            "results": [
                {
                    "rule": r.rule_name,
                    "severity": r.severity,
                    "column": r.column,
                    "details": r.details,
                }
                for r in self.results
            ],
        }

    def print_summary(self) -> None:
        status = "PASSED" if self.passed else "FAILED"
        print(f"\n{'=' * 60}")
        print(f"  Validation: {self.name}")
        print(f"  Status:     {status}")
        print(f"  Rules:      {self.pass_count}/{self.total_rules} passed")
        print(f"  Data:       {self.row_count:,} rows x {self.column_count} columns")
        print(f"{'=' * 60}")

    def print_failures(self) -> None:
        if not self.failures:
            print("  No failures.")
            return
        print(f"\n  Failures ({self.fail_count}):")
        print(f"  {'-' * 56}")
        for r in self.failures:
            print(f"  FAIL  {r.rule_name}")
            if r.column:
                print(f"        column: {r.column}")
            for key, val in r.details.items():
                print(f"        {key}: {val}")
            print()
