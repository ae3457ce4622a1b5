"""Validation reporting — structured results with pass/fail rollups.

Driver-side control plane (same role as the reference's report surface,
src/quality/report.py:14-99): the data never leaves the cluster, only rule
outcomes do. Field names and the ``to_dict`` key layout are the public
contract and match the reference; everything else (rollup internals,
rendering) is organized around a single pass/fail partition of the results.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from financial_data_engineering_spark.quality.rules import RuleResult


def _outcome_row(r: RuleResult) -> dict[str, Any]:
    """One serialized rule outcome (contract keys: rule/severity/column/details)."""
    return {
        "rule": r.rule_name,
        "severity": r.severity,
        "column": r.column,
        "details": r.details,
    }


@dataclass
class ValidationReport:
    """Outcome of a validation run over one DataFrame."""

    name: str
    results: list[RuleResult]
    row_count: int
    column_count: int

    def _partition(self) -> tuple[list[RuleResult], list[RuleResult]]:
        """Split results into (passed, failed) once; every rollup derives
        from this."""
        ok = [r for r in self.results if r.passed]
        bad = [r for r in self.results if not r.passed]
        return ok, bad

    @property
    def passed(self) -> bool:
        return not self._partition()[1]

    @property
    def pass_count(self) -> int:
        return len(self._partition()[0])

    @property
    def fail_count(self) -> int:
        return len(self._partition()[1])

    @property
    def total_rules(self) -> int:
        return len(self.results)

    @property
    def failures(self) -> list[RuleResult]:
        return self._partition()[1]

    def to_dict(self) -> dict[str, Any]:
        """JSON-safe serialization of the full report."""
        ok, bad = self._partition()
        return {
            "name": self.name,
            "passed": not bad,
            "summary": {
                "total_rules": len(self.results),
                "passed": len(ok),
                "failed": len(bad),
                "rows_checked": self.row_count,
                "columns_checked": self.column_count,
            },
            "results": [_outcome_row(r) for r in self.results],
        }

    # -- rendering ------------------------------------------------------------

    _RULE_W = 60

    def summary_lines(self) -> list[str]:
        """Summary block as lines (printable or log-shippable)."""
        ok, bad = self._partition()
        verdict = "FAILED" if bad else "PASSED"
        bar = "=" * self._RULE_W
        return [
            bar,
            f"[{verdict}] validation run '{self.name}'",
            f"  rules : {len(ok)}/{len(self.results)} passed"
            + (f" ({len(bad)} failing)" if bad else ""),
            f"  input : {self.row_count:,} rows, {self.column_count} columns",
            bar,
        ]

    def failure_lines(self) -> list[str]:
        """Per-failure detail block as lines; empty-case message included."""
        bad = self._partition()[1]
        if not bad:
            return ["all rules passed - nothing to report"]
        lines = [f"{len(bad)} failing rule(s):"]
        for r in bad:
            where = f" on column '{r.column}'" if r.column else ""
            lines.append(f"* {r.rule_name}{where}")
            lines.extend(f"    {k} = {v}" for k, v in r.details.items())
        return lines

    def print_summary(self) -> None:
        print("\n".join(["", *self.summary_lines()]))

    def print_failures(self) -> None:
        print("\n".join(["", *self.failure_lines()]))
