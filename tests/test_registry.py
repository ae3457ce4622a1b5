"""Registry contracts: the gate window reorder and the spec invariants
the driver relies on (names unique, oracles a subset of queries, window
names all registered)."""

from __future__ import annotations

import pytest

from financial_data_engineering_spark import queries as q
from financial_data_engineering_spark.queries.registry import reorder


def test_gate_window_is_registry_head():
    names = list(q.all_queries())
    assert names[: len(q.GATE_WINDOW)] == q.GATE_WINDOW
    # the window is bounded by the ~50 rows the driver checks per round
    assert len(q.GATE_WINDOW) <= 50
    assert len(set(q.GATE_WINDOW)) == len(q.GATE_WINDOW)


def test_oracles_subset_of_queries():
    assert set(q.all_oracles()) <= set(q.all_queries())


def test_reorder_rejects_unknown_and_duplicate_names():
    with pytest.raises(KeyError):
        reorder(["definitely_not_a_query"])
    with pytest.raises(ValueError):
        reorder([q.GATE_WINDOW[0], q.GATE_WINDOW[0]])
    # restore canonical order (reorder with the declared window is
    # idempotent, so other tests see the normal head)
    reorder(q.GATE_WINDOW)


def test_readme_counts_block_matches_registry():
    """README headline numbers are generated, not typed: the committed
    COUNTS block must match the live registry (regenerate with
    python tools/update_readme_counts.py)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "tools/update_readme_counts.py", "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
