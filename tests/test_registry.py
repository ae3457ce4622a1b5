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
    # the generated window is the FULL registry ordering (the driver
    # takes its ~50-row check from the head)
    assert len(q.GATE_WINDOW) == len(names)
    assert len(set(q.GATE_WINDOW)) == len(q.GATE_WINDOW)


def test_gate_window_file_matches_correctness_history():
    """The window ordering is generated, not hand-maintained: the
    committed gate_window.py must match regeneration from the
    CORRECTNESS_r*.json history (python tools/gen_gate_window.py)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "tools/gen_gate_window.py", "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr


def test_gate_window_never_verified_first():
    """Every query with no driver-green row in any committed round must
    precede every verified query — the property that closes the
    late-registration gap."""
    sys_path_hack = __import__("sys").path
    if "." not in sys_path_hack:
        sys_path_hack.insert(0, ".")
    from tools.gen_gate_window import last_green_rounds

    greens = last_green_rounds()
    seen_verified = False
    for name in q.GATE_WINDOW:
        if name in greens:
            seen_verified = True
        else:
            assert not seen_verified, (
                f"never-verified {name} after a verified query"
            )


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
