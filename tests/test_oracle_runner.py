"""OracleRunner escalation retry — the encoded form of the r10 sf10
manual rerun (reports/gate/r10_local_sf10_strict_spot.log: the
`part_copurchase_communities` oracle died on DuckDB temp-storage
exhaustion at the 32GB base cap and passed standalone at 40GB; the
runner now performs that rerun itself, so no future gate needs a
manual one).

The forced-spill test provokes the REAL error class — a sort larger
than memory against a 1MB-capped spill dir raises
OutOfMemoryException ("failed to offload data block") — rather than
monkeypatching, so the test breaks if DuckDB changes the error
taxonomy the retry keys on.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL
from tools.check_correctness import OracleRunner

#: Big enough to need spilling at a 64MB cap, small enough to sort in
#: about a second once the caps are raised.
_SPILL_SQL = (
    "SELECT count(*) AS n FROM"
    " (SELECT * FROM range(20000000) ORDER BY hash(range))"
)


def test_forced_spill_exhaustion_retries_and_succeeds():
    runner = OracleRunner(
        SF_SMALL, mem="64MB", temp="1MB", retry_mem="4GB", retry_temp="10GB"
    )
    cols, types, rows, retried = runner.run(_SPILL_SQL)
    assert retried, "base caps were expected to exhaust the 1MB spill dir"
    assert cols == ["n"] and rows == [(20000000,)]
    # escalated caps persist for the remaining session (caps only go up)
    _, _, rows2, retried2 = runner.run(_SPILL_SQL)
    assert rows2 == [(20000000,)] and not retried2


def test_retry_preserves_table_views():
    """The fresh escalated connection must re-register the sf views —
    an oracle that failed mid-gate resumes against the same tables."""
    runner = OracleRunner(
        SF_SMALL, mem="64MB", temp="1MB", retry_mem="4GB", retry_temp="10GB"
    )
    _, _, _, retried = runner.run(_SPILL_SQL)
    assert retried
    _, _, rows, _ = runner.run("SELECT count(*) AS n FROM nation")
    assert rows[0][0] > 0


def test_non_resource_errors_do_not_retry():
    """Only the exhaustion class escalates: a semantic error must raise
    immediately (a retry would mask a broken oracle as slow)."""
    runner = OracleRunner(SF_SMALL, mem="64MB")
    with pytest.raises(duckdb.Error):
        runner.run("SELECT no_such_column FROM nation")
    # and the connection stays usable on the ORIGINAL caps
    _, _, rows, retried = runner.run("SELECT count(*) AS n FROM region")
    assert rows[0][0] == 5 and not retried
