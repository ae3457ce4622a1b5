"""tools/make_scaled_sf.py invariants — the replica generator backs the
sf1 evidence runs, so its consistency claims are themselves tested:
exact N-x cardinalities, FK closure within every replica, untouched
fixed dimensions, and the per-replica time shift on events. Hermetic:
builds a tiny factor-3 replica of sf0.001 into tmp_path (DuckDB only,
no Spark session)."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    import sys

    sys.path.insert(0, ".")
    from tools.make_scaled_sf import scale

    dst = str(tmp_path_factory.mktemp("scaled") / "sf3x")
    scale(SF_SMALL, dst, 3)
    return dst


def _count(con, path, table):
    return con.sql(f"SELECT count(*) FROM '{path}/{table}.parquet'").fetchone()[0]


def test_cardinalities_scale_exactly(scaled):
    con = duckdb.connect()
    for table in ["orders", "lineitem", "customer", "supplier", "part",
                  "documents", "embeddings", "events"]:
        assert _count(con, scaled, table) == 3 * _count(con, SF_SMALL, table)
    for table in ["nation", "region"]:
        assert _count(con, scaled, table) == _count(con, SF_SMALL, table)


def test_fk_closure_holds_in_replica(scaled):
    """Every FK in the scaled facts must resolve in the scaled parents —
    the property that makes join results meaningful at the new scale."""
    con = duckdb.connect()
    checks = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
    ]
    for child, fk, parent, pk in checks:
        orphans = con.sql(
            f"SELECT count(*) FROM '{scaled}/{child}.parquet' c "
            f"WHERE NOT EXISTS (SELECT 1 FROM '{scaled}/{parent}.parquet' p "
            f"WHERE p.{pk} = c.{fk})"
        ).fetchone()[0]
        assert orphans == 0, f"{child}.{fk} -> {parent}.{pk}: {orphans} orphans"


def test_events_replicas_shift_time_and_keep_users(scaled):
    con = duckdb.connect()
    src_users, src_span = con.sql(
        f"SELECT count(DISTINCT user_id), date_diff('day', min(ts), max(ts)) "
        f"FROM '{SF_SMALL}/events.parquet'"
    ).fetchone()
    dst_users, dst_span = con.sql(
        f"SELECT count(DISTINCT user_id), date_diff('day', min(ts), max(ts)) "
        f"FROM '{scaled}/events.parquet'"
    ).fetchone()
    assert dst_users == src_users  # user axis does NOT scale (histories do)
    assert dst_span == src_span + 2 * 400  # factor-1 replicas shift 400d each
    # event ids stay globally unique
    n, nd = con.sql(
        f"SELECT count(*), count(DISTINCT event_id) "
        f"FROM '{scaled}/events.parquet'"
    ).fetchone()
    assert n == nd
