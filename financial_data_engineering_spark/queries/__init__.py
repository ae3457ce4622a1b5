"""Query registry: every operator exposed as a named (spark_fn, oracle_sql) pair.

Importing this package loads all query modules, populating the registry that
``__spark_entry__.py`` exports to the correctness driver.
"""

from financial_data_engineering_spark.queries.registry import (
    all_oracles,
    all_queries,
    get,
    register,
    reorder,
)

# Import for registration side effects (import order matters only for
# never-verified names, which the generated GATE_WINDOW keeps in
# registration order at the head).
from financial_data_engineering_spark.queries import analytics_ext  # noqa: E402,F401
from financial_data_engineering_spark.queries import audits  # noqa: E402,F401
from financial_data_engineering_spark.queries import curation  # noqa: E402,F401
from financial_data_engineering_spark.queries import dedup  # noqa: E402,F401
from financial_data_engineering_spark.queries import dimensional  # noqa: E402,F401
from financial_data_engineering_spark.queries import events  # noqa: E402,F401
from financial_data_engineering_spark.queries import finance  # noqa: E402,F401
from financial_data_engineering_spark.queries import graph  # noqa: E402,F401
from financial_data_engineering_spark.queries import layout  # noqa: E402,F401
from financial_data_engineering_spark.queries import multimodal  # noqa: E402,F401
from financial_data_engineering_spark.queries import quality  # noqa: E402,F401
from financial_data_engineering_spark.queries import relational  # noqa: E402,F401
from financial_data_engineering_spark.queries import relational_ext  # noqa: E402,F401
from financial_data_engineering_spark.queries import similarity  # noqa: E402,F401
from financial_data_engineering_spark.queries import sketch  # noqa: E402,F401
from financial_data_engineering_spark.queries import text  # noqa: E402,F401
from financial_data_engineering_spark.queries import tpch_shapes  # noqa: E402,F401

#: Driver gate policy: the driver verifies a bounded (~50) window from
#: the registry head each round, so registry order IS verification
#: priority. The ordering is GENERATED from the committed correctness
#: history (tools/gen_gate_window.py, freshness asserted by
#: tests/test_registry.py): queries with no driver-green row ever come
#: first in registration order — so anything registered at any point in
#: a round automatically heads the next round's window — then
#: FORCE_FIRST (semantic changes awaiting re-verification, listed in
#: the generator), then all verified queries oldest-green-first. At 110+
#: queries a 50-row window can no longer re-confirm every query within
#: two rounds; the generated rotation degrades gracefully (the oldest
#: greens are always next), and the committed local strict-gate logs
#: (reports/gate/) cover the full registry at sf0.01 and sf0.1 each
#: round.
from financial_data_engineering_spark.queries.gate_window import (  # noqa: E402
    GATE_WINDOW,
)

reorder(GATE_WINDOW)

__all__ = ["GATE_WINDOW", "all_oracles", "all_queries", "get", "register", "reorder"]
