"""Query registry: every operator exposed as a named (spark_fn, oracle_sql) pair.

Importing this package loads all query modules, populating the registry that
``__spark_entry__.py`` exports to the correctness driver.
"""

from financial_data_engineering_spark.queries.registry import (
    all_oracles,
    all_queries,
    get,
    register,
)

# Import for registration side effects. Registration order is also driver
# gate order, and the driver checks a bounded window (~50) of the registry.
# Round-5 rotation: the families whose rows were OUTSIDE the r4 window
# (relational, dimensional, quality), the three r4 hash-fixed queries
# (multimodal ×2, curation's doc_mix_rebalance), and every round-5
# addition (audits module + doc_split_assign + the three incremental
# dedup queries) sit in positions 1-50 — the window is EXACTLY full, with
# dedup_incremental_minhash at 50. Everything at 51+ was driver-green in
# r4. ROUND-6 ROTATION: move sketch/relational_ext/similarity/text/events
# (and the dedup tail) back to the front so their rows get re-confirmed;
# the families verified here rotate out.
from financial_data_engineering_spark.queries import multimodal  # noqa: E402,F401
from financial_data_engineering_spark.queries import audits  # noqa: E402,F401
from financial_data_engineering_spark.queries import curation  # noqa: E402,F401
from financial_data_engineering_spark.queries import quality  # noqa: E402,F401
from financial_data_engineering_spark.queries import dimensional  # noqa: E402,F401
from financial_data_engineering_spark.queries import relational  # noqa: E402,F401
from financial_data_engineering_spark.queries import dedup  # noqa: E402,F401
from financial_data_engineering_spark.queries import sketch  # noqa: E402,F401
from financial_data_engineering_spark.queries import relational_ext  # noqa: E402,F401
from financial_data_engineering_spark.queries import similarity  # noqa: E402,F401
from financial_data_engineering_spark.queries import text  # noqa: E402,F401
from financial_data_engineering_spark.queries import events  # noqa: E402,F401

__all__ = ["all_oracles", "all_queries", "get", "register"]
