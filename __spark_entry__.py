"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``terasort_spark`` — the registry in
``terasort_spark/registry.py`` is the single source of truth for the
declared operator inventory (SURVEY.md §2b) and the DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from terasort_spark import registry  # noqa: E402
from terasort_spark.session import configure  # noqa: E402

FLAGSHIP = "agg_group"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing-summary shape) on sf0.001."""
    configure(spark)
    return registry.queries()[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2b."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each SQL-expressible query (same column aliases)."""
    return registry.oracle_sql()
