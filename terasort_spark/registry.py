"""Query registry: the single source of truth for the engine's declared
operator inventory (SURVEY.md §2b).

Every operator registers a callable ``(spark, sf_dir) -> DataFrame`` and,
when SQL-expressible, a DuckDB oracle string. ``__spark_entry__.py`` is a
thin shim over this module; the driver compares each pair at sf0.01
(row-count + schema + order-insensitive value-hash).

Determinism conventions enforced by every registered query (D1–D6):
  D1 round floating outputs to 4dp on both sides (exact decimal sums where
     magnitudes make double-summation order observable at 4dp);
  D2 UTC session timezone;
  D3 materialize order as row_number with unique tie-breaks;
  D4 LIMIT only over a total order;
  D5 sort collected arrays;
  D6 identical column aliases on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that register operators on import. Order is cosmetic.
_OPERATOR_MODULES = (
    "terasort_spark.operators.scans",
    "terasort_spark.operators.projections",
    "terasort_spark.operators.joins",
    "terasort_spark.operators.aggregates",
    "terasort_spark.operators.windows",
    "terasort_spark.operators.sorts",
    "terasort_spark.operators.setops",
    "terasort_spark.operators.sessions",
    "terasort_spark.operators.llm_text",
    "terasort_spark.operators.llm_dedup",
    "terasort_spark.operators.llm_similarity",
    "terasort_spark.operators.multimodal",
    "terasort_spark.functions.scalar",
    "terasort_spark.functions.collections",
    "terasort_spark.functions.udfs",
    "terasort_spark.sources.tera_queries",
    "terasort_spark.operators.composites",
    "terasort_spark.operators.composites2",
    "terasort_spark.operators.extras",
    "terasort_spark.operators.extras2",
    "terasort_spark.operators.timeseries",
    "terasort_spark.operators.pipelines",
    "terasort_spark.operators.graph",
    "terasort_spark.operators.relational3",
    "terasort_spark.operators.relational4",
    "terasort_spark.operators.relational5",
    "terasort_spark.operators.pretrain",
    "terasort_spark.operators.analytics",
    "terasort_spark.operators.multimodal_audio",
    "terasort_spark.operators.llm_gemm",
    "terasort_spark.operators.llm_lm",
)

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with an optional DuckDB
    oracle. ``oracle=None`` → driver records a weaker rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


def _load() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
