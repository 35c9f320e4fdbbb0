"""Rule-style rewrite #2: answer coarse-grain aggregate queries FROM a
materialized view instead of the fact table — the query-rewrite half of
the materialized-view story (`ivm_incremental_agg` in operators/cdc.py
is the other half: keeping the MV fresh from a change feed).

Catalyst (OSS) has no MV-rewrite rule, so this module is the
plan-builder equivalent: ``answer_from_mv`` takes a requested grouping
+ measure set, PROVES it derivable from the view definition
(requested dims must be coarsenings of MV dims; measures must be
re-aggregable — SUM/COUNT roll up, AVG only as SUM/COUNT, MIN/MAX roll
up, COUNT DISTINCT does NOT), and emits a plan whose ONLY scan is the
MV. A non-derivable request raises instead of silently reading the
fact table — rewrite rules must be sound, not best-effort.

Exactness across the two plans (and the DuckDB oracle on RAW data):
the MV stores additive measures as DECIMAL(25,6) partial sums, so
rolling daily → monthly is exact integer-decimal addition —
order-insensitive, hash-identical to aggregating the fact table
directly. This is the same determinism trick (operators/_util.dsum)
that makes money-scale sums stable across partitionings.

Scale: this is THE 100 TB pattern for dashboard/rollup workloads — the
fact table is scanned once a day to refresh the MV (or incrementally
via ivm_incremental_agg), and every coarser query after that reads
|days| x |priorities| rows instead of 10^11 facts. The rewrite check
is O(#dims) driver-side metadata work.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import DEC, o_rnd, rnd, scratch_dir
from terasort_spark.registry import register

# --- the view definition (metadata a catalog would hold) -------------------
# grain: one row per (o_orderdate, o_orderpriority)
MV_DIMS = ("o_orderdate", "o_orderpriority")
# measure -> (agg, source expr); only re-aggregable aggregates allowed here
MV_MEASURES = {
    "n_orders": ("count", None),
    "revenue_dec": ("sum", "o_totalprice"),  # DECIMAL partial sums
}
# requested dim -> (mv dim it coarsens, coarsening expr builder)
_DERIVABLE_DIMS = {
    "o_orderdate": ("o_orderdate", lambda c: c),
    "order_month": ("o_orderdate", lambda c: F.trunc(c, "month")),
    "order_year": ("o_orderdate", lambda c: F.trunc(c, "year")),
    "o_orderpriority": ("o_orderpriority", lambda c: c),
}
_REAGG = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def build_daily_mv(spark, sf_dir: str) -> str:
    """Materialize the view (the nightly refresh a warehouse schedules).
    Partial sums go through DECIMAL so any later re-aggregation is
    exact regardless of partitioning or roll-up order."""
    out = scratch_dir(spark, "mv_daily")
    shutil.rmtree(out, ignore_errors=True)
    (
        table(spark, sf_dir, "orders")
        .groupBy(*MV_DIMS)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("revenue_dec"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def answer_from_mv(
    spark, mv_path: str, dims: tuple[str, ...], measures: tuple[str, ...]
) -> DataFrame:
    """The rewrite rule: validate derivability, then aggregate the MV.
    Raises ValueError when the request is not answerable from the view
    (the caller must fall back to the fact table EXPLICITLY)."""
    for d in dims:
        if d not in _DERIVABLE_DIMS:
            raise ValueError(
                f"dimension {d!r} is not derivable from MV grain {MV_DIMS}"
            )
    for m in measures:
        if m not in MV_MEASURES:
            raise ValueError(f"measure {m!r} not in the view definition")
        agg, _ = MV_MEASURES[m]
        if agg not in _REAGG:
            raise ValueError(f"{m!r} ({agg}) is not re-aggregable")
    mv = spark.read.parquet(mv_path)
    keys = [
        _DERIVABLE_DIMS[d][1](F.col(_DERIVABLE_DIMS[d][0])).alias(d)
        for d in dims
    ]
    aggs = [_REAGG[MV_MEASURES[m][0]](F.col(m)).alias(m) for m in measures]
    return mv.groupBy(*keys).agg(*aggs)


@register(
    "mv_rewrite",
    oracle=f"""
SELECT date_trunc('month', o_orderdate) AS order_month,
       o_orderpriority,
       CAST(sum(1) AS BIGINT) AS n_orders,
       {o_rnd("CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)", "revenue")}
FROM orders
GROUP BY 1, 2
""",
)
def mv_rewrite(spark, sf_dir):
    """Monthly revenue per priority answered FROM the daily MV: build
    (refresh) the view, then let the rewrite rule roll daily partial
    sums up to months. The oracle aggregates the RAW orders table, so a
    hash match proves the rewrite is semantics-preserving — the same
    guarantee similarity_rewrite gives for its strategy choice. The
    returned plan's only scan is the MV directory (plan-asserted in
    tests/test_plans.py): at 100 TB that is |days|x|priorities| rows
    instead of every order ever placed."""
    mv_path = build_daily_mv(spark, sf_dir)
    out = answer_from_mv(
        spark,
        mv_path,
        dims=("order_month", "o_orderpriority"),
        measures=("n_orders", "revenue_dec"),
    )
    return out.select(
        "order_month",
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        rnd(F.col("revenue_dec").cast("double"), "revenue"),
    )
