"""Sort / limit / top-k operators (SURVEY.md §2b).

Determinism: the driver's value hash is order-insensitive (D3), so
ordering is always materialized as a row_number with a unique tie-break;
LIMIT only ever sits on a total order (D4).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import rnd
from terasort_spark.registry import register


@register(
    "sort_rank",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice,
       CAST(row_number() OVER (ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INTEGER)
           AS price_rank
FROM lineitem
WHERE l_extendedprice > 99000
""",
)
def sort_rank(spark, sf_dir):
    """Global total order materialized as a rank column.

    Scale note: an unpartitioned window funnels all rows through one
    task, so the engine first cuts the input with a selective filter
    (top slice). The 100 TB variant of a full-table global rank is
    two-pass: repartitionByRange on the sort key, sortWithinPartitions,
    then add per-partition offsets (sum of lower-partition counts) —
    same technique the terasort module uses for total order.
    """
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 99000)
    w = Window.orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.row_number().over(w).alias("price_rank"),
    )


@register(
    "topk_limit",
    oracle="""
SELECT o_orderkey, o_totalprice,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def topk_limit(spark, sf_dir):
    # ORDER BY + LIMIT plans as TakeOrderedAndProject: each partition
    # keeps a k-row heap, the driver merges k*numPartitions rows — no
    # global sort, scales to any input size for small k.
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
    )


@register(
    "topk_pergroup",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal, rn
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         CAST(row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
  FROM customer
)
WHERE rn <= 3
""",
)
def topk_pergroup(spark, sf_dir):
    # Top-k per group via ranked window + filter. Spark pushes the rn<=3
    # predicate into the window sort (WindowGroupLimit) so each group
    # keeps only k rows through the shuffle.
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        table(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "topk_skyline",
    oracle="""
WITH p AS (
    SELECT p_partkey, p_size,
           CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
    FROM part
)
SELECT a.p_partkey, a.p_size,
       floor(a.cents / 100.0 * 10000 + 0.5) / 10000 AS price
FROM p a
WHERE NOT EXISTS (
    SELECT 1 FROM p b
    WHERE b.cents <= a.cents AND b.p_size >= a.p_size
      AND (b.cents < a.cents OR b.p_size > a.p_size)
)
""",
)
def topk_skyline(spark, sf_dir):
    """2-D skyline (pareto front) over parts: minimize retail price,
    maximize size — a part is on the skyline iff no other part is at
    least as large AND at least as cheap with one strict. The classic
    multi-objective "best tradeoffs" query (Börzsönyi et al., ICDE'01).

    Scale: instead of the O(n²) dominance self-join the oracle runs,
    the plan exploits the 2-D structure: aggregate to the per-size
    MIN-PRICE HISTOGRAM (p_size has a bounded domain), take a running
    min over sizes-descending ACROSS HISTOGRAM ROWS to find each
    size's cheaper-larger competitor, broadcast the surviving
    (size, min_price) frontier, and keep raw parts matching it with a
    stateless scan-stage filter — one map-combined groupBy plus a
    broadcast join, no self-join, no sort of raw rows. Prices are
    2dp decimals, so the cents quantization is lossless and dominance
    is exact-integer.

    The oracle deliberately uses the naive NOT EXISTS formulation —
    an independent algorithm whose agreement validates the frontier
    derivation, not just the arithmetic."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    return skyline_2d(p).select(
        "p_partkey",
        "p_size",
        rnd(F.col("cents") / 100.0, "price"),
    )


def skyline_2d(p):
    """Pareto front of a (p_partkey, p_size, cents) frame — minimize
    cents, maximize p_size. Factored so tests can feed arbitrary
    (randomized, repartitioned) frames."""
    hist = p.groupBy("p_size").agg(F.min("cents").alias("m"))
    # Running min over HISTOGRAM rows (bounded size domain — the
    # approved de-skew form; never a window over raw parts).
    w_larger = Window.orderBy(F.desc("p_size")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        hist.withColumn("mm", F.min("m").over(w_larger))
        .filter(F.col("mm").isNull() | (F.col("m") < F.col("mm")))
        .select("p_size", "m")
    )
    return (
        p.join(F.broadcast(frontier), "p_size")
        .filter(F.col("cents") == F.col("m"))
        .select("p_partkey", "p_size", "cents")
    )
