"""Sort / limit / top-k operators (SURVEY.md §2b).

Determinism: the driver's value hash is order-insensitive (D3), so
ordering is always materialized as a row_number with a unique tie-break;
LIMIT only ever sits on a total order (D4).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
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
