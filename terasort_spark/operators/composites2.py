"""Second batch of TPC-H-shaped composites: Q2/Q6/Q9/Q11/Q15/Q16/Q17/
Q19/Q20/Q21 adapted to the driver corpus (FIXTURES.md), completing the
22-query family alongside ``composites.py``.

The corpus has no ``partsupp`` table and no ``l_receiptdate`` /
``l_commitdate`` columns, so the shapes that depend on them are re-based
on the distinct ``(l_partkey, l_suppkey)`` relation mined from lineitem
and on ``l_shipdate`` vs ``o_orderdate`` lateness — the operator
structure (correlated subqueries, disjunctive join predicates,
exists/not-exists self-joins, group-global scalar comparisons) is
preserved exactly.

Scale notes (100 TB design): every query keeps dims broadcast, facts
shuffled on their join keys once, and thresholds computed through exact
DECIMAL sums so the group-vs-global comparisons are bit-stable
regardless of partition count or summation order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import DEC, dsum, o_dsum, o_rnd, rnd
from terasort_spark.registry import register


@register(
    "tpch_q6_shape",
    oracle=f"""
SELECT {o_dsum("l_extendedprice * l_discount", "revenue")},
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_shape(spark, sf_dir):
    """TPC-H Q6 (forecast revenue change): pure scan-side query — all
    three predicates push down to the parquet row-group level, zero
    joins, one partial+final global agg. At 100 TB this is the
    I/O-bound best case: min/max row-group stats on l_shipdate prune
    most of the scan before a byte is decoded."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q19_shape",
    oracle=f"""
SELECT {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
       count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_shape(spark, sf_dir):
    """TPC-H Q19 (discounted revenue, disjunctive predicates): equi join
    on partkey with an OR-of-conjuncts residual. The equi conjunct keeps
    it a broadcast hash join (part is the dim side); the disjunction is
    a post-join filter, not a nested-loop — the plan shape that survives
    100x scale."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (li.l_partkey == p.p_partkey) & (
        ((p.p_brand == "Brand#12") & p.p_size.between(1, 5) & li.l_quantity.between(1, 11))
        | ((p.p_brand == "Brand#23") & p.p_size.between(1, 10) & li.l_quantity.between(10, 20))
        | ((p.p_brand == "Brand#34") & p.p_size.between(1, 15) & li.l_quantity.between(20, 30))
    )
    return li.join(F.broadcast(p), cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q9_shape",
    oracle=f"""
SELECT n_name, o_year,
       {o_dsum("l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1", "profit")}
FROM (
  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice, l_discount, p_retailprice, l_quantity
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN orders   ON o_orderkey = l_orderkey
  WHERE p_name LIKE '%gear%'
)
GROUP BY n_name, o_year
""",
)
def tpch_q9_shape(spark, sf_dir):
    """TPC-H Q9 (product-type profit): 5-table join grouped by supplier
    nation x order year. partsupp's supplycost is adapted to a 10%
    carrying cost on p_retailprice. part/supplier/nation broadcast; the
    orders join is the one real shuffle."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.1)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("o_year", F.year("o_orderdate").cast("integer"))
        .groupBy("n_name", "o_year")
        .agg(dsum(profit, "profit"))
    )


@register(
    "tpch_q11_shape",
    oracle=f"""
WITH euro_value AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(25,6)) * CAST(l_quantity AS DECIMAL(25,6))) AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey, {o_rnd("CAST(v AS DOUBLE)", "part_value")}
FROM euro_value
WHERE CAST(v AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) FROM euro_value) * 0.001
""",
)
def tpch_q11_shape(spark, sf_dir):
    """TPC-H Q11 (important stock): per-part value vs a fraction of the
    global total — group-vs-global scalar comparison. partsupp value is
    adapted to extendedprice x quantity over EUROPE suppliers. Both the
    per-part and global sums go through exact DECIMAL so the > threshold
    compare is bit-stable at any partitioning; the global total joins
    back as a broadcast scalar, never a driver collect."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dims = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
            F.broadcast(r), n.n_regionkey == r.r_regionkey
        )
    )
    per_part = (
        li.join(dims, li.l_suppkey == dims.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_quantity").cast(DEC))
            .alias("v")
        )
    )
    total = per_part.agg(F.sum("v").cast("double").alias("tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("tot") * 0.001)
        .select("l_partkey", rnd(F.col("v").cast("double"), "part_value"))
    )


@register(
    "tpch_q15_shape",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, {o_rnd("CAST(total_rev AS DOUBLE)", "total_revenue")}
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
""",
)
def tpch_q15_shape(spark, sf_dir):
    """TPC-H Q15 (top supplier): the revenue "view" computed once, its
    max re-joined as a broadcast scalar, equality on the exact DECIMAL
    revenue (ties all surface, deterministically). No driver-side
    collect of the max — it stays a 1-row broadcast."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
        .alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .select(
            "s_suppkey", "s_name", rnd(F.col("total_rev").cast("double"), "total_revenue")
        )
    )


@register(
    "tpch_q16_shape",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 3, 9, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def tpch_q16_shape(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship): the partsupp relation is
    mined as DISTINCT (l_partkey, l_suppkey); NOT IN becomes a
    null-safe anti join against the (tiny, broadcast) excluded-supplier
    set; count(DISTINCT) keyed per group."""
    li = table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 19, 23, 36, 45, 49)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_shape",
    oracle=f"""
WITH li_part AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand IN ('Brand#3', 'Brand#13')
), stats AS (
  SELECT l_partkey AS sp, count(*) AS cnt,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
  FROM li_part GROUP BY l_partkey
)
SELECT {o_rnd("CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0", "avg_yearly")},
       count(*) AS n_small
FROM li_part JOIN stats ON l_partkey = sp
WHERE l_quantity * 5.0 * cnt < sum_qty
""",
)
def tpch_q17_shape(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): correlated avg-per-part
    subquery, decorrelated into an aggregate self-join — the form
    Catalyst itself rewrites EXISTS/IN into. The threshold compare is
    restated as 5*qty*cnt < sum_qty (all exactly-representable values),
    dodging cross-engine avg() rounding."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand").isin("Brand#3", "Brand#13"))
    lp = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    stats = lp.groupBy(F.col("l_partkey").alias("sp")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
    )
    return (
        lp.join(stats, lp.l_partkey == stats.sp)
        .filter(F.col("l_quantity") * 5.0 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            rnd(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0,
                "avg_yearly",
            ),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "tpch_q20_shape",
    oracle="""
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
  AND EXISTS (SELECT 1 FROM shipped
              WHERE l_suppkey = s_suppkey AND qty > 50.0)
""",
)
def tpch_q20_shape(spark, sf_dir):
    """TPC-H Q20 (potential promotion): nested subqueries → per
    (supplier, part) shipped-quantity agg, threshold filter, then a
    LEFT SEMI join into the region-filtered supplier dim. The semi
    join's build side is the small aggregated set — at 100 TB the agg
    shrinks the fact table before any supplier join happens."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"))
        .filter(F.col("qty") > 50.0)
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(shipped, s.s_suppkey == shipped.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "tpch_q21_shape",
    oracle="""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, numwait, rn FROM (
  SELECT s_name, count(*) AS numwait,
         CAST(row_number() OVER (ORDER BY count(*) DESC, s_name) AS INTEGER) AS rn
  FROM late l1
  JOIN supplier ON s_suppkey = l1.l_suppkey
  WHERE EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey)
  GROUP BY s_name
)
WHERE rn <= 20
""",
)
def tpch_q21_shape(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting): EXISTS + NOT
    EXISTS self-joins on the fact table, expressed as left-semi and
    left-anti joins. Lateness is adapted to shipdate > orderdate + 60d
    (corpus has no receipt/commit dates). Both the semi and anti sides
    shuffle on l_orderkey — one co-partitioned exchange reused across
    the two joins."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    l1 = (
        late.join(l2, (late.l_orderkey == l2.k2) & (late.l_suppkey != l2.s2), "left_semi")
        .join(l3, (late.l_orderkey == l3.k3) & (late.l_suppkey != l3.s3), "left_anti")
    )
    s = table(spark, sf_dir, "supplier")
    agg = (
        l1.join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    # Top-20 via TakeOrderedAndProject (per-partition heaps) before the
    # rank window sees anything — the window input is bounded at 20
    # rows, never the full supplier aggregate.
    top = agg.orderBy(F.desc("numwait"), F.asc("s_name")).limit(20)
    w = Window.orderBy(F.desc("numwait"), F.asc("s_name"))
    return top.select(
        "s_name", "numwait", F.row_number().over(w).cast("integer").alias("rn")
    )


@register(
    "tpch_q2_shape",
    oracle=f"""
SELECT p_partkey, s_suppkey, s_name, n_name, {o_rnd("s_acctbal", "acctbal")}
FROM (
  SELECT p_partkey, s_suppkey, s_name, n_name, s_acctbal,
         max(s_acctbal) OVER (PARTITION BY p_partkey) AS mx
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE p_size = 15 AND r_name = 'EUROPE'
)
WHERE s_acctbal = mx
""",
)
def tpch_q2_shape(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier): correlated per-part extremum.
    Min supplycost becomes max s_acctbal over the suppliers that ship
    each part (partsupp mined from lineitem). The correlated subquery
    is a window max over p_partkey — one shuffle, no re-join; ties all
    kept (exact 2dp doubles, deterministic both engines)."""
    li = table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    joined = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("mx", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("mx"))
        .select("p_partkey", "s_suppkey", "s_name", "n_name", rnd(F.col("s_acctbal"), "acctbal"))
    )
