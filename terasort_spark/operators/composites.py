"""Composite TPC-H-shaped queries: multi-operator pipelines proving the
primitives compose end-to-end (scan → filter → multi-join → agg →
window/top-k). These are the bench headliners a reference user would
actually run.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import DEC, dsum, o_dsum
from terasort_spark.registry import register


@register(
    "tpch_q3_shape",
    oracle=f"""
SELECT l_orderkey, o_orderdate, o_orderpriority, revenue, rn
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
         CAST(row_number() OVER (
              ORDER BY floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) * 10000 + 0.5) / 10000 DESC,
                       l_orderkey) AS INTEGER) AS rn
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-03-15'
    AND l_shipdate > TIMESTAMP '1995-03-15'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
WHERE rn <= 10
""",
)
def tpch_q3_shape(spark, sf_dir):
    """TPC-H Q3 (shipping priority): selective dim filter → 3-way join →
    revenue agg → global top-10. Filters sit directly on the scans
    (pushdown), the customer side broadcasts, and the final top-k is a
    TakeOrderedAndProject-style bounded sort — no full global sort."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    agg = (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    # Top-k as ORDER BY + LIMIT (plans as TakeOrderedAndProject: per-
    # partition k-row heaps, driver merges k*P rows) — then the rank
    # column is a window over the already-bounded 10 rows. No
    # unpartitioned window ever sees the unbounded aggregate.
    top = agg.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return top.select(
        "l_orderkey",
        "o_orderdate",
        "o_orderpriority",
        "revenue",
        F.row_number().over(w).alias("rn"),
    )


@register(
    "tpch_q5_shape",
    oracle=f"""
SELECT n_name,
       {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
       count(*) AS n_lines
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'AMERICA')
  AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name
""",
)
def tpch_q5_shape(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): six-table join. Dim chain
    (region→nation→supplier) broadcasts; the only shuffles are the
    customer⋈orders and ⋈lineitem fact joins plus the final tiny agg.
    The co-nation predicate rides the supplier join condition."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "AMERICA"))
    dims = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
            F.broadcast(r), n.n_regionkey == r.r_regionkey
        )
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            dims,
            (li.l_suppkey == dims.s_suppkey)
            & (c.c_nationkey == dims.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q10_shape",
    oracle=f"""
SELECT c_custkey, c_name, n_name, revenue, rn
FROM (
  SELECT c_custkey, c_name, n_name,
         {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
         CAST(row_number() OVER (
              ORDER BY floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) * 10000 + 0.5) / 10000 DESC,
                       c_custkey) AS INTEGER) AS rn
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name, n_name
)
WHERE rn <= 20
""",
)
def tpch_q10_shape(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): returned lineitems → revenue
    lost per customer → top 20."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    # Same top-k shape as tpch_q3_shape: TakeOrderedAndProject bounds
    # the input to 20 rows BEFORE the rank window — r3's form ranked
    # the whole aggregate through one single-partition window task.
    top = agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return top.select(
        "c_custkey",
        "c_name",
        "n_name",
        "revenue",
        F.row_number().over(w).alias("rn"),
    )


@register(
    "tpch_q18_shape",
    oracle=f"""
SELECT c_custkey, o_orderkey,
       {o_dsum("l_quantity", "total_qty")}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, o_orderkey
HAVING sum(l_quantity) > 300
""",
)
def tpch_q18_shape(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): per-order quantity totals with
    a HAVING cut. The HAVING predicate is evaluated post-aggregation —
    only surviving groups leave the agg, so the filter costs nothing
    extra at scale."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(
            dsum(F.col("l_quantity"), "total_qty"),
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter(F.col("_raw_qty") > 300)
        .drop("_raw_qty")
    )


@register(
    "corr_scalar_subquery",
    oracle="""
SELECT p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice = (SELECT min(p2.p_retailprice)
                       FROM part p2 WHERE p2.p_brand = p.p_brand)
""",
)
def corr_scalar_subquery(spark, sf_dir):
    """Correlated scalar subquery (cheapest part per brand), expressed in
    decorrelated form — groupBy-min joined back on the correlation key —
    which is exactly the plan Catalyst's RewriteCorrelatedScalarSubquery
    produces: one extra agg + one equi-join, no per-row subquery."""
    p = table(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_brand").alias("mb")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p.p_brand == F.col("mb")) & (p.p_retailprice == F.col("min_price")),
        )
        .select("p_partkey", "p_brand", "p_retailprice")
    )


@register(
    "tpch_q7_shape",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       {o_dsum("volume", "revenue")}
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
      OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7_shape(spark, sf_dir):
    """TPC-H Q7 (volume shipping): nation-pair trade volume by year. The
    disjunctive nation-pair predicate sits on two broadcast nation dims;
    the fact chain shuffles only on its natural keys."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = F.broadcast(table(spark, sf_dir, "nation")).alias("n1")
    n2 = F.broadcast(table(spark, sf_dir, "nation")).alias("n2")
    pair = (
        (F.col("n1.n_name") == "FRANCE") & (F.col("n2.n_name") == "GERMANY")
    ) | ((F.col("n1.n_name") == "GERMANY") & (F.col("n2.n_name") == "FRANCE"))
    j = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(pair)
    )
    return (
        j.select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), "revenue"))
    )


def _o_ratio(num_case: str, den_expr: str, alias: str, scale: str = "") -> str:
    """Oracle SQL for a deterministic ratio of two money sums: each side
    sums through DECIMAL(25,6) (order-insensitive), converts to DOUBLE,
    divides (one IEEE op), optional scale factor, floor-rounds to 4dp."""
    num = f"CAST(sum(CAST({num_case} AS DECIMAL(25,6))) AS DOUBLE)"
    den = f"CAST(sum(CAST({den_expr} AS DECIMAL(25,6))) AS DOUBLE)"
    return f"floor({scale}{num} / {den} * 10000 + 0.5) / 10000 AS {alias}"


@register(
    "tpch_q8_shape",
    oracle=f"""
SELECT o_year,
       {_o_ratio("CASE WHEN supp_nation = 'BRAZIL' THEN volume ELSE 0.0 END",
                 "volume", "mkt_share")}
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         n2.n_name AS supp_nation,
         l_extendedprice * (1 - l_discount) AS volume
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
)
GROUP BY o_year
""",
)
def tpch_q8_shape(spark, sf_dir):
    """TPC-H Q8 (national market share): BRAZIL's share of ECONOMY-part
    revenue among AMERICA-region customers, per year. The conditional
    numerator and the denominator are both exact decimal sums, so the
    final single IEEE division is reproducible on any partitioning.
    part/supplier/nation/region all broadcast; only the
    lineitem⋈orders⋈customer fact chain shuffles."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
    )
    num = F.sum(
        F.when(F.col("n2.n_name") == "BRAZIL", vol).otherwise(F.lit(0.0)).cast(DEC)
    ).cast("double")
    den = F.sum(vol.cast(DEC)).cast("double")
    from terasort_spark.operators._util import rnd

    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(rnd(num / den, "mkt_share"))
    )


@register(
    "tpch_q12_shape",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate
GROUP BY l_linestatus
""",
)
def tpch_q12_shape(spark, sf_dir):
    """TPC-H Q12 shape (shipping-mode priority split, adapted to this
    corpus: o_orderpriority plays l_shipmode's role): one fact join, two
    conditional counts per group. Integer conditional sums need no
    rounding — bit-exact on any engine."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@register(
    "tpch_q13_shape",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS INTEGER) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def tpch_q13_shape(spark, sf_dir):
    """TPC-H Q13 (customer distribution): left join keeps order-less
    customers (c_count = 0 via null-skipping count), then a second agg
    over the first's output — a distribution of counts. The ON-clause
    predicate is applied pre-join (outer semantics preserved: filtering
    the right side before a left join IS the ON-clause form)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("int").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q14_shape",
    oracle=f"""
SELECT {_o_ratio("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END",
                 "l_extendedprice * (1 - l_discount)", "promo_revenue", scale="100.0 * ")}
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
""",
)
def tpch_q14_shape(spark, sf_dir):
    """TPC-H Q14 (promotion effect): percent of one month's revenue from
    PROMO parts. Single-row global agg; the month filter pushes to the
    lineitem scan and part broadcasts."""
    from terasort_spark.operators._util import rnd

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.sum(
        F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)).cast(DEC)
    ).cast("double")
    den = F.sum(vol.cast(DEC)).cast("double")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(rnd(F.lit(100.0) * num / den, "promo_revenue"))
    )


@register(
    "tpch_q22_shape",
    oracle=f"""
WITH thr AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       {o_dsum("c_acctbal", "totacctbal")}
FROM customer, thr
WHERE c_acctbal > thr.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT'
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
""",
)
def tpch_q22_shape(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): customers with
    above-average positive balance and no recent urgent orders, counted
    per nation (every customer in this corpus has SOME order, so the
    anti-join side is the urgent-recent slice). The scalar-subquery
    threshold is a 1-row broadcast cross join (the same decorrelation
    Catalyst performs); "no matching orders" is a left-anti join. The
    threshold average divides an exact decimal sum by an exact count so
    the cutoff is identical on every engine and partitioning."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    )
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1)))
            .alias("avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )


@register(
    "tpch_q4_shape",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def tpch_q4_shape(spark, sf_dir):
    """TPC-H Q4 (order priority checking, adapted: the corpus lacks
    commit/receipt dates so the EXISTS predicate is "some lineitem
    shipped after the order date"): a correlated EXISTS expressed as a
    left-semi join carrying the non-equi ship-date condition, then a
    tiny priority rollup. The semi join never duplicates orders no
    matter how many lineitems match — output stays bounded by orders."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
