"""Join operators (SURVEY.md §2b — join_* family).

Scale notes baked into each operator:
- dim tables (region/nation/supplier/customer-slices) are broadcast —
  no shuffle of the fact side;
- fact-fact joins shuffle on the join key; AQE handles skew splitting;
- the as-of join is a window formulation (one shuffle by user), NOT a
  range self-join — the quadratic candidate explosion a naive
  BETWEEN-join would cost at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import dsum, o_dsum
from terasort_spark.registry import register


@register(
    "join_inner",
    oracle=f"""
SELECT c_mktsegment,
       count(*) AS n_lines,
       {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_mktsegment
""",
)
def join_inner(spark, sf_dir):
    # Multi-way equi join, smallest-first: customer⋈orders shuffles the
    # small pair, then joins lineitem on its natural key. AQE may demote
    # to broadcast when the build side fits.
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@register(
    "join_broadcast",
    oracle=f"""
SELECT n_name,
       count(*) AS n_lines,
       {o_dsum("l_extendedprice", "sum_price")}
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
)
def join_broadcast(spark, sf_dir):
    # Explicit broadcast of both dims: the fact table never shuffles for
    # the join — only the tiny grouped partials move. The plan assertion
    # (BroadcastHashJoin, no Exchange before it) lives in tests/test_plans.py.
    li = table(spark, sf_dir, "lineitem")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice"), "sum_price"),
        )
    )


@register(
    "join_left",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n_rows,
       count(o_orderkey) AS n_matched,
       count(*) - count(o_orderkey) AS n_unmatched
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) big
  ON c_custkey = big.o_custkey
GROUP BY c_mktsegment
""",
)
def join_left(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    j = c.join(big, c.c_custkey == big.o_custkey, "left")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_matched"),
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("n_unmatched"),
    )


@register(
    "join_full",
    oracle="""
SELECT count(*) AS n_rows,
       count(c.c_custkey) AS n_left_present,
       count(o.o_orderkey) AS n_right_present,
       count(CASE WHEN c.c_custkey IS NOT NULL AND o.o_orderkey IS NOT NULL
                  THEN 1 END) AS n_both
FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) o
  ON c.c_custkey = o.o_custkey
""",
)
def join_full(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    j = c.join(o, c.c_custkey == o.o_custkey, "full")
    both = F.when(
        c.c_custkey.isNotNull() & o.o_orderkey.isNotNull(), F.lit(1)
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(c.c_custkey).alias("n_left_present"),
        F.count(o.o_orderkey).alias("n_right_present"),
        F.count(both).alias("n_both"),
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
)
def join_semi(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_anti(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
SELECT r_name, n_name
FROM region CROSS JOIN nation
""",
)
def join_cross(spark, sf_dir):
    # Cartesian of two dims (5 × 25). Only ever small×small; a guard in
    # the API keeps this off fact tables at scale.
    return (
        table(spark, sf_dir, "region")
        .crossJoin(table(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
    )


@register(
    "join_theta",
    oracle="""
SELECT s_nationkey AS nationkey,
       count(*) AS n_pairs,
       count(DISTINCT s_suppkey) AS n_supps
FROM supplier
JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
GROUP BY s_nationkey
""",
)
def join_theta(spark, sf_dir):
    # Equi key + inequality residual: hash-partition on the equi key, the
    # inequality evaluates as a post-probe filter — no cartesian blowup.
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        )
        .groupBy(s.s_nationkey.alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("s_suppkey").alias("n_supps"),
        )
    )


@register(
    "join_interval",
    oracle=f"""
SELECT o_orderpriority,
       count(*) AS n_lines,
       {o_dsum("l_extendedprice", "sum_price")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
           AND l_shipdate BETWEEN o_orderdate
                              AND o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
""",
)
def join_interval(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    upper = F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & F.col("l_shipdate").between(F.col("o_orderdate"), upper),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice"), "sum_price"),
        )
    )


@register(
    "join_asof",
    oracle="""
SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def join_asof(spark, sf_dir):
    """As-of join: for each purchase, the latest click by the same user at
    or before the purchase timestamp.

    Implemented as a union + window (last ignorenulls over time order),
    not a range join: one shuffle by user_id, linear in events — the
    formulation that survives 100 TB where a BETWEEN self-join explodes
    quadratically per user.
    """
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("click_ts")
    )
    # clicks sort before purchases at equal ts (is_p) so "at or before"
    # includes a same-instant click, matching ASOF's >= semantics.
    tagged = clicks.withColumn("is_p", F.lit(0)).unionByName(
        purchases.withColumn("is_p", F.lit(1))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


@register(
    "join_asof_nearest",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts,
       CASE
         WHEN back IS NULL THEN fwd
         WHEN fwd IS NULL THEN back
         WHEN date_diff('second', back, p.ts)
              <= date_diff('second', p.ts, fwd) THEN back
         ELSE fwd
       END AS nearest_click_ts
FROM (
  SELECT p.event_id, p.user_id, p.ts,
         (SELECT max(c.ts) FROM c
          WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS back,
         (SELECT min(c.ts) FROM c
          WHERE c.user_id = p.user_id AND c.ts > p.ts) AS fwd
  FROM p
) p
""",
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-neighbor as-of join: for each purchase, the click by the
    same user CLOSEST in time in either direction (sensor/trade
    alignment semantics; ties at equal distance break backward). Still
    the linear union+window formulation — one shuffle on user_id, a
    backward last() and a forward first() over the same tagged stream —
    never a |purchases|x|clicks| range join. The oracle is an
    INDEPENDENT formulation (correlated min/max subqueries), so the
    window algebra is cross-checked, not mirrored."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    tagged = clicks.withColumn("is_p", F.lit(0)).unionByName(
        purchases.withColumn("is_p", F.lit(1))
    )
    order = [F.col("ts"), F.col("is_p"), F.col("event_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    back = F.last("click_ts", ignorenulls=True).over(wb)
    fwd = F.first("click_ts", ignorenulls=True).over(wf)
    nearest = (
        F.when(back.isNull(), fwd)
        .when(fwd.isNull(), back)
        .when(
            F.col("ts").cast("long") - back.cast("long")
            <= fwd.cast("long") - F.col("ts").cast("long"),
            back,
        )
        .otherwise(fwd)
    )
    return (
        tagged.withColumn("nearest_click_ts", nearest)
        .filter(F.col("is_p") == 1)
        .select("event_id", "user_id", "ts", "nearest_click_ts")
    )


@register(
    "join_asof_tolerance",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts,
       (SELECT max(c.ts) FROM c
        WHERE c.user_id = p.user_id
          AND c.ts <= p.ts
          AND c.ts >= p.ts - INTERVAL 1 HOUR) AS last_click_ts
FROM p
""",
)
def join_asof_tolerance(spark, sf_dir):
    """Bounded-staleness as-of join (pandas ``merge_asof(tolerance=...)``
    semantics): the latest click at or before each purchase, but only
    if it happened within the last hour — older matches return NULL
    instead of silently joining stale state. The guard every
    feature-store / trade-alignment lookup needs.

    Same linear union+window formulation as join_asof (one shuffle on
    the high-cardinality user key, never a range self-join); the
    tolerance is a stateless second-difference comparison AFTER the
    window, so it adds zero shuffles. Oracle is the independent
    correlated-subquery formulation, cross-checking the window algebra.
    """
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    tagged = clicks.withColumn("is_p", F.lit(0)).unionByName(
        purchases.withColumn("is_p", F.lit(1))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    back = F.last("click_ts", ignorenulls=True).over(w)
    within = F.col("ts").cast("long") - back.cast("long") <= 3600
    return (
        tagged.withColumn("last_click_ts", F.when(within, back))
        .filter(F.col("is_p") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts")
    )
