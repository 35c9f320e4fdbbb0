"""Fifth-wave relational operators: null-safe equality join,
deterministic mode, date-sequence generation (calendar spine), and the
printf/formatting function family. All absent from the reference's
5-operator sort pipeline (SURVEY.md §2a); declared here with full
DuckDB oracles per §2b rules D1–D6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.registry import register


@register(
    "join_nullsafe",
    oracle="""
SELECT a.seg AS seg, a.n_cust, b.n_ord
FROM (
    SELECT nullif(c_mktsegment, 'BUILDING') AS seg, count(*) AS n_cust
    FROM customer GROUP BY 1
) a
JOIN (
    SELECT nullif(c_mktsegment, 'BUILDING') AS seg, count(*) AS n_ord
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY 1
) b ON a.seg IS NOT DISTINCT FROM b.seg
""",
)
def join_nullsafe(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics needed when a
    dimension uses NULL as a real category (here manufactured by
    nullif-ing one segment). A plain equi-join silently drops the NULL
    group; the difference is exactly one row, and it's the row this
    query exists to keep.

    Scale notes: Spark plans <=> as an ordinary hash join (EqualNullSafe
    is a valid hash key — NULLs hash to a bucket like any value), so
    this costs the same single shuffle as '='."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    a = c.select(seg).groupBy("seg").agg(F.count(F.lit(1)).alias("n_cust"))
    b = (
        c.join(o, c.c_custkey == o.o_custkey)
        .select(seg)
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n_ord"))
    )
    return a.join(b, a.seg.eqNullSafe(b.seg)).select(
        a.seg.alias("seg"), "n_cust", "n_ord"
    )


@register(
    "agg_mode",
    oracle="""
SELECT o_orderstatus, o_orderpriority AS mode_priority, n
FROM (
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           row_number() OVER (PARTITION BY o_orderstatus
                              ORDER BY count(*) DESC, o_orderpriority) AS rn
    FROM orders GROUP BY o_orderstatus, o_orderpriority
)
WHERE rn = 1
""",
)
def agg_mode(spark, sf_dir):
    """Deterministic mode: most frequent order priority per status,
    ties broken by priority string order. Built-in mode() leaves tie
    choice engine-arbitrary (Spark and DuckDB disagree), so the mode is
    computed as count + row_number with a total order — the D3 rule
    applied to an aggregate.

    Scale notes: two-level aggregation — the groupBy(status, priority)
    count is the only full shuffle; the window then runs over at most
    |status|x|priority| rows (tiny), so 100 TB of orders reduces before
    any per-group ranking."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    win = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


@register(
    "fn_sequence",
    # The oracle unrolls the three slots as start + k*INTERVAL rather
    # than using generate_series: DuckDB's generate_series accumulates
    # the step ITERATIVELY (Jan 29 -> Feb 28 -> Mar 28, the clamp
    # sticks), while Spark's sequence() computes start + k*month
    # (Jan 29 + 2 months = Mar 29). The two agree except for month-end
    # dates crossing February — absent at sf0.01, 5 rows at sf0.1.
    oracle="""
SELECT o_orderkey, CAST(unnest([
           o_orderdate,
           o_orderdate + INTERVAL 1 MONTH,
           o_orderdate + INTERVAL 2 MONTH
       ]) AS DATE) AS bill_month
FROM orders
WHERE o_orderkey % 1000 = 0
""",
)
def fn_sequence(spark, sf_dir):
    """Date-sequence generation (calendar spine): three monthly billing
    dates per order — sequence() + explode, the idiom behind date
    scaffolds, gap-filling, and schedule expansion. DuckDB twin is
    generate_series + unnest.

    Scale notes: explode multiplies rows by a bounded constant (3) in
    the scan stage — narrow transformation, no shuffle; the o_orderkey
    filter reaches the parquet scan first."""
    o = table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") % 1000 == 0)
        .select(
            "o_orderkey",
            F.explode(
                F.sequence(
                    # o_orderdate is stored as TIMESTAMP (FIXTURES.md);
                    # spine slots are calendar DATEs on both engines.
                    F.col("o_orderdate").cast("date"),
                    F.add_months(F.col("o_orderdate").cast("date"), 2),
                    F.expr("INTERVAL 1 MONTH"),
                )
            ).alias("bill_month"),
        )
    )


@register(
    "fn_format",
    oracle=f"""
SELECT p_partkey,
       printf('%s#%06d', p_brand, p_partkey) AS sku,
       printf('%.2f', p_retailprice) AS price_str,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_code,
       printf('%x', p_partkey) AS key_hex
FROM part WHERE p_partkey % 100 = 0
""",
)
def fn_format(spark, sf_dir):
    """String formatting family: printf-style templates
    (format_string ↔ printf), fixed-decimal rendering, zero-padding,
    hex rendering — the functions that build SKUs, codes, and export
    columns. %-template semantics are the shared C printf spec, so the
    two engines agree byte-for-byte.

    Scale notes: stateless scan-stage expressions; the modulus filter
    is pushed to parquet; whole-stage codegen keeps them JVM-side."""
    p = table(spark, sf_dir, "part")
    return (
        p.where(F.col("p_partkey") % 100 == 0)
        .select(
            "p_partkey",
            F.format_string("%s#%06d", "p_brand", "p_partkey").alias("sku"),
            F.format_string("%.2f", "p_retailprice").alias("price_str"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_code"),
            F.format_string("%x", "p_partkey").alias("key_hex"),
        )
    )
