"""Projection / filter / predicate operators (SURVEY.md §2b).

Row-level outputs always carry the table's unique key columns so the
order-insensitive hash compare is total (determinism rule D3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import o_rnd, rnd
from terasort_spark.registry import register


@register(
    "project_arith",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       {o_rnd("l_extendedprice * (1 - l_discount)", "revenue")},
       {o_rnd("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "charge")},
       {o_rnd("l_quantity * 2.5 + 1", "scaled_qty")}
FROM lineitem
WHERE l_orderkey < 1000
""",
)
def project_arith(spark, sf_dir):
    # Pure arithmetic on doubles: IEEE ops are bit-identical across
    # engines, so the floor-round of the same expression always matches.
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(revenue, "revenue"),
        rnd(revenue * (1 + F.col("l_tax")), "charge"),
        rnd(F.col("l_quantity") * 2.5 + 1, "scaled_qty"),
    )


@register(
    "filter_compound",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'O' AND NOT (o_orderpriority LIKE '%LOW%'))
   OR (o_totalprice BETWEEN 350000 AND 400000
       AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
""",
)
def filter_compound(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    cond = (
        (F.col("o_orderstatus") == "O") & ~F.col("o_orderpriority").like("%LOW%")
    ) | (
        F.col("o_totalprice").between(350000, 400000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return o.filter(cond).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@register(
    "project_case",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            WHEN o_totalprice < 350000 THEN 'large'
            ELSE 'jumbo' END AS size_bucket,
       CASE o_orderstatus WHEN 'O' THEN 'open'
                          WHEN 'F' THEN 'finished'
                          ELSE 'other' END AS status_name
FROM orders
""",
)
def project_case(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(p < 50000, "small")
        .when(p < 200000, "medium")
        .when(p < 350000, "large")
        .otherwise("jumbo")
        .alias("size_bucket"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("other")
        .alias("status_name"),
    )


@register(
    "filter_null3vl",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       {o_rnd("coalesce(nullif(l_discount, 0.0), -1.0)", "disc_or_flag")},
       (nullif(l_discount, 0.0) IS NULL) AS was_zero
FROM lineitem
WHERE nullif(l_discount, 0.0) IS NULL OR nullif(l_discount, 0.0) > 0.08
""",
)
def filter_null3vl(spark, sf_dir):
    # Corpus has no NULLs — manufacture them with nullif, then exercise
    # three-valued logic: rows where the predicate is NULL must NOT pass
    # a plain filter, so the IS NULL arm makes the intent explicit.
    li = table(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.filter(d.isNull() | (d > 0.08)).select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.coalesce(d, F.lit(-1.0)), "disc_or_flag"),
        d.isNull().alias("was_zero"),
    )


@register(
    "filter_in_subquery",
    oracle="""
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
""",
)
def filter_in_subquery(spark, sf_dir):
    # IN (subquery) expressed as a left-semi join — the decorrelated plan
    # Catalyst would produce anyway; broadcast-able since the subquery
    # side is a filtered dim.
    o = table(spark, sf_dir, "orders")
    rich = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return o.join(
        rich, o.o_custkey == rich.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey")
