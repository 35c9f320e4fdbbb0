"""Fourth-wave relational operators: LATERAL correlated joins and
recursive CTEs — the two query shapes Spark only recently made
first-class (lateralJoin: Spark 4.0 DataFrame API; WITH RECURSIVE:
Spark 4.x SQL). The reference has neither (SURVEY.md §2a — it is a
5-operator sort pipeline), so both are part of the engine's extended
§2b surface with full DuckDB oracles.

Scale notes: a correlated LATERAL top-k decorrelates in Catalyst to a
WindowGroupLimit (partial top-k before the shuffle, final after — NOT
a per-outer-row subquery execution), so the plan is the same one a
hand-written row_number()<=k query gets, with map-side pruning.
Recursive CTEs execute as one join per recursion level; depth is
bounded by the hierarchy's height (log n for the synthetic heap
hierarchy here), and each level shuffles only the frontier.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import o_rnd, rnd
from terasort_spark.registry import register


@register(
    "join_lateral",
    oracle=f"""
SELECT n.n_name, c.c_custkey, {o_rnd("c.c_acctbal", "bal")}
FROM nation n, LATERAL (
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 2
) c
""",
)
def join_lateral(spark, sf_dir):
    """Correlated LATERAL join: top-2 customers by account balance per
    nation, written as a dependent subquery with ORDER BY + LIMIT (the
    shape ORMs and BI tools emit), not a window function.

    Catalyst decorrelates this into WindowGroupLimit over a single
    hashpartitioning(c_nationkey) exchange — per-group top-k with
    partial pruning before the shuffle — so 100 TB of customers never
    executes 25 subqueries; it runs ONE pass. Tie-break on c_custkey
    (D4: LIMIT only over a total order)."""
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    top2 = (
        c.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .limit(2)
        .select("c_custkey", "c_acctbal")
    )
    return n.lateralJoin(top2).select(
        "n_name", "c_custkey", rnd(F.col("c_acctbal"), "bal")
    )


@register(
    "cte_recursive",
    oracle="""
WITH RECURSIVE chain AS (
    SELECT n_nationkey AS nk, n_name AS name,
           CAST(0 AS INTEGER) AS depth, n_name AS path
    FROM nation WHERE n_nationkey = 0
    UNION ALL
    SELECT n.n_nationkey, n.n_name,
           CAST(c.depth + 1 AS INTEGER),
           concat(c.path, '>', n.n_name)
    FROM nation n JOIN chain c
      ON n.n_nationkey > 0 AND (n.n_nationkey - 1) // 2 = c.nk
)
SELECT nk, name, depth, path FROM chain
""",
)
def cte_recursive(spark, sf_dir):
    """Recursive CTE (WITH RECURSIVE, Spark 4 SQL): traverse a synthetic
    binary-heap hierarchy over nation (parent(k) = (k-1) div 2, root 0),
    emitting each node's depth and root path. The iterative-join shape
    behind org charts, BOM explosions, and graph reachability.

    Scale notes: each recursion level is one equi-join of the frontier
    against the (once-scanned, re-used) node table; levels = tree height
    (log n here). Spark executes UnionLoop with the same per-level plan
    an imperative loop would build, but inside one optimized query."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
            SELECT n_nationkey AS nk, n_name AS name,
                   CAST(0 AS INT) AS depth, n_name AS path
            FROM nation WHERE n_nationkey = 0
            UNION ALL
            SELECT n.n_nationkey, n.n_name,
                   CAST(c.depth + 1 AS INT),
                   concat(c.path, '>', n.n_name)
            FROM nation n JOIN chain c
              ON n.n_nationkey > 0 AND (n.n_nationkey - 1) DIV 2 = c.nk
        )
        SELECT nk, name, depth, path FROM chain
        """
    )
