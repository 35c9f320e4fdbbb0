"""Property-based spot checks (SURVEY.md §5b #4): random filter
predicates over orders must return identical row counts from Spark and
DuckDB. Complements the fixed oracle suite with randomized coverage of
the predicate space."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.compare import duck_connection

_STATUSES = ["O", "P", "F"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lo=st.floats(min_value=0, max_value=500000, allow_nan=False),
    width=st.floats(min_value=0, max_value=200000, allow_nan=False),
    status=st.sampled_from(_STATUSES),
    prio=st.sampled_from(_PRIORITIES),
    negate=st.booleans(),
)
def test_random_predicates_match_duckdb(spark, sf_dir, lo, width, status, prio, negate):
    hi = lo + width
    spark_cond = (
        F.col("o_totalprice").between(lo, hi)
        & (F.col("o_orderstatus") == status)
    ) | (F.col("o_orderpriority") == prio)
    if negate:
        spark_cond = ~spark_cond
    n_spark = table(spark, sf_dir, "orders").filter(spark_cond).count()

    sql_cond = (
        f"((o_totalprice BETWEEN {lo!r} AND {hi!r}) "
        f"AND o_orderstatus = '{status}') OR o_orderpriority = '{prio}'"
    )
    if negate:
        sql_cond = f"NOT ({sql_cond})"
    con = duck_connection(sf_dir)
    try:
        n_duck = con.execute(f"SELECT count(*) FROM orders WHERE {sql_cond}").fetchone()[0]
    finally:
        con.close()
    assert n_spark == n_duck

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    bal=st.floats(min_value=-1000, max_value=10000, allow_nan=False),
    seg=st.sampled_from(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    ),
)
def test_random_theta_join_counts_match_duckdb(spark, sf_dir, bal, seg):
    """Randomized theta-join: supplier x customer on same nation AND
    acctbal threshold — row counts must agree with DuckDB."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == seg)
    n_spark = s.join(
        c,
        (s.s_nationkey == c.c_nationkey)
        & (s.s_acctbal > c.c_acctbal)
        & (c.c_acctbal > bal),
    ).count()
    con = duck_connection(sf_dir)
    try:
        n_duck = con.execute(
            f"""SELECT count(*) FROM supplier JOIN customer
                ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
                AND c_acctbal > {bal!r}
                WHERE c_mktsegment = '{seg}'"""
        ).fetchone()[0]
    finally:
        con.close()
    assert n_spark == n_duck
