"""Local twin of the driver's t2 gate: every registered query with an
oracle is compared against DuckDB at sf0.001 (fast; the driver re-runs
the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from terasort_spark.compare import compare_query, duck_connection
from terasort_spark.registry import oracle_sql, queries

_QUERIES = queries()
_ORACLES = oracle_sql()
_NAMES = sorted(n for n in _QUERIES if n in _ORACLES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_match(name, spark, sf_dir, duck):
    res = compare_query(name, _QUERIES[name], _ORACLES[name], spark, sf_dir, duck)
    assert res.ok, str(res)


def test_no_nested_output_types(spark, sf_dir):
    """Registry-wide lint: no declared query may emit array/map/struct
    columns. The driver canonicalizes results through pandas
    (sort_values + factorize), where list-like cells raise
    ``TypeError: unhashable type`` — the r1 agg_collect failure class.
    Arrays must be array_join'd to scalar strings before leaving a query.
    """
    from terasort_spark.compare import nested_output_columns

    bad = {}
    for name, fn in sorted(_QUERIES.items()):
        cols = nested_output_columns(fn(spark, sf_dir).schema)
        if cols:
            bad[name] = cols
    assert not bad, f"declared queries with nested output columns: {bad}"


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still execute and return a stable schema."""
    for name in sorted(set(_QUERIES) - set(_ORACLES)):
        df = _QUERIES[name](spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_engine_facade(spark, sf_dir):
    from terasort_spark import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    assert "agg_group" in eng.names()
    assert eng.query("agg_group").count() > 0
    assert eng.sql("SELECT count(*) AS n FROM region").collect()[0]["n"] == 5
    assert eng.oracle("agg_group") is not None
    report = eng.teravalidate(eng.terasort(n_rows=10_000, n_partitions=4))
    assert report["sorted_between"] and report["sorted_within"]


def test_grading_rotation_fronts_ungraded_queries():
    """The driver grades queries() in dict order with a ~50-entry
    budget, so the rotation must yield hard-CORRECTNESS-row-less
    entries first. The graded set is derived from the committed
    CORRECTNESS_r*.json files (self-advancing); two self-healing rules
    re-front (a) rows whose latest grade FAILED and (b) rows graded
    rows-only before their oracle existed (sink_parquet)."""
    import json

    from terasort_spark import registry

    order = list(registry.queries())
    pos = {n: i for i, n in enumerate(order)}
    with open("CORRECTNESS_r03.json") as f:
        r3 = json.load(f)
    graded_green = [n for n, row in r3.items() if row.get("hash_match")]
    # every hash-green r3 row sits behind every never-graded tpch shape
    worst_shape = max(pos[f"tpch_q{i}_shape"] for i in range(2, 23))
    assert all(pos[n] > worst_shape for n in graded_green), [
        n for n in graded_green if pos[n] <= worst_shape
    ]
    # sink_parquet was graded before its oracle existed -> re-fronted
    assert pos["sink_parquet"] < worst_shape
