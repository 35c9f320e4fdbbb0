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
    CORRECTNESS_r*.json files (self-advancing), so this test derives
    the expected partition from the same ``_graded_names()`` source
    instead of naming specific queries — future driver rounds advance
    the rotation without re-breaking this invariant."""
    from terasort_spark import registry

    order = list(registry.queries())
    pos = {n: i for i, n in enumerate(order)}
    # _REGRADE pins queries whose OUTPUT changed this round: they hold a
    # (now-stale) green row yet must re-front, so the rotation treats
    # them as ungraded — mirror that here (r10).
    graded = registry._graded_names() - set(registry._REGRADE)
    ungraded = [n for n in order if n not in graded]
    graded_in_order = [n for n in order if n in graded]
    # Self-check: both sides of the partition are non-trivial.
    assert ungraded or graded_in_order
    if ungraded and graded_in_order:
        worst_ungraded = max(pos[n] for n in ungraded)
        best_graded = min(pos[n] for n in graded_in_order)
        assert worst_ungraded < best_graded, (
            f"graded query '{min(graded_in_order, key=pos.get)}' precedes "
            f"ungraded '{max(ungraded, key=pos.get)}'"
        )
    # Self-healing rule: a query whose latest committed row is
    # rows-only (err == no_oracle) but that NOW has a registered
    # oracle must be UNGRADED (re-fronted to earn a hash row), i.e.
    # sort before every graded name in the rotation.
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(registry.__file__)))
    latest = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        data = json.load(open(path))
        for name, row in data.items():
            if isinstance(row, dict):
                latest[name] = row
    oracles = registry.oracle_sql()
    refront = [
        n
        for n, row in latest.items()
        if row.get("err") == "no_oracle" and n in oracles and n in pos
    ]
    for name in refront:
        assert name not in graded, (
            f"{name}: rows-only row but oracle now registered — must re-front"
        )
        if graded_in_order:
            assert pos[name] < min(pos[g] for g in graded_in_order), (
                f"{name} must sort before all graded names"
            )
    # And a query whose latest row FAILED re-fronts for regrade.
    for name, row in latest.items():
        if name in pos and not row.get("hash_match") and row.get("err") != "no_oracle":
            assert name not in graded, f"{name}: failed row must re-front"


def test_engine_explain_returns_plan_text(spark, sf_dir):
    from terasort_spark import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    plan = eng.explain("agg_group")
    assert "HashAggregate" in plan and "Scan parquet" in plan
    assert "Scan parquet" in eng.explain("scan_project", mode="simple")
