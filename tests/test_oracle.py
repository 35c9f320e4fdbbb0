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
    budget; since r12 the rotation is TIERED (registry._graded_last):
    tier 0 = urgent regrades (latest row FAILED, output changed this
    round, or graded rows-only before its oracle existed), tier 1 =
    stale green rows (graded before _FRESH_CUT) oldest-first, tier 2 =
    never-graded new declarations, tier 3 = remaining green rows
    stalest-first. This test derives the expected tiers from the same
    committed CORRECTNESS_r*.json files the rotation reads, so future
    driver rounds advance it without re-breaking the invariant."""
    from terasort_spark import registry

    order = list(registry.queries())
    pos = {n: i for i, n in enumerate(order)}
    rounds = registry._graded_rounds()
    ever = registry._ever_graded()
    graded = set(rounds) - set(registry._REGRADE)

    def tier(n):
        if n in ever and n not in graded:
            return 0
        if n in graded and rounds[n] < registry._FRESH_CUT:
            return 1
        if n not in ever:
            return 2
        return 3

    tiers = [tier(n) for n in order]
    assert tiers == sorted(tiers), [
        (n, t) for n, t in zip(order, tiers)
    ][:20]
    # within tiers 1 and 3, stalest evidence first
    for want in (1, 3):
        rs = [rounds[n] for n, t in zip(order, tiers) if t == want]
        assert rs == sorted(rs)
    # Self-healing rules: a rows-only row whose oracle now exists, and
    # a FAILED latest row, must both be tier 0 (before everything).
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(registry.__file__)))
    latest = {}
    paths = []
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            paths.append((int(m.group(1)), path))
    for _, path in sorted(paths):
        data = json.load(open(path))
        for name, row in data.items():
            if isinstance(row, dict):
                latest[name] = row
    oracles = registry.oracle_sql()
    for name, row in latest.items():
        if name not in pos:
            continue
        if row.get("err") == "no_oracle" and name in oracles:
            assert tier(name) == 0, (
                f"{name}: rows-only row but oracle now registered"
            )
        if not row.get("hash_match") and row.get("err") != "no_oracle":
            assert tier(name) == 0, f"{name}: failed row must re-front"


def test_engine_explain_returns_plan_text(spark, sf_dir):
    from terasort_spark import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    plan = eng.explain("agg_group")
    assert "HashAggregate" in plan and "Scan parquet" in plan
    assert "Scan parquet" in eng.explain("scan_project", mode="simple")
