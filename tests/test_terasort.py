"""TeraValidate-style invariant tests for the terasort module
(SURVEY.md §5b #4): order within partitions, order between partitions,
count and content preserved — invariants, not golden files."""

from __future__ import annotations

from terasort_spark.sources.teragen import (
    KEY_LEN,
    VALUE_LEN,
    checksum,
    teragen,
    terasort,
    teravalidate,
)

N = 200_000
PARTS = 16


def test_teragen_shape_and_determinism(spark):
    df = teragen(spark, 1000, n_partitions=4)
    rows = df.collect()
    assert len(rows) == 1000
    assert all(len(r["key"]) == KEY_LEN for r in rows)
    assert all(len(r["value"]) == VALUE_LEN for r in rows)
    assert all(all(0x20 <= b <= 0x7E for b in r["key"]) for r in rows)
    # regenerating with a different partitioning yields identical content
    again = sorted(bytes(r["key"]) for r in teragen(spark, 1000, n_partitions=7).collect())
    assert sorted(bytes(r["key"]) for r in rows) == again


def test_terasort_total_order_and_content(spark):
    gen = teragen(spark, N, n_partitions=PARTS)
    in_checksum = checksum(gen)
    out = terasort(gen, n_partitions=PARTS)
    report = teravalidate(out)
    assert report["n_rows"] == N
    assert report["sorted_within"], report
    assert report["sorted_between"], report
    assert checksum(out) == in_checksum  # permutation, nothing lost/changed


def test_terasort_plan_uses_range_exchange(spark):
    out = terasort(teragen(spark, 1000, n_partitions=4), n_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan

def test_teragen_datasource_plugin(spark):
    """The custom Python DataSource (connector-plugin surface): reader
    plans its own id-range partitions, generates deterministically on
    executors, and feeds the standard terasort pipeline unchanged."""
    from pyspark.sql import functions as F

    from terasort_spark.sources.teragen_ds import TeraGenDataSource, _record

    spark.dataSource.register(TeraGenDataSource)
    df = (
        spark.read.format("teragen")
        .option("rows", 20_000)
        .option("partitions", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 20_000

    # deterministic at a DIFFERENT partition count: same multiset
    df2 = (
        spark.read.format("teragen")
        .option("rows", 20_000)
        .option("partitions", 3)
        .load()
    )
    assert checksum(df) == checksum(df2)

    # row shape matches the GraySort contract and the local generator
    row = df.filter(F.col("value") == "0".zfill(32).ljust(90, "X").encode()).first()
    assert row is not None and bytes(row.key) == _record(0, 42)[0]

    # the sort pipeline is source-agnostic
    v = teravalidate(terasort(df, n_partitions=5))
    assert v["n_rows"] == 20_000
    assert v["sorted_within"] and v["sorted_between"]
