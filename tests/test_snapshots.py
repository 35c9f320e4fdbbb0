"""Versioned-table (snapshot/time-travel) semantics: upserts, deletes,
time travel to every version, and partition pruning of unread segments
(terasort_spark/sources/snapshots.py)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.sources import snapshots as snap


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="ts_snap_")
    shutil.rmtree(d, ignore_errors=True)  # write_version creates it
    yield d
    shutil.rmtree(d, ignore_errors=True)


KEY = ["o_orderkey"]


def _base(spark, sf_dir):
    return table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def test_snapshot_upsert_delete_time_travel(spark, sf_dir, root):
    base = _base(spark, sf_dir)
    n0 = base.count()
    snap.write_version(base, root, 0)

    # v1: reprice 50 orders (update) and add two synthetic ones (insert)
    upd = (
        base.orderBy("o_orderkey")
        .limit(50)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    ins = spark.createDataFrame(
        [(10_000_001, "N", 1.0), (10_000_002, "N", 2.0)], upd.schema
    )
    snap.write_version(upd.unionByName(ins), root, 1)

    # v2: delete 10 of the repriced orders
    doomed = upd.orderBy("o_orderkey").limit(10).select("o_orderkey")
    snap.delete_keys(
        spark,
        doomed.withColumn("o_orderstatus", F.lit(None).cast("string"))
        .withColumn("o_totalprice", F.lit(None).cast("double")),
        root,
        2,
    )

    assert snap.versions(spark, root) == [0, 1, 2]

    # time travel: v0 is the untouched base
    v0 = snap.read_snapshot(spark, root, KEY, 0)
    assert v0.count() == n0
    assert v0.agg(F.sum("o_totalprice")).first()[0] == pytest.approx(
        base.agg(F.sum("o_totalprice")).first()[0]
    )

    # v1: updates visible (doubled prices on the 50), inserts present
    v1 = snap.read_snapshot(spark, root, KEY, 1)
    assert v1.count() == n0 + 2
    repriced = v1.join(upd.select("o_orderkey"), "o_orderkey").orderBy("o_orderkey")
    orig = base.join(upd.select("o_orderkey"), "o_orderkey").orderBy("o_orderkey")
    got = [r.o_totalprice for r in repriced.collect()]
    want = [2 * r.o_totalprice for r in orig.collect()]
    assert got == pytest.approx(want)

    # v2 (latest, version=None): the 10 tombstoned keys are gone
    v2 = snap.read_snapshot(spark, root, KEY)
    assert v2.count() == n0 + 2 - 10
    assert v2.join(doomed, "o_orderkey").count() == 0


def test_snapshot_read_prunes_unread_versions(spark, sf_dir, root):
    base = _base(spark, sf_dir)
    snap.write_version(base, root, 0)
    snap.write_version(base.limit(5), root, 1)
    snap.write_version(base.limit(5), root, 2)

    df = snap.read_snapshot(spark, root, KEY, version=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    start = plan.index("PartitionFilters")
    segment = plan[start : plan.index("]", start) + 1]
    assert "_v" in segment, segment  # version predicate prunes at listing


def test_snapshot_compaction_preserves_state(spark, sf_dir, root):
    base = _base(spark, sf_dir)
    snap.write_version(base, root, 0)
    snap.write_version(
        base.limit(20).withColumn("o_totalprice", F.lit(0.0)), root, 1
    )
    new_root = root + "_compacted"
    try:
        snap.compact(spark, root, KEY, new_root)
        before = snap.read_snapshot(spark, root, KEY)
        after = snap.read_snapshot(spark, new_root, KEY)
        assert sorted(map(tuple, before.collect())) == sorted(
            map(tuple, after.collect())
        )
        assert snap.versions(spark, new_root) == [0]
    finally:
        shutil.rmtree(new_root, ignore_errors=True)


def test_schema_evolution_merge_schema(spark, sf_dir, root):
    """Schema evolution across segments: later files may add columns.
    mergeSchema=true unions the schemas (old rows read NULL for new
    columns) — the lake-format behavior that lets a 100 TB table gain a
    column without rewriting history."""
    import os

    old = _base(spark, sf_dir).limit(10)
    new = (
        _base(spark, sf_dir)
        .limit(5)
        .withColumn("o_channel", F.lit("web"))
        .withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000)
    )
    old.write.parquet(os.path.join(root, "seg=0"))
    new.write.parquet(os.path.join(root, "seg=1"))

    df = spark.read.option("mergeSchema", "true").parquet(root)
    assert "o_channel" in df.columns
    assert df.count() == 15
    assert df.filter(F.col("o_channel").isNull()).count() == 10  # old rows
    assert df.filter(F.col("o_channel") == "web").count() == 5


def test_changefeed_ops_partition_and_classify_correctly(spark, sf_dir):
    """scan_changefeed invariants the oracle can't see: the feed reads
    ONLY the v=1 segment plus the v0 snapshot (partition filter visible
    in the scan), every op's key set matches a direct recomputation,
    and old/new values are populated per op semantics."""
    from terasort_spark.registry import queries

    feed = queries()["scan_changefeed"](spark, sf_dir)
    rows = feed.collect()
    by_op = {}
    for r in rows:
        by_op.setdefault(r["op"], set()).add(r["o_orderkey"])
    keys = {
        r[0]
        for r in table(spark, sf_dir, "orders").select("o_orderkey").collect()
    }
    expect_update = {k for k in keys if k % 10 == 0 and k % 4 != 3}
    expect_insert = {k for k in keys if k % 10 == 0 and k % 4 == 3}
    expect_delete = {
        k for k in keys if k % 17 == 0 and k % 10 != 0 and k % 4 != 3
    }
    assert by_op.get("update", set()) == expect_update
    assert by_op.get("insert", set()) == expect_insert
    assert by_op.get("delete", set()) == expect_delete
    for r in rows:
        if r["op"] == "insert":
            assert r["old_price"] is None and r["new_price"] is not None
        elif r["op"] == "update":
            assert r["old_price"] is not None and r["new_price"] is not None
        else:
            assert r["new_price"] is None and r["old_price"] is not None
