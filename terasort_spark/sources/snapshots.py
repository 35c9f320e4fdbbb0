"""Versioned-table emulation (delta-style snapshots / time travel).

A table is a log of versioned parquet segments under one root:

    root/v=0/...   full base load
    root/v=1/...   upserts (+ tombstones) relative to earlier versions
    root/v=2/...   ...

Each segment holds the rows CHANGED at that version: new or updated rows
by key, plus tombstones (``_deleted = true``) for removed keys. A
snapshot read at version ``n`` is then:

    scan v <= n  (hive partition pruning — later segments never listed)
      → per key keep the row from the highest version (window row_number)
      → drop tombstones

This is the MERGE/time-travel core of a transactional lake format,
re-expressed in plain Spark primitives: the version column is a hive
partition (pruning is directory-level), the last-writer-wins resolve is
one row_number window keyed by the table key — a single shuffle of only
the versions you read. No transaction-log protocol is emulated (commits
here are directory renames, atomic enough for a test corpus; a real lake
format's log solves concurrent writers, which is out of scope).

At 100 TB: segments after the base are small (the delta), so the
snapshot scan cost is dominated by v=0; periodic compaction (rewrite
``read_snapshot`` output as a new base) bounds the window shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DELETED = "_deleted"
VERSION = "_v"


def write_version(df: DataFrame, root: str, version: int) -> None:
    """Append one versioned segment. ``df`` holds upserted rows; rows
    with ``_deleted = true`` are tombstones (non-key columns ignored)."""
    if DELETED not in df.columns:
        df = df.withColumn(DELETED, F.lit(False))
    df.write.mode("errorifexists").parquet(os.path.join(root, f"{VERSION}={version}"))


def delete_keys(spark: SparkSession, keys_df: DataFrame, root: str, version: int) -> None:
    """Write a tombstone-only segment for the given key rows."""
    write_version(keys_df.withColumn(DELETED, F.lit(True)), root, version)


def read_snapshot(
    spark: SparkSession, root: str, key: list[str], version: int | None = None
) -> DataFrame:
    """State of the table as of ``version`` (default: latest).

    The ``_v <= version`` filter lands on the hive partition column, so
    pruning happens at file-listing time; resolution is one window per
    key ordered by version descending.
    """
    df = spark.read.option("basePath", root).parquet(root)
    if version is not None:
        df = df.filter(F.col(VERSION) <= version)
    w = Window.partitionBy(*key).orderBy(F.desc(VERSION))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (~F.col(DELETED)))
        .drop("__rn", DELETED, VERSION)
    )


def versions(spark: SparkSession, root: str) -> list[int]:
    """Committed versions, from the directory listing alone."""
    out = []
    for name in os.listdir(root):
        if name.startswith(f"{VERSION}="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def compact(spark: SparkSession, root: str, key: list[str], new_root: str) -> None:
    """Rewrite the current snapshot as a fresh base (version 0) — bounds
    the per-read window cost after many delta segments."""
    write_version(read_snapshot(spark, root, key), new_root, 0)
