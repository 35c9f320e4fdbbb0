"""Table catalog: the ten driver-provided parquet tables (FIXTURES.md).

All loads go through here so scan behavior (schema pinning, future
partitioned layouts for the 100 TB path) is centralized. Schemas come
from the parquet footers — explicit and stable, no inference pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Parquet scan → columnar vectorized read; Catalyst
    handles column pruning + predicate pushdown from whatever the caller
    stacks on top."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Every query path passes through here: make sure the session is
    # configured (UTC) and the package is importable on Python workers
    # even when the caller skipped entry()/configure().
    from terasort_spark.session import configure

    configure(spark)
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects. Read nanos as long and convert to microsecond
        # timestamps (integer div — exact), matching DuckDB's nanos→micros
        # truncation of the same column.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so SQL-form operators
    (GROUPING SETS, etc.) can run against the same inputs."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
