"""Invariant tests for operators/integrity.py — most importantly that
the referential audit actually DETECTS orphans (the production corpus
is clean, so the declared query's zeros alone can't prove the anti-join
works)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from terasort_spark.operators.integrity import N_FEATURES, fk_orphans
from terasort_spark.registry import queries

_Q = queries()


def test_fk_orphans_detects_injected_rot(spark):
    child = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 2, 3, 7, None, 9]}).astype({"k": "Int64"})
    )
    parent = spark.createDataFrame(
        pd.DataFrame({"pk": [1, 2, 3, 4]}).astype({"pk": "Int64"})
    )
    row = fk_orphans(child, "k", parent, "pk").collect()[0]
    # orphans: 7, NULL, 9 -> 3 of 7
    assert (row["n_child"], row["n_orphan"]) == (7, 3)
    # clean parentage -> zero orphans, same child count
    ok = fk_orphans(child.filter(F.col("k").isNotNull() & (F.col("k") <= 3)),
                    "k", parent, "pk").collect()[0]
    assert (ok["n_child"], ok["n_orphan"]) == (4, 0)


def test_dq_referential_is_clean_on_synthetic_corpus(spark, sf_dir):
    rows = {r["relationship"]: r for r in _Q["dq_referential"](spark, sf_dir).collect()}
    assert len(rows) == 6
    assert all(r["n_orphan"] == 0 for r in rows.values())
    # child counts really are the table counts (the audit saw all rows)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert rows["lineitem.l_orderkey->orders"]["n_child"] == li


def test_ts_seasonal_indices_average_to_one(spark, sf_dir):
    out = _Q["ts_seasonal"](spark, sf_dir).collect()
    assert {r["dow"] for r in out} <= set(range(7))
    # day-weighted mean of the seasonal index is 1 by construction
    n = sum(r["n_days"] for r in out)
    mean_idx = sum(r["seasonal_index"] * r["n_days"] for r in out) / n
    assert abs(mean_idx - 1.0) < 1e-3
    assert all(r["seasonal_index"] > 0 for r in out)


def test_ml_feature_hash_conserves_token_mass(spark, sf_dir):
    out = _Q["ml_feature_hash"](spark, sf_dir)
    rows = out.collect()
    assert all(0 <= r["feature"] < N_FEATURES for r in rows)
    assert all(r["n_distinct"] <= r["n_tokens"] for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    total_tokens = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .filter(F.length("t") > 0)
        .count()
    )
    assert sum(r["n_tokens"] for r in rows) == total_tokens


def test_source_mergeschema_null_pattern(spark, sf_dir):
    out = _Q["source_mergeschema"](spark, sf_dir)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert out.count() == n_orders
    bad = out.filter(
        ((F.col("o_orderkey") % 2 == 0) & F.col("o_totalprice").isNull())
        | ((F.col("o_orderkey") % 2 == 1) & F.col("o_totalprice").isNotNull())
        | ((F.col("o_orderkey") % 2 == 1) & F.col("o_orderstatus").isNull())
        | ((F.col("o_orderkey") % 2 == 0) & F.col("o_orderstatus").isNotNull())
    ).count()
    assert bad == 0
