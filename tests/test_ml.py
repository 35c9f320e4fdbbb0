"""ml_logreg (terasort_spark/operators/ml.py): rows-only iterative
training, so semantics are pinned by an exact numpy replay of the
standardize + quantized-GD recipe plus learnability and determinism
checks."""

from __future__ import annotations

import math

from terasort_spark.operators.ml import FEATS, LR, N_ITER, Q
from terasort_spark.registry import queries

_Q = queries()


def _numpy_replay(spark, sf_dir):
    import numpy as np

    from terasort_spark.operators.ml import standardized_features

    X_df, n = standardized_features(spark, sf_dir)
    rows = X_df.collect()
    X = np.array([[r[c] for c in FEATS] for r in rows], dtype=np.float64)
    y = np.array([r["y"] for r in rows], dtype=np.float64)
    w = np.zeros(len(FEATS))
    for _ in range(N_ITER):
        err = 1.0 / (1.0 + np.exp(-(X @ w))) - y
        # the exact quantized-sum the distributed aggregation performs
        g = np.array(
            [
                int(np.sum(np.floor(X[:, j] * err * Q + 0.5).astype(np.int64)))
                for j in range(len(FEATS))
            ],
            dtype=np.float64,
        )
        w = w - LR * (g / Q) / n
    acc = float(np.mean(((X @ w) > 0).astype(np.float64) == y))
    return w, acc


def test_logreg_matches_numpy_replay_exactly(spark, sf_dir):
    got = {r["name"]: r["value"] for r in _Q["ml_logreg"](spark, sf_dir).collect()}
    w, acc = _numpy_replay(spark, sf_dir)
    for j, c in enumerate(FEATS):
        assert got[f"w_{c}"] == round(w[j], 6), (c, got[f"w_{c}"], w[j])
    assert got["train_accuracy"] == round(acc, 6)


def test_logreg_learns_separable_target(spark, sf_dir):
    """The long-doc label is determined by n_chars, which is (scaled) a
    feature — 10 conditioned GD steps must leave chance far behind."""
    got = {r["name"]: r["value"] for r in _Q["ml_logreg"](spark, sf_dir).collect()}
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    pos = d.filter(F.col("n_chars") > 300).count() / d.count()
    majority = max(pos, 1 - pos)
    assert got["train_accuracy"] >= min(0.95, majority + 0.05)
    assert not math.isnan(got["w_x1"]) and got["w_x1"] > 0.0  # chars feature


def test_logreg_deterministic_across_partitionings(spark, sf_dir):
    """Quantized int64 gradient sums: same weights at any parallelism."""
    a = sorted(map(tuple, _Q["ml_logreg"](spark, sf_dir).collect()))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(map(tuple, _Q["ml_logreg"](spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
