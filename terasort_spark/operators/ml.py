"""Distributed model training beyond closed-form: logistic regression
by batch gradient descent (`ml_logreg`) — the quality-classifier shape
(fastText-style linear scorer) every corpus-curation pipeline trains to
filter documents.

Same data/model split as emb_kmeans and text_bpe_train: the corpus
contributes ONE aggregation per iteration (the gradient — a handful of
sums with map-side combine), the model (a dims-sized weight vector)
lives driver-side and is broadcast back as codegen literals. A
standardization pass (feature means/stds from exact DECIMAL sums)
conditions the problem so 10 fixed iterations converge. Per-row
gradient contributions are quantized to 6dp int64 BEFORE the sum, so
the training trajectory is bit-identical at any partition count — the
determinism contract every iterative operator here follows
(tests/test_ml.py replays the identical recipe in numpy and must match
weights exactly).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.registry import register

LR = 2.0
N_ITER = 10
Q = 1_000_000  # 6dp gradient quantization

RAW = ("r1", "r2", "r3")
FEATS = ("x0", "x1", "x2", "x3")


def _raw_features(spark, sf_dir):
    """Codegen feature row per doc: chars (thousands), word count
    (hundreds), definite-article rate. Label: long-document flag."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: F.length(t) > 0)
    n_words = F.size(toks)
    the_rate = F.size(F.filter(toks, lambda t: t == F.lit("the"))) / n_words
    return d.select(
        (F.col("n_chars") / 1000.0).alias("r1"),
        (n_words / 100.0).alias("r2"),
        the_rate.alias("r3"),
        (F.col("n_chars") > 300).cast("double").alias("y"),
    )


def standardized_features(spark, sf_dir):
    """Standardize each raw feature to zero mean / unit variance. The
    moments come from ONE aggregation through exact DECIMAL sums (the
    ml_linreg sufficient-statistics pattern), so mu/sd are identical
    doubles at any partitioning; the standardization itself is codegen
    with mu/sd as broadcast literals. Returns (df, n)."""
    raw = _raw_features(spark, sf_dir)
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in RAW:
        aggs.append(
            F.sum(F.col(c).cast("decimal(25,6)")).cast("double").alias(f"s_{c}")
        )
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast("decimal(25,6)"))
            .cast("double")
            .alias(f"ss_{c}")
        )
    m = raw.agg(*aggs).first()
    n = m["n"]
    if not n:  # empty corpus → no model, not a crash
        empty = spark.createDataFrame(
            [], "x0 double, x1 double, x2 double, x3 double, y double"
        )
        return empty, 0
    mu = {c: m[f"s_{c}"] / n for c in RAW}
    sd = {
        c: math.sqrt(max(m[f"ss_{c}"] / n - mu[c] * mu[c], 1e-12))
        for c in RAW
    }
    X = raw.select(
        F.lit(1.0).alias("x0"),
        *[
            ((F.col(c) - F.lit(mu[c])) / F.lit(sd[c])).alias(f"x{j}")
            for j, c in enumerate(RAW, start=1)
        ],
        "y",
    )
    return X.localCheckpoint(eager=True), int(n)  # reused every iteration


def _margin(w):
    m = F.lit(float(w[0])) * F.col("x0")
    for j in range(1, len(FEATS)):
        m = m + F.lit(float(w[j])) * F.col(FEATS[j])
    return m


@register("ml_logreg")
def ml_logreg(spark, sf_dir):
    """Batch-GD logistic regression. Each iteration: broadcast the
    4-weight model as literals, one aggregation computes the gradient
    (per-row contributions x_j*(sigmoid(w.x) - y) quantized to 6dp
    int64, summed exactly), driver updates w. 10 fixed iterations over
    standardized features (known stage count), base matrix
    localCheckpoint'ed ONCE. Output: the learned weights plus training
    accuracy — rows-only by declared design (iterative);
    numpy-replay-pinned in tests/test_ml.py."""
    X, n = standardized_features(spark, sf_dir)
    if n == 0:
        return spark.createDataFrame([], "name string, value double")
    w = [0.0] * len(FEATS)
    for _ in range(N_ITER):
        err = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w))) - F.col("y")
        row = X.agg(
            *[
                F.sum(
                    F.floor(F.col(c) * err * Q + 0.5).cast("bigint")
                ).alias(c)
                for c in FEATS
            ]
        ).first()
        w = [w[j] - LR * (row[c] / Q) / n for j, c in enumerate(FEATS)]
    acc_expr = F.sum(
        ((_margin(w) > 0).cast("double") == F.col("y")).cast("bigint")
    )
    acc = X.agg(acc_expr.alias("k")).first()["k"] / n
    rows = [(f"w_{c}", round(w[j], 6)) for j, c in enumerate(FEATS)]
    rows.append(("train_accuracy", round(acc, 6)))
    return spark.createDataFrame(rows, "name string, value double")
