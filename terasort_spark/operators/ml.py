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


def _logreg_oracle() -> str:
    """Unrolled exact-SQL replay of the 10-iteration training loop
    (the ts_holt_forecast pattern): every per-row gradient contribution
    is 6dp-quantized to int64 BEFORE summation in BOTH engines, so the
    whole trajectory is a chain of exact-integer aggregates plus fixed
    IEEE double expressions — one CTE pair (gradient, weight update)
    per iteration, no expression blow-up. The only cross-engine risk is
    a 1-ulp exp() difference landing exactly on a floor boundary
    (probability ~1e-10 per row-term; absorbed by the quantization)."""
    toks = "list_filter(string_split(lower(text), ' '), t -> length(t) > 0)"
    parts = [
        f"""raw AS (
    SELECT CAST(n_chars AS DOUBLE) / 1000.0 AS r1,
           CAST(len({toks}) AS DOUBLE) / 100.0 AS r2,
           CAST(len(list_filter({toks}, t -> t = 'the')) AS DOUBLE)
               / len({toks}) AS r3,
           CASE WHEN n_chars > 300 THEN 1.0 ELSE 0.0 END AS y
    FROM documents WHERE text IS NOT NULL AND length(text) > 0
)"""
    ]
    moment_cols = ["CAST(count(*) AS DOUBLE) AS n"]
    for c in RAW:
        moment_cols.append(
            f"CAST(sum(CAST({c} AS DECIMAL(25,6))) AS DOUBLE) AS s_{c}"
        )
        moment_cols.append(
            f"CAST(sum(CAST({c} * {c} AS DECIMAL(25,6))) AS DOUBLE) AS ss_{c}"
        )
    parts.append(
        "moments AS MATERIALIZED (\n    SELECT " + ",\n           ".join(moment_cols) + "\n    FROM raw\n)"
    )
    x_cols = ["1.0 AS x0"]
    for j, c in enumerate(RAW, start=1):
        mu = f"s_{c} / n"
        sd = f"sqrt(greatest(ss_{c} / n - ({mu}) * ({mu}), 1e-12))"
        x_cols.append(f"({c} - {mu}) / {sd} AS x{j}")
    parts.append(
        "X AS MATERIALIZED (\n    SELECT "
        + ",\n           ".join(x_cols)
        + ",\n           y\n    FROM raw, moments\n)"
    )
    parts.append(
        "w0 AS (SELECT "
        + ", ".join(f"0.0 AS w{j}" for j in range(len(FEATS)))
        + ")"
    )
    margin = " + ".join(f"w{j} * x{j}" for j in range(len(FEATS)))
    err = f"1.0 / (1.0 + exp(-({margin}))) - y"
    for t in range(1, N_ITER + 1):
        g_cols = ", ".join(
            f"CAST(sum(CAST(floor(x{j} * ({err}) * {Q} + 0.5) AS BIGINT)) AS BIGINT) AS g{j}"
            for j in range(len(FEATS))
        )
        parts.append(f"g{t} AS MATERIALIZED (SELECT {g_cols} FROM X, w{t - 1})")
        w_cols = ", ".join(
            f"w{j} - {LR} * (g{j} / {Q}.0) / n AS w{j}"
            for j in range(len(FEATS))
        )
        parts.append(f"w{t} AS MATERIALIZED (SELECT {w_cols} FROM w{t - 1}, g{t}, moments)")
    sign = f"CASE WHEN ({margin}) > 0.0 THEN 1.0 ELSE 0.0 END"
    parts.append(
        f"""acc AS (
    SELECT CAST(sum(CASE WHEN ({sign}) = y THEN 1 ELSE 0 END) AS DOUBLE) / max(n) AS a
    FROM X, w{N_ITER}, moments
)"""
    )
    finals = [
        f"SELECT 'w_x{j}' AS name, floor(w{j} * {Q} + 0.5) / {Q} AS value FROM w{N_ITER}"
        for j in range(len(FEATS))
    ]
    finals.append(
        f"SELECT 'train_accuracy' AS name, floor(a * {Q} + 0.5) / {Q} AS value FROM acc"
    )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(finals)


@register("ml_logreg", oracle=_logreg_oracle())
def ml_logreg(spark, sf_dir):
    """Batch-GD logistic regression. Each iteration: broadcast the
    4-weight model as literals, one aggregation computes the gradient
    (per-row contributions x_j*(sigmoid(w.x) - y) quantized to 6dp
    int64, summed exactly), driver updates w. 10 fixed iterations over
    standardized features (known stage count), base matrix
    localCheckpoint'ed ONCE. Output: the learned weights plus training
    accuracy — EXACT-oracle since r6: the 6dp int64 gradient
    quantization makes the whole trajectory a chain of exact-integer
    aggregates, so the 10 iterations unroll into SQL CTEs
    (_logreg_oracle) the same way ts_holt_forecast's recursion does;
    also numpy-replay-pinned in tests/test_ml.py."""
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
    q6 = lambda v: math.floor(v * Q + 0.5) / Q  # noqa: E731 — half-up, both engines
    rows = [(f"w_{c}", q6(w[j])) for j, c in enumerate(FEATS)]
    rows.append(("train_accuracy", q6(acc)))
    return spark.createDataFrame(rows, "name string, value double")
