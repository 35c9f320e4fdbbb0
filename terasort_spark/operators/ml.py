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

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import rnd
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


NB_SALT_PRIOR = 1  # Laplace +1 smoothing


@register(
    "ml_naivebayes",
    oracle="""
WITH tok AS (
    SELECT doc_id, lang, t AS term FROM (
        SELECT doc_id, lang,
               unnest(string_split(lower(text), ' ')) AS t
        FROM documents WHERE text IS NOT NULL AND length(text) > 0
    ) WHERE length(t) > 0
),
doc_tf AS (
    SELECT doc_id, term, count(*) AS c_dt FROM tok GROUP BY doc_id, term
),
model AS (
    SELECT lang, term, count(*) AS c FROM tok GROUP BY lang, term
),
vocab AS (SELECT count(DISTINCT term) AS v FROM tok),
totals AS (SELECT lang, count(*) AS n_tok FROM tok GROUP BY lang),
priors AS (
    SELECT lang, count(DISTINCT doc_id) AS n_docs,
           sum(count(DISTINCT doc_id)) OVER () AS total_docs
    FROM tok GROUP BY lang
),
scored AS (
    SELECT d.doc_id, t.lang AS cand,
           sum(d.c_dt * CAST(floor(ln((coalesce(m.c, 0) + 1.0)
                                      / (t.n_tok + vocab.v))
                                   * 1000000 + 0.5) AS BIGINT)) AS ll
    FROM doc_tf d
    CROSS JOIN totals t
    CROSS JOIN vocab
    LEFT JOIN model m ON m.lang = t.lang AND m.term = d.term
    GROUP BY d.doc_id, t.lang, t.n_tok, vocab.v
),
with_prior AS (
    SELECT s.doc_id, s.cand,
           s.ll + CAST(floor(ln(CAST(p.n_docs AS DOUBLE) / p.total_docs)
                             * 1000000 + 0.5) AS BIGINT) AS score
    FROM scored s JOIN priors p ON p.lang = s.cand
),
pred AS (
    SELECT doc_id, cand AS pred_lang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, cand) AS rk
    FROM with_prior
)
SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
FROM pred p JOIN documents d USING (doc_id)
WHERE p.rk = 1
GROUP BY d.lang, p.pred_lang
""",
)
def ml_naivebayes(spark, sf_dir):
    """Multinomial naive Bayes language classifier, trained AND applied
    in one relational plan: per-(lang, term) Laplace-smoothed
    log-likelihoods (quantized to 6dp int64 — so per-doc scores are
    exact integer sums, argmax is engine-invariant with a lang
    tie-break), log priors from document counts, prediction = argmax
    over the 5 candidate languages. Output is the confusion matrix —
    the fastText-style lang-id quality gate a curation pipeline trains
    on its own corpus.

    Scale: the model is one (lang, term)-keyed groupBy; scoring
    multiplies per-doc term counts (doc_tf, one groupBy keyed by
    (doc_id, term)) against the model via an equi-join on term after a
    5-way candidate expansion (|langs| is a constant, so the expansion
    is a bounded fan-out, not a cartesian risk); argmax is a window
    keyed by doc_id. Everything is keyed by high-cardinality
    (doc_id/term) composites."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    ).filter(F.length("term") > 0)
    # ONE tokenization pass: doc_tf is checkpointed and every other
    # model statistic (per-lang term counts, totals, vocab size, doc
    # priors) derives from it plus the narrow (doc_id, lang) scan —
    # instead of five independent re-tokenizations of the corpus
    # (16 exchanges -> 10, one corpus pass at 100 TB).
    doc_tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c_dt"))
        .localCheckpoint(eager=False)
    )
    dl = d.select("doc_id", "lang")
    model = (
        doc_tf.join(dl, "doc_id")
        .groupBy("lang", "term")
        .agg(F.sum("c_dt").alias("c"))
        .localCheckpoint(eager=False)
    )
    vocab = model.agg(F.countDistinct("term").alias("v"))
    totals = model.groupBy("lang").agg(F.sum("c").alias("n_tok"))
    priors = (
        doc_tf.select("doc_id")
        .distinct()
        .join(dl, "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    ).withColumn("total_docs", F.sum("n_docs").over(Window.partitionBy()))
    cand = totals.crossJoin(vocab)  # 5 rows x 1 row — bounded
    ll_q6 = F.floor(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
            / (F.col("n_tok") + F.col("v"))
        )
        * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    scored = (
        doc_tf.crossJoin(F.broadcast(cand.withColumnRenamed("lang", "cand")))
        .join(
            model,
            (F.col("cand") == model.lang) & (doc_tf.term == model.term),
            "left",
        )
        .groupBy("doc_id", "cand", "n_tok", "v")
        .agg(F.sum(F.col("c_dt") * ll_q6).alias("ll"))
    )
    prior_q6 = F.floor(
        F.log(F.col("n_docs").cast("double") / F.col("total_docs"))
        * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    with_prior = scored.join(
        F.broadcast(priors.select(F.col("lang").alias("cand"), prior_q6.alias("pq"))),
        "cand",
    ).select("doc_id", "cand", (F.col("ll") + F.col("pq")).alias("score"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cand")
    pred = (
        with_prior.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("cand").alias("pred_lang"))
    )
    return (
        pred.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register(
    "ml_stump",
    oracle="""
WITH hist AS (
    SELECT n_chars AS x,
           count(*) AS cnt,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
    FROM documents GROUP BY n_chars
),
cum AS (
    SELECT x,
           sum(cnt) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS ln_,
           sum(pos) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS lp,
           sum(cnt) OVER () AS n,
           sum(pos) OVER () AS p
    FROM hist
),
splits AS (
    SELECT x AS threshold, ln_, lp, n - ln_ AS rn_, p - lp AS rp, n
    FROM cum WHERE ln_ < n
),
scored AS (
    SELECT threshold,
           (ln_ * (1.0 - (CAST(lp AS DOUBLE) / ln_) * (CAST(lp AS DOUBLE) / ln_)
                       - (CAST(ln_ - lp AS DOUBLE) / ln_)
                         * (CAST(ln_ - lp AS DOUBLE) / ln_))
            + rn_ * (1.0 - (CAST(rp AS DOUBLE) / rn_) * (CAST(rp AS DOUBLE) / rn_)
                         - (CAST(rn_ - rp AS DOUBLE) / rn_)
                           * (CAST(rn_ - rp AS DOUBLE) / rn_))) / n AS wgini,
           ln_, rn_
    FROM splits
)
SELECT CAST(threshold AS BIGINT) AS threshold,
       floor(wgini * 1000000 + 0.5) / 1000000 AS wgini,
       CAST(ln_ AS BIGINT) AS n_left, CAST(rn_ AS BIGINT) AS n_right
FROM scored
ORDER BY wgini, threshold
LIMIT 1
""",
)
def ml_stump(spark, sf_dir):
    """Decision stump (depth-1 tree) on document length predicting
    lang == 'en', trained ENTIRELY on the feature histogram: candidate
    thresholds are the distinct n_chars values, per-split class counts
    come from two running sums over histogram rows, and the best split
    minimizes weighted Gini (threshold tie-break). This is the
    histogram-based split search every distributed GBDT implementation
    (LightGBM/XGBoost-style) uses — the raw corpus contributes ONE
    map-combined groupBy; the split scan touches #distinct-values rows,
    never documents.

    Determinism: class counts are exact integers; the Gini expression
    is one fixed IEEE formula over them, identical in both engines;
    the global argmin is an ORDER BY ... LIMIT 1 (TakeOrdered) with a
    total tie-break."""
    d = table(spark, sf_dir, "documents")
    hist = d.groupBy(F.col("n_chars").alias("x")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum((F.col("lang") == "en").cast("int")).alias("pos"),
    )
    w_cum = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = hist.select(
        "x",
        F.sum("cnt").over(w_cum).alias("ln_"),
        F.sum("pos").over(w_cum).alias("lp"),
        F.sum("cnt").over(w_all).alias("n"),
        F.sum("pos").over(w_all).alias("p"),
    )
    splits = cum.filter(F.col("ln_") < F.col("n")).select(
        F.col("x").alias("threshold"),
        "ln_",
        "lp",
        (F.col("n") - F.col("ln_")).alias("rn_"),
        (F.col("p") - F.col("lp")).alias("rp"),
        "n",
    )

    def gini(nn, pp):
        pr = pp.cast("double") / nn
        qr = (nn - pp).cast("double") / nn
        return 1.0 - pr * pr - qr * qr

    wgini = (
        F.col("ln_") * gini(F.col("ln_"), F.col("lp"))
        + F.col("rn_") * gini(F.col("rn_"), F.col("rp"))
    ) / F.col("n")
    return (
        splits.select(
            F.col("threshold").cast("bigint").alias("threshold"),
            (F.floor(wgini * 1000000 + F.lit(0.5)) / 1000000).alias("wgini"),
            F.col("ln_").cast("bigint").alias("n_left"),
            F.col("rn_").cast("bigint").alias("n_right"),
        )
        .orderBy("wgini", "threshold")
        .limit(1)
    )


_AUC_STOPS = ("the", "and", "of", "to", "a", "in", "is", "it")
_AUC_STOPS_SQL = "['" + "','".join(_AUC_STOPS) + "']"

# shared 4dp stopword-ratio score + lang=='en' label — the classifier
# both ml_auc (discrimination) and ml_calibration (calibration) evaluate
_SCORED_SQL = f"""scored AS (
    SELECT CAST(floor(
               CAST(len(list_filter(string_split(lower(text), ' '),
                        w -> list_contains({_AUC_STOPS_SQL}, w))) AS DOUBLE)
               / len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
               * 10000 + 0.5) AS BIGINT) AS s,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
    FROM documents
    WHERE text IS NOT NULL AND length(text) > 0
      AND len(list_filter(string_split(lower(text), ' '), w -> w <> '')) > 0
)"""


def _stopword_scored(spark, sf_dir):
    """(s, y) per document: 4dp-quantized stopword-ratio score and the
    lang == 'en' label — Spark twin of _SCORED_SQL."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: F.length(t) > 0)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_AUC_STOPS)))
    n_toks = F.size(toks)
    return d.select(
        F.floor(n_stop / n_toks * 10000 + F.lit(0.5)).cast("bigint").alias("s"),
        (F.col("lang") == "en").cast("int").alias("y"),
    ).filter(n_toks > 0)


@register(
    "ml_auc",
    oracle=f"""
WITH {_SCORED_SQL},
hist AS (
    SELECT s, sum(y) AS n1, count(*) - sum(y) AS n0
    FROM scored GROUP BY s
),
cum AS (
    SELECT n1, n0,
           coalesce(sum(n0) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c0
    FROM hist
)
SELECT CAST(sum(n1) AS BIGINT) AS n_pos,
       CAST(sum(n0) AS BIGINT) AS n_neg,
       floor(CAST(sum(n1 * (2 * c0 + n0)) AS DOUBLE)
             / (2.0 * sum(n1) * sum(n0)) * 10000 + 0.5) / 10000 AS auc
FROM cum
""",
)
def ml_auc(spark, sf_dir):
    """Exact ROC-AUC of the stopword-ratio classifier (text_stats'
    English-stopword signal) against the lang == 'en' label, via the
    rank-sum identity: AUC = U / (n_pos * n_neg) with the Mann-Whitney
    U accumulated over the SCORE HISTOGRAM using midranks for ties —
    2U = sum_s n1(s) * (2 * negatives_below(s) + n0(s)). The evaluation
    loop every trained quality/langid classifier goes through before
    its threshold is picked.

    Scale: scores are quantized to 4dp (<= 10001 distinct values), so
    the corpus contributes ONE map-combined groupBy; the running sum
    and the final reduction run over histogram rows only — no global
    sort of raw documents, the same de-skew discipline as ml_stump.
    All rank arithmetic is exact integers; the single division happens
    once at the end."""
    return auc_from_scored(_stopword_scored(spark, sf_dir))


def auc_from_scored(scored):
    """Rank-sum AUC of any (s, y) frame (integer score, 0/1 label) —
    factored so tests can feed arbitrary randomized frames."""
    hist = scored.groupBy("s").agg(
        F.sum("y").alias("n1"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n0"),
    )
    # Running negative count over HISTOGRAM rows (bounded input — the
    # approved de-skew form for a global rank).
    w_below = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "n1", "n0", F.coalesce(F.sum("n0").over(w_below), F.lit(0)).alias("c0")
    )
    two_u = F.sum(F.col("n1") * (2 * F.col("c0") + F.col("n0")))
    return cum.agg(
        F.sum("n1").cast("bigint").alias("n_pos"),
        F.sum("n0").cast("bigint").alias("n_neg"),
        rnd(two_u.cast("double") / (2.0 * F.sum("n1") * F.sum("n0")), "auc"),
    )


@register(
    "ml_calibration",
    oracle=f"""
WITH {_SCORED_SQL}
SELECT CAST(least(s // 1000, 9) AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       floor(CAST(sum(s) AS DOUBLE) / (count(*) * 10000) * 10000 + 0.5)
           / 10000 AS avg_pred,
       floor(CAST(sum(y) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
           AS frac_pos
FROM scored GROUP BY least(s // 1000, 9)
""",
)
def ml_calibration(spark, sf_dir):
    """Reliability diagram for the stopword-ratio classifier (ml_auc's
    discrimination twin): bucket the 4dp score into 10 equal-width
    probability bins and report each bin's mean predicted probability
    vs its empirical positive rate — the calibration curve every
    deployed quality/langid classifier is audited with before its
    keep/drop threshold is trusted (ECE is the n-weighted |gap| sum,
    asserted in tests/test_wave6.py).

    Scale: ONE map-combined groupBy onto a 10-key space; bin stats are
    exact integer sums (scores are already integers), divided once at
    the end. Nothing ever sorts or windows raw documents."""
    scored = _stopword_scored(spark, sf_dir)
    return (
        scored.groupBy(
            F.least(F.floor(F.col("s") / 1000), F.lit(9))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            rnd(
                F.sum("s").cast("double") / (F.count(F.lit(1)) * 10000),
                "avg_pred",
            ),
            rnd(F.sum("y").cast("double") / F.count(F.lit(1)), "frac_pos"),
        )
    )


_CONF_THRESHOLDS = (250, 500, 750)


@register(
    "ml_confusion",
    oracle=f"""
WITH {_SCORED_SQL},
hist AS (
    SELECT s, CAST(sum(y) AS BIGINT) AS n1,
           CAST(count(*) - sum(y) AS BIGINT) AS n0
    FROM scored GROUP BY s
),
conf AS (
    SELECT t.threshold,
           sum(CASE WHEN s >= t.threshold THEN n1 ELSE 0 END) AS tp,
           sum(CASE WHEN s >= t.threshold THEN n0 ELSE 0 END) AS fp,
           sum(CASE WHEN s <  t.threshold THEN n1 ELSE 0 END) AS fn,
           sum(CASE WHEN s <  t.threshold THEN n0 ELSE 0 END) AS tn
    FROM hist
    CROSS JOIN (SELECT unnest([{", ".join(map(str, _CONF_THRESHOLDS))}])
                AS threshold) t
    GROUP BY t.threshold
)
SELECT CAST(threshold AS BIGINT) AS threshold,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CASE WHEN tp + fp = 0 THEN 0.0 ELSE
            floor(CAST(tp AS DOUBLE) / (tp + fp) * 10000 + 0.5) / 10000
       END AS precision_,
       CASE WHEN tp + fn = 0 THEN 0.0 ELSE
            floor(CAST(tp AS DOUBLE) / (tp + fn) * 10000 + 0.5) / 10000
       END AS recall_,
       CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0 ELSE
            floor(2.0 * tp / (2 * tp + fp + fn) * 10000 + 0.5) / 10000
       END AS f1
FROM conf
""",
)
def ml_confusion(spark, sf_dir):
    """Thresholded confusion matrices for the stopword-ratio classifier
    (completing ml_auc's threshold-free discrimination and
    ml_calibration's reliability curve): at each operating point the
    exact tp/fp/fn/tn plus floor-4dp precision/recall/F1 — the numbers
    a corpus-filter threshold is actually chosen from.

    Scale: documents collapse to the score HISTOGRAM first (one
    map-combined groupBy, <=10001 integer keys); the 3 operating points
    evaluate over histogram rows via a broadcast cross join — per-doc
    work never grows with the threshold grid. The dq_benford/ml_auc
    aggregate-before-window discipline applied to model evaluation."""
    hist = (
        _stopword_scored(spark, sf_dir)
        .groupBy("s")
        .agg(
            F.sum("y").cast("bigint").alias("n1"),
            (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("n0"),
        )
    )
    th = spark.range(len(_CONF_THRESHOLDS)).select(
        F.element_at(
            F.array(*[F.lit(t) for t in _CONF_THRESHOLDS]),
            (F.col("id") + 1).cast("int"),
        )
        .cast("bigint")
        .alias("threshold")
    )
    pos = F.col("s") >= F.col("threshold")
    conf = (
        hist.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(pos, F.col("n1")).otherwise(0)).alias("tp"),
            F.sum(F.when(pos, F.col("n0")).otherwise(0)).alias("fp"),
            F.sum(F.when(~pos, F.col("n1")).otherwise(0)).alias("fn"),
            F.sum(F.when(~pos, F.col("n0")).otherwise(0)).alias("tn"),
        )
    )

    def ratio(num, den, alias):
        return (
            F.when(den == 0, F.lit(0.0)).otherwise(
                F.floor(num.cast("double") / den * 10000 + F.lit(0.5)) / 10000
            )
        ).alias(alias)

    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return conf.select(
        "threshold",
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        tn.cast("bigint").alias("tn"),
        ratio(tp, tp + fp, "precision_"),
        ratio(tp, tp + fn, "recall_"),
        ratio(2 * tp, 2 * tp + fp + fn, "f1"),
    )
