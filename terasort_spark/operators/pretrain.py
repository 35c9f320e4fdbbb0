"""Pretraining-corpus construction operators: benchmark decontamination,
context-window sequence packing, and deterministic source-mixture
sampling. These are the steps between "deduped corpus" and "token
stream" in an LLM data pipeline; none exist in the reference (SURVEY.md
§2a) — they extend the engine's §2b surface with full DuckDB oracles.

Scale notes: all three are single-shuffle shapes. Decontamination
shuffles on the shingle (the benchmark side is tiny → broadcast);
packing is a per-source window cumsum (one shuffle on the packing key,
state = one running sum per partition); mixture sampling is a stateless
filter on a content hash — no shuffle at all, and the SAME rows are
kept on any cluster size or partitioning (md5, not partition-dependent
rand()).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.registry import register

# Word 8-grams: long enough that cross-doc collisions mean real shared
# text in the synthetic corpus (vocab ~40 words → an 8-gram has ~40^8
# possible values), short enough that 30-word docs yield shingles.
NGRAM = 8
CONTEXT = 2048  # packing target, in whitespace-token units
# Mixture weights per source, in percent. Unlisted sources keep 50%.
MIX = {"src0": 90, "src1": 60, "src2": 30}
MIX_DEFAULT = 50


@register(
    "text_contamination",
    oracle=f"""
WITH words AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
shingles AS (
    SELECT doc_id, unnest(list_transform(
               generate_series(1, len(w) - {NGRAM - 1}),
               i -> array_to_string(w[i:i + {NGRAM - 1}], ' '))) AS s
    FROM words WHERE len(w) >= {NGRAM}
),
bench AS (SELECT DISTINCT s FROM shingles WHERE doc_id % 100 = 0),
corpus AS (SELECT * FROM shingles WHERE doc_id % 100 <> 0)
SELECT c.doc_id,
       count(DISTINCT c.s) AS n_hit_shingles,
       count(c.s) AS n_hits
FROM corpus c JOIN bench b ON c.s = b.s
GROUP BY c.doc_id
""",
)
def text_contamination(spark, sf_dir):
    """Benchmark decontamination: flag corpus docs sharing any word
    8-gram with a held-out benchmark set (here: doc_id % 100 == 0
    stands in for the eval suite). Per contaminated doc: distinct
    overlapping shingles and total hit count — the report a pipeline
    uses to drop or redact before training.

    Scale notes: the benchmark side is small by construction (eval
    suites are KBs, corpora are TBs) → its distinct-shingle set
    broadcasts, so the corpus side is scanned once with no shuffle of
    document text; only the grouped hit counts (one row per
    contaminated doc) aggregate."""
    d = table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    # Filter BEFORE exploding: Spark's sequence(1, n) runs DESCENDING
    # when n < 1, so short docs must never reach the shingle expression.
    shingles = (
        d.where(F.size(w) >= NGRAM)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - (NGRAM - 1)),
                    lambda i: F.concat_ws(" ", F.slice(w, i, NGRAM)),
                )
            ).alias("s"),
        )
    )
    bench = (
        shingles.where(F.col("doc_id") % 100 == 0).select("s").distinct()
    )
    corpus = shingles.where(F.col("doc_id") % 100 != 0)
    return (
        corpus.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("s").alias("n_hit_shingles"),
            F.count("s").alias("n_hits"),
        )
    )


@register(
    "pack_sequences",
    oracle=f"""
SELECT doc_id, source, n_tokens,
       CAST(floor((run - n_tokens) / {CONTEXT}) AS BIGINT) AS bin_id,
       CAST(run - n_tokens - floor((run - n_tokens) / {CONTEXT}) * {CONTEXT}
            AS BIGINT) AS bin_offset
FROM (
    SELECT doc_id, source,
           len(string_split(text, ' ')) AS n_tokens,
           sum(len(string_split(text, ' ')))
               OVER (PARTITION BY source ORDER BY doc_id) AS run
    FROM documents
)
""",
)
def pack_sequences(spark, sf_dir):
    """Sequence packing: assign each document a (source, bin_id,
    bin_offset) slot in a stream of fixed-size context windows
    (CONTEXT whitespace tokens), documents concatenated in doc_id
    order per source — the deterministic "greedy concat then chop"
    packing used to build training batches. A doc may straddle two
    bins (offset + n_tokens > CONTEXT); bin_id is where it starts.

    Scale notes: one window cumsum per source — a single shuffle on
    the packing key and O(1) running state per partition; no pairwise
    anything. The assignment depends only on (source, doc_id order),
    so it is identical on any cluster size (D3-style determinism for
    a physical-layout decision)."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    win = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(n_tok).over(win)
    start = run - n_tok
    return d.select(
        "doc_id",
        "source",
        n_tok.cast("long").alias("n_tokens"),
        F.floor(start / CONTEXT).alias("bin_id"),
        (start - F.floor(start / CONTEXT) * CONTEXT)
        .cast("long")
        .alias("bin_offset"),
    )


def _hex_threshold(pct: int) -> str:
    """pct% of the 6-hex-digit space as a lowercase hex string; a doc is
    kept iff its md5-prefix sorts below this. String comparison of
    same-length lowercase hex == numeric comparison, and both engines
    emit identical lowercase md5 hex — no cross-engine hex→int cast
    needed (DuckDB has no conv())."""
    return format(int(pct / 100 * 16**6), "06x")


def _mix_threshold_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN '{_hex_threshold(w)}'"
        for s, w in sorted(MIX.items())
    )
    return f"CASE {cases} ELSE '{_hex_threshold(MIX_DEFAULT)}' END"


@register(
    "sample_mixture",
    oracle=f"""
SELECT doc_id, source, lang
FROM documents
WHERE substr(md5(concat('mix', CAST(doc_id AS VARCHAR))), 1, 6)
      < ({_mix_threshold_sql()})
""",
)
def sample_mixture(spark, sf_dir):
    """Dataset mixture sampling: down-weight sources to target
    percentages (MIX) with a deterministic content-hash coin —
    md5('mix' || doc_id) compared against a per-source hex threshold —
    instead of rand(). The same doc is kept or dropped on every run,
    every partitioning, every cluster size, so the mixture is
    reproducible and resumable (the property rand() sampling loses the
    moment a partition is recomputed).

    Scale notes: stateless filter, no shuffle; evaluates in the scan
    stage. Changing MIX re-samples only the affected sources."""
    d = table(spark, sf_dir, "documents")
    coin = F.substring(
        F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))), 1, 6
    )
    threshold = F.lit(_hex_threshold(MIX_DEFAULT))
    for s, wgt in sorted(MIX.items()):
        threshold = F.when(
            F.col("source") == s, F.lit(_hex_threshold(wgt))
        ).otherwise(threshold)
    return d.where(coin < threshold).select("doc_id", "source", "lang")


_LANGS = ("de", "en", "es", "fr")


@register(
    "pipeline_pretrain_funnel",
    oracle=f"""
WITH flags AS (
    SELECT md5(text) AS h,
           lang IN {_LANGS!r} AS lang_ok,
           lang IN {_LANGS!r}
             AND n_chars BETWEEN 100 AND 20000
             AND len(string_split(text, ' ')) >= 10
             AND (CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')))
                 BETWEEN 2 AND 12
             AS qual_ok
    FROM documents
)
SELECT 1 AS stage_id, 'raw' AS stage, count(*) AS n_docs FROM flags
UNION ALL
SELECT 2, 'lang', count(*) FILTER (WHERE lang_ok) FROM flags
UNION ALL
SELECT 3, 'quality', count(*) FILTER (WHERE qual_ok) FROM flags
UNION ALL
SELECT 4, 'dedup', count(DISTINCT CASE WHEN qual_ok THEN h END) FROM flags
""",
)
def pipeline_pretrain_funnel(spark, sf_dir):
    """The corpus-admission funnel as ONE aggregation: how many
    documents survive each pretraining gate — raw -> language filter ->
    quality filter (length bounds, minimum word count, mean-word-length
    band) -> exact dedup. The per-stage survivor counts every corpus
    report leads with, computed without materializing any intermediate
    stage.

    Scale notes: conditional aggregation folds all four stages into a
    single scan; the only shuffle is the count(DISTINCT md5) for the
    dedup stage (hash, not text, so shuffle rows are 32 bytes each).
    Compare running four separate filter+count jobs: 4 scans and no
    shared work. Output is 4 rows at any corpus size."""
    d = table(spark, sf_dir, "documents")
    words = F.size(F.split(F.col("text"), " "))
    lang_ok = F.col("lang").isin(*_LANGS)
    qual_ok = (
        lang_ok
        & F.col("n_chars").between(100, 20000)
        & (words >= 10)
        & (F.col("n_chars").cast("double") / words).between(2, 12)
    )
    row = d.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(lang_ok.cast("bigint")).alias("n_lang"),
        F.sum(qual_ok.cast("bigint")).alias("n_qual"),
        F.countDistinct(F.when(qual_ok, F.md5("text"))).alias("n_dedup"),
    )
    return row.selectExpr(
        "stack(4, 1, 'raw', n_raw, 2, 'lang', n_lang,"
        " 3, 'quality', n_qual, 4, 'dedup', n_dedup)"
        " AS (stage_id, stage, n_docs)"
    )


TOKEN_BUDGET = 2000  # per-language token budget (interior at sf0.001-0.1)


@register(
    "sample_token_budget",
    oracle=f"""
WITH scored AS (
  SELECT lang, doc_id,
         len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
             AS tok,
         CAST(floor(
             CAST(len(list_filter(string_split(lower(text), ' '),
                  w -> list_contains(['the','and','of','to','a','in','is','it'], w)))
                  AS DOUBLE)
             / len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
             * 10000 + 0.5) AS BIGINT) AS qs
  FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
    AND len(list_filter(string_split(lower(text), ' '), w -> w <> '')) > 0
),
cum AS (
  SELECT lang, doc_id, tok, qs,
         sum(tok) OVER (PARTITION BY lang ORDER BY qs DESC, doc_id) AS c
  FROM scored
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS tokens_selected,
       CAST(min(qs) AS BIGINT) AS min_score
FROM cum WHERE c <= {TOKEN_BUDGET}
GROUP BY lang
""",
)
def sample_token_budget(spark, sf_dir):
    """Token-budgeted greedy selection: per language, admit documents
    in descending quality order (stopword-ratio score, doc_id
    tie-break) while the cumulative token count stays within the
    per-language budget — how a pretraining mix fills each language's
    token allocation from the best documents first.

    The oracle states the semantics as one per-lang running sum over
    RAW documents; the Spark plan must NOT do that (a per-lang window
    over the corpus is the text_ccnet_bucket anti-pattern — 5 serial
    sorts of the whole corpus at 100 TB). De-skewed equivalent:
      1. collapse docs to the (lang, qs) HISTOGRAM (bounded: |langs| x
         10001 score values) and run the budget prefix sum over
         histogram rows;
      2. buckets that fit entirely are admitted wholesale (stateless
         broadcast-joined comparison, no per-doc window);
      3. ONLY the single boundary bucket per lang — a bounded tie
         group keyed by (lang, qs) — gets a per-doc running sum to
         split it exactly at the budget.
    Identical output, windows only over aggregates and tie-slices.
    Companion discipline to text_ccnet_bucket/agg_weighted_percentile
    (tests/test_plans.py asserts the window shapes)."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: F.length(t) > 0)
    stops = ("the", "and", "of", "to", "a", "in", "is", "it")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stops)))
    n_tok = F.size(toks)
    scored = d.select(
        "lang",
        "doc_id",
        n_tok.cast("bigint").alias("tok"),
        F.floor(n_stop / n_tok * 10000 + F.lit(0.5)).cast("bigint").alias("qs"),
    ).filter(n_tok > 0)

    # (1) histogram + budget prefix over histogram rows
    hist = scored.groupBy("lang", "qs").agg(F.sum("tok").alias("btok"))
    w_h = Window.partitionBy("lang").orderBy(F.desc("qs"))
    hb = hist.select(
        "lang",
        "qs",
        "btok",
        (F.sum("btok").over(w_h) - F.col("btok")).alias("c_before"),
    )
    full = hb.filter(F.col("c_before") + F.col("btok") <= TOKEN_BUDGET)
    boundary = hb.filter(
        (F.col("c_before") < TOKEN_BUDGET)
        & (F.col("c_before") + F.col("btok") > TOKEN_BUDGET)
    )

    # (2) whole buckets admitted without touching doc rows again
    sel_full = scored.join(full.select("lang", "qs"), ["lang", "qs"])

    # (3) split the one boundary bucket per lang on its own doc rows
    w_b = Window.partitionBy("lang", "qs").orderBy("doc_id")
    sel_boundary = (
        scored.join(F.broadcast(boundary), ["lang", "qs"])
        .withColumn("c_in", F.sum("tok").over(w_b))
        .filter(F.col("c_before") + F.col("c_in") <= TOKEN_BUDGET)
        .select("lang", "doc_id", "tok", "qs")
    )

    return (
        sel_full.select("lang", "doc_id", "tok", "qs")
        .unionAll(sel_boundary)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("tokens_selected"),
            F.min("qs").cast("bigint").alias("min_score"),
        )
    )
