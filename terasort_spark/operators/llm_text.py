"""Text-analysis operators for LLM data pipelines (SURVEY.md §2b +
north-star extension): wordcount, per-language stats, quality scoring,
language-ID heuristic, and content fingerprinting.

Everything is built-in-function composition (split/explode/regexp/md5) —
JVM-side, no Python UDFs — so the same pipeline runs at corpus scale
with only scan + one shuffle per aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import o_rnd, ravg, rnd
from terasort_spark.registry import register

# tiny per-language stopword lists for the language-ID heuristic
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "data"),
    "de": ("der", "und", "die", "das", "mit"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "是", "在", "了", "和"),
}


@register(
    "text_wordcount",
    oracle="""
SELECT word, count(*) AS n
FROM (
  SELECT unnest(string_split(lower(text), ' ')) AS word
  FROM documents
)
WHERE length(word) > 0
GROUP BY word
""",
)
def text_wordcount(spark, sf_dir):
    # The canonical explode → groupBy pipeline: fan-out stays pipelined
    # in codegen; only (word, partial count) pairs shuffle.
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_stats",
    oracle=f"""
SELECT lang,
       count(*) AS n_docs,
       {o_rnd("avg(len(string_split(text, ' ')))", "avg_words")},
       {o_rnd("avg(n_chars)", "avg_chars")},
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY lang
""",
)
def text_stats(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return (
        d.withColumn("n_words", F.size(F.split(F.col("text"), " ")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            ravg(F.col("n_words"), "avg_words"),
            ravg(F.col("n_chars"), "avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "text_quality",
    oracle=f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS n_tokens_re,
       {o_rnd("CAST(length(text) AS DOUBLE) / greatest(len(string_split(text, ' ')), 1)", "avg_token_len")},
       {o_rnd("CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / greatest(length(text), 1)", "punct_ratio")},
       {o_rnd("CAST(len(list_filter(string_split(lower(text), ' '), w -> list_contains(['the','and','of','to','a','in','is','it'], w))) AS DOUBLE) / greatest(len(string_split(text, ' ')), 1)", "stopword_ratio")}
FROM documents
WHERE doc_id < 300
""",
)
def text_quality(spark, sf_dir):
    """Heuristic quality scores (pretraining-filter style): byte length,
    regex token count (BPE-ish word/number runs), mean token length,
    punctuation ratio, stopword ratio."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = F.split(F.col("text"), " ")
    n_toks = F.greatest(F.size(toks), F.lit(1))
    stop = F.array([F.lit(w) for w in ("the", "and", "of", "to", "a", "in", "is", "it")])
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_bytes"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)).alias(
            "n_tokens_re"
        ),
        rnd(F.length("text").cast("double") / n_toks, "avg_token_len"),
        rnd(
            F.length(F.regexp_replace(F.col("text"), "[a-z0-9 ]", "")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)),
            "punct_ratio",
        ),
        rnd(
            F.size(
                F.filter(
                    F.split(F.lower("text"), " "),
                    lambda w: F.array_contains(stop, w),
                )
            ).cast("double")
            / n_toks,
            "stopword_ratio",
        ),
    )


def _marker_hits_spark(col, words):
    arr = F.array([F.lit(w) for w in words])
    return F.size(F.filter(col, lambda w: F.array_contains(arr, w)))


def _marker_hits_sql(words):
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"CAST(len(list_filter(string_split(lower(text), ' '), "
        f"w -> list_contains([{lst}], w))) AS INTEGER)"
    )


@register(
    "text_langid",
    oracle=f"""
SELECT doc_id, lang,
       {_marker_hits_sql(_LANG_MARKERS["en"])} AS hits_en,
       {_marker_hits_sql(_LANG_MARKERS["de"])} AS hits_de,
       {_marker_hits_sql(_LANG_MARKERS["es"])} AS hits_es,
       {_marker_hits_sql(_LANG_MARKERS["fr"])} AS hits_fr,
       CASE
         WHEN {_marker_hits_sql(_LANG_MARKERS["de"])} > {_marker_hits_sql(_LANG_MARKERS["en"])}
          AND {_marker_hits_sql(_LANG_MARKERS["de"])} >= {_marker_hits_sql(_LANG_MARKERS["es"])}
          AND {_marker_hits_sql(_LANG_MARKERS["de"])} >= {_marker_hits_sql(_LANG_MARKERS["fr"])}
           THEN 'de'
         WHEN {_marker_hits_sql(_LANG_MARKERS["es"])} > {_marker_hits_sql(_LANG_MARKERS["en"])}
          AND {_marker_hits_sql(_LANG_MARKERS["es"])} >= {_marker_hits_sql(_LANG_MARKERS["fr"])}
           THEN 'es'
         WHEN {_marker_hits_sql(_LANG_MARKERS["fr"])} > {_marker_hits_sql(_LANG_MARKERS["en"])}
           THEN 'fr'
         ELSE 'en'
       END AS predicted_lang
FROM documents
WHERE doc_id < 300
""",
)
def text_langid(spark, sf_dir):
    """Stopword-hit language-ID heuristic. The prediction rule is a fixed
    deterministic argmax ladder (de > es > fr > en on ties-to-English),
    identical in both engines; accuracy on synthetic word-soup text is
    not the point — the operator shape is."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = F.split(F.lower("text"), " ")
    hits = {k: _marker_hits_spark(toks, v) for k, v in _LANG_MARKERS.items()}
    pred = (
        F.when(
            (hits["de"] > hits["en"])
            & (hits["de"] >= hits["es"])
            & (hits["de"] >= hits["fr"]),
            "de",
        )
        .when((hits["es"] > hits["en"]) & (hits["es"] >= hits["fr"]), "es")
        .when(hits["fr"] > hits["en"], "fr")
        .otherwise("en")
    )
    return d.select(
        "doc_id",
        "lang",
        hits["en"].alias("hits_en"),
        hits["de"].alias("hits_de"),
        hits["es"].alias("hits_es"),
        hits["fr"].alias("hits_fr"),
        pred.alias("predicted_lang"),
    )


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
           AS content_fp,
       md5(substring(text, 1, 64)) AS prefix_fp
FROM documents
""",
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprints: an order-insensitive content hash (sorted
    distinct token set → md5) for exact-content dedup modulo word order,
    and a prefix hash for fast candidate blocking."""
    d = table(spark, sf_dir, "documents")
    canon = F.concat_ws(
        " ", F.sort_array(F.array_distinct(F.split(F.lower("text"), " ")))
    )
    return d.select(
        "doc_id",
        F.md5(canon).alias("content_fp"),
        F.md5(F.substring("text", 1, 64)).alias("prefix_fp"),
    )
