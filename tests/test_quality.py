"""Invariant tests for operators/quality.py — properties the oracle
hash compare can't express directly (weight conservation, rate caps,
version isolation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.registry import queries

_Q = queries()


def test_soft_dedup_weights_sum_to_dedup_count(spark, sf_dir):
    """Σ weight over all copies of a hash group is 1 (up to the 4dp
    quantization), so total weight equals the hard-deduplicated corpus
    size — the property that makes SoftDeDup gradient-equivalent to
    dropping duplicates in expectation."""
    out = _Q["dedup_soft"](spark, sf_dir)
    total_weight = out.agg(F.sum("weight")).collect()[0][0]
    d = table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    n_distinct = d.select("text").distinct().count()
    # 4dp rounding error is at most 0.5e-4 per row
    assert abs(total_weight - n_distinct) <= 0.5e-4 * out.count() + 1e-9
    # hard dedup is recoverable: exactly one weight-1-per-group max
    assert out.filter(F.col("n_copies") == 1).count() == out.filter(
        F.col("weight") == 1.0
    ).count()


def test_temperature_sampling_keeps_rarest_language_whole(spark, sf_dir):
    """rate(p_min) == 1, so every document of the rarest language
    survives; all other languages are subsampled at sqrt(p_min/p)."""
    d = table(spark, sf_dir, "documents")
    counts = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    rare = min(counts, key=lambda k: (counts[k], k))
    kept = _Q["sample_temperature"](spark, sf_dir)
    kept_counts = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert kept_counts[rare] == counts[rare]
    # the most common language is genuinely subsampled: its target rate
    # sqrt(p_min/p_max) < 1, and with 100+ docs the chance all survive
    # a fair coin at that rate is negligible (deterministic here anyway
    # — the mixer's kept set is a fixed function of doc_ids)
    common = max(counts, key=lambda k: (counts[k], k))
    if counts[common] > counts[rare]:
        assert kept_counts.get(common, 0) < counts[common]


def test_temperature_sampling_is_repartition_invariant(spark, sf_dir):
    """The coin is content-addressed (mixer on doc_id), so the kept set
    is identical at any partitioning — the reproducibility property
    rand()-based sampling loses. This feeds genuinely repartitioned
    inputs through the factored core (r5 ADVICE: the old version never
    exercised repartitioning)."""
    from terasort_spark.operators.quality import temperature_sample

    a = {r["doc_id"] for r in _Q["sample_temperature"](spark, sf_dir).collect()}
    docs = table(spark, sf_dir, "documents")
    for reshaped in (docs.repartition(7), docs.repartition(3, "lang"), docs.coalesce(1)):
        b = {r["doc_id"] for r in temperature_sample(reshaped).collect()}
        assert a == b
    assert a  # non-trivial: the sample keeps something


def test_ccnet_buckets_are_language_terciles(spark, sf_dir):
    out = _Q["text_ccnet_bucket"](spark, sf_dir).collect()
    from collections import Counter

    per_lang = Counter((r["lang"], r["bucket"]) for r in out)
    langs = {r["lang"] for r in out}
    for lang in langs:
        h = per_lang[(lang, "head")]
        m = per_lang[(lang, "middle")]
        t = per_lang[(lang, "tail")]
        # ntile(3): sizes differ by at most 1 and head >= middle >= tail
        assert h >= m >= t >= h - 1
        # head scores dominate tail scores
    by_lang_bucket = {}
    for r in out:
        by_lang_bucket.setdefault((r["lang"], r["bucket"]), []).append(
            r["avg_logprob"]
        )
    for lang in langs:
        if (lang, "tail") in by_lang_bucket and (lang, "head") in by_lang_bucket:
            assert min(by_lang_bucket[(lang, "head")]) >= max(
                by_lang_bucket[(lang, "tail")]
            )


def test_timetravel_excludes_later_versions(spark, sf_dir):
    """A key whose only change is at v2 must show its v<=1 value; a key
    deleted at v2 must still be present in the v1 snapshot."""
    out = {r["o_orderkey"]: r["price"] for r in _Q["scan_timetravel"](spark, sf_dir).collect()}
    o = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    }
    import math

    def q4(x):
        return math.floor(x * 10000 + 0.5) / 10000

    for k, price in o.items():
        in_base = k % 3 != 2
        in_v1 = k % 7 == 0
        if in_v1:
            assert out[k] == q4(price * 2), k  # v1 upsert visible
        elif in_base:
            assert out[k] == q4(price), k  # base value, v2 invisible
        else:
            assert k not in out
