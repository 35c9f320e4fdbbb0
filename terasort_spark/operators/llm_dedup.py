"""Deduplication operators for LLM data pipelines (north-star
extension): exact dedup and MinHash-LSH near-dedup.

Scale design:
- exact dedup is a hash-groupBy keeping the minimum doc_id —
  deterministic (never bare dropDuplicates, whose row choice depends on
  partition arrival order) and a single shuffle on the content hash;
- MinHash-LSH replaces the O(n²) pair scan with banded bucket joins —
  candidates are only pairs sharing a band bucket, so the join is
  equi-key and shuffle-partitioned, the pattern that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import o_rnd, rnd
from terasort_spark.registry import register

N_HASHES = 16  # minhash signature length
N_BANDS = 4  # bands of 4 rows each


def _with_dups(spark, sf_dir):
    """The corpus has no exact duplicate texts (FIXTURES.md) — union a
    re-keyed slice of documents onto itself so dedup has work to do."""
    d = table(spark, sf_dir, "documents")
    dup = d.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return d.unionByName(dup)


_DUP_SQL = """
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 5 = 0
"""


@register(
    "dedup_exact",
    oracle=f"""
SELECT md5(lower(trim(text))) AS h,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM ({_DUP_SQL})
GROUP BY md5(lower(trim(text)))
""",
)
def dedup_exact(spark, sf_dir):
    # groupBy(hash).min(doc_id): the kept row is a pure function of the
    # data, independent of partitioning — unlike dropDuplicates.
    return (
        _with_dups(spark, sf_dir)
        .withColumn("h", F.md5(F.lower(F.trim(F.col("text")))))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "dedup_minhash",
    oracle=None,  # banded-LSH candidate set is engine-specific → rows-only;
    # exactness of surviving pairs is asserted in tests/test_llm.py
)
def dedup_minhash(spark, sf_dir):
    """MinHash-LSH near-duplicate pairs.

    signature: for each of 16 seeded hash functions, the min of
    xxhash64(token, seed) over the doc's distinct tokens (seeded
    permutation approximation — fully deterministic, no RNG state);
    banding: 4 bands × 4 rows; docs sharing any band bucket are
    candidates; verification: exact Jaccard >= 0.5 on token sets.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("toks")
    )
    def minhash(i):
        # 1-ary lambda: a 2-ary one would receive the array INDEX as its
        # second argument, silently replacing the seed
        return F.array_min(
            F.transform(F.col("toks"), lambda t: F.xxhash64(t, F.lit(i)))
        ).alias(f"mh{i}")

    sig = d.select("doc_id", "toks", *[minhash(i) for i in range(N_HASHES)])
    rows_per_band = N_HASHES // N_BANDS
    bands = sig.select(
        "doc_id",
        "toks",
        *[
            F.hash(*[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)])
            .alias(f"band{b}")
            for b in range(N_BANDS)
        ],
    )
    # candidate pairs: equal bucket in any band (union over bands, dedup)
    cands = None
    for b in range(N_BANDS):
        left = bands.select(
            F.col("doc_id").alias("a_id"),
            F.col("toks").alias("a_toks"),
            F.col(f"band{b}").alias("bucket"),
        )
        right = bands.select(
            F.col("doc_id").alias("b_id"),
            F.col("toks").alias("b_toks"),
            F.col(f"band{b}").alias("bucket"),
        )
        pairs = left.join(right, "bucket").filter(F.col("a_id") < F.col("b_id"))
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.dropDuplicates(["a_id", "b_id"])
    jacc = F.size(F.array_intersect("a_toks", "b_toks")).cast("double") / F.size(
        F.array_union("a_toks", "b_toks")
    )
    return (
        cands.withColumn("jaccard", rnd(jacc))
        .filter(F.col("jaccard") >= 0.5)
        .select("a_id", "b_id", "jaccard")
    )


@register(
    "dedup_simhash",
    oracle=None,  # 64-bit simhash uses xxhash64 (no DuckDB twin) → rows-only
)
def dedup_simhash(spark, sf_dir):
    """SimHash fingerprint per document: sign-sum of per-token 64-bit
    hashes, bit-majority packed into a BIGINT. Near-dup candidates =
    equal fingerprints (Hamming-0 buckets; a banded Hamming-k variant
    splits the 64 bits into 4 × 16-bit keys the same way MinHash bands
    do)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("toks")
    )
    # For each bit b: +1 if token-hash bit set else -1; sum over tokens;
    # fingerprint bit = 1 iff sum > 0. All JVM higher-order functions.
    d = d.withColumn("th", F.transform(F.col("toks"), lambda t: F.xxhash64(t)))

    def make_vote(b):
        # HOF merge lambdas must be exactly 2-ary; bind b via closure
        def vote(acc, h):
            bit = F.shiftright(h, b).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

        return vote

    fp = F.lit(0)
    for b in range(16):  # 16-bit simhash keeps the expression tree small
        vote = F.aggregate(F.col("th"), F.lit(0), make_vote(b))
        fp = fp + F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return d.select("doc_id", fp.cast("long").alias("simhash16"))
