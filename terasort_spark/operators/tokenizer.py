"""Tokenizer operators: corpus-scale BPE training and encoding.

Byte-pair-encoding training is THE tokenizer workload of a pretraining
pipeline, and its distributed architecture mirrors emb_kmeans: the
corpus-scale part is a single word-frequency histogram (one shuffle
with map-side combine — the token stream itself never leaves the
executors), while the merge loop runs over that VOCAB-SIZED table as
driver-side model state, exactly how production tokenizer trainers
(word-count-then-merge) are built. Encoding re-distributes: each
DISTINCT word is encoded once, and documents join the word→subtoken
table — corpus cost is one broadcast join, not a per-token Python
loop.

Both queries are rows-only by design (a merge loop is not expressible
in one SQL statement); tests/test_tokenizer.py pins the semantics with
an independent pure-Python BPE replay over the raw corpus and
first-merge brute-force checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.registry import register

N_MERGES = 20
VOCAB_CAP = 10_000  # frequency-truncated word vocab, standard practice
END = "</w>"


def _word_counts(spark, sf_dir):
    """One shuffle: corpus word histogram, frequency-truncated to the
    cap with a deterministic (count desc, word) tie-break."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(VOCAB_CAP)
    )


def train_bpe(word_counts: list[tuple[str, int]], n_merges: int = N_MERGES):
    """Deterministic BPE merge loop over a word histogram (driver-side
    model state, vocab-sized). Ties break on the lexicographically
    smallest (left, right) pair so retrained models are bit-identical.
    Returns [(rank, left, right, pair_count)]."""
    words = {}
    for w, n in word_counts:
        words[tuple(w) + (END,)] = words.get(tuple(w) + (END,), 0) + n
    merges = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((rank, a, b, cnt))
        merged = a + b
        nxt = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + n
        words = nxt
    return merges


def encode_word(word: str, merges) -> list[str]:
    """Apply learned merges (in rank order) to one word."""
    sym = list(word) + [END]
    for _rank, a, b, _cnt in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


@register("text_bpe_train")
def text_bpe_train(spark, sf_dir):
    """BPE training: word histogram (ONE corpus shuffle, map-side
    combine; token stream stays on executors) → merge loop over the
    vocab-sized driver table. Returns the learned merge table — rank,
    pair, and the pair's frequency at merge time. 100 TB: the only
    data-sized step is the histogram; the loop's state is O(vocab),
    independent of corpus size — the same partial-then-model split as
    emb_kmeans. Rows-only by design; semantics pinned by pure-Python
    replay in tests/test_tokenizer.py."""
    wc = [(r["w"], r["n"]) for r in _word_counts(spark, sf_dir).collect()]
    merges = train_bpe(wc)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    ).orderBy("rank")


@register("text_bpe_encode")
def text_bpe_encode(spark, sf_dir):
    """BPE encoding at corpus scale: train (as above), encode each
    DISTINCT word once driver-side (vocab-sized), then broadcast-join
    the word→(n_subtokens, joined form) table onto the exploded corpus
    and aggregate per document — encoding cost is one broadcast join,
    never a per-token Python loop over the corpus. Emits per-doc word
    and subtoken counts plus the compression ratio for doc_id < 100."""
    wc = [(r["w"], r["n"]) for r in _word_counts(spark, sf_dir).collect()]
    merges = train_bpe(wc)
    enc = [
        (w, len(encode_word(w, merges)), " ".join(encode_word(w, merges)))
        for w, _n in wc
    ]
    enc_df = spark.createDataFrame(
        enc, "w string, n_sub int, sub string"
    )
    d = table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & (F.length("text") > 0)
        & (F.col("doc_id") < 100)
    )
    words = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") > 0)
    return (
        # left join: a word outside the frequency-truncated vocab falls
        # back to its unmerged character segmentation (len + </w>)
        words.join(F.broadcast(enc_df), "w", "left")
        .withColumn(
            "n_sub", F.coalesce(F.col("n_sub"), F.length("w") + 1)
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_subtokens"),
        )
        .withColumn(
            "ratio",
            F.floor(
                F.col("n_subtokens") / F.col("n_words") * 10000 + 0.5
            )
            / 10000,
        )
    )
