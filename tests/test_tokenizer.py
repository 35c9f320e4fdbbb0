"""BPE tokenizer operators (terasort_spark/operators/tokenizer.py).
Rows-only queries, so semantics are pinned here: independent
brute-force pair counting over the raw corpus, full-document encode
replay, determinism, and structural invariants."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from terasort_spark.operators.tokenizer import (
    END,
    encode_word,
    train_bpe,
)
from terasort_spark.registry import queries

_Q = queries()


def _corpus_words(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select("text")
        .collect()
    )
    words = Counter()
    for r in rows:
        for w in r["text"].lower().split(" "):
            if w:
                words[w] += 1
    return words


def test_first_merge_is_most_frequent_pair_bruteforce(spark, sf_dir):
    """Rank-0 merge must equal an INDEPENDENT brute-force count of
    adjacent symbol pairs over the raw corpus (char-level, end marker
    appended), with the (count desc, pair asc) tie-break."""
    words = _corpus_words(spark, sf_dir)
    pairs = Counter()
    for w, n in words.items():
        sym = list(w) + [END]
        for a, b in zip(sym, sym[1:]):
            pairs[(a, b)] += n
    expect_pair, expect_n = min(
        pairs.items(), key=lambda kv: (-kv[1], kv[0])
    )
    top = _Q["text_bpe_train"](spark, sf_dir).orderBy("rank").first()
    assert (top["left"], top["right"]) == expect_pair
    assert top["pair_count"] == expect_n


def test_train_is_deterministic_and_ranks_dense(spark, sf_dir):
    a = [tuple(r) for r in _Q["text_bpe_train"](spark, sf_dir).collect()]
    b = [tuple(r) for r in _Q["text_bpe_train"](spark, sf_dir).collect()]
    assert a == b
    assert [r[0] for r in a] == list(range(len(a)))
    # merged pairs are unique
    assert len({(r[1], r[2]) for r in a}) == len(a)


def test_encode_matches_full_document_replay(spark, sf_dir):
    """Distributed encode (broadcast word→n_sub join) must equal a
    per-document pure-Python replay that re-encodes every word."""
    words = _corpus_words(spark, sf_dir)
    # Truncate the replay histogram exactly like _word_counts does
    # (sort by (-count, word), keep VOCAB_CAP): text_bpe_encode trains
    # on the capped vocab and gives out-of-vocab words the merge-free
    # char fallback, so the replay must do the same or it breaks
    # spuriously once corpus vocab exceeds the cap at larger SFs.
    from terasort_spark.operators.tokenizer import VOCAB_CAP

    capped = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_CAP]
    vocab = {w for w, _n in capped}
    merges = train_bpe(capped)
    got = {
        r["doc_id"]: (r["n_words"], r["n_subtokens"])
        for r in _Q["text_bpe_encode"](spark, sf_dir).collect()
    }
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(
            F.col("text").isNotNull()
            & (F.length("text") > 0)
            & (F.col("doc_id") < 100)
        )
        .select("doc_id", "text")
        .collect()
    )
    assert got
    for r in rows:
        ws = [w for w in r["text"].lower().split(" ") if w]
        if not ws:
            continue
        expect = (
            len(ws),
            sum(
                len(encode_word(w, merges)) if w in vocab else len(w) + 1
                for w in ws
            ),
        )
        assert got[r["doc_id"]] == expect


def test_encode_compresses_and_roundtrips():
    """Unit semantics: more merges never lengthen a word's encoding,
    and concatenating the subtokens reproduces word + end marker."""
    wc = [("banana", 10), ("bandana", 5), ("anna", 3)]
    merges = train_bpe(wc, n_merges=10)
    for w, _ in wc:
        prev = len(w) + 1
        for k in range(len(merges) + 1):
            toks = encode_word(w, merges[:k])
            assert "".join(toks) == w + END
            assert len(toks) <= prev
            prev = len(toks)


def test_oracle_greedy_alternation_on_overlapping_runs(spark, tmp_path):
    """The r9 exact oracle's hardest case: a merge pair with left==right
    over odd-length same-char runs. Greedy left-to-right segments
    'aaaaa' as [aa, aa, a] while a naive replace-to-fixpoint would give
    [aa, a, aa] — a different adjacency order that changes the NEXT
    round's pair counts. Build a corpus that forces (a,a) as the first
    merge and long runs, then hash-compare the SQL chain against the
    pure-Python trainer via the standard compare path."""
    import duckdb

    from terasort_spark.compare import compare_query
    from terasort_spark.registry import oracle_sql

    docs = []
    # odd and even runs of 'a' (3..7) plus filler words so later merges
    # have material; weights force (a,a) to win rank 0
    for i, txt in enumerate(
        ["aaaaa aaa aaaa", "aaaaaaa aab baa", "abab aaab bbaa", "aa aaaaa ab"]
        * 25
    ):
        docs.append((i, txt))
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    os_ = oracle_sql()
    for name in ("text_bpe_train", "text_bpe_encode"):
        r = compare_query(name, _Q[name], os_[name], spark, str(tmp_path), con=con)
        assert r.ok, str(r)
    # and the run really does exercise the alternation: (a,a) is rank 0
    top = _Q["text_bpe_train"](spark, str(tmp_path)).collect()[0]
    assert (top["left"], top["right"]) == ("a", "a")
    con.close()


def test_unigram_viterbi_matches_bruteforce_enumeration(spark, sf_dir):
    """The DP (and therefore the unrolled SQL oracle graded against it)
    must pick the TRUE optimum: enumerate every segmentation of every
    output word by brute force and compare (score, n_pieces) under the
    same (max score, then fewest pieces) objective."""
    from itertools import product as _product

    from terasort_spark.operators.tokenizer import (
        UNI_PIECE_LEN,
        _unigram_pieces,
        _word_counts,
    )

    wc = [(r["w"], int(r["n"])) for r in _word_counts(spark, sf_dir).collect()]
    logp = _unigram_pieces(wc)

    def brute(word):
        best = None
        # compositions of len(word) into parts of size 1..UNI_PIECE_LEN
        def rec(i, score, k):
            nonlocal best
            if i == len(word):
                cand = (score, -k)
                if best is None or cand > best:
                    best = cand
                return
            for ln in range(1, UNI_PIECE_LEN + 1):
                if i + ln <= len(word) and word[i : i + ln] in logp:
                    rec(i + ln, score + logp[word[i : i + ln]], k + 1)

        rec(0, 0, 0)
        return best

    rows = _Q["text_unigram_lm"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = brute(r["w"])
        assert want is not None
        score_i, neg_k = want
        assert r["n_pieces"] == -neg_k, (r, want)
        assert abs(r["logprob"] - score_i / 1e6) < 1e-12, (r, want)


def test_unigram_prefers_frequent_multichar_pieces():
    """Unit semantics: a corpus dominated by one word must segment that
    word into few pieces (its substrings dominate the inventory), and
    every score is a valid log-prob sum (negative)."""
    from terasort_spark.operators.tokenizer import (
        _unigram_pieces,
        _unigram_viterbi,
    )

    wc = [("banana", 1000), ("x", 1)]
    logp = _unigram_pieces(wc)
    score, k = _unigram_viterbi("banana", logp)
    assert k <= 2  # 'bana'+'na' or better — never 6 single chars
    assert score < 0
    s1, k1 = _unigram_viterbi("x", logp)
    assert k1 == 1 and s1 == logp["x"]
