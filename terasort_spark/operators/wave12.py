"""Round-10 third wave: WordPiece greedy encoding (completing the
tokenizer triad next to BPE and unigram-LM), integer-weighted boosted
stumps (the histogram-GBDT shape carried from one stump to an
ensemble), lakehouse VACUUM dry-run audit (segment liveness against the
latest checkpoint), and EXCEPT ALL (completing the bag-semantics set
family).

All four carry exact DuckDB oracles. The tokenizer and boosting
operators follow the repo's data-vs-model split: the only corpus-sized
step is ONE map-combined histogram shuffle; the model loop (greedy
matcher / boosting rounds) runs over vocab- or histogram-sized driver
state, and the oracle unrolls that loop into materialized CTE rounds.
"""

from __future__ import annotations

import os
import shutil
from collections import Counter

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import scratch_dir
from terasort_spark.operators.tokenizer import VOCAB_CAP, _word_counts
from terasort_spark.registry import register
from terasort_spark.sources.snapshots import (
    delete_keys,
    read_snapshot,
    write_version,
)

# ---------------------------------------------------------------------------
# text_wordpiece — greedy longest-match-first subword segmentation

WP_MAXLEN = 12  # words longer than this are out of segmentation scope
WP_PIECE_LEN = 4  # max candidate piece length
WP_MULTI_KEEP = 300  # multi-char pieces kept PER CLASS (initial / cont)
WP_TOP_WORDS = 200  # output rows: most frequent words


def _wp_inventory(word_counts):
    """WordPiece-style piece inventory over the word histogram: every
    substring of length 1..WP_PIECE_LEN, weighted by word frequency and
    CLASSED by position — initial (word start) vs continuation (the
    '##' pieces). All single chars of each class are kept (coverage
    guarantee: every encodable word segments without [UNK]) plus the
    WP_MULTI_KEEP most frequent multi-char pieces per class, ties to
    the lexicographically smaller piece. Returns set[(txt, is_cont)]."""
    cnt: Counter = Counter()
    for w, n in word_counts:
        for s in range(len(w)):
            for ln in range(1, WP_PIECE_LEN + 1):
                if s + ln <= len(w):
                    cnt[(w[s : s + ln], s > 0)] += n
    kept = {k for k in cnt if len(k[0]) == 1}
    for is_cont in (False, True):
        multis = sorted(
            (
                (t, c)
                for (t, ic), c in cnt.items()
                if ic == is_cont and len(t) > 1
            ),
            key=lambda tc: (-tc[1], tc[0]),
        )[:WP_MULTI_KEEP]
        kept |= {(t, is_cont) for t, _ in multis}
    return kept


def _wp_encode(w: str, kept) -> list[str]:
    """The WordPiece inference rule: at each position take the LONGEST
    inventory piece of the position's class. Always terminates without
    [UNK] because single chars of both classes are in the inventory."""
    pos, pieces = 0, []
    while pos < len(w):
        for ln in range(min(WP_PIECE_LEN, len(w) - pos), 0, -1):
            t = w[pos : pos + ln]
            if (t, pos > 0) in kept:
                pieces.append(("##" + t) if pos > 0 else t)
                pos += ln
                break
    return pieces


def _wp_base_sql() -> str:
    lens = ",".join(str(i) for i in range(1, WP_PIECE_LEN + 1))
    return f"""
vocab AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w
    FROM documents
    WHERE text IS NOT NULL AND length(text) > 0
  )
  WHERE length(w) > 0
  GROUP BY w
  ORDER BY n DESC, w
  LIMIT {VOCAB_CAP}
),
v12 AS MATERIALIZED (
  SELECT w, n FROM vocab WHERE length(w) <= {WP_MAXLEN}
),
cand AS MATERIALIZED (
  SELECT substr(w, s, l) AS txt, s > 1 AS is_cont, SUM(n) AS cnt
  FROM (SELECT w, n, unnest(generate_series(1, length(w))) AS s FROM v12)
  CROSS JOIN (SELECT unnest([{lens}]) AS l)
  WHERE s + l - 1 <= length(w)
  GROUP BY txt, is_cont
),
kept AS MATERIALIZED (
  SELECT txt, is_cont FROM cand WHERE length(txt) = 1
  UNION ALL
  SELECT txt, is_cont FROM (
    SELECT txt, is_cont,
           row_number() OVER (PARTITION BY is_cont ORDER BY cnt DESC, txt) AS rk
    FROM cand WHERE length(txt) > 1
  ) WHERE rk <= {WP_MULTI_KEEP}
),
s0 AS MATERIALIZED (
  SELECT w, n, CAST(1 AS BIGINT) AS pos, 0 AS n_pieces, '' AS seg
  FROM (SELECT w, n FROM v12 ORDER BY n DESC, w LIMIT {WP_TOP_WORDS})
)"""


def _wp_step_sql(k: int) -> str:
    """One unrolled greedy step: every unfinished word matches the kept
    pieces of its position's class at each length (equi-joins on the
    substr key — the hash-joinable form of 'longest prefix'), the
    longest wins (row_number over plen DESC — unique: one piece per
    (word, pos, length, class)), finished words carry forward."""
    p = k - 1
    branches = []
    for ln in range(1, WP_PIECE_LEN + 1):
        branches.append(
            f"""SELECT s.w, s.n, s.pos, s.n_pieces, s.seg, p.txt, {ln} AS plen
      FROM s{p} s JOIN kept p
        ON p.is_cont = (s.pos > 1) AND length(p.txt) = {ln}
           AND p.txt = substr(s.w, CAST(s.pos AS INT), {ln})
      WHERE s.pos <= length(s.w) AND s.pos + {ln} - 1 <= length(s.w)"""
        )
    u = "\n      UNION ALL ".join(branches)
    return f"""
m{k} AS MATERIALIZED (
  SELECT *, row_number() OVER (PARTITION BY w ORDER BY plen DESC) AS rk
  FROM (
      {u}
  )
),
s{k} AS MATERIALIZED (
  SELECT w, n, pos + plen AS pos, n_pieces + 1 AS n_pieces,
         seg || CASE WHEN pos > 1 THEN ' ##' ELSE '' END || txt AS seg
  FROM m{k} WHERE rk = 1
  UNION ALL
  SELECT w, n, pos, n_pieces, seg FROM s{p} WHERE pos > length(w)
)"""


def _wp_oracle() -> str:
    parts = [_wp_base_sql()] + [
        _wp_step_sql(k) for k in range(1, WP_MAXLEN + 1)
    ]
    return (
        "WITH "
        + ",".join(parts)
        + f"\nSELECT w, n, n_pieces, seg FROM s{WP_MAXLEN}"
    )


@register("text_wordpiece", oracle=_wp_oracle())
def text_wordpiece(spark, sf_dir):
    """WordPiece tokenizer (the BERT family's inference rule, built
    from the public algorithm): derive a piece inventory from the word
    histogram — every substring up to WP_PIECE_LEN weighted by word
    frequency, classed initial vs continuation ('##'), all single
    chars kept per class for coverage plus the WP_MULTI_KEEP most
    frequent multi-char pieces per class — then segment each word by
    GREEDY LONGEST-MATCH-FIRST. Completes the tokenizer triad: BPE
    (merge-rank replay), unigram-LM (Viterbi), WordPiece (greedy).

    Architecture mirrors text_bpe_train / text_unigram_lm: the ONE
    corpus-sized step is the word-histogram shuffle (map-side combine);
    inventory and matcher run over vocab-sized driver model state.
    Exact oracle: the greedy loop unrolls into WP_MAXLEN steps — each
    step equi-joins unfinished words to the piece table per candidate
    length (substr keys, hash-joinable) and keeps the longest — so the
    FULL segmentation string is hash-checked, not just piece counts.
    Emits the WP_TOP_WORDS most frequent words with piece count and
    the '##'-marked segmentation."""
    wc = [(r["w"], int(r["n"])) for r in _word_counts(spark, sf_dir).collect()]
    v12 = [(w, n) for w, n in wc if len(w) <= WP_MAXLEN]
    kept = _wp_inventory(v12)
    top = sorted(v12, key=lambda t: (-t[1], t[0]))[:WP_TOP_WORDS]
    rows = []
    for w, n in top:
        pieces = _wp_encode(w, kept)
        rows.append((w, n, len(pieces), " ".join(pieces)))
    return spark.createDataFrame(
        rows, "w string, n bigint, n_pieces int, seg string"
    )


# ---------------------------------------------------------------------------
# ml_adaboost — integer-weighted boosting over histogram stumps

ADA_ROUNDS = 3


def _ada_round_sql(t: int) -> str:
    """One unrolled boosting round over the weighted class histogram.

    c{t}: running + total class weights by feature value (the stump
          search scans #distinct-values rows, never documents).
    e{t}: weighted error of every (threshold, polarity) stump;
          polarity +1 predicts positive on x <= thr, -1 on x > thr.
    b{t}: argmin by (err, thr, polarity) — all integers, total order.
    h{t}: weight update — misclassified examples DOUBLE (the declared
          unit-alpha integer variant of discrete AdaBoost; weights stay
          exact int64, bounded by 2^rounds) — and the ensemble vote
          advances by the stump's +-1 prediction.
    a{t}: training accuracy of the vote-so-far against the ORIGINAL
          unweighted counts (vote > 0 predicts positive)."""
    p = t - 1
    return f"""
c{t} AS MATERIALIZED (
  SELECT x, sum(wp) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cwp,
         sum(wn) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cwn,
         sum(wp) OVER () AS twp, sum(wn) OVER () AS twn,
         sum(cnt) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS ccnt,
         sum(cnt) OVER () AS tcnt
  FROM h{p}
),
e{t} AS MATERIALIZED (
  SELECT x AS thr, 1 AS pol, cwn + (twp - cwp) AS err, twp + twn AS tot
  FROM c{t} WHERE ccnt < tcnt
  UNION ALL
  SELECT x AS thr, -1 AS pol, cwp + (twn - cwn) AS err, twp + twn AS tot
  FROM c{t} WHERE ccnt < tcnt
),
b{t} AS MATERIALIZED (
  SELECT thr, pol, err, tot FROM e{t} ORDER BY err, thr, pol LIMIT 1
),
h{t} AS MATERIALIZED (
  SELECT h.x, h.cnt, h.pos,
         h.wp * CASE WHEN (b.pol = 1 AND h.x > b.thr)
                       OR (b.pol = -1 AND h.x <= b.thr)
                     THEN 2 ELSE 1 END AS wp,
         h.wn * CASE WHEN (b.pol = 1 AND h.x <= b.thr)
                       OR (b.pol = -1 AND h.x > b.thr)
                     THEN 2 ELSE 1 END AS wn,
         h.vote + CASE WHEN (b.pol = 1 AND h.x <= b.thr)
                         OR (b.pol = -1 AND h.x > b.thr)
                       THEN 1 ELSE -1 END AS vote
  FROM h{p} h CROSS JOIN b{t} b
),
a{t} AS MATERIALIZED (
  SELECT SUM(CASE WHEN vote > 0 THEN pos ELSE cnt - pos END) AS correct,
         SUM(cnt) AS n
  FROM h{t}
)"""


def _ada_oracle() -> str:
    parts = [
        """
hist AS MATERIALIZED (
  SELECT n_chars AS x, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM documents WHERE n_chars IS NOT NULL GROUP BY n_chars
),
h0 AS MATERIALIZED (
  SELECT x, cnt, pos, pos AS wp, cnt - pos AS wn, CAST(0 AS BIGINT) AS vote
  FROM hist
)"""
    ] + [_ada_round_sql(t) for t in range(1, ADA_ROUNDS + 1)]
    finals = "\nUNION ALL ".join(
        f"""SELECT {t} AS round, CAST(b{t}.thr AS BIGINT) AS threshold,
       CAST(b{t}.pol AS INT) AS polarity, CAST(b{t}.err AS BIGINT) AS err_w,
       CAST(b{t}.tot AS BIGINT) AS total_w,
       floor(CAST(a{t}.correct AS DOUBLE) / a{t}.n * 1000000 + 0.5) / 1000000 AS acc
FROM b{t} CROSS JOIN a{t}"""
        for t in range(1, ADA_ROUNDS + 1)
    )
    return "WITH " + ",".join(parts) + f"\nSELECT * FROM (\n{finals}\n) ORDER BY round"


@register("ml_adaboost", oracle=_ada_oracle())
def ml_adaboost(spark, sf_dir):
    """Boosted decision stumps on the feature histogram — ml_stump
    carried to an ensemble with the AdaBoost reweighting loop in a
    DECLARED INTEGER VARIANT: unit alpha, misclassified example weights
    double each round (exact int64, bounded by 2^rounds), final
    classifier is the majority vote of the per-round stumps. Stump t
    minimizes weighted error over (threshold, polarity) with a total
    integer tie-break, so retraining is bit-identical.

    The distributed split is the histogram-GBDT contract: the corpus
    contributes ONE map-combined groupBy (feature value -> class
    counts); every boosting round then scans #distinct-values rows of
    driver model state, never documents — at 100 TB round cost is
    independent of corpus size. Emits per round: the stump, its
    weighted error over the round's total weight, and the ensemble's
    training accuracy so far (the boosting curve). Exact oracle:
    ADA_ROUNDS unrolled CTE rounds over the same histogram."""
    # a NULL feature value cannot be thresholded — excluded in BOTH
    # engines (semantic, not defensive; the null-corpus sweep's rule)
    d = table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    hist = sorted(
        (int(r["x"]), int(r["cnt"]), int(r["pos"]))
        for r in d.groupBy(F.col("n_chars").alias("x"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.when(F.col("lang") == "en", 1).otherwise(0)
            ).alias("pos"),
        )
        .collect()
    )
    xs = [x for x, _, _ in hist]
    cnt = {x: c for x, c, _ in hist}
    pos = {x: p for x, _, p in hist}
    wp = {x: pos[x] for x in xs}
    wn = {x: cnt[x] - pos[x] for x in xs}
    vote = {x: 0 for x in xs}
    n_total = sum(cnt.values())
    rows = []
    for t in range(1, ADA_ROUNDS + 1):
        if n_total == 0 or len(xs) < 2:
            break  # no splittable histogram (empty corpus)
        twp, twn = sum(wp.values()), sum(wn.values())
        best = None
        cwp = cwn = ccnt = 0
        for x in xs:
            cwp += wp[x]
            cwn += wn[x]
            ccnt += cnt[x]
            if ccnt >= n_total:
                break
            for pol, err in (
                (1, cwn + (twp - cwp)),
                (-1, cwp + (twn - cwn)),
            ):
                key = (err, x, pol)
                if best is None or key < best:
                    best = key
        err, thr, pol = best
        for x in xs:
            pred_pos = (pol == 1 and x <= thr) or (pol == -1 and x > thr)
            if pred_pos:
                wn[x] *= 2
                vote[x] += 1
            else:
                wp[x] *= 2
                vote[x] -= 1
        correct = sum(
            pos[x] if vote[x] > 0 else cnt[x] - pos[x] for x in xs
        )
        import math

        acc = math.floor(correct / n_total * 1000000 + 0.5) / 1000000
        rows.append((t, thr, pol, err, twp + twn, acc))
    return spark.createDataFrame(
        rows,
        "round int, threshold bigint, polarity int, err_w bigint, "
        "total_w bigint, acc double",
    ).orderBy("round")


# ---------------------------------------------------------------------------
# scan_vacuum — lakehouse VACUUM dry-run: segment liveness audit

_VACUUM_BASE = 3  # the checkpoint version; earlier segments are unreferenced


@register(
    "scan_vacuum",
    oracle="""
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderstatus AS st
  FROM orders
),
latest AS (
  SELECT k, CASE WHEN k % 7 = 0 THEN cents + 100 ELSE cents END AS cents, st
  FROM o WHERE k % 13 <> 0
)
SELECT CAST(0 AS INT) AS v,
       (SELECT count(*) FROM o) AS n_rows,
       (SELECT count(*) FROM o WHERE k % 7 <> 0 AND k % 13 <> 0) AS n_live,
       TRUE AS removable
UNION ALL
SELECT 1, (SELECT count(*) FROM o WHERE k % 7 = 0),
          (SELECT count(*) FROM o WHERE k % 7 = 0 AND k % 13 <> 0), TRUE
UNION ALL
SELECT 2, (SELECT count(*) FROM o WHERE k % 13 = 0), 0, TRUE
UNION ALL
SELECT 3, (SELECT count(*) FROM latest), (SELECT count(*) FROM latest), FALSE
""",
)
def scan_vacuum(spark, sf_dir):
    """VACUUM dry-run over the versioned snapshot store: stage base
    (v0) -> upserts (v1, keys %7, +100 cents) -> tombstones (v2, keys
    %13) -> CHECKPOINT (v3, the resolved snapshot rewritten as a fresh
    base), then audit every segment against the latest state. A
    segment is removable iff no retained snapshot references it — with
    retention at the checkpoint that is exactly v < base. The report
    is DATA-derived, not listing-derived: n_live counts the segment's
    rows still byte-identical to the latest state for their key (the
    left-semi join on all columns), so the grade proves the checkpoint
    lost nothing — the audit a real VACUUM runs before deleting. Note
    tombstone segments show n_live = 0 yet are only removable because
    the checkpoint subsumes them; liveness alone never justifies
    deletion (dropping v2 without v3 would resurrect v0 rows).

    100 TB: the audit is one snapshot-sized semi-join per retention
    decision; segment scans prune on the hive version partition.
    Integer cents keep row equality exact. Oracle replays the staging
    recipe relationally from orders."""
    root = scratch_dir(spark, "vacuum")
    shutil.rmtree(root, ignore_errors=True)
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
        F.col("o_orderstatus").alias("st"),
    )
    write_version(o, root, 0)
    ups = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "cents", F.col("cents") + 100
    )
    write_version(ups, root, 1)
    delete_keys(spark, o.filter(F.col("o_orderkey") % 13 == 0), root, 2)
    # Pin the v<=2 resolution BEFORE writing v3 into the same root:
    # spark.read.parquet lists files lazily enough that the checkpoint
    # write job could otherwise re-list the root mid-write and read its
    # own partial _v=3 output (the transient-FileNotFound retry shape
    # _util.py documents). localCheckpoint is the repo's idiom for
    # cutting a lineage off a directory that is about to be mutated.
    snap = read_snapshot(spark, root, ["o_orderkey"], version=2).localCheckpoint()
    write_version(snap, root, _VACUUM_BASE)

    latest = read_snapshot(
        spark, root, ["o_orderkey"], version=_VACUUM_BASE
    ).select("o_orderkey", "cents", "st")
    segs = None
    for v in range(_VACUUM_BASE + 1):
        seg = spark.read.parquet(os.path.join(root, f"_v={v}")).withColumn(
            "v", F.lit(v)
        )
        segs = seg if segs is None else segs.unionByName(seg)
    n_rows = segs.groupBy("v").agg(F.count(F.lit(1)).alias("n_rows"))
    n_live = (
        segs.filter(~F.col("_deleted"))
        .select("v", "o_orderkey", "cents", "st")
        .join(latest, ["o_orderkey", "cents", "st"], "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_live"))
    )
    return (
        n_rows.join(n_live, "v", "left")
        .select(
            F.col("v").cast("int").alias("v"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.coalesce(F.col("n_live"), F.lit(0))
            .cast("bigint")
            .alias("n_live"),
            (F.col("v") < _VACUUM_BASE).alias("removable"),
        )
        .orderBy("v")
    )


# ---------------------------------------------------------------------------
# set_except_all — bag-semantics difference (completes the set family)


@register(
    "set_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 1000
EXCEPT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL: multiset difference — each nation keeps
    max(customer_copies - supplier_copies, 0) rows, the bag semantics
    EXCEPT (DISTINCT) destroys. Spark plans this as one aggregate of
    signed counts + generator replication (no join back to the raw
    rows), the same single-shuffle shape as intersectAll."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    return c.filter(F.col("c_acctbal") > 1000).select(
        F.col("c_nationkey").alias("nationkey")
    ).exceptAll(s.select(F.col("s_nationkey").alias("nationkey")))
