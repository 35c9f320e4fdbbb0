"""Empirical scaling study (SCALE.md §"Measured scaling").

The graded corpus tops out at sf0.1; this script manufactures 2x/5x/10x
scale-ups of the four tables the LLM-pipeline operators read (documents,
embeddings, events, lineitem) and measures how each operator family's
wall-clock actually grows — the local proxy for "would this survive
100x?". Copies are id-offset so keys stay unique; each document copy is
prefixed with a copy token so exact-dedup keeps copies distinct while
cross-copy Jaccard similarity stays ~1 (near-dup clusters grow K-fold —
the WORST case for LSH bucketing, which is the point: the per-doc
candidate cap must keep dedup_minhash near-linear even as every bucket
gets K times hotter).

terasort is scaled directly through teragen's row count (1M -> 10M
100-byte records = ~1 GB sorted at 10x).

Output: one JSON line per (query, K) to stdout + a markdown table with
the fitted scaling exponent alpha where t(K) ~ K^alpha (alpha <= ~1.1
is linear; the study fails loudly if any measured operator goes
super-linear past 1.5). Run:  python scripts/scaleup_study.py
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from terasort_spark.registry import queries  # noqa: E402
from terasort_spark.session import get_spark  # noqa: E402
from terasort_spark.sources.teragen import teragen, terasort  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join("/tmp", "terasort_spark_scaleup")
# Override for spot checks, e.g. SCALEUP_SCALES=1,20 for a 20x point.
SCALES = tuple(
    int(s) for s in os.environ.get("SCALEUP_SCALES", "1,2,5,10").split(",")
)
REPS = int(os.environ.get("SCALEUP_REPS", "2"))  # after one discarded warm-up

# query name -> tables it needs materialized at scale
MEASURED = {
    "dedup_exact": ("documents",),
    "dedup_minhash": ("documents",),
    "dedup_simhash": ("documents",),
    "text_quality": ("documents",),
    "text_langid": ("documents",),
    "sim_cosine_topk": ("embeddings",),
    "sim_cosine_gemm": ("embeddings",),
    "sim_cosine_ivf": ("embeddings",),
    "sessionize": ("events",),
    "agg_group": ("lineitem",),
    "text_bm25": ("documents",),
    "text_bpe_train": ("documents",),
    "sample_weighted": ("documents",),
    "events_sequence_match": ("events",),
    # round-5 wave (added r6, VERDICT task 4)
    "text_ccnet_bucket": ("documents",),
    "text_bigram_lm": ("documents",),
    "dedup_soft": ("documents",),
    "sample_temperature": ("documents",),
    "agg_weighted_percentile": ("documents",),
    "agg_entropy": ("documents",),
    "ml_kfold": ("documents",),
    # sim_join_autoplan: input is bounded by doc_id < SIM_JOIN_DOC_BOUND
    # by declared design (the synthetic corpus's qualifying OUTPUT grows
    # near-quadratically — see plans/similarity_rewrite.py), so its α
    # here measures strategy/plan overhead at fixed input, not corpus
    # scaling; the unbounded scale path is dedup_minhash above.
    "sim_join_autoplan": ("documents",),
    "sink_merge": ("orders",),
    "scan_timetravel": ("orders",),
    # round-6 wave (added r6)
    "text_boilerplate": ("documents",),
    "text_keywords": ("documents",),
    "text_readability": ("documents",),
    "ml_naivebayes": ("documents",),
    "ml_stump": ("documents",),
    "dq_outliers": ("documents",),
    "sample_stratified_alloc": ("documents",),
    "events_ab_test": ("events",),
    "events_rfm": ("events",),
    "emb_kmeans": ("embeddings",),
    "win_gaps_islands": ("events",),
    "pipeline_rag_retrieval": ("documents",),
    "sink_bucketed": ("orders", "lineitem"),
    "text_novelty": ("documents",),
    "agg_gini": ("documents",),
    "ml_auc": ("documents",),
    "text_dsir_weights": ("documents",),
    "topk_skyline": ("part",),
    "ml_calibration": ("documents",),
    "dq_ks_drift": ("documents",),
    "sink_compacted": ("orders",),
    "dq_k_anonymity": ("documents",),
    # r6 exact-oracle upgrades (arithmetic changed → re-measure shape)
    "graph_pagerank": ("documents",),
    "graph_triangles": ("documents",),
    "emb_pca_power": ("embeddings",),
    "sim_cosine_pq": ("embeddings",),
    "scan_sample": ("lineitem",),
    "scan_stratified": ("documents",),
    # r6 additions: lag-autocorrelation, Benford DQ, exact count-min
    "ts_autocorr": ("events",),
    "dq_benford": ("orders",),
    "agg_heavyhitters": ("documents",),
    # r6 integrity/lifecycle wave + perceptual dedup
    "multimodal_phash": ("documents",),
    "dq_referential": (
        "lineitem", "orders", "customer", "events", "part",
        "supplier", "nation",
    ),
    "ts_seasonal": ("orders",),
    "ml_feature_hash": ("documents",),
    "source_mergeschema": ("orders",),
    "ml_confusion": ("documents",),
    "ts_cusum": ("events",),
    "sink_ann_index": ("embeddings",),
    "sample_token_budget": ("documents",),
    "join_asof_tolerance": ("events",),
    "multimodal_phash_hamming": ("documents",),
    "text_langid_confusion": ("documents",),
    # round-7 wave (source_fixedwidth is input-independent — fixed 20k
    # generated records regardless of sf_dir — so it has no scaling row)
    "ml_mrr": ("embeddings",),
    "sample_reservoir": ("documents",),
    "multimodal_scenecut": ("documents",),
    "pipeline_preference_pairs": ("documents",),
    "mv_rewrite": ("orders",),  # refresh cost scales; the answer side is MV-sized
    "text_markup_extract": ("documents",),
    # round-8 wave
    "dedup_probabilistic": ("documents",),
    "pipeline_ivm_rewrite": ("orders",),
    "text_minhash_containment": ("documents",),
    "scan_position_delete": ("orders",),
    "dedup_fuzzy_ingest": ("documents",),
}

OFFSETS = {  # per-copy id offsets, far above any base id
    "documents": ("doc_id", 10_000_000),
    "embeddings": ("vec_id", 10_000_000),
    "events": ("event_id", 1_000_000_000),
    "lineitem": ("l_orderkey", 100_000_000),
    "orders": ("o_orderkey", 100_000_000),
    "part": ("p_partkey", 100_000_000),
    "customer": ("c_custkey", 10_000_000),
    "supplier": ("s_suppkey", 10_000_000),
    "nation": ("n_nationkey", 10_000),
}


def build_scale(spark, k: int, tables: set[str]) -> str:
    d = os.path.join(OUT, f"x{k}")
    for t in tables:
        dst = os.path.join(d, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(os.path.join(BASE, f"{t}.parquet"))
        key, off = OFFSETS[t]
        copies = []
        for i in range(k):
            c = base.withColumn(key, F.col(key) + F.lit(i * off))
            if t == "documents" and i > 0:
                # distinct bytes per copy (exact dedup must NOT collapse
                # copies) while keeping cross-copy Jaccard ~1 (near-dup
                # clusters genuinely grow K-fold)
                c = c.withColumn(
                    "text", F.concat(F.lit(f"c{i} "), F.col("text"))
                )
            if t == "events" and i > 0:
                # separate user populations per copy: sessions stay
                # per-user-sized, the partition count grows — the shape
                # a 10x event stream actually has
                c = c.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000))
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(dst)
    return d


def timed(fn, *args):
    times = []
    for rep in range(REPS + 1):
        t0 = time.perf_counter()
        fn(*args)
        dt = time.perf_counter() - t0
        if rep > 0:
            times.append(dt)
    return round(statistics.median(times), 3)


def main() -> None:
    global MEASURED
    only = os.environ.get("SCALEUP_ONLY")
    if only:  # comma-separated subset, e.g. for re-measuring one wave
        keep = {q.strip() for q in only.split(",")}
        MEASURED = {k: v for k, v in MEASURED.items() if k in keep}
    spark = get_spark(app_name="terasort-spark-scaleup")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    needed = set().union(*MEASURED.values())
    results: dict[str, dict[int, float]] = {}

    for k in SCALES:
        d = build_scale(spark, k, needed)
        for name in MEASURED:
            t = timed(lambda: qs[name](spark, d).collect())
            results.setdefault(name, {})[k] = t
            print(json.dumps({"query": name, "scale": k, "sec": t}), flush=True)
        if only:
            continue  # subset runs skip the terasort row
        # terasort scales by generated row count, not table files
        n = 1_000_000 * k
        t = timed(
            lambda: terasort(
                teragen(spark, n, n_partitions=32), n_partitions=32
            ).count()
        )
        results.setdefault("terasort_1Mx", {})[k] = t
        print(json.dumps({"query": "terasort_1Mx", "scale": k, "sec": t}), flush=True)

    # alpha is fitted between the smallest and largest measured scales,
    # so SCALEUP_SCALES=2,20 (no 1x point) still reports t~K^a over the
    # measured decade instead of crashing after the whole run.
    lo, top = min(SCALES), max(SCALES)
    hdr = " | ".join(f"{k}x" for k in SCALES)
    print(f"\n| query | {hdr} (s) | alpha (t~K^a) |")
    print("|---" * (len(SCALES) + 2) + "|")
    bad = []
    for name, row in results.items():
        alpha = (
            math.log(row[top] / row[lo]) / math.log(top / lo)
            if row[lo] > 0 and top > lo
            else 0.0
        )
        cells = " | ".join(str(row[k]) for k in SCALES)
        print(f"| {name} | {cells} | {alpha:.2f} |")
        if alpha > 1.5 and row[top] > 2.0:
            bad.append((name, round(alpha, 2)))
    if bad:
        print(f"SUPER-LINEAR: {bad}", file=sys.stderr)
        sys.exit(1)
    print("all measured operators scale with alpha <= 1.5")


if __name__ == "__main__":
    main()
