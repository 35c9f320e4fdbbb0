"""Round-9 wave: IVF-PQ composition and incremental index maintenance.
Oracle parity is driver-graded; these tests pin what the hash compare
cannot see — append-only ingest at the FILE level (no base rewrite),
ingest locality (only routed buckets gain files), and the IVF-PQ
shortlist's recall against exact brute force."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from terasort_spark.operators._util import scratch_dir
from terasort_spark.operators.ann_index import (
    _ANN_INC_SCHEMA,
    _ann_inc_build,
    _ann_inc_bucketed,
    _ann_inc_ingest,
)
from terasort_spark.registry import queries

_Q = queries()


def _snapshot(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_ann_incremental_append_never_rewrites_base_files(spark, sf_dir):
    """The whole point of the operator: after the batch ingest, every
    base file is byte-for-byte untouched (same size AND mtime), and new
    files appear ONLY under bucket directories the batch routes to —
    ingest cost is O(batch), not O(index)."""
    out = scratch_dir(spark, "ann_inc_test")
    _ann_inc_build(spark, sf_dir, out)
    before = _snapshot(out)
    assert before  # base wrote real files

    batch_buckets = {
        r["bucket"]
        for r in _ann_inc_bucketed(
            spark, sf_dir, F.col("vec_id") % 10 == 0, "batch"
        )
        .select("bucket")
        .distinct()
        .collect()
    }
    _ann_inc_ingest(spark, sf_dir, out)
    after = _snapshot(out)

    for path, sig in before.items():
        assert after.get(path) == sig, f"base file rewritten: {path}"
    new_files = set(after) - set(before)
    assert new_files  # the batch landed
    for path in new_files:
        bucket = int(path.split("bucket=")[1].split(os.sep)[0])
        assert bucket in batch_buckets, f"file in untouched bucket: {path}"


def test_ann_incremental_equals_full_rebuild(spark, sf_dir):
    """Append-maintained index content == a from-scratch full rebuild
    over base+batch (same rows, same bucket assignment) — maintenance
    is an execution strategy, never a semantics change."""
    inc = _Q["sink_ann_incremental"](spark, sf_dir)
    out2 = scratch_dir(spark, "ann_inc_rebuild")
    import shutil

    shutil.rmtree(out2, ignore_errors=True)
    full = _ann_inc_bucketed(spark, sf_dir, F.lit(True), "any").withColumn(
        "src",
        F.when(F.col("vec_id") % 10 == 0, "batch").otherwise("base"),
    )
    full.select("vec_id", "emb", "src", "bucket").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(out2)
    reb = (
        spark.read.schema(_ANN_INC_SCHEMA).parquet(out2)
        .select("vec_id", "bucket", "src")
    )
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, reb.collect())
    )


def test_ivfpq_shortlist_recall_vs_exact(spark, sf_dir):
    """IVF-PQ is lossy by design (nprobe=1 + 8-byte codes); pin its
    quality floor so a quantizer/codebook regression is visible: the
    top-1 exact SAME-BUCKET neighbor must appear in the returned top-3
    for every query (the ADC shortlist covers the probed list), and
    every returned cosine must match the exact brute-force value for
    that pair (the refine step is exact)."""
    got = _Q["sim_cosine_ivfpq"](spark, sf_dir).collect()
    assert got
    exact = {
        (r["q_id"], r["c_id"]): r["cosine"]
        for r in _Q["sim_cosine_topk"](spark, sf_dir).collect()
    }
    # refine-step exactness: any (q, c) also present in the brute-force
    # top-5 must carry the identical 4dp cosine
    for r in got:
        if (r["q_id"], r["c_id"]) in exact:
            assert r["cosine"] == exact[(r["q_id"], r["c_id"])]
    # recall floor (r9 ADVICE — the docstring promised it, now assert
    # it): brute-force the exact SAME-BUCKET top-1 per query and require
    # it among that query's returned c_ids. A codebook/LUT regression
    # that wrecks the ADC shortlist ordering fails here even though the
    # refine step would still report exact cosines for whatever survived.
    from terasort_spark.catalog import table
    from terasort_spark.operators._util import rnd
    from terasort_spark.operators.llm_similarity import dot_fold, ivf_bucket

    e = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )
    xu = F.transform(
        F.col("v"), lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("long")
    )
    eb = e.withColumn("bucket", ivf_bucket(xu))
    q = eb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    cos = dot_fold(F.col("qv"), F.col("cv")) / (
        F.sqrt(dot_fold(F.col("qv"), F.col("qv")))
        * F.sqrt(dot_fold(F.col("cv"), F.col("cv")))
    )
    pairs = (
        q.join(
            eb.select(
                F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), "bucket"
            ),
            "bucket",
        )
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("cosine", rnd(cos))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    top1 = {
        r["q_id"]: r["c_id"]
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    returned: dict = {}
    for r in got:
        returned.setdefault(r["q_id"], set()).add(r["c_id"])
    for q_id, c1 in top1.items():
        assert c1 in returned.get(q_id, set()), (
            f"query {q_id}: exact same-bucket top-1 {c1} missing from "
            f"returned {sorted(returned.get(q_id, set()))}"
        )
