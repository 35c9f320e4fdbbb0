"""Persisted ANN index layout (north-star extension): embeddings
written hive-partitioned BY IVF BUCKET, so a nearest-neighbor probe
reads only the matching partition directories — the disk layout that
makes similarity search over a 100 TB embedding corpus a pruned scan
instead of a full pass.

Shares the exact integer-hyperplane quantizer with sim_cosine_ivf
(llm_similarity.ivf_bucket / _ivf_proj_sql), so the whole
build → write → prune → re-rank pipeline replays in DuckDB.
"""

from __future__ import annotations

import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import o_rnd, rnd, scratch_dir
from terasort_spark.operators.llm_similarity import (
    _COSINE_SQL,
    _ivf_proj_sql,
    ivf_bucket,
)
from terasort_spark.registry import register


@register(
    "sink_ann_index",
    oracle=f"""
WITH xu AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
),
b AS MATERIALIZED (
  SELECT vec_id, embedding,
         (CASE WHEN {_ivf_proj_sql(0)} > 0 THEN 1 ELSE 0 END)
       + (CASE WHEN {_ivf_proj_sql(1)} > 0 THEN 2 ELSE 0 END)
       + (CASE WHEN {_ivf_proj_sql(2)} > 0 THEN 4 ELSE 0 END)
       + (CASE WHEN {_ivf_proj_sql(3)} > 0 THEN 8 ELSE 0 END) AS bucket
  FROM xu
)
SELECT q_id, c_id, cosine, rn
FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         {o_rnd(_COSINE_SQL, "cosine")},
         CAST(row_number() OVER (
              PARTITION BY q.vec_id
              ORDER BY {o_rnd(_COSINE_SQL)} DESC, c.vec_id) AS INTEGER) AS rn
  FROM (SELECT vec_id, embedding, bucket FROM b WHERE vec_id < 5) q
  JOIN b c ON c.bucket = q.bucket AND c.vec_id != q.vec_id
)
WHERE rn <= 3
""",
)
def sink_ann_index(spark, sf_dir):
    """Build a persisted IVF index (embeddings hive-partitioned by
    coarse-quantizer bucket), then answer 5 probes by joining the
    broadcast query frame against the index ON THE PARTITION COLUMN and
    exact-re-ranking cosine top-3 inside the matching buckets.

    The join key IS the directory key, so Spark's dynamic partition
    pruning (or a static IN-filter from the planner) restricts the
    index scan to the probed buckets' directories — at 100 TB the probe
    reads |probed buckets| / 16 of the corpus from disk, and wider
    quantizers (256/4096 lists) shrink that fraction without changing
    the plan shape. The write is one shuffle-free pass (partitionBy on
    a computed column); probes are a broadcast join + per-bucket
    window top-k, never an all-pairs scan. Recall measurement for this
    quantizer lives in tests/test_llm.py (sim_cosine_ivf shares it).

    The returned answer is layout-independent (same rows as an
    unpartitioned bucketed join — the oracle), making this a
    sink-fidelity check too: doubles must round-trip the parquet write
    bit-exactly."""
    out = scratch_dir(spark, "ann_index")
    shutil.rmtree(out, ignore_errors=True)
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    xu = F.transform(
        F.col("emb"), lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("long")
    )
    eb = e.withColumn("bucket", ivf_bucket(xu))
    eb.write.mode("overwrite").partitionBy("bucket").parquet(out)

    # explicit schema: an all-empty corpus writes no partition
    # directories, and the re-read must still resolve (sink_parquet
    # empty-input convention). Partition inference would also widen
    # bucket to int anyway; pinning it keeps the probe join key typed.
    idx = spark.read.schema(eb.schema).parquet(out).select(
        F.col("vec_id").alias("c_id"), F.col("emb").alias("c_emb"), "bucket"
    )
    q = F.broadcast(
        eb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"), "bucket"
        )
    )

    from terasort_spark.operators.llm_similarity import dot_fold as dot

    cosine = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.sqrt(dot(F.col("q_emb"), F.col("q_emb")))
        * F.sqrt(dot(F.col("c_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        idx.join(q, "bucket")
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("cosine", rnd(cosine))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "c_id", "cosine", "rn")
    )
