"""Round-10 wave: the Avro source (last bundled-format gap) and the
streaming LSH near-dup ingest (batch fuzzy dedup composed onto the
watermarked streaming surface).
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import scratch_dir
from terasort_spark.registry import register
from terasort_spark.sources.avro_ds import AvroDataSource, write_avro

_AVRO_SCHEMA = {
    "type": "record",
    "name": "order",
    "fields": [
        {"name": "o_orderkey", "type": ["null", "long"]},
        {"name": "o_custkey", "type": ["null", "long"]},
        {"name": "o_orderstatus", "type": ["null", "string"]},
        {"name": "o_totalprice", "type": ["null", "double"]},
        {"name": "o_orderdate", "type": ["null", "string"]},
    ],
}
_AVRO_COERCE = (int, int, str, float, str)


def _avro_write_partition(out_dir: str):
    """mapInPandas stage: each executor writes ITS partition as one
    Avro container file (deflate) and emits a 1-row manifest — the
    distributed write_tera_files pattern, no row through the driver."""

    def fn(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.avro")

        def rows():
            for pdf in batches:
                for t in pdf.itertuples(index=False):
                    # arrow->pandas hands numpy scalars (and floats for
                    # nullable ints); coerce per declared field type
                    yield tuple(
                        None if pd.isna(v) else c(v)
                        for c, v in zip(_AVRO_COERCE, t)
                    )

        n = write_avro(path, rows(), _AVRO_SCHEMA, codec="deflate",
                       block_rows=2000)
        yield pd.DataFrame({"path": [path], "n": [n]})

    return fn


@register(
    "source_avro",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
FROM orders
""",
)
def source_avro(spark, sf_dir):
    """Avro Object Container File round-trip through the pure-Python
    ``pyavro`` DataSource (sources/avro_ds.py) — closes the engine's
    last mainstream bundled-format gap (r9 VERDICT task 2; the
    spark-avro jar is absent from this distribution, so the reader is
    built from the public Avro spec like the repo's JPEG/PNG/LZW
    decoders).

    Write path: orders is repartitioned and each EXECUTOR writes its
    partition as one deflate-compressed .avro container (mapInPandas —
    the write_tera_files shape, no driver materialization; the 4-row
    manifest is the only driver state). Read path: the real DataSource
    — header/schema parse, sync-marker split planning at 16 KiB so the
    read provably fans out across MULTIPLE record-aligned splits per
    file (split-geometry invariance is property-tested in
    tests/test_wave10.py), zigzag/union/IEEE binary decoding, raw-
    DEFLATE block decompression. The exact oracle closes the loop: what
    came back from the container must hash-equal the source table, so
    encoder, compressor, split scan and decoder are all on the graded
    path. At 100 TB the same plugin streams one split per task at block
    granularity — Avro's sync-marker design exists precisely for this
    scan shape."""
    out = scratch_dir(spark, "avro_src")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
            "o_orderdate"
        ),
    )
    manifest = (
        src.repartition(4)
        .mapInPandas(_avro_write_partition(out), schema="path string, n long")
        .collect()
    )
    assert len(manifest) >= 1
    spark.dataSource.register(AvroDataSource)
    return (
        spark.read.format("pyavro")
        .option("path", out)
        .option("split_bytes", 16384)
        .load()
    )


# ---------------------------------------------------------------------------
# dedup_stream_lsh — streaming near-dup ingest (r9 VERDICT task 4): the
# watermarked streaming surface composed with the LSH fuzzy-admission
# stages, so a live crawl deduplicates each arriving micro-batch against
# STANDING state and folds its admissions back in.

_STREAM_ROUNDS = 3
_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
_BUCKET_SCHEMA = "band int, bucket bigint, e_id bigint"
_TOKS_SCHEMA = "doc_id bigint, toks array<string>"


def _stream_lsh_oracle() -> str:
    """Sequential-ingest replay: the standing corpus (doc_id % 5 == 0)
    is round-0 state; crawl round k (doc_id % 3 == k among the rest)
    dedups against everything admitted so far, then its keeps join the
    admitted set — three unrolled MATERIALIZED rounds of the exact
    dedup_fuzzy_ingest CTE chain."""
    from terasort_spark.operators.llm_dedup import (
        jaccard_sql,
        lsh_buckets_sql,
    )
    from terasort_spark.operators.wave8 import FUZZY_CAP, FUZZY_TAU

    parts = [
        lsh_buckets_sql(),
        "adm0 AS MATERIALIZED (SELECT doc_id FROM d WHERE doc_id % 5 = 0)",
    ]
    drops = []
    for k in range(_STREAM_ROUNDS):
        parts.append(
            f"bk{k} AS MATERIALIZED (SELECT doc_id FROM d "
            f"WHERE doc_id % 5 <> 0 AND doc_id % 3 = {k})"
        )
        parts.append(
            f"""g{k} AS MATERIALIZED (
  SELECT band, bucket, list_sort(list(DISTINCT b.doc_id)) AS eids
  FROM buckets b JOIN adm{k} a USING (doc_id) GROUP BY band, bucket)"""
        )
        parts.append(
            f"""c{k} AS MATERIALIZED (
  SELECT bb.doc_id AS b_id, unnest(g.eids[1:{FUZZY_CAP}]) AS e_id
  FROM buckets bb JOIN bk{k} USING (doc_id) JOIN g{k} g USING (band, bucket))"""
        )
        parts.append(
            f"""p{k} AS MATERIALIZED (
  SELECT b_id, unnest(list_sort(list(DISTINCT e_id))[1:{FUZZY_CAP}]) AS e_id
  FROM c{k} GROUP BY b_id)"""
        )
        parts.append(
            f"""dr{k} AS MATERIALIZED (
  SELECT DISTINCT p.b_id
  FROM p{k} p
  JOIN th_t ta ON ta.doc_id = p.e_id
  JOIN th_t tb ON tb.doc_id = p.b_id
  WHERE {jaccard_sql()} >= {FUZZY_TAU!r})"""
        )
        drops.append(f"SELECT b_id FROM dr{k}")
        if k < _STREAM_ROUNDS - 1:
            parts.append(
                f"""adm{k + 1} AS MATERIALIZED (
  SELECT doc_id FROM adm{k}
  UNION ALL
  SELECT b.doc_id FROM bk{k} b
  LEFT JOIN dr{k} x{k} ON x{k}.b_id = b.doc_id
  WHERE x{k}.b_id IS NULL)"""
            )
    union_drops = "\n      UNION ALL ".join(drops)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT b.doc_id, CAST(b.doc_id % 3 AS INT) AS round,
       (dr.b_id IS NULL) AS keep
FROM (SELECT doc_id FROM d WHERE doc_id % 5 <> 0) b
LEFT JOIN ({union_drops}) dr ON dr.b_id = b.doc_id
"""
    )


@register("dedup_stream_lsh", oracle=_stream_lsh_oracle())
def dedup_stream_lsh(spark, sf_dir):
    """STREAMING near-duplicate ingest — the live-crawl shape (r9
    VERDICT task 4): document batches arrive as a real file-source
    stream; each micro-batch is MinHash-LSH deduplicated against the
    STANDING admitted corpus inside foreachBatch, and its admissions
    MERGE back into that state before the next batch — so a near-dup
    of a doc admitted two crawls ago is dropped even though batch LSH
    (dedup_minhash) and streaming exact dedup (sessions.stream_dedup)
    would each miss it.

    One code path with the batch twin: signatures/bands come from
    llm_dedup.lsh_signatures_df and the capped admission rule is
    wave8.fuzzy_dropped — literally the functions dedup_fuzzy_ingest
    runs, applied per micro-batch. Arrival rounds are the exact
    function doc_id % 3 (a value-partitioned staged write, moved file
    by file into the watched directory), so the whole sequential fold
    replays relationally: the oracle unrolls the three rounds as
    MATERIALIZED CTE generations of the fuzzy-ingest chain.

    Per-batch state discipline: drops are eagerly checkpointed BEFORE
    any state append (the decision must see state as of batch start);
    decisions land in an append-only sink; admitted docs append their
    band-bucket rows and token sets. State per (band, bucket) is
    append-only here; at 100 TB a compaction keeps only the cap
    SMALLEST ids per bucket — semantics-preserving because the
    admission slice sort(S)[1:cap] depends only on those — and the
    existing side contributes signatures, never text, exactly as in
    the batch twin."""
    import os as _os

    from terasort_spark.operators.llm_dedup import lsh_signatures_df
    from terasort_spark.operators.wave8 import fuzzy_dropped

    base = scratch_dir(spark, "stream_lsh")
    shutil.rmtree(base, ignore_errors=True)
    replay = _os.path.join(base, "replay")
    ckpt = _os.path.join(base, "ckpt")
    st_b = _os.path.join(base, "state_buckets")
    st_t = _os.path.join(base, "state_toks")
    dec = _os.path.join(base, "decisions")
    staged = _os.path.join(base, "_staged")
    _os.makedirs(replay, exist_ok=True)

    docs = table(spark, sf_dir, "documents")
    # bootstrap standing state from the existing corpus
    sig0, b0 = lsh_signatures_df(
        docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    )
    b0.select("band", "bucket", F.col("doc_id").alias("e_id")).write.mode(
        "overwrite"
    ).parquet(st_b)
    sig0.select("doc_id", "toks").write.mode("overwrite").parquet(st_t)

    # stage the crawl rounds: VALUE-partitioned write (round is the
    # exact function doc_id % 3, never a sampled range), then each
    # round's files move into the watched dir when its turn comes
    (
        docs.filter(F.col("doc_id") % 5 != 0)
        .withColumn("_round", F.pmod("doc_id", F.lit(3)).cast("int"))
        .repartition(_STREAM_ROUNDS, "_round")
        .write.mode("overwrite")
        .partitionBy("_round")
        .parquet(staged)
    )

    def admit(batch_df, _batch_id):
        b = batch_df.select("doc_id", "text")
        sigb, bb = lsh_signatures_df(b)
        btb = bb.select("band", "bucket", F.col("doc_id").alias("b_id"))
        exb = spark.read.schema(_BUCKET_SCHEMA).parquet(st_b)
        e_toks = (
            spark.read.schema(_TOKS_SCHEMA)
            .parquet(st_t)
            .select(F.col("doc_id").alias("e_id"), "toks")
        )
        b_toks = sigb.select(F.col("doc_id").alias("b_id"), "toks")
        # pin the drop set against state AS OF batch start, before any
        # append below can change what the reads would return
        dropped = fuzzy_dropped(btb, exb, b_toks, e_toks).localCheckpoint(
            eager=True
        )
        drop_ids = dropped.withColumnRenamed("b_id", "doc_id")
        decisions = (
            sigb.select("doc_id")
            .join(drop_ids, "doc_id", "left_anti")
            .withColumn("keep", F.lit(True))
            .unionByName(drop_ids.withColumn("keep", F.lit(False)))
        )
        decisions.write.mode("append").parquet(dec)
        kept = sigb.select("doc_id", "toks").join(
            drop_ids, "doc_id", "left_anti"
        )
        (
            bb.join(kept.select("doc_id"), "doc_id")
            .select("band", "bucket", F.col("doc_id").alias("e_id"))
            .write.mode("append")
            .parquet(st_b)
        )
        kept.write.mode("append").parquet(st_t)

    q = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .parquet(replay)
        .writeStream.foreachBatch(admit)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        for r in range(_STREAM_ROUNDS):
            rdir = _os.path.join(staged, f"_round={r}")
            if _os.path.isdir(rdir):
                parts = sorted(
                    f for f in _os.listdir(rdir) if f.endswith(".parquet")
                )
                for j, f in enumerate(parts):
                    _os.rename(
                        _os.path.join(rdir, f),
                        _os.path.join(replay, f"data-{r}-{j}.parquet"),
                    )
            q.processAllAvailable()
    finally:
        q.stop()

    if not _os.path.isdir(dec):  # empty corpus: no batch ever landed
        return spark.createDataFrame(
            [], "doc_id bigint, round int, keep boolean"
        )
    return (
        spark.read.schema("doc_id bigint, keep boolean")
        .parquet(dec)
        .select(
            "doc_id",
            F.pmod("doc_id", F.lit(3)).cast("int").alias("round"),
            "keep",
        )
    )
