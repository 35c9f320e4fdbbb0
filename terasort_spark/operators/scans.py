"""Scan / source / sink operators (SURVEY.md §2b).

Reference parity: the reference's only source/sink is the fixed-width
TeraGen record format (see ``terasort_spark/sources/teragen.py``); the
general engine reads columnar parquet so Catalyst can push filters and
prune columns into the scan itself — verified by plan assertions in
``tests/test_plans.py`` (PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import dsum, o_dsum, scratch_dir
from terasort_spark.registry import register

_O_DSUM_REVENUE = o_dsum("l_extendedprice*(1-l_discount)", "revenue")


@register("scan_full", oracle="SELECT * FROM nation")
def scan_full(spark, sf_dir):
    return table(spark, sf_dir, "nation")


@register(
    "scan_project",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
)
def scan_project(spark, sf_dir):
    # Column pruning: ReadSchema must contain exactly these three columns —
    # at 100 TB this is the difference between scanning 3 columns and 11.
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "scan_pushdown",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-03-31'
  AND l_quantity > 45
""",
)
def scan_pushdown(spark, sf_dir):
    # Predicate pushdown: both conjuncts reach the parquet reader
    # (row-group statistics skip non-matching groups before decode).
    return (
        table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate").between(
                F.lit("1997-01-01").cast("timestamp"),
                F.lit("1997-03-31").cast("timestamp"),
            )
            & (F.col("l_quantity") > 45)
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    )


@register(
    "source_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS props_k
FROM events
""",
)
def source_json(spark, sf_dir):
    # JSON-in-string → typed column, JVM-side (from_json, no Python UDF).
    return (
        table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.from_json(F.col("props"), "k INT").getField("k").alias("props_k"),
        )
    )


@register(
    "sink_parquet",
    # round-trip identity oracle: partitioned write + re-read must
    # reproduce orders exactly (partition column type/order restored)
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderdate, o_orderpriority
FROM orders
""",
)
def sink_parquet(spark, sf_dir):
    """Write + re-read round-trip. Scale note: output is partitioned by a
    low-cardinality column — the layout a 100 TB pipeline would use for
    partition pruning on later reads."""
    out = scratch_dir(spark, "sink_parquet")
    shutil.rmtree(out, ignore_errors=True)
    src = table(spark, sf_dir, "orders")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    # explicit schema: the writer knows it, and an all-empty (or
    # empty-partition) output directory then still reads back cleanly
    df = spark.read.schema(src.schema).parquet(out)
    # partitionBy reads the partition column back as string; restore type
    # and original column order for a stable schema.
    return df.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderstatus").cast("string").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


@register(
    "sink_partitioned_pruned",
    oracle="SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'",
)
def sink_partitioned_pruned(spark, sf_dir):
    """Partitioned sink + partition-pruned re-read, oracle-checked: write
    documents hive-partitioned by lang, then read back ONE partition.
    The filter is satisfied by directory listing alone (PartitionFilters
    in the scan, zero data files from other langs opened) — the layout
    that makes a 100 TB corpus cheap to slice by a low-cardinality key.
    Values must round-trip bit-exactly through the write, so this is a
    sink-fidelity check too (vs sink_parquet's weaker rows-only)."""
    out = scratch_dir(spark, "sink_part")
    shutil.rmtree(out, ignore_errors=True)
    src = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    src.write.mode("overwrite").partitionBy("lang").parquet(out)
    return (
        spark.read.schema(src.schema).parquet(out)
        .filter(F.col("lang") == "en")
        .select("doc_id", F.col("lang").cast("string").alias("lang"), "n_chars")
    )


@register(
    "scan_provenance",
    # positions are computed over the FULL per-lang file, then filtered —
    # row_index is physical, so the doc_id<100 cut happens in the outer
    # query exactly like the Spark-side post-scan filter
    oracle="""
SELECT doc_id, src_part, src_row FROM (
  SELECT doc_id, lang AS src_part,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1
              AS BIGINT) AS src_row
  FROM documents
)
WHERE doc_id < 100
""",
)
def scan_provenance(spark, sf_dir):
    """Row-level lineage from the hidden _metadata column of file
    sources: which physical source object (and physical row position
    inside it) produced each row. At 100 TB this is how a pipeline
    traces a bad record back to its source object without any
    bookkeeping columns in the data.

    Upgraded rows-only → exact oracle in r9: lineage over raw corpus
    paths is environment-specific, so the operator writes its own
    deterministic layout — repartition(lang) + sortWithinPartitions
    (lang, doc_id) + partitionBy(lang) yields exactly one file per lang
    whose physical row order is doc_id order — then reads it back and
    relativizes _metadata.file_path to the partition directory and
    _metadata.row_index to the in-file position. Both are then exactly
    replayable relationally: src_part = lang, src_row = rank of doc_id
    within lang. The same _metadata relativization trick as
    scan_position_delete (wave8.py)."""
    out = scratch_dir(spark, "provenance")
    shutil.rmtree(out, ignore_errors=True)
    src = table(spark, sf_dir, "documents").select("doc_id", "lang")
    (
        src.repartition("lang")
        .sortWithinPartitions("lang", "doc_id")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out)
    )
    back = spark.read.schema("doc_id bigint, lang string").parquet(out)
    return (
        back.select(
            "doc_id",
            # partition directory, relativized: the lineage key a 100 TB
            # pipeline stores (object identity, never absolute paths)
            F.regexp_extract(F.col("_metadata.file_path"), "lang=([^/]+)/", 1).alias(
                "src_part"
            ),
            F.col("_metadata.row_index").alias("src_row"),
        )
        .filter(F.col("doc_id") < 100)
    )


@register(
    "source_json_dirty",
    oracle="""
SELECT event_type,
       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_corrupt
FROM (
  SELECT event_type,
         json_valid(CASE WHEN event_id % 7 = 0
                         THEN substr(props, 1, length(props) - 1)
                         ELSE props END) AS ok
  FROM events
)
GROUP BY event_type
""",
)
def source_json_dirty(spark, sf_dir):
    """Dirty-data tolerance: a corpus where ~1/7 of the JSON payloads
    are malformed (simulated by truncating the closing brace — the one
    corruption class Spark's lenient Jackson parser and DuckDB's
    json_valid agree on; trailing garbage and trailing commas are each
    accepted by exactly one engine) must parse
    without failing the job — from_json's PERMISSIVE default yields a
    struct whose fields are all NULL for bad rows (the struct itself is
    non-null), so corruption is detected through a required field
    (every valid payload carries ``k``; FIXTURES.md) and counted per
    event type.
    At 100 TB you quarantine by routing the n_corrupt rows to a
    dead-letter sink instead of counting them; the detection predicate
    is the same."""
    ev = table(spark, sf_dir, "events")
    mangled = F.when(
        F.col("event_id") % 7 == 0,
        F.substring(F.col("props"), 1, F.length("props") - 1),
    ).otherwise(F.col("props"))
    parsed = F.from_json(mangled, "k INT, cat STRING")
    return (
        ev.select("event_type", parsed.getField("k").isNotNull().alias("ok"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_valid"),
            F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("n_corrupt"),
        )
    )


@register(
    "sink_bucketed",
    oracle=f"""
SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_items,
       {_O_DSUM_REVENUE}
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey
""",
)
def sink_bucketed(spark, sf_dir):
    """Pre-bucketed table layout: write orders AND lineitem bucketed +
    sorted by their join key into the warehouse, re-read both, and run
    the fact-fact join + per-key aggregation ENTIRELY shuffle-free —
    the sort-merge join consumes co-located pre-sorted buckets and the
    groupBy on the same key reuses the bucket partitioning, so the
    physical plan contains ZERO Exchange (asserted in
    tests/test_plans.py). At 100 TB this is the layout that turns every
    repeated join on the table's primary key into a scan-only
    operation — bucketing cost is paid once at write time. The oracle
    is the plain join: the layout must not change a single answer."""
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # table names carry the applicationId (same isolation as
    # _util.scratch_dir): two processes sharing a warehouse dir would
    # otherwise rmtree each other's buckets mid-read
    app = "".join(
        c if c.isalnum() else "_" for c in spark.sparkContext.applicationId
    )
    t_o = f"sink_bucketed_orders_{app}"
    t_li = f"sink_bucketed_lineitem_{app}"
    spark.sql(f"DROP TABLE IF EXISTS {t_o}")
    spark.sql(f"DROP TABLE IF EXISTS {t_li}")
    # a previous SESSION's table may survive as an orphaned warehouse
    # directory the new catalog doesn't know about — clear the location
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for t in (t_o, t_li):
        shutil.rmtree(
            os.path.join(wh.removeprefix("file:"), t), ignore_errors=True
        )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(t_o)
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(t_li)
    )
    ob = spark.table(t_o)
    lb = spark.table(t_li)
    # merge hint: the broadcast path would be chosen at this size, but
    # the POINT is the shuffle-free sort-merge over buckets
    j = ob.hint("merge").join(lb, ob.o_orderkey == lb.l_orderkey)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        dsum(revenue, "revenue"),
    )


@register(
    "scan_rowgroup_stats",
    oracle="""
SELECT 'doc_id' AS col_name,
       CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls,
       CAST(min(doc_id) AS BIGINT) AS min_val,
       CAST(max(doc_id) AS BIGINT) AS max_val
FROM documents
UNION ALL
SELECT 'n_chars', CAST(count(*) - count(n_chars) AS BIGINT),
       CAST(min(n_chars) AS BIGINT), CAST(max(n_chars) AS BIGINT)
FROM documents
""",
)
def scan_rowgroup_stats(spark, sf_dir):
    """Metadata-only statistics query: answer per-column null_count /
    min / max for the documents table from PARQUET FOOTER row-group
    statistics alone — zero data pages read, zero Spark jobs. The
    oracle recomputes the same numbers by scanning the data, so a hash
    match PROVES the footer stats are faithful — the property every
    data-skipping decision (min/max pruning, scan_zorder) silently
    relies on. At 100 TB this is the difference between a catalog
    lookup and a full scan for COUNT/MIN/MAX-shaped queries.

    Scale: driver-side O(#row-groups) footer reads (a real engine
    caches these in the catalog); the result is 2 rows."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    files = []
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            files += [
                os.path.join(root, n) for n in names if n.endswith(".parquet")
            ]
    else:
        files = [path]
    agg: dict[str, list] = {}  # col -> [nulls, min, max]
    for fp in sorted(files):
        md = pq.ParquetFile(fp).metadata
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                c = rg.column(i)
                if c.path_in_schema not in ("doc_id", "n_chars"):
                    continue
                st = c.statistics
                # Fail LOUDLY when a writer omitted statistics for a
                # targeted column — silently skipping would return wrong
                # min/max/null counts while claiming footer fidelity (r6
                # ADVICE). A production engine would fall back to a data
                # scan; here the contract is "footers are faithful".
                # Exception: an ALL-NULL row group legitimately has
                # null_count but no min/max — the metadata answer is
                # still exact (nothing to fold into min/max).
                if st is None or st.null_count is None:
                    raise ValueError(
                        f"{fp} row-group {g}: column "
                        f"{c.path_in_schema!r} lacks parquet statistics "
                        "(null_count) — metadata-only answer would be "
                        "wrong; rewrite the file or scan data"
                    )
                all_null = st.null_count == rg.num_rows
                if not st.has_min_max and not all_null:
                    raise ValueError(
                        f"{fp} row-group {g}: column "
                        f"{c.path_in_schema!r} has non-null values but "
                        "no min/max statistics — metadata-only answer "
                        "would be wrong; rewrite the file or scan data"
                    )
                cur = agg.setdefault(c.path_in_schema, [0, None, None])
                cur[0] += st.null_count
                if st.has_min_max:
                    cur[1] = st.min if cur[1] is None else min(cur[1], st.min)
                    cur[2] = st.max if cur[2] is None else max(cur[2], st.max)
    rows = [
        (name, int(v[0]), v[1], v[2])
        for name, v in sorted(agg.items())
    ]
    return spark.createDataFrame(
        rows, "col_name string, n_nulls bigint, min_val bigint, max_val bigint"
    )


_COMPACT_TARGET_BYTES = 1 << 20  # 1 MiB target output files


@register(
    "sink_compacted",
    # identity oracle: compaction must not change a single row
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
)
def sink_compacted(spark, sf_dir):
    """Small-file compaction: simulate an ingest that produced 64 tiny
    parquet files (every streaming/CDC sink does this), then rewrite
    them into size-targeted files — target count = ceil(on-disk bytes /
    1 MiB) from the actual directory listing, so the plan adapts to the
    data instead of hardcoding a file count. The declared result is the
    compacted table re-read: the oracle proves compaction is purely a
    LAYOUT operation (zero row changes). File-count assertions live in
    tests/test_wave6.py.

    This is the file-size axis of compaction; sources/snapshots.py
    compact() is the orthogonal version axis (rewriting delta chains to
    a fresh base). At 100 TB the small-file problem is an availability
    risk, not a tuning nit: a million 100 KB files turn scan planning
    and NameNode/listing into the bottleneck — periodic size-targeted
    rewrite is the standard operational fix (OPTIMIZE in table
    formats). One round-robin shuffle, no skew (keys never matter)."""
    small_dir = scratch_dir(spark, "smallfiles")
    big_dir = scratch_dir(spark, "compacted")
    shutil.rmtree(small_dir, ignore_errors=True)
    shutil.rmtree(big_dir, ignore_errors=True)
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    src.repartition(64).write.mode("overwrite").parquet(small_dir)
    on_disk = sum(
        os.path.getsize(os.path.join(small_dir, f))
        for f in os.listdir(small_dir)
        if f.endswith(".parquet")
    )
    target = max(1, -(-on_disk // _COMPACT_TARGET_BYTES))  # ceil div
    small = spark.read.schema(src.schema).parquet(small_dir)
    small.repartition(target).write.mode("overwrite").parquet(big_dir)
    return spark.read.schema(src.schema).parquet(big_dir)
