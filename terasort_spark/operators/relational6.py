"""Seventh-wave operators: runtime-filter and range-join patterns that
only matter once the data no longer fits one machine, plus two
pipeline-observability queries (event-transition matrix, one-pass
column profiling). None exist in the reference (SURVEY.md §2a); all
are declared §2b-style entries with full DuckDB oracles.

Scale rationale per operator lives in each docstring; the common theme
is *move the small thing to the big thing*: a 4 KB Bloom bitmap
instead of a key shuffle, a bin id instead of an interval predicate,
one aggregation pass instead of per-column scans.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import dsum, o_dsum
from terasort_spark.registry import register

# --- join_bloom -----------------------------------------------------------

# Bloom geometry: M bits / K hashes. At the sf0.01 gate the build side
# is ~10^2-10^3 keys -> false-positive rate well under 1%; in
# production M scales with the build-side count estimate exactly as
# Spark's own InjectRuntimeFilter sizes its bloom (the internal
# bloom_filter_agg expression is not exposed to the public function
# registry in 4.1, hence this from-parts formulation).
_BLOOM_BITS = 1 << 15
_BLOOM_HASHES = 3


def bloom_prefilter(probe, probe_key: str, build, build_key: str):
    """Filter `probe` to rows whose `probe_key` MIGHT appear in
    `build.build_key`, via a distributed Bloom filter: K xxhash64
    positions per build key OR'd into 64-bit words (bounded,
    partial-aggregatable state), shipped as a one-row broadcast map,
    tested with pure codegen bit expressions. No false negatives;
    false positives bounded by the M/K geometry — callers follow with
    an exact join. The one-row cross join necessarily prints as a
    BroadcastNestedLoopJoin; it moves M/8 bytes, not data."""
    pos = [
        F.pmod(F.xxhash64(F.col(build_key), F.lit(i)), F.lit(_BLOOM_BITS))
        for i in range(_BLOOM_HASHES)
    ]
    words = (
        build.select(F.explode(F.array(*pos)).alias("pos"))
        .select(
            F.expr("pos DIV 64").alias("word_idx"),
            F.expr("CAST(pos % 64 AS INT)").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("w"))
    )
    bloom = words.agg(
        F.map_from_arrays(
            F.collect_list("word_idx"), F.collect_list("w")
        ).alias("bf")
    )
    pre = probe.crossJoin(F.broadcast(bloom))
    for i in range(_BLOOM_HASHES):
        pre = pre.withColumn(
            f"_p{i}",
            F.pmod(F.xxhash64(F.col(probe_key), F.lit(i)), F.lit(_BLOOM_BITS)),
        ).where(
            F.expr(
                f"element_at(bf, _p{i} DIV 64) IS NOT NULL AND "
                f"(shiftright(element_at(bf, _p{i} DIV 64), "
                f"CAST(_p{i} % 64 AS INT)) & 1) = 1"
            )
        )
    return pre.drop("bf", *[f"_p{i}" for i in range(_BLOOM_HASHES)])


@register(
    "join_bloom",
    oracle=f"""
SELECT o_orderstatus,
       count(*) AS n_lines,
       {o_dsum("l_extendedprice", "sum_price")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
GROUP BY o_orderstatus
""",
)
def join_bloom(spark, sf_dir):
    """Runtime Bloom-filter join: the selective build side (urgent
    high-value orders) is distilled into a Bloom bitmap that pre-filters
    the probe side BEFORE its shuffle, then an exact equi-join removes
    the Bloom's false positives — so the answer (and the oracle) is the
    plain join, while the shuffle moves only the ~matching fraction of
    lineitem.

    This is the pattern Spark's AQE InjectRuntimeFilter applies
    automatically on clusters (its `bloom_filter_agg`/`might_contain`
    expressions are internal-only in 4.1), built here from public
    building blocks, all JVM-side:
      build:  K positions per key via xxhash64(key, seed) mod M,
              OR'd into 64-bit words (`bit_or` over `shiftleft`) —
              partial-aggregatable state, bounded by M bits no matter
              how many keys;
      ship:   the <=M/64-entry (word_idx -> word) map broadcast as a
              one-row cross join (4 KB at M=2^15);
      probe:  K bit tests per row — pure codegen, no shuffle, no UDF.

    100 TB: build-side state is M bits regardless of cardinality;
    the probe filter is embedded in the scan stage, so the downstream
    join shuffles only surviving rows. False positives cost nothing
    but wasted shuffle bytes; correctness never depends on the filter."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    sel = o.where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000)
    )
    pre = bloom_prefilter(li, "l_orderkey", sel, "o_orderkey")
    return (
        pre.join(sel, pre.l_orderkey == sel.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice"), "sum_price"),
        )
    )


# --- join_range_binned ----------------------------------------------------

_BIN_DAYS = 14  # bin width == window length -> each window spans <=2 bins
_N_WINDOWS = 15
_WIN_DAYS = 14  # window = [start, start + 13]


@register(
    "join_range_binned",
    oracle=f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
    FROM orders GROUP BY 1
),
top AS (
    SELECT day,
           CAST(row_number() OVER (ORDER BY n DESC, day) AS INTEGER) AS wid
    FROM daily
),
wins AS (
    SELECT wid, day AS w_start, day + {_WIN_DAYS - 1} AS w_end
    FROM top WHERE wid <= {_N_WINDOWS}
)
SELECT wid,
       count(*) AS n_lines,
       {o_dsum("l_extendedprice", "sum_price")}
FROM lineitem
JOIN wins ON CAST(l_shipdate AS DATE) BETWEEN w_start AND w_end
GROUP BY wid
""",
)
def join_range_binned(spark, sf_dir):
    """Range join with NO equi-key (point-in-interval), made scale-safe
    by binning: both sides map time onto fixed 14-day bins — each
    window explodes into the <=2 bins it overlaps, each lineitem row
    computes its single containing bin — so Catalyst sees an ordinary
    equi-join on `bin` (hash/sort-merge, never a nested-loop) with the
    BETWEEN as a cheap residual filter. A row matching a window always
    shares a bin with it (the row's day lies inside the window, and the
    window covers that day's bin), so binning loses nothing; duplicates
    are impossible because a row has exactly one bin.

    The windows here (top-15 busiest order days, each open 14 days) are
    derived, not read, to keep the query self-contained; the global
    `row_number` window ranking them runs over the day-level aggregate,
    which is bounded by the calendar (a few thousand rows at ANY scale
    factor), not by the data — unlike the unbounded global windows the
    round-3 audit flagged.

    100 TB: without binning this predicate forces
    BroadcastNestedLoopJoin (every row x every window). With binning it
    is a shuffle-free broadcast hash join here, and stays a plain
    equi-join even when the interval side is itself huge (both sides
    just shuffle on bin). Plan-asserted nested-loop-free in
    tests/test_relational6.py."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    day0 = F.lit("1995-01-01").cast("date")

    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wins = (
        daily.withColumn(
            "wid", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("day")))
        )
        .where(F.col("wid") <= _N_WINDOWS)
        .select(
            "wid",
            F.col("day").alias("w_start"),
            F.date_add("day", _WIN_DAYS - 1).alias("w_end"),
        )
    )
    wins_binned = wins.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.datediff("w_start", day0) / _BIN_DAYS),
                F.floor(F.datediff("w_end", day0) / _BIN_DAYS),
            )
        ),
    )
    li_binned = li.withColumn(
        "bin", F.floor(F.datediff(F.to_date("l_shipdate"), day0) / _BIN_DAYS)
    )
    return (
        li_binned.join(wins_binned, "bin")
        .where(F.to_date("l_shipdate").between(F.col("w_start"), F.col("w_end")))
        .groupBy("wid")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice"), "sum_price"),
        )
    )


# --- events_transitions ---------------------------------------------------


@register(
    "events_transitions",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
""",
)
def events_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: lag(event_type) within (user_id, ts-order), then a
    global bigram count — the standard behavioural-analytics "what do
    users do next" query and the event-stream twin of text_bigram_lm.

    100 TB: one shuffle on user_id for the lag window (sessions are
    small, so no skew), one map-side-combining count over a
    |event_types|^2-bounded key space. Tie-break on event_id makes the
    lag order — and therefore the counts — deterministic."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- profile_table --------------------------------------------------------

_PROFILE_COLS = (
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "string"),
)


def _render(col, dtype):
    """Engine-portable string rendering of a min/max value: fixed 2dp
    for doubles (format_string ~ printf), explicit timestamp format —
    never a bare double/timestamp->string cast, whose shortest-repr
    rules differ between engines."""
    if dtype == "double":
        return F.format_string("%.2f", col)
    if dtype == "timestamp":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def _o_render(expr, dtype):
    if dtype == "double":
        return f"printf('%.2f', {expr})"
    if dtype == "timestamp":
        return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"
    return f"CAST({expr} AS VARCHAR)"


@register(
    "profile_table",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       {_o_render(f"min({c})", t)} AS min_s,
       {_o_render(f"max({c})", t)} AS max_s
FROM orders"""
        for c, t in _PROFILE_COLS
    ),
)
def profile_table(spark, sf_dir):
    """Table profiling: per-column null count, exact distinct count,
    and min/max (rendered portably) for every column of `orders` — the
    data-quality summary every ingestion pipeline runs before
    training-data admission. Output is 6 rows regardless of input size.

    100 TB design, two passes with bounded shuffles: (1) nulls +
    min/max for ALL columns in one distinct-free aggregation —
    map-side partials collapse to one row per partition. (2) exact
    distinct counts via unpivot-then-two-level-groupBy: stack each row
    into narrow (col_name, value) pairs, groupBy(col_name, value) —
    whose map-side combine means the exchange carries only each
    column's DISTINCT set, not the row stream — then count per column.
    The earlier single-agg multi-countDistinct form made Catalyst
    Expand every row ×(cols+1) into one fat exchange (~7× the table
    through the shuffle); this form shuffles Σ|distinct(c)| narrow
    rows. Swap stage 2 for approx_count_distinct and the whole profile
    is a single combining pass (agg_approx shows that surface)."""
    o = table(spark, sf_dir, "orders")
    aggs = []
    for c, t in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"nn_{c}"),
            _render(F.min(F.col(c)), t).alias(f"mn_{c}"),
            _render(F.max(F.col(c)), t).alias(f"mx_{c}"),
        ]
    stack_base = ", ".join(
        f"'{c}', nn_{c}, mn_{c}, mx_{c}" for c, _ in _PROFILE_COLS
    )
    base = o.agg(*aggs).selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_base})"
        " AS (col_name, n_nulls, min_s, max_s)"
    )
    stack_vals = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c, _ in _PROFILE_COLS
    )
    nd = (
        o.selectExpr(
            f"stack({len(_PROFILE_COLS)}, {stack_vals}) AS (col_name, v)"
        )
        .filter(F.col("v").isNotNull())
        .groupBy("col_name", "v")
        .agg(F.lit(1))
        .groupBy("col_name")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    # Left join + coalesce: an all-NULL (or empty-table) column has no
    # nd row, but its profile row must still appear with n_distinct=0 —
    # dropping exactly the pathological columns would defeat the profiler.
    return base.join(F.broadcast(nd), "col_name", "left").select(
        "col_name",
        "n_nulls",
        F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
        "min_s",
        "max_s",
    )


@register(
    "dq_expectations",
    oracle="""
SELECT 'orderkey_unique' AS check_name,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'custkey_not_null',
       CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 'custkey_fk_valid', CAST(count(*) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'totalprice_positive',
       CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orderdate_in_range',
       CAST(count(*) FILTER (
           WHERE o_orderdate < TIMESTAMP '1992-01-01'
              OR o_orderdate >= TIMESTAMP '1999-01-01') AS BIGINT)
FROM orders
""",
)
def dq_expectations(spark, sf_dir):
    """Data-quality expectations (the Deequ / dbt-tests shape): declared
    constraints validated in bulk, one row per check with its violation
    count — uniqueness of the key, non-null and referentially valid
    foreign key, value range, date window. The gate every ingest runs
    before data is admitted downstream.

    Scale design: the four column checks share ONE scan (conditional
    aggregates, map-side combined — adding a check adds a column, not a
    pass); the referential check is a single anti-join against the
    dimension's key column (broadcast when dimension-sized; the scan
    prunes to the key via ReadSchema). Violation counts rather than
    booleans so triage starts from the same query that gated."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    # Each SUM is coalesced to 0: on an empty table SUM is NULL while
    # the oracle's count(*) FILTER is 0, and a NULL violation count
    # would violate the repo's empty-input-safety principle.
    scan = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("orderkey_unique"),
        F.coalesce(F.sum(F.col("o_custkey").isNull().cast("bigint")), F.lit(0))
        .cast("bigint")
        .alias("custkey_not_null"),
        F.coalesce(F.sum((F.col("o_totalprice") <= 0).cast("bigint")), F.lit(0))
        .cast("bigint")
        .alias("totalprice_positive"),
        F.coalesce(
            F.sum(
                (
                    (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
                    | (
                        F.col("o_orderdate")
                        >= F.lit("1999-01-01").cast("timestamp")
                    )
                ).cast("bigint")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("orderdate_in_range"),
    )
    fk = (
        o.select("o_custkey")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custkey_fk_valid"))
    )
    wide = scan.crossJoin(F.broadcast(fk))
    names = (
        "orderkey_unique",
        "custkey_not_null",
        "custkey_fk_valid",
        "totalprice_positive",
        "orderdate_in_range",
    )
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) AS (check_name, n_violations)"
    )
