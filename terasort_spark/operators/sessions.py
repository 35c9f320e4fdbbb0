"""Event-time windowing and sessionization — batch twins of the
streaming surface (SURVEY.md §2b stream_* / sessionize).

Spark's unified API: the same ``window()`` / aggregation expressions run
unchanged under Structured Streaming (see terasort_spark/streaming/),
where a watermark bounds state. The declared queries here are the batch
forms the driver can oracle-check; streaming equivalence is asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.registry import register

GAP_MIN = 30  # session gap


@register(
    "stream_tumbling",
    oracle="""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events
FROM events
GROUP BY 1, 2, 3
""",
)
def stream_tumbling(spark, sf_dir):
    # Tumbling 1h windows: window() assigns exactly one bucket per row
    # (a projection — no row expansion), then an ordinary hash agg.
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


@register(
    "stream_sliding",
    oracle="""
SELECT ws AS window_start,
       ws + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events
FROM (
  SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws,
         event_type
  FROM events
)
GROUP BY 1, 2, 3
""",
)
def stream_sliding(spark, sf_dir):
    # Sliding 1h/30m: each event belongs to size/slide = 2 windows; the
    # oracle replicates Spark's expansion explicitly with unnest.
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


@register(
    "sessionize",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_MIN} * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM sessions
GROUP BY user_id, session_id
""",
)
def sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization: a new session starts when the gap
    to the previous event of the same user exceeds 30 minutes (strict >,
    microsecond-exact). One shuffle by user_id; per-user state is a
    single running counter — linear at any scale."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(
            gap_us.isNull() | (gap_us > GAP_MIN * 60 * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(run).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


@register(
    "stream_session",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {GAP_MIN} * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {GAP_MIN} MINUTE AS session_end,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, sid
""",
)
def stream_session(spark, sf_dir):
    """session_window() in batch mode — the exact expression a streaming
    job uses (with a watermark) runs unchanged here, so this declared
    query pins its semantics against the gaps-and-islands SQL: Spark's
    session_window merges events closer than the gap (strict <, i.e. a
    gap of exactly 30:00 starts a NEW session) and reports
    end = last_ts + gap. Streaming equivalence for the same expression
    is asserted in tests/test_streaming.py."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", f"{GAP_MIN} minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "stream_dedup",
    oracle="""
SELECT event_id,
       min(user_id) AS user_id,
       min(event_type) AS event_type,
       min(ts) AS first_ts,
       count(*) AS n_deliveries
FROM (
  SELECT event_id, user_id, event_type, ts FROM events
  UNION ALL
  SELECT event_id, user_id, event_type, ts FROM events
  WHERE event_id % 3 = 0
)
GROUP BY event_id
""",
)
def stream_dedup(spark, sf_dir):
    """Batch twin of ``dropDuplicatesWithinWatermark(["event_id"])``:
    at-least-once delivery is simulated by re-appending every third
    event (a deterministic stand-in for a replayed Kafka batch), then
    exactly-once semantics are restored by keeping one row per
    event_id. The streaming form of the same dedup — watermark-bounded
    state keyed by event_id — is asserted equivalent in
    tests/test_streaming.py::test_stream_dedup_within_watermark.

    Scale note: a single hash aggregation on the dedup key, identical
    in shape to the streaming operator's state store keyed by event_id;
    partial (map-side) aggregation absorbs duplicates that land in the
    same input split before the shuffle."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    redelivered = ev.filter(F.col("event_id") % 3 == 0)
    return (
        ev.unionAll(redelivered)
        .groupBy("event_id")
        .agg(
            F.min("user_id").alias("user_id"),
            F.min("event_type").alias("event_type"),
            F.min("ts").alias("first_ts"),
            F.count(F.lit(1)).alias("n_deliveries"),
        )
    )


@register(
    "stream_join",
    oracle="""
SELECT p.event_id AS p_id,
       c.event_id AS c_id,
       CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 60000000 AS BIGINT)
           AS gap_min
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
JOIN (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
""",
)
def stream_join(spark, sf_dir):
    """Batch twin of the watermarked stream-stream interval join
    (tests/test_streaming.py::test_stream_stream_join_equals_batch):
    each purchase joins the same user's clicks in the preceding 30
    minutes. The streaming form watermarks BOTH sides so the state
    store can evict clicks older than max(event time) - delay - range;
    replayed over the at-rest table the identical join condition gives
    the identical pairs, which is what the replay test asserts.

    Scale note: the equi-key (user_id) carries the shuffle; the time
    range is a residual predicate evaluated inside each hash-join
    match, so cost is one shuffle per side — never a cartesian. The
    gap_min projection uses integer microsecond arithmetic (exact
    cross-engine, no double rounding)."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
    )
    gap_us = F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("c_ts"))
    return p.join(c, cond).select(
        "p_id",
        "c_id",
        F.floor(gap_us / F.lit(60_000_000)).cast("long").alias("gap_min"),
    )


@register(
    "stream_stateful",
    oracle="""
SELECT user_id, event_id,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_n
FROM events
""",
)
def stream_stateful(spark, sf_dir):
    """Batch twin of the applyInPandasWithState running-count operator
    (tests/test_streaming.py::test_stream_stateful_running_count): the
    stateful stream emits, per user, the event count after each
    micro-batch; replayed over the at-rest table that is the running
    count at every event, a per-user window sum. The streaming form's
    final emission per user equals this query's last row per user —
    asserted in the replay test.

    Scale note: one shuffle on user_id (exactly the stateful
    operator's state partitioning); per-user state is a single counter
    either way."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("running_n"),
    )


WM_DELAY_MIN = 10  # watermark delay (matches tests/test_streaming.py)


@register(
    "late_data",
    oracle=f"""
WITH arr AS (
  SELECT event_id, event_type, ts,
         max(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS max_prev
  FROM events
)
SELECT event_id, event_type,
       CASE WHEN max_prev IS NOT NULL
             AND ts < max_prev - INTERVAL {WM_DELAY_MIN} MINUTE
            THEN TRUE ELSE FALSE END AS is_late
FROM arr
""",
)
def late_data(spark, sf_dir):
    """Batch replay of watermark lateness: arrival order = event_id,
    watermark before event i = max(ts of earlier arrivals) - delay, and
    an event is LATE iff its ts falls below that watermark — exactly
    the row-drop rule Structured Streaming applies
    (tests/test_streaming.py::test_late_data_dropped_after_watermark
    asserts the streaming side).

    The global prefix-max is computed with the TWO-PASS pattern (the
    same mechanism as terasort's total order), not a single-partition
    window: bucket by arrival-key range, per-bucket running max, then
    one bounded collect of per-bucket maxima (<= one TIMESTAMP per
    bucket — model-state-sized, independent of data volume) broadcast
    back as each bucket's carry-in. No task ever sees more than its
    own bucket. The bucket id is a PURE FUNCTION of the key (id-span
    chunks from one min/max agg), not repartitionByRange — sampled
    range boundaries can differ between the window branch and the
    maxima branch of the same query, silently misaligning the carry."""
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    if lo is None:  # empty stream → nothing can be late, not a crash
        return spark.createDataFrame(
            [], "event_id bigint, event_type string, is_late boolean"
        )
    n_buckets = 32
    chunk = max(1, (hi - lo) // n_buckets + 1)
    parts = ev.withColumn(
        "pid", ((F.col("event_id") - F.lit(lo)) / F.lit(chunk)).cast("int")
    )
    w_in = (
        Window.partitionBy("pid")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parts.withColumn("local_prev_max", F.max("ts").over(w_in))
    # one row per partition -> prefix max over earlier partitions
    # (range partitions are ordered by event_id, so pid order IS
    # arrival order across partitions)
    maxima = sorted(
        (r["pid"], r["pmax"])
        for r in parts.groupBy("pid").agg(F.max("ts").alias("pmax")).collect()
    )
    prefix, best = [], None
    for pid, pmax in maxima:
        prefix.append((pid, best))
        best = pmax if best is None or pmax > best else best
    carry = spark.createDataFrame(
        prefix, "pid int, carry_max timestamp"
    )
    glob_prev = F.greatest("local_prev_max", "carry_max")
    wm = glob_prev - F.expr(f"INTERVAL {WM_DELAY_MIN} MINUTES")
    return (
        local.join(F.broadcast(carry), "pid", "left")
        .select(
            "event_id",
            "event_type",
            F.when(F.col("ts") < wm, F.lit(True))
            .otherwise(F.lit(False))
            .alias("is_late"),
        )
    )


@register(
    "stream_topk",
    oracle="""
SELECT window_start, user_id, n_events, rn
FROM (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
         user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(row_number() OVER (
             PARTITION BY time_bucket(INTERVAL 1 HOUR, ts)
             ORDER BY count(*) DESC, user_id) AS INTEGER) AS rn
  FROM events
  GROUP BY 1, 2
)
WHERE rn <= 3
""",
)
def stream_topk(spark, sf_dir):
    """Windowed leaderboard: top-3 most active users per tumbling hour —
    the canonical streaming top-k. The batch twin here is ALSO the
    production serving recipe: Structured Streaming maintains only the
    per-(window, user) counts (mergeable state, bounded by active keys
    per window), and the rank runs OVER THE AGGREGATED SINK — ranking
    inside the stream is unsupported and unnecessary, since the sink is
    windows×users-sized, not event-sized. The replay test
    (tests/test_streaming.py::test_stream_topk_equals_batch) proves the
    streamed counts + batch rank reproduce this query exactly. The rank
    window partitions by window_start — bounded state per task."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    rank_w = Window.partitionBy("w").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        counts.withColumn("rn", F.row_number().over(rank_w).cast("integer"))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
            "rn",
        )
    )
