"""Sessionization / wide-aggregation scale probe (round 10): decade
evidence for the engine's OTHER big-shuffle shape. The terasort probes
cover the range-exchange sort; this probe covers the hash-exchange +
per-key window pipeline every log-analytics and crawl-curation job
runs: sessionize (shuffle on user, window sort, gap rule) and a
high-cardinality groupBy (partial-agg evidence), at decades up to tens
of GB of generated events.

Methodology (same discipline as tera_scale_probe.py): events are
generated deterministically in-executor from row ids (xxhash64 streams
— no input scan, no sink), so the measured cost is exactly the
shuffle + window/aggregate work. Logical row width is 24 bytes
(3 int64 columns). Correctness at scale is CHECKED, not assumed:

  (a) plain sessionize vs the TWO-PHASE bucketed rewrite (sessionize
      within hour buckets, then merge sessions across bucket
      boundaries on the per-user bucket summaries) must produce an
      identical per-user (user, n_sessions, n_events) multiset —
      compared by order-insensitive xxhash64-sum checksum. The rewrite
      is the scale fix for hot users: a user's window state shrinks
      from all-events to events-per-bucket, and the merge pass runs
      over bucket summaries (<= span/bucket rows per user).
  (b) row conservation: sum(n_events) == n on both paths.
  (c) the groupBy workload re-aggregates its own output into a
      checksum, so a lost/duplicated group would show.

Key-mode dial mirrors the sort probe: ``uniform`` hashes users evenly
(~50 events/user at every decade); ``hot`` routes ~10% of ALL events
to one user — the straggler a viral page or bot produces — so the
plain window's single-task sort and the bucketed rewrite's fix are
both measured (hot_user_share, straggler seconds) rather than
asserted.

Run:  python scripts/agg_scale_probe.py [n_rows] [mode]
      mode in {uniform (default), hot}
      AGG_PROBE_ONLY=plain|bucketed|groupby runs ONE workload in its
      own JVM (shuffle dirs are freed on exit — required above ~10 GB
      where two workloads' live shuffle files exceed the sandbox disk;
      the emitted per-workload checksums are deterministic, so
      plain-vs-bucketed equality is still checkable ACROSS runs).
      AGG_PROBE_HOT_FRAC=K routes 1/K of all events to the hot user
      (default 10; 2 = a 50%-hot adversary).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from terasort_spark.session import get_spark  # noqa: E402

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
MODE = sys.argv[2] if len(sys.argv) > 2 else "uniform"
assert MODE in ("uniform", "hot"), MODE

GAP = 1800  # session gap, seconds
SPAN = 30 * 86400  # event timestamps span 30 days
BUCKET = 3600  # two-phase rewrite bucket: one hour
ROW_BYTES = 24  # 3 int64 logical columns
HOT_FRAC = int(os.environ.get("AGG_PROBE_HOT_FRAC", "10"))  # hot mode: 1/HOT_FRAC of events on one user


def events(spark, n: int):
    """Deterministic event stream from row ids: (user, ts, val)."""
    n_users = max(n // 50, 1)
    base = F.xxhash64(F.col("id"))
    user = F.pmod(base, F.lit(n_users))
    if MODE == "hot":
        user = F.when(
            F.pmod(F.xxhash64(F.col("id"), F.lit(9)), F.lit(HOT_FRAC)) < 1,
            F.lit(0),
        ).otherwise(user)
    return spark.range(n).select(
        user.alias("user"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(SPAN)).alias("ts"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1000)).alias("val"),
    )


def _cs_and_events(df, *cols):
    """ONE pass over a per-user result: order-insensitive checksum
    (sum of row hashes) + total event count for row conservation."""
    row = df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("s"),
        F.sum("n_events").alias("ne"),
        F.max("n_events").alias("mx"),
    ).collect()[0]
    return int(row["s"]), int(row["ne"]), int(row["mx"])


def sessionize_plain(ev):
    w = Window.partitionBy("user").orderBy("ts")
    gap = F.col("ts") - F.lag("ts").over(w)
    brk = (gap.isNull() | (gap > GAP)).cast("long")
    return (
        ev.withColumn("brk", brk)
        .groupBy("user")
        .agg(
            F.sum("brk").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def sessionize_bucketed(ev):
    """Two-phase rewrite: hour-bucket windows, then boundary merge over
    per-(user, bucket) summaries. Identical output to the plain form —
    a full-stream break is either a within-bucket break or a boundary
    whose cross-bucket gap exceeds GAP (buckets partition time
    monotonically, so no other case exists)."""
    b = ev.withColumn("bucket", F.floor(F.col("ts") / BUCKET))
    wb = Window.partitionBy("user", "bucket").orderBy("ts")
    gap = F.col("ts") - F.lag("ts").over(wb)
    brk = (gap.isNull() | (gap > GAP)).cast("long")
    bsum = (
        b.withColumn("brk", brk)
        .groupBy("user", "bucket")
        .agg(
            F.sum("brk").alias("s"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("ne"),
        )
    )
    wu = Window.partitionBy("user").orderBy("bucket")
    merged = bsum.withColumn(
        "merge",
        (
            F.lag("last_ts").over(wu).isNotNull()
            & (F.col("first_ts") - F.lag("last_ts").over(wu) <= GAP)
        ).cast("long"),
    )
    return merged.groupBy("user").agg(
        (F.sum("s") - F.sum("merge")).alias("n_sessions"),
        F.sum("ne").alias("n_events"),
    )


def main() -> None:
    spark = get_spark(app_name="agg-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    only = os.environ.get("AGG_PROBE_ONLY")  # plain | bucketed | groupby
    gb = N_ROWS * ROW_BYTES / 1e9
    out = {"mode": MODE, "n_rows": N_ROWS, "bytes": N_ROWS * ROW_BYTES}
    preserved, cs1, cs2 = True, None, None

    # workload A1: plain sessionize (the straggler-prone baseline)
    if only in (None, "plain"):
        t0 = time.time()
        a1 = sessionize_plain(events(spark, N_ROWS))
        cs1, ev1, mx1 = _cs_and_events(a1, "user", "n_sessions", "n_events")
        t_plain = time.time() - t0
        preserved = preserved and ev1 == N_ROWS
        out["sessionize_plain_sec"] = round(t_plain, 1)
        out["mb_per_sec_plain"] = round(gb * 1000 / t_plain, 1)
        out["plain_checksum"] = str(cs1)
        if MODE == "hot":
            # the hot user is the max-events user — no extra pass
            out["hot_user_share"] = round(mx1 / N_ROWS, 4)

    # workload A2: two-phase bucketed rewrite (the scale fix)
    if only in (None, "bucketed"):
        t1 = time.time()
        a2 = sessionize_bucketed(events(spark, N_ROWS))
        cs2, ev2, _ = _cs_and_events(a2, "user", "n_sessions", "n_events")
        t_bucketed = time.time() - t1
        preserved = preserved and ev2 == N_ROWS
        out["sessionize_bucketed_sec"] = round(t_bucketed, 1)
        out["mb_per_sec_bucketed"] = round(gb * 1000 / t_bucketed, 1)
        out["bucketed_checksum"] = str(cs2)

    # workload B: high-cardinality groupBy (partial-agg evidence) —
    # ~n/10 groups, count+sum, re-aggregated into one checksum
    if only in (None, "groupby"):
        t2 = time.time()
        g = (
            events(spark, N_ROWS)
            .groupBy(
                F.pmod(
                    F.xxhash64("user", "val"), F.lit(max(N_ROWS // 10, 1))
                ).alias("k")
            )
            .agg(F.count(F.lit(1)).alias("c"), F.sum("val").alias("sv"))
        )
        row = g.select(
            F.sum(F.xxhash64("k", "c", "sv").cast("decimal(38,0)")).alias("s"),
            F.sum("c").alias("n"),
        ).collect()[0]
        t_group = time.time() - t2
        preserved = preserved and int(row["n"]) == N_ROWS
        out["groupby_sec"] = round(t_group, 1)
        out["mb_per_sec_groupby"] = round(gb * 1000 / t_group, 1)

    out["rows_preserved"] = preserved
    ok = preserved
    if cs1 is not None and cs2 is not None:
        out["plain_vs_bucketed_match"] = cs1 == cs2
        ok = ok and cs1 == cs2
    out["ok"] = ok
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
