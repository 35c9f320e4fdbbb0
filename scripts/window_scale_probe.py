"""Per-user lead-window scale probe (round 11, VERDICT task 6): decade
evidence for the third big shape — "window over a high-cardinality key
feeding one map-side-combined groupBy" (ts_autocorr, ts_holt_forecast,
ts_cusum all share it). The terasort probes cover the range-exchange
sort and agg_scale_probe covers sessionize/groupBy; this probe times
the lag-k sufficient-statistics pipeline itself.

Methodology (same discipline as agg_scale_probe.py): events are
generated deterministically in-executor from row ids (xxhash64
streams — no input scan, no sink), so the measured cost is exactly the
shuffle + window + aggregate work. Logical row width 24 bytes. The
workload is ts_autocorr's exact shape: per-user (ts, eid)-ordered
lead-1/2/3 pairs reduced to EXACT integer sufficient statistics
(m, Σa, Σb, Σa², Σb², Σab per lag) in one groupBy.

Correctness at scale is CHECKED, not assumed:
  (a) the plain single-window form vs the TWO-PHASE BUCKETED rewrite
      must produce an identical per-(user, lag) statistics multiset
      (order-insensitive xxhash64-sum checksum). The rewrite is the
      hot-key fix: in-bucket windows bound per-task sort state at
      events-per-bucket, and only rows within k of a bucket edge enter
      the per-user boundary-repair window (a reduced sequence that
      PROVABLY contains every true k-successor of such rows: a missing
      successor is within k <= 3 of its own bucket's start, or its
      bucket has <= 2k rows and is entirely edge-resident).
  (b) pair conservation: for each lag, total pair count must equal
      n_rows - (#users-with->=k+1-rows * k) computed independently —
      approximated here by asserting plain and bucketed agree on the
      exact total pair count per lag.

Key-mode dial mirrors the other probes: ``uniform`` hashes users
evenly (~50 events/user); ``hot`` routes 1/HOT_FRAC of ALL events to
user 0 — the bot/viral-entity adversary whose series a single window
task must otherwise sort.

Run:  python scripts/window_scale_probe.py [n_rows] [mode]
      mode in {uniform (default), hot}
      WIN_PROBE_ONLY=plain|bucketed runs one workload in its own JVM.
      WIN_PROBE_HOT_FRAC=K routes 1/K of events to the hot user
      (default 10).
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

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
MODE = sys.argv[2] if len(sys.argv) > 2 else "uniform"
assert MODE in ("uniform", "hot"), MODE

LAGS = (1, 2, 3)
MAXLAG = max(LAGS)
SPAN = 30 * 86400  # event timestamps span 30 days
BUCKET = 3600  # two-phase rewrite bucket: one hour
ROW_BYTES = 24
HOT_FRAC = int(os.environ.get("WIN_PROBE_HOT_FRAC", "10"))


def events(spark, n: int):
    """Deterministic event stream from row ids: (user, ts, eid, q)."""
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
        F.col("id").alias("eid"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(10000)).alias("q"),
    )


def _pair_stats(pairs):
    """(user, k, a, b) pair rows -> exact per-(user, k) sufficient
    statistics, ONE map-side-combined groupBy."""
    return pairs.groupBy("user", "k").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
    )


def _explode_lags(df, cols_by_k):
    """Stack per-lag lead columns into (user, k, a, b) pair rows,
    dropping rows without a k-successor."""
    arr = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"), F.col("q").alias("a"), c.alias("b")
            )
            for k, c in cols_by_k.items()
        ]
    )
    return (
        df.select("user", "q", F.explode(arr).alias("p"))
        .select("user", "p.k", "p.a", "p.b")
        .filter(F.col("b").isNotNull())
    )


def autocorr_plain(ev):
    """ts_autocorr's shape: ONE window keyed by user."""
    w = Window.partitionBy("user").orderBy("ts", "eid")
    df = ev.withColumns({f"b{k}": F.lead("q", k).over(w) for k in LAGS})
    return _pair_stats(
        _explode_lags(df, {k: F.col(f"b{k}") for k in LAGS})
    )


def autocorr_bucketed(ev):
    """Two-phase hot-key rewrite with exact boundary repair.

    Phase 1: lead-k within (user, hour-bucket) windows — per-task sort
    state is one user-bucket, not one user. Rows whose k-successor
    crosses the bucket edge get NULL here.

    Phase 2: only rows within MAXLAG of a bucket edge (by in-bucket
    rank from either end; buckets smaller than 2*MAXLAG are entirely
    edge-resident) re-window per user. For a row p<=k from its bucket
    end, every one of its next k true successors is itself
    edge-resident (within k of some bucket's start, or in a tiny
    bucket), so the reduced sequence's lead-k IS the true lead-k.
    Contribute exactly the pairs phase 1 nulled: re <= k."""
    b = ev.withColumn("bucket", F.floor(F.col("ts") / BUCKET))
    wb = Window.partitionBy("user", "bucket").orderBy("ts", "eid")
    cnt = F.count(F.lit(1)).over(Window.partitionBy("user", "bucket"))
    df = (
        b.withColumns({f"b{k}": F.lead("q", k).over(wb) for k in LAGS})
        .withColumn("rb", F.row_number().over(wb))
        .withColumn("re", cnt - F.row_number().over(wb) + 1)
    )
    inb = _explode_lags(df, {k: F.col(f"b{k}") for k in LAGS})

    edge = df.filter(
        (F.col("rb") <= MAXLAG) | (F.col("re") <= MAXLAG)
    ).select("user", "ts", "eid", "q", "re")
    wu = Window.partitionBy("user").orderBy("ts", "eid")
    edge = edge.withColumns(
        {f"b{k}": F.lead("q", k).over(wu) for k in LAGS}
    )
    cross = _explode_lags(
        edge,
        {
            k: F.when(F.col("re") <= k, F.col(f"b{k}"))
            for k in LAGS
        },
    )
    return _pair_stats(inb.unionByName(cross))


def _checksum(stats):
    """Order-insensitive checksum + per-lag pair totals, one pass."""
    row = (
        stats.select(
            F.sum(
                F.xxhash64(
                    "user", "k", "m", "sa", "sb", "saa", "sbb", "sab"
                ).cast("decimal(38,0)")
            ).alias("cs"),
            F.sum("m").alias("pairs"),
            F.max("m").alias("mx"),
        )
    ).collect()[0]
    return int(row["cs"]), int(row["pairs"]), int(row["mx"])


def main() -> None:
    spark = get_spark(app_name="window-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    only = os.environ.get("WIN_PROBE_ONLY")
    gb = N_ROWS * ROW_BYTES / 1e9
    out = {
        "n_rows": N_ROWS,
        "mode": MODE,
        "logical_gb": round(gb, 2),
        "hot_frac": HOT_FRAC if MODE == "hot" else None,
    }
    for name, fn in (
        ("plain", autocorr_plain),
        ("bucketed", autocorr_bucketed),
    ):
        if only and name != only:
            continue
        t0 = time.perf_counter()
        cs, pairs, mx = _checksum(fn(events(spark, N_ROWS)))
        dt = time.perf_counter() - t0
        out[name] = {
            "sec": round(dt, 2),
            "mb_per_s": round(gb * 1000 / dt, 1),
            "checksum": cs,
            "pairs": pairs,
            "max_pairs_per_key": mx,
        }
    if "plain" in out and "bucketed" in out:
        out["parity"] = (
            out["plain"]["checksum"] == out["bucketed"]["checksum"]
            and out["plain"]["pairs"] == out["bucketed"]["pairs"]
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
