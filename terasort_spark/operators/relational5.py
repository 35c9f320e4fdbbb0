"""Sixth-wave operators: bitmap-based exact distinct aggregation and
time-series linear interpolation over a generated day spine. Neither
exists in the reference (SURVEY.md §2a); both are declared §2b entries
with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import rnd
from terasort_spark.registry import register


@register(
    "agg_bitmap",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
)
def agg_bitmap(spark, sf_dir):
    """Exact COUNT(DISTINCT) via bitmap aggregation: bucket each
    user_id, OR per-bucket bitmaps together (bitmap_construct_agg),
    sum popcounts. Same answer as count(DISTINCT) — the oracle IS
    count(DISTINCT) — but the distributed representation is a fixed
    32 KB bitmap per (group, bucket) instead of a shuffled set of raw
    ids: the standard warehouse trick (Roaring-style) for distinct
    counts over billions of keys.

    Scale notes: the first aggregation's partial state is bounded
    (bitmap bytes, not distinct values), so map-side combine stays
    effective no matter the cardinality; the second aggregation moves
    only (group, bucket) popcounts. Compare `agg_approx` (HLL) for the
    sketched version; this one is exact."""
    ev = table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type",
        F.bitmap_bucket_number(F.col("user_id")).alias("bkt"),
    ).agg(
        F.bitmap_construct_agg(
            F.bitmap_bit_position(F.col("user_id"))
        ).alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )


@register(
    "ts_interpolate",
    oracle="""
WITH daily AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
           avg(value) AS v
    FROM events WHERE user_id % 50 = 0 AND event_type = 'purchase'
    GROUP BY 1, 2
),
spine AS (
    SELECT user_id,
           CAST(unnest(generate_series(min(day), max(day),
                                       INTERVAL 1 DAY)) AS DATE) AS day
    FROM daily GROUP BY user_id
),
joined AS (
    SELECT s.user_id, s.day, d.v,
           last_value(d.v IGNORE NULLS) OVER w_prev AS pv,
           last_value(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS)
               OVER w_prev AS pd,
           first_value(d.v IGNORE NULLS) OVER w_next AS nv,
           first_value(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS)
               OVER w_next AS nd
    FROM spine s LEFT JOIN daily d USING (user_id, day)
    WINDOW
      w_prev AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_next AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       floor((CASE
           WHEN v IS NOT NULL THEN v
           WHEN pv IS NULL THEN nv
           WHEN nv IS NULL THEN pv
           ELSE pv + (nv - pv) * date_diff('day', pd, day)
                              / date_diff('day', pd, nd)
       END) * 10000 + 0.5) / 10000 AS v_interp,
       (v IS NULL) AS filled
FROM joined
""",
)
def ts_interpolate(spark, sf_dir):
    """Time-series gap filling with linear interpolation (the
    Timescale/InfluxDB `interpolate()` operator): build each user's
    complete day spine, left-join observed daily averages, and fill
    gaps linearly between the previous and next observation (edges
    carry the nearest value). `filled` marks synthesized rows.

    Scale notes: one shuffle keys everything by user_id; the spine
    explode is a narrow constant-bounded expansion; both IGNORE NULLS
    windows run in the SAME sort order (day) over the same partition
    key, so Catalyst executes them in one Window pass each direction
    with no extra exchange. State per user = one running (value, day)
    pair per direction."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.where((F.col("user_id") % 50 == 0) & (F.col("event_type") == "purchase"))
        .groupBy(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.avg("value").alias("v"))
    )
    spine = daily.groupBy("user_id").agg(
        F.explode(
            F.sequence(F.min("day"), F.max("day"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    j = j.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * F.datediff(F.col("day"), F.col("pd"))
            / F.datediff(F.col("nd"), F.col("pd"))
        )
    )
    return j.select(
        "user_id",
        "day",
        rnd(interp, "v_interp"),
        F.col("v").isNull().alias("filled"),
    )
