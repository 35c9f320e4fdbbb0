"""Time-series operators (hypertable-style): gap-filled resampling with
forward fill, and hierarchical time rollups. Everything is sequence/
explode/window composition — the continuous-aggregate pattern at any
scale (the grid is per-key and bounded by the key's own time span).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import DEC, o_dsum, o_rnd, rnd
from terasort_spark.registry import register


@register(
    "ts_resample",
    oracle=f"""
WITH hourly AS (
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS hour,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_v
  FROM events WHERE user_id < 20
  GROUP BY 1, 2
),
grid AS (
  SELECT user_id,
         unnest(generate_series(min(hour), max(hour), INTERVAL 1 HOUR)) AS hour
  FROM hourly GROUP BY user_id
)
SELECT g.user_id, g.hour,
       coalesce(h.n, 0) AS n_events,
       {o_rnd("last_value(h.sum_v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", "ffill_sum")}
FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
""",
)
def ts_resample(spark, sf_dir):
    """Resample to an hourly grid per user (gap-filling) + forward-fill:
    the TimescaleDB continuous-aggregate / `time_bucket_gapfill` +
    `locf` pattern. The grid is generated per key with sequence()
    (both engines' series are end-inclusive), so empty hours appear with
    n_events=0 and the running sum carries forward."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_v"),
        )
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(
            F.sequence(
                F.min("hour"), F.max("hour"), F.expr("INTERVAL 1 HOUR")
            ).alias("hours")
        )
        .select("user_id", F.explode("hours").alias("hour"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    return joined.select(
        "user_id",
        "hour",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        rnd(F.last("sum_v", ignorenulls=True).over(w), "ffill_sum"),
    )


@register(
    "ts_rollup",
    oracle=f"""
SELECT CAST(year(ts) AS INTEGER) AS yr,
       CAST(month(ts) AS INTEGER) AS mo,
       CAST(day(ts) AS INTEGER) AS dom,
       CAST(grouping(year(ts)) AS INTEGER) AS g_yr,
       CAST(grouping(month(ts)) AS INTEGER) AS g_mo,
       CAST(grouping(day(ts)) AS INTEGER) AS g_dom,
       count(*) AS n,
       {o_dsum("value", "sum_value")}
FROM events
GROUP BY ROLLUP (year(ts), month(ts), day(ts))
""",
)
def ts_rollup(spark, sf_dir):
    """Hierarchical time rollup (day ⊂ month ⊂ year in one pass) — the
    pre-aggregation cascade a hypertable materializes; ROLLUP computes
    all levels from a single shuffle."""
    ev = table(spark, sf_dir, "events").select(
        F.year("ts").alias("yr"), F.month("ts").alias("mo"), F.dayofmonth("ts").alias("dom"), "value"
    )
    return ev.rollup("yr", "mo", "dom").agg(
        F.grouping("yr").cast("int").alias("g_yr"),
        F.grouping("mo").cast("int").alias("g_mo"),
        F.grouping("dom").cast("int").alias("g_dom"),
        F.count(F.lit(1)).alias("n"),
        rnd(F.sum(F.col("value").cast(DEC)).cast("double"), "sum_value"),
    )
