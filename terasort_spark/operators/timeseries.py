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


# Holt's linear-trend smoothing, fixed 8-step horizon. The recursion is
# UNROLLED into straight-line arithmetic on both engines, so the oracle
# is exact: identical IEEE ops in identical order, no iteration
# machinery anywhere. Smoothing constants are binary-exact.
HOLT_ALPHA = 0.5
HOLT_BETA = 0.25
HOLT_STEPS = 8


def _holt_oracle() -> str:
    a, b = HOLT_ALPHA, HOLT_BETA
    xs = ",\n         ".join(
        f"max(CASE WHEN i = {k} THEN value END) AS x{k}"
        for k in range(1, HOLT_STEPS + 1)
    )
    lines = ["l1 AS (SELECT *, x1 AS l_1, x2 - x1 AS b_1 FROM first8)"]
    for k in range(2, HOLT_STEPS + 1):
        lines.append(
            f"l{k} AS (SELECT *, {a} * x{k} + {1 - a} * (l_{k - 1} + b_{k - 1})"
            f" AS l_{k}, {b} * (({a} * x{k} + {1 - a} * (l_{k - 1} + b_{k - 1}))"
            f" - l_{k - 1}) + {1 - b} * b_{k - 1} AS b_{k} FROM l{k - 1})"
        )
    n = HOLT_STEPS
    chain = ",\n".join(lines)
    return f"""
WITH seq AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i
  FROM events
),
first8 AS (
  SELECT user_id,
         {xs}
  FROM seq WHERE i <= {n}
  GROUP BY user_id
  HAVING count(*) >= {n}
),
{chain}
SELECT user_id,
       {o_rnd(f'l_{n}', 'level')},
       {o_rnd(f'b_{n}', 'trend')},
       {o_rnd(f'l_{n} + 1 * b_{n}', 'fc_1')},
       {o_rnd(f'l_{n} + 2 * b_{n}', 'fc_2')},
       {o_rnd(f'l_{n} + 3 * b_{n}', 'fc_3')}
FROM l{n}
"""


# Lag-k autocorrelation from exact integer sufficient statistics.
# Values are quantized to 4dp int64 (exact and identical in both
# engines), so every sum/product below is exact integer arithmetic at
# any partitioning; only the final Pearson ratio touches IEEE ops,
# identically on both sides. Bounds at the fixture's ranges: q <= 5.7e6
# (value <= 561), per-user n <= ~100, so m*Saa <= ~3e17 < 2^63.
AC_LAGS = (1, 2, 3)
AC_MIN_EVENTS = 24


def _autocorr_oracle() -> str:
    leads = ",\n         ".join(
        f"lead(CAST(floor(value * 10000 + 0.5) AS BIGINT), {k})"
        f" OVER (PARTITION BY user_id ORDER BY ts, event_id) AS q{k}"
        for k in AC_LAGS
    )
    sums = ",\n         ".join(
        f"CAST(count(q{k}) AS BIGINT) AS m{k},\n         "
        f"CAST(sum(CASE WHEN q{k} IS NOT NULL THEN q END) AS BIGINT) AS sa{k},\n         "
        f"CAST(sum(q{k}) AS BIGINT) AS sb{k},\n         "
        f"CAST(sum(CASE WHEN q{k} IS NOT NULL THEN q * q END) AS BIGINT) AS saa{k},\n         "
        f"CAST(sum(q{k} * q{k}) AS BIGINT) AS sbb{k},\n         "
        f"CAST(sum(q * q{k}) AS BIGINT) AS sab{k}"
        for k in AC_LAGS
    )
    rs = ",\n       ".join(
        o_rnd(
            f"CAST(m{k} * sab{k} - sa{k} * sb{k} AS DOUBLE)"
            f" / nullif(sqrt(CAST(m{k} * saa{k} - sa{k} * sa{k} AS DOUBLE))"
            f" * sqrt(CAST(m{k} * sbb{k} - sb{k} * sb{k} AS DOUBLE)), 0)",
            f"r{k}",
        )
        for k in AC_LAGS
    )
    return f"""
WITH seq AS (
  SELECT user_id,
         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS q,
         {leads}
  FROM events WHERE value IS NOT NULL
),
sums AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         {sums}
  FROM seq GROUP BY user_id
  HAVING count(*) >= {AC_MIN_EVENTS}
)
SELECT user_id, n,
       {rs}
FROM sums
"""


@register("ts_autocorr", oracle=_autocorr_oracle())
def ts_autocorr(spark, sf_dir):
    """Per-entity lag-1/2/3 autocorrelation of the event-value series —
    the seasonality/memory diagnostic behind forecasting-model choice
    (near-zero ACF → ts_ewma suffices; strong lag structure → Holt or
    seasonal models) and behind bot detection (machine traffic shows
    spiky periodic ACF where organic traffic decays smoothly).

    Estimator: Pearson correlation between (x_i) and (x_{i+k}) over
    each user's ts-ordered series, k in {1,2,3}. Values quantize to 4dp
    int64, so all six sufficient statistics per lag (m, Σa, Σb, Σa²,
    Σb², Σab as conditional sums over the defined pairs) are EXACT
    integers at any partitioning; the ratio is evaluated from those
    integers in identical IEEE order on both engines.

    Scale: one window keyed by user_id (high-cardinality — per-task
    state is one user's history, never a global or handful-of-values
    sort) producing the three leads, then ONE map-side-combined groupBy
    to a users-sized table. No self-join: lead() pairs each row with
    its k-successor in the same sort the window already owns."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
    seq = (
        ev.select("user_id", "ts", "event_id", q.alias("q"))
        .withColumns({f"q{k}": F.lead("q", k).over(w) for k in AC_LAGS})
        .drop("ts", "event_id")
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for k in AC_LAGS:
        qk = F.col(f"q{k}")
        aggs += [
            F.count(qk).cast("bigint").alias(f"m{k}"),
            F.sum(F.when(qk.isNotNull(), F.col("q"))).alias(f"sa{k}"),
            F.sum(qk).alias(f"sb{k}"),
            F.sum(F.when(qk.isNotNull(), F.col("q") * F.col("q"))).alias(f"saa{k}"),
            F.sum(qk * qk).alias(f"sbb{k}"),
            F.sum(F.col("q") * qk).alias(f"sab{k}"),
        ]
    sums = seq.groupBy("user_id").agg(*aggs).filter(
        F.col("n") >= AC_MIN_EVENTS
    )
    out = [F.col("user_id"), F.col("n")]
    for k in AC_LAGS:
        m, sa, sb = F.col(f"m{k}"), F.col(f"sa{k}"), F.col(f"sb{k}")
        saa, sbb, sab = F.col(f"saa{k}"), F.col(f"sbb{k}"), F.col(f"sab{k}")
        num = (m * sab - sa * sb).cast("double")
        den = F.sqrt((m * saa - sa * sa).cast("double")) * F.sqrt(
            (m * sbb - sb * sb).cast("double")
        )
        out.append(rnd(num / F.when(den != 0, den), f"r{k}"))
    return sums.select(*out)


@register("ts_holt_forecast", oracle=_holt_oracle())
def ts_holt_forecast(spark, sf_dir):
    """Holt double-exponential (level + trend) smoothing over each
    user's first 8 events, forecasting 1-3 steps ahead — the
    trend-aware upgrade of ts_ewma's flat smoothing, i.e. the shape of
    capacity forecasting / anomaly baselines over entity time series.

    Scale design: ONE shuffle on user_id pivots the bounded first-8
    window into columns (conditional aggregates, map-side combined);
    the coupled recursion l_k = αx_k + (1-α)(l+b), b_k = β(l_k-l) +
    (1-β)b then UNROLLS into straight-line whole-stage-codegen
    arithmetic — no loop, no UDF, no driver state, and the oracle runs
    the literally identical expression DAG, so results are exact. Per-
    key state is a constant 8 columns regardless of history length
    (the smoothing horizon is the operator's parameter, as in any
    streaming EWMA/Holt implementation)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("i", F.row_number().over(w)).filter(
        F.col("i") <= HOLT_STEPS
    )
    first8 = seq.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("i") == k, F.col("value"))).alias(f"x{k}")
            for k in range(1, HOLT_STEPS + 1)
        ],
        F.count(F.lit(1)).alias("n_pts"),
    ).filter(F.col("n_pts") >= HOLT_STEPS)
    a, bta = HOLT_ALPHA, HOLT_BETA
    # Each step's l_k/b_k is materialized as a NAMED column in its own
    # projection. Inlining them as expression objects instead would
    # duplicate every prior step's subtree (each step references the
    # previous level twice and trend twice → ~3^k node blow-up, seconds
    # of analysis/codegen); multiply-referenced aliases also stop
    # Catalyst's CollapseProject from re-inlining, so the staged plan
    # stays linear in the horizon.
    cur = first8.select(
        "*",
        F.col("x1").alias("l_1"),
        (F.col("x2") - F.col("x1")).alias("b_1"),
    )
    for k in range(2, HOLT_STEPS + 1):
        lp, bp = F.col(f"l_{k - 1}"), F.col(f"b_{k - 1}")
        cur = cur.select(
            "*",
            (a * F.col(f"x{k}") + (1 - a) * (lp + bp)).alias(f"l_{k}"),
        )
        cur = cur.select(
            "*",
            (bta * (F.col(f"l_{k}") - lp) + (1 - bta) * bp).alias(f"b_{k}"),
        )
    l, b = F.col(f"l_{HOLT_STEPS}"), F.col(f"b_{HOLT_STEPS}")
    return cur.select(
        "user_id",
        rnd(l, "level"),
        rnd(b, "trend"),
        rnd(l + 1 * b, "fc_1"),
        rnd(l + 2 * b, "fc_2"),
        rnd(l + 3 * b, "fc_3"),
    )


@register(
    "ts_cusum",
    oracle="""
WITH ev AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(CAST(value AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS iv
  FROM events WHERE value IS NOT NULL
),
daily AS (
  SELECT event_type, d, sum(iv) AS sv FROM ev GROUP BY event_type, d
),
st AS (
  SELECT event_type, d,
         sum(sv) OVER (PARTITION BY event_type ORDER BY d) AS pre,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS t,
         sum(sv) OVER (PARTITION BY event_type) AS total,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
c AS (
  SELECT event_type, d, n, n * pre - t * total AS cusum
  FROM st
)
SELECT event_type, cp_date, n_days, max_dev FROM (
  SELECT event_type, d AS cp_date, CAST(n AS BIGINT) AS n_days,
         floor(abs(CAST(cusum AS DOUBLE)) / (n * 10000.0) * 10000 + 0.5)
             / 10000 AS max_dev,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(cusum) DESC, d) AS rk
  FROM c
)
WHERE rk = 1
""",
)
def ts_cusum(spark, sf_dir):
    """CUSUM changepoint detection per event type: the day where the
    cumulative deviation of daily value-sums from the series mean peaks
    — the classical level-shift detector, computed relationally.

    Exactness: per-event values quantize to 4dp integers at the scan,
    so daily sums, prefix sums and the scaled statistic
    n*prefix_t - t*total (= n * classic CUSUM_t, same argmax) are pure
    int64 — bit-identical in both engines; |n*prefix| <= 31 days *
    ~1e11 << 2^63. Only the reported deviation divides back to double,
    floor-rounded.

    Scale: the full-data pass is ONE map-combined groupBy onto
    (event_type, day) — bounded domain, one row per type-day. Every
    window (prefix sum, total, argmax rank) runs over those aggregated
    rows, never raw events: the dq_benford aggregate-before-window
    discipline. A type with years of history still gives its windows
    only ~365 rows/year."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        F.sum(
            F.floor(F.col("value").cast("double") * 10000 + F.lit(0.5)).cast(
                "long"
            )
        ).alias("sv")
    )
    w_ord = Window.partitionBy("event_type").orderBy("d")
    w_all = Window.partitionBy("event_type")
    st = daily.select(
        "event_type",
        "d",
        F.sum("sv").over(w_ord).alias("pre"),
        F.row_number().over(w_ord).alias("t"),
        F.sum("sv").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    c = st.select(
        "event_type",
        "d",
        "n",
        (F.col("n") * F.col("pre") - F.col("t") * F.col("total")).alias("cusum"),
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.asc("d")
    )
    return (
        c.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("d").alias("cp_date"),
            F.col("n").cast("bigint").alias("n_days"),
            rnd(F.abs("cusum") / (F.col("n") * 10000.0), "max_dev"),
        )
    )
