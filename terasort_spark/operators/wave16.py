"""Round-12 wave: the streaming Python DataSource surface and
transformWithState timers.

- ``stream_source_pyds`` — Structured Streaming over a CUSTOM Python
  data source (Spark 4 ``SimpleDataSourceStreamReader``,
  sources/replay_stream_ds.py): rate-limited replay of the events
  table with exact offset bookkeeping, folded to a per-type aggregate
  that hash-grades against the batch twin.
- ``stream_tws_timer`` — transformWithStateInPandas PROCESSING-TIME
  TIMERS end-to-end (registerTimer → handleExpiredTimer → deleteTimer
  through the pure-Python StateMessage codec): a flush-on-timer fold
  whose LAST flush per key equals the batch aggregate.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from terasort_spark.operators._util import scratch_dir
from terasort_spark.registry import register


def _run_stream_complete(df, qname: str, spark):
    """Start ``df`` on a complete-mode memory sink, drain every
    available micro-batch, stop, and return the sink table. Runs under
    the micro-batch shuffle width (r12: state partition count = shuffle
    partitions at query start; 32 batch-sized state partitions per
    micro-batch are pure init overhead — see _util.stream_shuffle_width
    for the measured curve)."""
    from terasort_spark.operators._util import (
        scoped_confs,
        stream_shuffle_width,
    )

    with scoped_confs(
        spark,
        {"spark.sql.shuffle.partitions": stream_shuffle_width(spark)},
    ):
        q = (
            df.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    return spark.table(qname)


@register(
    "stream_source_pyds",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM events
GROUP BY event_type
""",
)
def stream_source_pyds(spark, sf_dir):
    """Streaming aggregate over the custom ``events_replay`` Python
    data source (sources/replay_stream_ds.py): the source hands
    Structured Streaming one third of the event_id-ordered table per
    micro-batch (driver-side by the SimpleDataSourceStreamReader API
    contract — the declared low-rate boundary; bulk streams use the
    file source), and the complete-mode per-type aggregate after the
    final batch must equal the batch GROUP BY exactly — exact integer
    cents, so micro-batch boundaries are unobservable."""
    from terasort_spark.sources.replay_stream_ds import (
        register_replay_source,
        stage_sorted_events,
    )

    register_replay_source(spark)
    root = scratch_dir(spark, "pyds_replay")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "events_sorted.parquet")
    stage_sorted_events(spark, sf_dir, path)
    import pyarrow.parquet as pq

    n = pq.ParquetFile(path).metadata.num_rows
    stream = (
        spark.readStream.format("events_replay")
        .option("path", path)
        .option("batchRows", max(1, (n + 2) // 3))
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("total_cents"),
    )
    got = _run_stream_complete(agg, "pyds_replay_sink", spark)
    return got.select("event_type", "n_events", "total_cents")


@register(
    "stream_tws_timer",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
""",
)
def stream_tws_timer(spark, sf_dir):
    """transformWithStateInPandas PROCESSING-TIME TIMERS end-to-end,
    hash-graded: a flush-on-timer fold. handleInputRows only folds
    (exact integer cents + count into ValueState) and registers a
    constant already-expired timer — guarded by ``listTimers`` so each
    key holds at most one; ALL emission happens in
    ``handleExpiredTimer``, which reads the state, flushes a row, and
    ``deleteTimer``s itself. Every timer wire call of the StateMessage
    protocol (register/list/delete + the expiry iterator) therefore
    runs through the pure-Python codec (r11 SURVEY candidate: "timer
    wire calls are in the codec, unexercised end-to-end").

    Determinism: the per-key count is strictly monotone across that
    key's flushes (a flush follows a batch that delivered rows), so
    max-by-count is the final fold regardless of how many intermediate
    flushes the timer schedule produced; the run drains until the
    flushed totals cover every staged row (known count), which the
    engine guarantees because the last registration's expiry is
    already in the past. Equal to the batch GROUP BY exactly.

    Timer cadence is paced at 500 ms — with expired timers the
    zero-interval default schedules continuous empty micro-batches
    (measured: a drain via processAllAvailable never settles), which
    is also why the drain condition is row-coverage, not
    no-more-data."""
    from terasort_spark.operators.wave15 import _ensure_state_codec

    _ensure_state_codec(spark)
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from terasort_spark.streaming.replay import read_stream, stage_chunks

    replay_dir = scratch_dir(spark, "tws_timer_replay")
    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)
    for s in stagers:
        s()

    class FlushOnTimer(StatefulProcessor):
        def init(self, handle):
            self._s = handle.getValueState("tot", "total bigint, n bigint")
            self._h = handle

        def handleInputRows(self, key, rows, timerValues):
            import math

            # get() returns None for absent state — the exists()
            # pre-check was an extra round trip per key per batch (r12)
            cur = self._s.get()
            t, n = tuple(cur) if cur is not None else (0, 0)
            for pdf in rows:
                v = pdf["value"].dropna()
                t += int(sum(int(math.floor(x * 100 + 0.5)) for x in v))
                n += int(len(v))
            self._s.update((t, n))
            if not any(True for _ in self._h.listTimers()):
                self._h.registerTimer(1)  # constant past expiry
            return iter([])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            self._h.deleteTimer(expiredTimerInfo.getExpiryTimeInMs())
            cur = self._s.get()
            t, n = tuple(cur) if cur is not None else (0, 0)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "total_cents": [t],
                    "n_events": [n],
                }
            )

        def close(self):
            pass

    from terasort_spark.catalog import table

    src = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    expected_rows = src.count()
    folded = (
        read_stream(spark, replay_dir)
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .transformWithStateInPandas(
            FlushOnTimer(),
            outputStructType=(
                "user_id bigint, total_cents bigint, n_events bigint"
            ),
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )
    from terasort_spark.operators.wave15 import _tws_scope

    import time

    qname = "tws_timer_sink"
    with _tws_scope(spark):
        q = (
            folded.writeStream.format("memory")
            .queryName(qname)
            .outputMode("update")
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 600
            covered = -1
            while time.time() < deadline:
                covered = (
                    spark.table(qname)
                    .groupBy("user_id")
                    .agg(F.max("n_events").alias("mx"))
                    .agg(F.sum("mx").alias("s"))
                    .collect()[0]
                    .s
                ) or 0
                if covered >= expected_rows:
                    break
                # 0.3 s, not 1 s: the drain loop's sleep quantization
                # was adding up to a full second per flush round on the
                # graded path (r12; the coverage condition is unchanged)
                time.sleep(0.3)
            if covered < expected_rows:
                raise TimeoutError(
                    f"timer flushes covered {covered}/{expected_rows} rows"
                )
        finally:
            q.stop()
            q.awaitTermination()
        final = (
            spark.table(qname)
            .groupBy("user_id")
            .agg(F.max(F.struct("n_events", "total_cents")).alias("s"))
            .select(
                "user_id",
                F.col("s.n_events").cast("bigint").alias("n_events"),
                F.col("s.total_cents").cast("bigint").alias("total_cents"),
            )
        )
    return final


@register(
    "stream_source_pyds_dist",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM events
WHERE user_id % 7 = 0
GROUP BY user_id
""",
)
def stream_source_pyds_dist(spark, sf_dir):
    """Streaming aggregate over the PARTITION-PLANNING custom source
    (``events_replay_dist``, sources/replay_stream_ds.py): the driver
    plans only row-offset ranges; each micro-batch's window is split
    into 4 RowRange partitions whose parquet slicing runs ON EXECUTORS
    — the high-throughput shape of the Python streaming DataSource
    API, complementing stream_source_pyds's driver-side Simple reader.
    A pre-aggregation filter rides the stream (user_id % 7) so the
    graded fold also proves predicate flow through the custom scan.
    Complete-mode result equals the batch GROUP BY exactly."""
    from terasort_spark.sources.replay_stream_ds import (
        register_replay_dist_source,
        stage_sorted_events,
    )

    register_replay_dist_source(spark)
    root = scratch_dir(spark, "pyds_replay_dist")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "events_sorted.parquet")
    stage_sorted_events(spark, sf_dir, path)
    import pyarrow.parquet as pq

    n = pq.ParquetFile(path).metadata.num_rows
    stream = (
        spark.readStream.format("events_replay_dist")
        .option("path", path)
        .option("batchRows", max(1, (n + 2) // 3))
        .option("numPartitions", "4")
        .load()
    )
    agg = (
        stream.filter(F.col("user_id") % 7 == 0)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
    )
    got = _run_stream_complete(agg, "pyds_replay_dist_sink", spark)
    return got.select("user_id", "n_events", "total_cents")
