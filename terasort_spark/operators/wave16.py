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

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _run_stream_complete(df, qname: str, spark):
    """Start ``df`` on a complete-mode memory sink, drain every
    available micro-batch, stop, and return the sink table."""
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
