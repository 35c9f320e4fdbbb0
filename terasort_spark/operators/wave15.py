"""Round-11 wave: transformWithState on the graded surface.

PySpark 4's transformWithStateInPandas (the successor of
applyInPandasWithState: explicit ValueState/ListState/MapState handles,
timers, a processor lifecycle) needs the google-protobuf runtime for
its state-server wire protocol, which this container lacks. The
repo-root ``usercustomize`` hook + ``streaming/state_message_shim.py``
(a pure-Python proto3 codec for Spark's public StateMessage.proto)
close that gap, so the operator family graduates from "2 documented
pytest skips" (r10 VERDICT task 5) to a real, hash-graded query.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import scratch_dir
from terasort_spark.registry import register

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _ensure_state_codec(spark) -> None:
    """Make the StateMessage codec importable in EVERY Python process of
    this session. Two pieces:

    - driver: importing ``usercustomize`` registers the meta-path finder
      (a no-op when a real google-protobuf is installed — the finder is
      only registered when ``google.protobuf.descriptor`` is absent);
    - workers (Arrow workers AND transformWithState's driver-side init
      runner): each python function carries ``sc.environment`` as its
      worker env, so putting the repo root on its PYTHONPATH makes
      worker interpreters import the same ``usercustomize`` at startup
      — this works even when the JVM was launched by an EXTERNAL driver
      (the grading harness) whose env we never controlled."""
    import usercustomize  # noqa: F401

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env = spark.sparkContext.environment
    pp = env.get("PYTHONPATH", "")
    if repo not in pp.split(os.pathsep):
        env["PYTHONPATH"] = repo + (os.pathsep + pp if pp else "")


@register(
    "stream_transformwithstate",
    oracle="""
SELECT user_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
""",
)
def stream_transformwithstate(spark, sf_dir):
    """REAL transformWithStateInPandas fold, hash-graded: events replay
    through a file stream in three chunks; a StatefulProcessor keeps an
    explicit ValueState of exact (total_cents, n) per user, updated per
    micro-batch; after the replay the LAST emission per user (the
    running totals are strictly monotone in n, so max-by-struct picks
    it) must hash-equal the plain batch aggregate — streaming fold ≡
    batch groupBy, the same contract every stream operator here grades
    under, now for the Spark-4 stateful API.

    Cents quantization keeps the fold exact at any batch boundary
    (int64 adds commute; float sums would not). State store is RocksDB
    — transformWithState requires multi-column-family state, which the
    HDFS provider rejects by Spark design; the conf is scoped and
    restored. At 100 TB this is the live-aggregation shape: state is
    partitioned by the grouping key across executors, each key's state
    is O(1), and micro-batches shuffle only their own rows."""
    _ensure_state_codec(spark)
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from terasort_spark.streaming.replay import (
        read_stream,
        run_to_memory,
        stage_chunks,
    )

    replay_dir = scratch_dir(spark, "tws_replay")
    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)

    class RunningTotals(StatefulProcessor):
        def init(self, handle):
            self._s = handle.getValueState("tot", "total bigint, n bigint")

        def handleInputRows(self, key, rows, timerValues):
            import math

            t, n = (
                tuple(self._s.get()) if self._s.exists() else (0, 0)
            )
            for pdf in rows:
                v = pdf["value"].dropna()
                t += int(
                    sum(int(math.floor(x * 100 + 0.5)) for x in v)
                )
                n += int(len(v))
            self._s.update((t, n))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "total_cents": [t],
                    "n_events": [n],
                }
            )

        def close(self):
            pass

    counted = (
        read_stream(spark, replay_dir)
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=(
                "user_id bigint, total_cents bigint, n_events bigint"
            ),
            outputMode="Update",
            timeMode="None",
        )
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, _ROCKSDB_PROVIDER)
    try:
        got = run_to_memory(counted, "tws_graded", "update", stagers, spark)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return (
        got.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_cents")).alias("s"))
        .select(
            "user_id",
            F.col("s.total_cents").cast("bigint").alias("total_cents"),
            F.col("s.n_events").cast("bigint").alias("n_events"),
        )
    )
