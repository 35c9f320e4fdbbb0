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


@register(
    "stream_tws_liststate",
    oracle="""
WITH c AS (
  SELECT user_id, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC)
             AS rn,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
  FROM events WHERE value IS NOT NULL
)
SELECT user_id,
       string_agg(CAST(cents AS VARCHAR), '|' ORDER BY event_id) AS last3,
       any_value(n_events) AS n_events
FROM c WHERE rn <= 3
GROUP BY user_id
""",
)
def stream_tws_liststate(spark, sf_dir):
    """transformWithState ListState fold, hash-graded: per user, keep
    the cents of the LAST 3 events (by event_id) across micro-batches
    plus a running count — the bounded-recency buffer every
    feature-store / fraud pipeline keeps per entity. Each batch reads
    the standing list back through the state server's ListStateGet
    iterator and puts the capped merge, so ListStateGet / ListStatePut
    cross the pure-Python codec on the graded path (single fetch at
    this list size; the multi-fetch requireNextFetch decode is
    unit-tested in tests/test_wave15.py). Final emission per user must
    hash-equal the batch window query (rows with rn<=3 by event_id
    desc). Bounded state: 3 tuples + 1 counter per key at any corpus
    size."""
    _ensure_state_codec(spark)
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from terasort_spark.streaming.replay import (
        read_stream,
        run_to_memory,
        stage_chunks,
    )

    replay_dir = scratch_dir(spark, "tws_list_replay")
    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)

    class Last3(StatefulProcessor):
        def init(self, handle):
            self._l = handle.getListState("vals", "eid bigint, c bigint")
            self._n = handle.getValueState("n", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            import math

            cur = list(self._l.get()) if self._l.exists() else []
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                pdf = pdf.dropna(subset=["value"]).sort_values("event_id")
                for eid, v in zip(pdf["event_id"], pdf["value"]):
                    cur.append((int(eid), int(math.floor(v * 100 + 0.5))))
                    n += 1
            cur.sort()
            cur = cur[-3:]
            self._l.put(cur)
            self._n.update((n,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    # '|'-joined (arrays are driver-unhashable in the
                    # grading canonicalizer; the string is total-ordered
                    # by event_id so it is deterministic)
                    "last3": ["|".join(str(c) for _, c in cur)],
                    "n_events": [n],
                }
            )

        def close(self):
            pass

    folded = (
        read_stream(spark, replay_dir)
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .transformWithStateInPandas(
            Last3(),
            outputStructType=(
                "user_id bigint, last3 string, n_events bigint"
            ),
            outputMode="Update",
            timeMode="None",
        )
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, _ROCKSDB_PROVIDER)
    try:
        got = run_to_memory(folded, "tws_list", "update", stagers, spark)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return (
        got.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "last3")).alias("s"))
        .select(
            "user_id",
            F.col("s.last3").alias("last3"),
            F.col("s.n_events").cast("bigint").alias("n_events"),
        )
    )


@register(
    "stream_tws_mapstate",
    oracle="""
SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY user_id, event_type
""",
)
def stream_tws_mapstate(spark, sf_dir):
    """transformWithState MapState fold, hash-graded: per user, a map
    event_type -> count updated each micro-batch (GetValue /
    UpdateValue / the paginated Iterator all cross the state server
    through the pure-Python codec), emitting the full map as rows after
    every batch; the final per-(user, type) count must hash-equal the
    batch groupBy. This is the per-entity categorical-profile shape
    (user agent mix, event-type histograms) with O(distinct types)
    state per key."""
    _ensure_state_codec(spark)
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from terasort_spark.streaming.replay import (
        read_stream,
        run_to_memory,
        stage_chunks,
    )

    replay_dir = scratch_dir(spark, "tws_map_replay")
    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)

    class TypeCounts(StatefulProcessor):
        def init(self, handle):
            self._m = handle.getMapState("tc", "t string", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for t, cnt in pdf["event_type"].value_counts().items():
                    cur = (
                        self._m.getValue((t,))
                        if self._m.containsKey((t,))
                        else None
                    )
                    n = (cur[0] if cur else 0) + int(cnt)
                    self._m.updateValue((t,), (n,))
            out = sorted((k[0], v[0]) for k, v in self._m.iterator())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "event_type": [t for t, _ in out],
                    "n": [n for _, n in out],
                }
            )

        def close(self):
            pass

    folded = (
        read_stream(spark, replay_dir)
        .groupBy("user_id")
        .transformWithStateInPandas(
            TypeCounts(),
            outputStructType="user_id bigint, event_type string, n bigint",
            outputMode="Update",
            timeMode="None",
        )
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, _ROCKSDB_PROVIDER)
    try:
        got = run_to_memory(folded, "tws_map", "update", stagers, spark)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return (
        got.groupBy("user_id", "event_type")
        .agg(F.max("n").cast("bigint").alias("n"))
    )
