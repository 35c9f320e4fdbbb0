"""Streaming ≡ batch equivalence tests (SURVEY.md §5b #4): the same
expressions run through Structured Streaming over a chunked file replay
of ``events`` must reproduce the batch answers after all data arrives.
Covers: tumbling windows, session windows, watermark dedup, arbitrary
state (applyInPandasWithState), and late-data drop semantics."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from terasort_spark.catalog import table
from terasort_spark.registry import queries
from terasort_spark.streaming.replay import (
    EVENTS_SCHEMA,
    read_stream,
    run_to_memory,
    stage_chunks,
)


@pytest.fixture()
def replay_dir():
    d = tempfile.mkdtemp(prefix="ts_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_tumbling_equals_batch(spark, sf_dir, replay_dir, state_store):
    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)
    agg = (
        read_stream(spark, replay_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    got = run_to_memory(agg, "tumbling_sink", "complete", stagers, spark)
    want = queries()["stream_tumbling"](spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_session_window_equals_sessionize(spark, sf_dir, replay_dir, state_store):
    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)
    agg = (
        read_stream(spark, replay_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "n_events")
    )
    got = run_to_memory(agg, "session_sink", "complete", stagers, spark)
    # batch twin: per-(user, session) event counts from gaps-and-islands
    want = queries()["sessionize"](spark, sf_dir).select("user_id", "n_events")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_dedup_within_watermark(spark, sf_dir, replay_dir, state_store):
    # duplicate every event across two chunks: dedup must keep one each
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    base = ev.collect()
    os.makedirs(replay_dir, exist_ok=True)

    def stage(i):
        def go():
            spark.createDataFrame(base, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(replay_dir, f"c{i}"))
            src = os.path.join(replay_dir, f"c{i}")
            for f in os.listdir(src):
                if f.endswith(".parquet"):
                    os.rename(
                        os.path.join(src, f),
                        os.path.join(replay_dir, f"data-{i}.parquet"),
                    )
            shutil.rmtree(src, ignore_errors=True)

        return go

    dedup = (
        read_stream(spark, replay_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    got = run_to_memory(dedup, "dedup_sink", "append", [stage(0), stage(1)], spark)
    assert got.count() == len(base)  # each duplicate suppressed


def test_stream_stateful_running_count(spark, sf_dir, replay_dir, state_store):
    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)

    def count_per_user(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    counted = (
        read_stream(spark, replay_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            count_per_user,
            outputStructType="user_id bigint, n_events bigint",
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    got = run_to_memory(counted, "stateful_sink", "update", stagers, spark)
    # the last emission per user is the total
    final = (
        got.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    )
    want = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert sorted(map(tuple, final)) == sorted(map(tuple, want))


def test_late_data_dropped_after_watermark(spark, sf_dir, replay_dir, state_store):
    """Rows older than watermark - delay must be excluded once their
    window is closed (append mode emits closed windows only)."""
    os.makedirs(replay_dir, exist_ok=True)
    rows1 = [
        (1, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 12:00:00", 1, "click", 1.0, "{}"),  # advances watermark
    ]
    late = [(3, "2024-01-01 10:10:00", 1, "click", 1.0, "{}")]  # closed window

    def stage(i, rows):
        def go():
            pdf = pd.DataFrame(
                rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
            )
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            df = spark.createDataFrame(pdf)
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(replay_dir, f"c{i}")
            )
            src = os.path.join(replay_dir, f"c{i}")
            for f in os.listdir(src):
                if f.endswith(".parquet"):
                    os.rename(
                        os.path.join(src, f),
                        os.path.join(replay_dir, f"data-{i}.parquet"),
                    )
            shutil.rmtree(src, ignore_errors=True)

        return go

    agg = (
        read_stream(spark, replay_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    got = run_to_memory(
        agg, "late_sink", "append", [stage(0, rows1), stage(1, late)], spark
    )
    out = {r["ws"].isoformat(): r["n"] for r in got.collect()}
    # the 10:00 window was closed by the 12:00 event advancing the
    # watermark; the late 10:10 row must NOT appear in it
    assert out.get("2024-01-01T10:00:00") == 1, out

def test_stream_stream_join_equals_batch(spark, sf_dir, replay_dir, state_store):
    """Stream-stream inner join with an event-time range constraint:
    purchases joined to the same user's clicks within the preceding 30
    minutes. Both sides are watermarked so Spark can discard buffered
    state; after full replay the result must equal the batch join."""
    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)
    src = read_stream(spark, replay_dir)
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
    )
    joined = purchases.join(clicks, cond).select("p_id", "c_id")
    got = run_to_memory(joined, "ssjoin_sink", "append", stagers, spark)

    ev = table(spark, sf_dir, "events")
    bp = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    bc = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    want = bp.join(bc, cond).select("p_id", "c_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_foreachbatch_upsert_sink_equals_batch(spark, sf_dir, replay_dir, state_store):
    """foreachBatch is the custom-sink workhorse: an update-mode
    streaming agg emits changed per-user totals each micro-batch, and
    the sink MERGEs them into a keyed parquet state (replace-by-key —
    at cluster scale this is MERGE INTO a transactional table; the
    key-replace merge makes redelivery of a batch naturally
    idempotent). After all chunks arrive the sink state must equal the
    batch groupBy answer."""
    import pandas as pd

    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)
    # state lives OUTSIDE replay_dir: the file-stream source globs that
    # dir, and Spark's batch reader skips underscore-prefixed paths
    state_dir = tempfile.mkdtemp(prefix="ts_fbatch_state_")
    state_file = os.path.join(state_dir, "state.parquet")
    seen = {}

    def merge(batch_df, batch_id):
        upd = batch_df.toPandas()
        seen[batch_id] = upd
        if os.path.exists(state_file):
            cur = pd.read_parquet(state_file)
            cur = cur[~cur["user_id"].isin(set(upd["user_id"]))]
            out = pd.concat([cur, upd], ignore_index=True)
        else:
            out = upd
        tmp = state_file + ".tmp"
        out.to_parquet(tmp)
        os.replace(tmp, state_file)

    agg = (
        read_stream(spark, replay_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        agg.writeStream.foreachBatch(merge)
        .outputMode("update")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        for stage in stagers:
            stage()
            q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (int(r.user_id), int(r.n_events))
        for r in spark.read.parquet(state_file).collect()
    )
    want = sorted(
        (int(r.user_id), int(r.n))
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == want

    # redeliver the last batch verbatim: key-replace merge is idempotent
    last_bid = max(seen)
    merge(spark.createDataFrame(seen[last_bid]), last_bid)
    again = sorted(
        (int(r.user_id), int(r.n_events))
        for r in spark.read.parquet(state_file).collect()
    )
    assert again == want
    shutil.rmtree(state_dir, ignore_errors=True)


def test_stream_static_enrichment_join_equals_batch(spark, sf_dir, replay_dir, state_store):
    """Stream-static join: each micro-batch joins against a static
    dimension snapshot (no watermark needed — the static side is not
    stateful). The enrichment pattern for 100 TB pipelines: the dim is
    broadcast per batch, the stream never shuffles on the join key."""
    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)
    users = (
        table(spark, sf_dir, "customer")
        .select(
            (F.col("c_custkey") % 50).alias("user_id"), "c_mktsegment"
        )
        .groupBy("user_id")
        .agg(F.min("c_mktsegment").alias("segment"))
    )
    enriched = (
        read_stream(spark, replay_dir)
        .join(F.broadcast(users), "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = run_to_memory(enriched, "enrich_sink", "complete", stagers, spark)
    want = (
        table(spark, sf_dir, "events")
        .join(users, "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_sliding_window_equals_batch(spark, sf_dir, replay_dir, state_store):
    """Sliding windows (1h size, 30m slide): every event lands in two
    overlapping windows; the streaming replay must produce the same
    per-(window, type) counts as the declared batch twin."""
    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)
    agg = (
        read_stream(spark, replay_dir)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    got = run_to_memory(agg, "sliding_sink", "complete", stagers, spark)
    want = queries()["stream_sliding"](spark, sf_dir)
    # align on the columns the declared query exposes
    want = want.select("window_start", "event_type", "n_events")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_funnel_state_equals_batch(spark, sf_dir, replay_dir, state_store):
    """Streaming twin of events_funnel's per-user stage table: first-touch
    timestamps per funnel stage tracked in applyInPandasWithState must
    equal the batch conditional-min aggregation after full replay. State
    per user is three timestamps — bounded by keys, not history."""
    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)
    STAGES = ("signup", "click", "purchase")

    def track(key, pdfs, state: GroupState):
        cur = list(state.get) if state.exists else [None, None, None]
        for pdf in pdfs:
            for et, ts in zip(pdf["event_type"], pdf["ts"]):
                for i, name in enumerate(STAGES):
                    if et == name and (cur[i] is None or ts < cur[i]):
                        cur[i] = ts
        state.update(tuple(cur))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "t_signup": [cur[0]],
                "t_click": [cur[1]],
                "t_purchase": [cur[2]],
            }
        )

    tracked = (
        read_stream(spark, replay_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType=(
                "user_id bigint, t_signup timestamp, "
                "t_click timestamp, t_purchase timestamp"
            ),
            stateStructType="s timestamp, c timestamp, p timestamp",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    got = run_to_memory(tracked, "funnel_sink", "update", stagers, spark)
    # last emission per user carries the final stage times: min ts per
    # stage only ever decreases, so take the row with the fewest nulls /
    # smallest times == elementwise min over emissions
    final = got.groupBy("user_id").agg(
        F.min("t_signup").alias("t_signup"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    ev = table(spark, sf_dir, "events")
    stage_min = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    want = ev.groupBy("user_id").agg(
        stage_min("signup").alias("t_signup"),
        stage_min("click").alias("t_click"),
        stage_min("purchase").alias("t_purchase"),
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, want.collect()))


def test_transform_with_state_running_sum(spark, sf_dir, replay_dir, state_store):
    """transformWithState (Spark 4 stateful API, successor to
    applyInPandasWithState): running per-user (sum, count) across
    replayed micro-batches must equal the batch aggregate. Exercises
    the ValueState handle + processor lifecycle.

    The operator's state-server protocol speaks proto3; when
    google-protobuf is absent (this container), the repo-root
    usercustomize hook substitutes the pure-Python StateMessage codec
    (terasort_spark/streaming/state_message_shim.py, r11) in every
    worker process — so this test runs EVERYWHERE: real protobuf wins
    when installed, the shim carries the wire format when not."""
    import usercustomize  # noqa: F401  (installs the finder if needed)

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    if state_store == "hdfs":
        pytest.skip(
            "transformWithState needs multiple state-store column "
            "families — RocksDB-only by Spark design "
            "(UNSUPPORTED_FEATURE.STATE_STORE_MULTIPLE_COLUMN_FAMILIES)"
        )

    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)

    class RunningSum(StatefulProcessor):
        def init(self, handle):
            self.state = handle.getValueState("tot", "total double, n bigint")

        def handleInputRows(self, key, rows, timerValues):
            total, n = (
                tuple(self.state.get()) if self.state.exists() else (0.0, 0)
            )
            for pdf in rows:
                total += float(pdf["value"].sum())
                n += len(pdf)
            self.state.update((total, n))
            yield pd.DataFrame(
                {"user_id": [key[0]], "total": [total], "n_events": [n]}
            )

        def close(self):
            pass

    counted = (
        read_stream(spark, replay_dir)
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningSum(),
            outputStructType="user_id bigint, total double, n_events bigint",
            outputMode="Update",
            timeMode="None",
        )
    )
    got = run_to_memory(counted, "tws_sink", "update", stagers, spark)
    final = (
        got.groupBy("user_id")
        .agg(
            F.round(F.max("total"), 4).alias("total"),
            F.max("n_events").alias("n_events"),
        )
        .collect()
    )
    want = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 4).alias("total"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    assert sorted(map(tuple, final)) == sorted(map(tuple, want))


def test_stream_topk_equals_batch(spark, sf_dir, replay_dir, state_store):
    """Leaderboard pattern: the STREAM maintains only per-(window, user)
    counts; the rank runs over the aggregated sink (windows x users
    rows, not events). Streamed counts + batch rank must equal the
    declared batch twin exactly."""
    from pyspark.sql import Window

    stagers = stage_chunks(spark, sf_dir, replay_dir, n_chunks=3)
    counts = (
        read_stream(spark, replay_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    sink = run_to_memory(counts, "topk_sink", "complete", stagers, spark)
    rank_w = Window.partitionBy("w").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    got = (
        sink.withColumn("rn", F.row_number().over(rank_w).cast("integer"))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("w.start").alias("window_start"), "user_id", "n_events", "rn"
        )
    )
    want = queries()["stream_topk"](spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
