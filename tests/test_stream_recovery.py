"""Checkpoint recovery — the exactly-once-on-restart property a
production stream user hits first (r7 VERDICT task 1). Each test starts
a file-source → file-sink streaming query with a checkpointLocation,
stops it mid-stream, restarts the SAME query from the SAME checkpoint
(new files staged both while stopped and after resume), and asserts the
final sink equals the batch twin exactly:

- no double-counting: if the restarted query re-read already-committed
  source files, or the file sink re-committed batch output, duplicate
  rows/windows would appear;
- no loss: if a staged micro-batch were skipped on resume, rows/windows
  would be missing;
- state recovery: dedup state and open window partials span the restart
  boundary, so a query that resumed with FRESH state (offsets only)
  also fails these assertions.

The file sink's _spark_metadata commit log plus the source offset log in
the checkpoint directory are the mechanisms under test; reading the sink
back with spark.read.parquet honors the commit log, which is exactly how
a downstream consumer sees the exactly-once contract.
"""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.registry import queries
from terasort_spark.streaming.replay import (
    EVENTS_SCHEMA,
    read_stream,
    stage_chunks,
)


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="ts_ckpt_")
    d = {
        "replay": os.path.join(root, "replay"),
        "ckpt": os.path.join(root, "ckpt"),
        "out": os.path.join(root, "out"),
    }
    os.makedirs(d["replay"], exist_ok=True)
    yield d
    shutil.rmtree(root, ignore_errors=True)


def _start_file_sink(stream_df, out, ckpt):
    return (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )


def _run_life(df_fn, out, ckpt, actions, attempts=2):
    """One 'life' of a recovering query: start from the checkpoint, run
    ``actions(q)`` (stagers + processAllAvailable calls), stop.

    Retries ONCE on a streaming failure (r9 VERDICT task 6): under host
    contention a just-stopped life can still hold provider resources —
    observed as the rocksdb recovery test failing in a contended run and
    passing solo — so the restart waits and tries again. The retry is
    exactly-once-SAFE by construction: restarting from the same
    checkpoint is precisely the recovery property these tests assert,
    so a retried life must converge to the identical sink contents, and
    a deterministic failure still fails (the second raise propagates).
    Assertion errors from the actions themselves are never retried."""
    import time

    for attempt in range(attempts):
        q = _start_file_sink(df_fn(), out, ckpt)
        try:
            actions(q)
            q.stop()
            return
        except AssertionError:
            q.stop()
            raise
        except Exception:
            q.stop()
            if attempt == attempts - 1:
                raise
            time.sleep(10)


def _stage_rows(spark, replay_dir, rows, tag):
    """Write one flat parquet file of events into the replay dir."""
    df = spark.createDataFrame(rows, schema=EVENTS_SCHEMA)
    tmp = os.path.join(replay_dir, f"_stage_{tag}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            os.rename(
                os.path.join(tmp, f), os.path.join(replay_dir, f"data-{tag}.parquet")
            )
    shutil.rmtree(tmp, ignore_errors=True)


def test_checkpoint_recovery_dedup_exactly_once(spark, sf_dir, dirs, state_store):
    """dropDuplicatesWithinWatermark across a stop/restart: duplicates
    arrive before the stop, while stopped, and after the resume. The
    restored dedup STATE (not just source offsets) must suppress every
    one — 500 input ids replayed three times must yield exactly 500
    sink rows."""
    base = table(spark, sf_dir, "events").filter(F.col("event_id") < 500).collect()
    assert len(base) == 500

    def dedup_df():
        return (
            read_stream(spark, dirs["replay"])
            .withWatermark("ts", "10 minutes")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id")
        )

    # --- first life: one full copy, processed and committed
    def life1(q):
        _stage_rows(spark, dirs["replay"], base, "a")
        q.processAllAvailable()

    _run_life(dedup_df, dirs["out"], dirs["ckpt"], life1)

    mid = spark.read.schema("event_id bigint").parquet(dirs["out"]).count()
    assert mid == 500  # first life committed all ids once

    # --- while stopped: a second full copy lands in the source dir
    _stage_rows(spark, dirs["replay"], base, "b")

    # --- second life: SAME checkpoint, SAME sink; then a third copy
    def life2(q):
        q.processAllAvailable()
        _stage_rows(spark, dirs["replay"], base, "c")
        q.processAllAvailable()

    _run_life(dedup_df, dirs["out"], dirs["ckpt"], life2)

    got = spark.read.schema("event_id bigint").parquet(dirs["out"])
    assert got.count() == 500  # no duplicate escaped, no id lost
    want = sorted(r["event_id"] for r in base)
    assert sorted(r["event_id"] for r in got.collect()) == want


def test_checkpoint_recovery_tumbling_equals_batch(spark, sf_dir, dirs, state_store):
    """Watermarked tumbling-window counts through a stop/restart must
    equal the batch twin (stream_tumbling) exactly. Chunks are staged in
    strict ts order (no event is ever late → append mode drops nothing),
    the restart lands mid-corpus so open window partials must survive in
    checkpoint state, and two far-future flush events advance the
    watermark so every real window finalizes and is emitted once."""
    stagers = stage_chunks(
        spark, sf_dir, dirs["replay"], n_chunks=4, order_by=("ts", "event_id")
    )

    def agg_df():
        return (
            read_stream(spark, dirs["replay"])
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type",
                "n_events",
            )
        )

    out_schema = (
        "window_start timestamp, window_end timestamp, "
        "event_type string, n_events bigint"
    )

    # --- first life: half the corpus
    def life1(q):
        for s in stagers[:2]:
            s()
            q.processAllAvailable()

    _run_life(agg_df, dirs["out"], dirs["ckpt"], life1)

    # --- one chunk lands while the query is down
    stagers[2]()

    # --- second life resumes from the checkpoint: it must pick up the
    # while-down chunk, finish the corpus, then flush the watermark
    max_ts = max(
        r["ts"]
        for r in table(spark, sf_dir, "events").select("ts").collect()
    )
    flush = [
        (
            10_000_000 + i,
            max_ts + datetime.timedelta(days=i + 1),
            0,
            "___flush___",
            0.0,
            "{}",
        )
        for i in range(2)
    ]

    def life2(q):
        q.processAllAvailable()
        stagers[3]()
        q.processAllAvailable()
        for i, row in enumerate(flush):
            _stage_rows(spark, dirs["replay"], [row], f"flush{i}")
            q.processAllAvailable()

    _run_life(agg_df, dirs["out"], dirs["ckpt"], life2)

    got = (
        spark.read.schema(out_schema)
        .parquet(dirs["out"])
        .filter(F.col("event_type") != "___flush___")
    )
    want = queries()["stream_tumbling"](spark, sf_dir)
    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    # every real window emitted exactly once with the full-corpus count:
    # a dropped micro-batch → missing/short windows; a re-processed one
    # or unrestored window partials → duplicate/short windows
    assert got_rows == want_rows


def test_checkpoint_recovery_arbitrary_state(spark, sf_dir, dirs, state_store):
    """applyInPandasWithState across a stop/restart: per-user running
    counts accumulate in GroupState, so a resume with fresh state (or
    re-counted batches) yields wrong totals for every user whose events
    span the boundary. The file sink accumulates one emission per
    (user, batch); max(n_events) per user must equal the batch count."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from terasort_spark.streaming.replay import stage_chunks

    stagers = stage_chunks(spark, sf_dir, dirs["replay"], n_chunks=4)

    def count_per_user(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    def counted_df():
        return (
            read_stream(spark, dirs["replay"])
            .groupBy("user_id")
            .applyInPandasWithState(
                count_per_user,
                outputStructType="user_id bigint, n_events bigint",
                stateStructType="n bigint",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    def life1(q):
        for s in stagers[:2]:
            s()
            q.processAllAvailable()

    _run_life(counted_df, dirs["out"], dirs["ckpt"], life1)

    stagers[2]()  # lands while the query is down

    def life2(q):
        q.processAllAvailable()
        stagers[3]()
        q.processAllAvailable()

    _run_life(counted_df, dirs["out"], dirs["ckpt"], life2)

    got = (
        spark.read.schema("user_id bigint, n_events bigint")
        .parquet(dirs["out"])
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    want = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
