"""Streaming replay harness: feed the ``events`` table through a file
source incrementally, so Structured Streaming queries can be asserted
equivalent to their batch twins (SURVEY.md §2b streaming surface).

The same DataFrame expressions run in both modes — Spark's unified
API — so each streaming test builds its query from the identical
building blocks the batch operator uses.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from terasort_spark.catalog import table

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def stage_chunks(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 4,
    order_by: tuple = ("event_id",),
):
    """Split events into n_chunks files by ``order_by`` range (the
    default event_id order is roughly time-ordered, like a real stream).
    Pass ``order_by=("ts", "event_id")`` for strictly nondecreasing
    event time — then no event is ever late relative to the watermark,
    which makes append-mode window aggregation drop-free and therefore
    equal to the batch twin. Returns the list of chunk-staging callables
    so tests control arrival order."""
    ev = table(spark, sf_dir, "events").orderBy(*order_by).collect()
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    per = (len(ev) + n_chunks - 1) // n_chunks
    stagers = []
    for i in range(n_chunks):
        chunk = ev[i * per : (i + 1) * per]

        def stage(i=i, chunk=chunk):
            df = spark.createDataFrame(chunk, schema=EVENTS_SCHEMA)
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"chunk{i}")
            )
            # move part file up so the stream source (flat dir glob) sees it
            cdir = os.path.join(out_dir, f"chunk{i}")
            for f in os.listdir(cdir):
                if f.endswith(".parquet"):
                    os.rename(
                        os.path.join(cdir, f),
                        os.path.join(out_dir, f"data-{i}.parquet"),
                    )
            shutil.rmtree(cdir, ignore_errors=True)

        stagers.append(stage)
    return stagers


def read_stream(spark: SparkSession, dir_: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir_)
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str,
    stagers,
    spark: SparkSession,
    _attempt: int = 0,
):
    """Start the query on a memory sink, release chunks one at a time
    (processing all available work between arrivals so watermarks advance
    deterministically), then stop and return the sink table.

    One automatic retry on a transient STREAMING failure only: under a
    heavily loaded suite the zero-interval trigger can occasionally die
    mid-replay (observed once in r5 and once in r6, different tests,
    both green in isolation). Staging is idempotent (overwrite +
    rename), so the retry restarts a FRESH query (new sink table) and
    re-releases every chunk; a deterministic failure still fails —
    the retry fires at most once and re-raises. Exceptions raised by the
    stagers themselves (test bugs, assertion errors) are NOT retried —
    they propagate immediately with their original traceback (r6
    ADVICE: the old blanket ``except Exception`` masked stager bugs)."""
    from pyspark.errors.exceptions.base import StreamingQueryException

    qname = name if _attempt == 0 else f"{name}_retry{_attempt}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        for stage in stagers:
            stage()
            q.processAllAvailable()
    except StreamingQueryException as exc:
        q.stop()
        if _attempt >= 1:
            raise
        import sys

        print(
            f"[replay] transient streaming failure in {name!r}: {exc!r} "
            "— retrying once with a fresh query",
            file=sys.stderr,
        )
        return run_to_memory(
            stream_df, name, output_mode, stagers, spark, _attempt + 1
        )
    finally:
        q.stop()
    return spark.table(qname)
