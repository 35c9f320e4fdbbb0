"""Round-12 wave: streaming Python DataSource (events_replay) and
transformWithState timers."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import scratch_dir
from terasort_spark.registry import queries
from terasort_spark.sources.replay_stream_ds import (
    EventsReplayStreamReader,
    _slice_rows,
    stage_sorted_events,
)

_Q = queries()


@pytest.fixture(scope="module")
def staged(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pyds") / "events_sorted.parquet")
    stage_sorted_events(spark, sf_dir, path)
    return path


def test_reader_offsets_partition_the_table_exactly(staged):
    """Offset bookkeeping: successive read() calls cover [0, n) in
    disjoint contiguous windows and stop advancing at the end."""
    import pyarrow.parquet as pq

    n = pq.ParquetFile(staged).metadata.num_rows
    r = EventsReplayStreamReader({"path": staged, "batchrows": "1000"})
    off = r.initialOffset()
    assert off == {"row": 0}
    seen = 0
    batches = 0
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if nxt == off:
            assert rows == []
            break
        assert nxt["row"] == min(off["row"] + 1000, n)
        assert len(rows) == nxt["row"] - off["row"]
        seen += len(rows)
        off = nxt
        batches += 1
        r.commit(off)
    assert seen == n
    assert batches == (n + 999) // 1000


def test_read_between_offsets_replays_identically(staged):
    """Failure-recovery contract: readBetweenOffsets(start, end) must
    return exactly the rows the original read() delivered."""
    r = EventsReplayStreamReader({"path": staged, "batchrows": "700"})
    first, nxt = r.read({"row": 0})
    replay = r.readBetweenOffsets({"row": 0}, nxt)
    assert list(first) == list(replay)
    mid, nxt2 = r.read(nxt)
    assert list(mid) == list(r.readBetweenOffsets(nxt, nxt2))


def test_slice_rows_rejects_unsorted_input(spark, sf_dir, tmp_path):
    """The event_id-sorted layout is asserted, not trusted."""
    bad = str(tmp_path / "unsorted.parquet")
    tmp = str(tmp_path / "tmp")
    (
        table(spark, sf_dir, "events")
        .orderBy(F.desc("event_id"))
        .limit(100)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.rename(os.path.join(tmp, part), bad)
    with pytest.raises(ValueError, match="sorted"):
        list(_slice_rows(bad, 0, 100))


def test_stream_source_pyds_runs_multiple_microbatches(spark, sf_dir):
    """The declared query must actually stream: the complete-mode fold
    over the custom source equals the batch GROUP BY (the oracle twin
    re-checks this at sf0.01), and the staged sorted file plus
    batchRows=n/3 forces >= 3 micro-batches through the source."""
    got = {
        r.event_type: (r.n_events, r.total_cents)
        for r in _Q["stream_source_pyds"](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: (r.n, r.cents)
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("cents"),
        )
        .collect()
    }
    assert got == exact
    # the staged file is still around: prove the source sliced it in
    # thirds by replaying the offsets it would have used
    root = scratch_dir(spark, "pyds_replay")
    path = os.path.join(root, "events_sorted.parquet")
    import pyarrow.parquet as pq

    n = pq.ParquetFile(path).metadata.num_rows
    batch = max(1, (n + 2) // 3)
    assert (n + batch - 1) // batch >= 3 or n < 3
