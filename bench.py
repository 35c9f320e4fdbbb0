#!/usr/bin/env python
"""Benchmark harness (BASELINE.md §2 protocol).

Runs every declared query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], 3 repetitions after a
discarded warm-up, and prints ONE JSON line:
  {"metric": "suite_median_total_s", "value": N, "unit": "sec",
   "queries": {name: median_sec, ...}, "sf": 0.1}

Each timing materializes the full result (collect) so the measured cost
includes the whole plan, not just planning.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from terasort_spark.registry import queries  # noqa: E402
from terasort_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("BENCH_REPS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(app_name="terasort-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    only = os.environ.get("BENCH_ONLY")  # comma-separated names, local iteration
    if only:
        keep = {n.strip() for n in only.split(",")}
        qs = {n: f for n, f in qs.items() if n in keep}
    medians: dict[str, float] = {}
    for name in sorted(qs):
        fn = qs[name]
        times = []
        for rep in range(REPS + 1):  # rep 0 = warm-up, discarded
            t0 = time.perf_counter()
            try:
                fn(spark, SF_DIR).collect()
            except Exception as exc:  # pragma: no cover
                print(f"# {name} failed: {exc}", file=sys.stderr)
                times = []
                break
            dt = time.perf_counter() - t0
            if rep > 0:
                times.append(dt)
        if times:
            medians[name] = round(statistics.median(times), 3)
        # Release per-query driver state between queries: dropping the
        # Python DataFrame refs lets the JVM ContextCleaner evict
        # localCheckpoint blocks (iterative queries pin them until GC),
        # which otherwise accumulate across 185x4 runs and inflate
        # late-alphabet medians ~2x vs isolated runs.
        gc.collect()
        spark.catalog.clearCache()
    total = round(sum(medians.values()), 3)
    sf = _sf_from_dir(SF_DIR)
    # Machine-detectable ambient drift (r8 VERDICT task 7): the median
    # per-query ratio vs the previously committed snapshot. Host load
    # shows up as a UNIFORM ~1.1-1.25x ratio across all queries; a real
    # regression moves individual queries. >1.15 here means "re-run
    # solo before trusting absolute numbers", documented in BASELINE.md.
    ambient = None
    try:
        with open(os.path.join(REPO, "BENCH_QUERIES.json")) as f:
            prev = json.load(f).get("queries", {})
        ratios = sorted(
            medians[n] / prev[n]
            for n in medians
            if n in prev and prev[n] > 0
        )
        if ratios:
            ambient = round(ratios[len(ratios) // 2], 3)
    except (OSError, ValueError):
        pass
    # Full per-query map: separate stdout line + file. The FINAL stdout
    # line must stay compact (a few hundred bytes) — the driver keeps
    # only a short tail of output, and r1's single 186-entry line was
    # truncated to unparseable. The compact line carries the 15 slowest
    # queries; the complete map lives in BENCH_QUERIES.json / line 1.
    full = {
        "metric": "per_query_median_s",
        "unit": "sec",
        "queries": medians,
        "sf": sf,
        "n_queries": len(medians),
        "ambient_vs_prev_snapshot": ambient,
    }
    print(json.dumps(full))
    # A BENCH_ONLY-filtered run is a local iteration aid; only a full
    # sweep may replace the committed per-query snapshot.
    if not only:
        try:
            with open(os.path.join(REPO, "BENCH_QUERIES.json"), "w") as f:
                json.dump(full, f, indent=1, sort_keys=True)
        except OSError as exc:  # pragma: no cover
            print(f"# could not write BENCH_QUERIES.json: {exc}", file=sys.stderr)
    slowest = dict(
        sorted(medians.items(), key=lambda kv: kv[1], reverse=True)[:15]
    )
    print(
        json.dumps(
            {
                "metric": "suite_median_total_s",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "sf": sf,
                "n_queries": len(medians),
                "ambient_vs_prev_snapshot": ambient,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
