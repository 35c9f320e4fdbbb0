#!/usr/bin/env python
"""Build OPERATIVE_BASELINE.json — the machine-readable per-query frozen
baseline (round-10 verdict task 7).

For each query ever recorded in a committed BENCH_QUERIES.json, the
operative baseline is the MINIMUM median across the file's git history
(the code's best demonstrated capability on this host; ambient load only
inflates, never deflates, a median), with the provenance commit recorded.
bench.py evaluates its >2x-and->1s gate against this file, so "is
anything over the gate?" is one command instead of archaeology across
ten rounds of BASELINE.md prose.

Re-run after any round whose bench sweep produces new per-query bests;
the output is committed so the gate is stable between regenerations.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args],
        check=True,
        capture_output=True,
        text=True,
    ).stdout


def main() -> None:
    sys.path.insert(0, REPO)
    from terasort_spark.registry import queries as live_queries

    live = set(live_queries())
    commits = git(
        "log", "--format=%H %ad", "--date=short", "--", "BENCH_QUERIES.json"
    ).splitlines()
    best: dict[str, dict] = {}
    n_versions = 0
    for line in commits:
        sha, date = line.split()
        try:
            raw = git("show", f"{sha}:BENCH_QUERIES.json")
            snap = json.loads(raw)
        except (subprocess.CalledProcessError, ValueError):
            continue
        qs = snap.get("queries", {})
        if not qs:
            continue
        n_versions += 1
        for name, med in qs.items():
            # Drop renamed/retired queries (e.g. sink_zorder) so the file
            # tracks exactly the live registry.
            if name not in live:
                continue
            if not isinstance(med, (int, float)) or med <= 0:
                continue
            cur = best.get(name)
            if cur is None or med < cur["median_s"]:
                best[name] = {
                    "median_s": med,
                    "provenance": f"{sha[:10]} {date}",
                }
    out = {
        "metric": "operative_per_query_baseline_s",
        "unit": "sec",
        "sf": 0.1,
        "protocol": (
            "min per-query 3-rep median across all committed "
            "BENCH_QUERIES.json versions; gate = current median > 2x this "
            "AND > 1s absolute"
        ),
        "n_snapshot_versions": n_versions,
        "queries": dict(sorted(best.items())),
    }
    path = os.path.join(REPO, "OPERATIVE_BASELINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"wrote {path}: {len(best)} queries from {n_versions} snapshot "
        "versions",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
