"""CLI entry point — the spark-submit surface a user of the reference
drives today (gen → sort → validate over record directories), plus
registry access:

    python -m terasort_spark teragen --rows 1000000 --out /tmp/tera_in
    python -m terasort_spark terasort --input /tmp/tera_in --out /tmp/tera_out
    python -m terasort_spark teravalidate --input /tmp/tera_out
    python -m terasort_spark list
    python -m terasort_spark query agg_group --sf-dir /root/testdata/sf0.01
    python -m terasort_spark explain dedup_minhash

Each subcommand is a thin shim over the library (Engine /
sources/teragen.py), so spark-submit'ing this module on a cluster runs
the identical code paths the tests pin. Exit status: teravalidate
returns nonzero when the directory is NOT sorted — and, when the
caller supplies ``--expect-rows`` / ``--expect-checksum`` (printed by
teragen / computable via sources.teragen.checksum), also when records
were dropped, duplicated, or corrupted, which upgrades the check to
the reference validator's full sorted-permutation contract.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="terasort_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("teragen", help="generate records -> fixed-width files")
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--partitions", type=int, default=32)
    g.add_argument(
        "--checksum",
        action="store_true",
        help="also read back the written files and print their content "
        "checksum, for a later teravalidate --expect-checksum",
    )

    s = sub.add_parser("terasort", help="sort a record directory")
    s.add_argument("--input", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--partitions", type=int, default=32)

    v = sub.add_parser("teravalidate", help="validate a sorted directory")
    v.add_argument("--input", required=True)
    v.add_argument(
        "--expect-rows",
        type=int,
        default=None,
        help="fail unless the directory holds exactly this many records",
    )
    v.add_argument(
        "--expect-checksum",
        type=int,
        default=None,
        help="fail unless the order-insensitive content checksum matches "
        "(catches duplicated/corrupted records a sort check cannot)",
    )

    sub.add_parser("list", help="list registered queries")

    q = sub.add_parser("query", help="run a registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=None)
    q.add_argument("--limit", type=int, default=20)

    e = sub.add_parser("explain", help="formatted plan of a registered query")
    e.add_argument("name")
    e.add_argument("--sf-dir", default=None)
    e.add_argument("--mode", default="formatted")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    """Runs one subcommand; ``spark`` is injectable for in-process tests
    (a real spark-submit leaves it None and builds the session)."""
    args = _build_parser().parse_args(argv)

    if args.cmd == "list":
        # pure-Python registry read — no SparkSession/JVM boot needed
        from terasort_spark import registry

        for name in sorted(registry.queries()):
            print(name)
        return 0

    from terasort_spark.catalog import DEFAULT_SF_DIR
    from terasort_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=getattr(args, "sf_dir", None) or DEFAULT_SF_DIR)

    if args.cmd == "teragen":
        from terasort_spark.sources.teragen import write_tera_files

        paths = write_tera_files(
            eng.teragen(args.rows, args.partitions), args.out
        )
        out = {"rows": args.rows, "files": len(paths)}
        if args.checksum:
            from terasort_spark.sources.teragen import checksum, read_tera_files

            out["checksum"] = checksum(read_tera_files(eng.spark, args.out))
        print(json.dumps(out))
        return 0

    if args.cmd == "terasort":
        from terasort_spark.sources.teragen import (
            read_tera_files,
            terasort,
            write_tera_files,
        )

        df = read_tera_files(eng.spark, args.input)
        paths = write_tera_files(terasort(df, args.partitions), args.out)
        print(json.dumps({"files": len(paths)}))
        return 0

    if args.cmd == "teravalidate":
        from terasort_spark.sources.teragen import checksum, read_tera_files

        df = read_tera_files(eng.spark, args.input)
        report = eng.teravalidate(df)
        ok = report["sorted_within"] and report["sorted_between"]
        if args.expect_rows is not None:
            report["rows_ok"] = report["n_rows"] == args.expect_rows
            ok = ok and report["rows_ok"]
        if args.expect_checksum is not None:
            report["checksum"] = checksum(df)
            report["checksum_ok"] = report["checksum"] == args.expect_checksum
            ok = ok and report["checksum_ok"]
        print(json.dumps(report))
        return 0 if ok else 1

    if args.cmd == "query":
        eng.query(args.name).show(args.limit, truncate=False)
        return 0

    if args.cmd == "explain":
        print(eng.explain(args.name, mode=args.mode))
        return 0

    raise AssertionError(f"unhandled command {args.cmd}")  # pragma: no cover


if __name__ == "__main__":
    sys.exit(main())
