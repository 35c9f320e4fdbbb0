"""CLI surface (python -m terasort_spark): the gen -> sort -> validate
pipeline over record directories plus registry access — invoked
in-process with an injected session so the suite doesn't boot extra
JVMs. Checksums/ordering semantics are pinned by test_terasort.py; this
pins the command wiring and exit-status contract."""

from __future__ import annotations

import json

from terasort_spark.__main__ import main


def test_cli_gen_sort_validate_roundtrip(spark, tmp_path, capsys):
    gen_dir = str(tmp_path / "gen")
    sort_dir = str(tmp_path / "sorted")

    assert main(
        ["teragen", "--rows", "20000", "--out", gen_dir, "--partitions", "4"],
        spark=spark,
    ) == 0
    assert json.loads(capsys.readouterr().out)["files"] == 4

    assert main(
        ["terasort", "--input", gen_dir, "--out", sort_dir, "--partitions", "4"],
        spark=spark,
    ) == 0
    capsys.readouterr()

    assert main(["teravalidate", "--input", sort_dir], spark=spark) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["n_rows"] == 20000
    assert report["sorted_within"] and report["sorted_between"]

    # the UNSORTED directory must FAIL validation (nonzero exit) —
    # the scriptable contract a validator exists for
    assert main(["teravalidate", "--input", gen_dir], spark=spark) == 1
    capsys.readouterr()

    # --expect-rows/--expect-checksum upgrade the check to the full
    # sorted-PERMUTATION contract: a sorted directory with dropped or
    # duplicated records must now fail too
    from terasort_spark.sources.teragen import checksum, read_tera_files

    cks = checksum(read_tera_files(spark, gen_dir))
    assert main(
        ["teravalidate", "--input", sort_dir,
         "--expect-rows", "20000", "--expect-checksum", str(cks)],
        spark=spark,
    ) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["rows_ok"] and report["checksum_ok"]

    assert main(
        ["teravalidate", "--input", sort_dir, "--expect-rows", "19999"],
        spark=spark,
    ) == 1
    assert json.loads(capsys.readouterr().out)["rows_ok"] is False

    assert main(
        ["teravalidate", "--input", sort_dir,
         "--expect-checksum", str(cks + 1)],
        spark=spark,
    ) == 1
    assert json.loads(capsys.readouterr().out)["checksum_ok"] is False


def test_cli_list_query_explain(spark, sf_dir, capsys):
    assert main(["list"], spark=spark) == 0
    names = capsys.readouterr().out.split()
    assert "agg_group" in names and len(names) > 250

    assert main(
        ["query", "agg_group", "--sf-dir", sf_dir, "--limit", "3"], spark=spark
    ) == 0
    shown = capsys.readouterr().out
    assert "l_returnflag" in shown  # show() rendered the result table

    assert main(["explain", "scan_pushdown", "--sf-dir", sf_dir], spark=spark) == 0
    assert "Scan parquet" in capsys.readouterr().out
