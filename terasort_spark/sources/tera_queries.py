"""Registry entries for the terasort module (rows-only checks; the
TeraValidate invariants are asserted in tests/test_terasort.py)."""

from __future__ import annotations

from terasort_spark.registry import register
from terasort_spark.sources.teragen import teragen, terasort

N_ROWS = 100_000  # driver-facing sample; module tests run 1M


@register("teragen")  # binary generator — no SQL oracle; invariants in tests
def teragen_query(spark, sf_dir):
    return teragen(spark, N_ROWS, n_partitions=16)


@register("terasort")  # total-order binary sort — validated in tests
def terasort_query(spark, sf_dir):
    return terasort(teragen(spark, N_ROWS, n_partitions=16), n_partitions=16)
