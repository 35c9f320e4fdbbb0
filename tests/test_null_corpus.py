"""NULL-input safety sweep: every registered query must execute against
a corpus where ~10% of every non-key value is NULL (deterministically
hashed), without crashing.

Why this matters at 100 TB: real ingests carry nulls everywhere —
failed extractions, absent fields, schema drift. The sweep found and
pinned real bug classes: null embeddings reaching numpy (np.stack of
None), null payloads reaching decoders, null-unsafe row-at-a-time
Python UDFs (`None < 10` TypeError), UDTFs calling .split on None, and
a rolling median indexing element 0 of an all-NULL (hence empty after
collect_list) frame. The fixes are semantic, not defensive: null
vectors/payloads filter out at the scan (mirrored in the oracle SQL),
UDFs follow SQL NULL-in→NULL-out, and empty frames yield NULL medians."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from terasort_spark.registry import queries

_Q = queries()

NULL_DIR = "/tmp/terasort_spark_null_sf_ci"

KEYS = {
    "r_regionkey", "n_nationkey", "c_custkey", "s_suppkey", "p_partkey",
    "o_orderkey", "l_orderkey", "l_linenumber", "event_id", "doc_id",
    "vec_id",
}


@pytest.fixture(scope="module")
def null_sf(spark, sf_dir):
    shutil.rmtree(NULL_DIR, ignore_errors=True)
    os.makedirs(NULL_DIR)
    for f in os.listdir(sf_dir):
        if not f.endswith(".parquet"):
            continue
        df = spark.read.parquet(os.path.join(sf_dir, f))
        keys = [k for k in df.columns if k in KEYS]
        cols = []
        for c in df.schema.fields:
            if c.name in KEYS:
                cols.append(F.col(c.name))
            else:
                # Materialize the list before the `or`: a map object is
                # always truthy, so the keyless-table fallback would
                # otherwise be dead code and the coin constant per column.
                key_cols = [F.col(k) for k in keys] or [F.col(c.name)]
                coin = F.abs(F.hash(F.lit(c.name), *key_cols)) % 10
                cols.append(
                    F.when(coin == 0, F.lit(None).cast(c.dataType))
                    .otherwise(F.col(c.name))
                    .alias(c.name)
                )
        df.select(*cols).write.parquet(os.path.join(NULL_DIR, f))
    yield NULL_DIR


@pytest.mark.parametrize("name", sorted(_Q))
def test_query_survives_null_heavy_corpus(name, spark, null_sf):
    rows = _Q[name](spark, null_sf).collect()
    assert isinstance(rows, list)
