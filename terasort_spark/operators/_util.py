"""Shared determinism helpers (SURVEY.md §2b rules D1–D6).

Two cross-engine hazards, two fixes:

1. ``round(double, 4)`` differs between engines on exact half-way
   values: Spark rounds the double's shortest decimal representation
   (HALF_UP on "x.60995"), DuckDB rounds the binary value
   (x.6094999…→down). Fix: round as ``floor(x*10000 + 0.5)/10000`` —
   pure IEEE arithmetic, bit-identical on both engines for identical
   input doubles (verified).

2. Money-scale doubles summed in floating point are order-sensitive: at
   sf0.1 ``sum(l_extendedprice*(1-l_discount))`` ≈ 3e10, where partial
   summation order perturbs the result beyond 1e-4. Fix: sum through an
   exact DECIMAL cast (inputs are ≤6dp decimals → lossless), convert
   the exact sum to double, floor-round. This keeps the same query
   hash-stable on local[32] and on a 1000-executor cluster.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def scratch_dir(spark, name: str) -> str:
    """Session-scoped scratch path for sink/source round-trip queries.

    Fixed /tmp names collide when two Spark processes run the same
    operator concurrently (a pytest sweep next to a driver run clobbers
    the other's files mid-read — transient FileNotFound / parquet-footer
    errors). Suffixing the applicationId keeps the path stable WITHIN a
    session (idempotent re-runs, bench reps reuse the overwrite) while
    isolating processes — the same property a cluster job gets from a
    per-application staging directory."""
    app = spark.sparkContext.applicationId
    return os.path.join(tempfile.gettempdir(), f"terasort_spark_{name}_{app}")


# Token-hash dial for the sketch/LSH family (dedup_minhash,
# agg_heavyhitters): "md5" (default) keeps every bucket SQL-replayable in
# DuckDB — the exact-oracle mode the driver grades; "xxhash64" is the
# production mode for a 100 TB scan-bound corpus (single JVM-intrinsic
# 64-bit hash instead of a 128-bit digest + hex slicing — measured 1.6×
# cheaper on dedup_minhash, 2.4× on agg_heavyhitters at sf0.1,
# BASELINE.md). The bucket/banding STRUCTURE is hash-agnostic; a test
# pins that both modes produce identical dedup decisions at sf0.01.
TOKEN_HASH_CONF = "spark.terasort_spark.tokenHash"


def token_hash_mode(spark) -> str:
    mode = spark.conf.get(TOKEN_HASH_CONF, "md5")
    if mode not in ("md5", "xxhash64"):
        raise ValueError(f"{TOKEN_HASH_CONF} must be md5|xxhash64, got {mode!r}")
    return mode


def rnd(col: Column, alias: str | None = None, nd: int = 4) -> Column:
    """Engine-portable rounding: floor(x*10^nd + 0.5)/10^nd."""
    s = 10**nd
    out = F.floor(col * s + F.lit(0.5)) / F.lit(s)
    return out.alias(alias) if alias else out


def o_rnd(expr: str, alias: str | None = None, nd: int = 4) -> str:
    s = 10**nd
    sql = f"floor(({expr}) * {s} + 0.5) / {s}"
    return f"{sql} AS {alias}" if alias else sql


def dsum(col: Column, alias: str, nd: int = 4) -> Column:
    """Exact decimal sum of a money-scale double → floor-rounded double."""
    return rnd(F.sum(col.cast(DEC)).cast("double"), alias, nd)


def o_dsum(expr: str, alias: str, nd: int = 4) -> str:
    return o_rnd(f"CAST(sum(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)", alias, nd)


def ravg(col: Column, alias: str, nd: int = 4) -> Column:
    return rnd(F.avg(col), alias, nd)


def o_ravg(expr: str, alias: str, nd: int = 4) -> str:
    return o_rnd(f"avg({expr})", alias, nd)
