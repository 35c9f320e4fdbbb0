"""Shared determinism helpers (SURVEY.md §2b rules D1–D6).

Money-scale doubles summed in floating point are order-sensitive: at
sf0.1 ``sum(l_extendedprice*(1-l_discount))`` ≈ 3e10, where summation
order perturbs the result by more than the 1e-4 the round(,4) contract
can absorb. Both engines therefore sum through an exact DECIMAL cast
(input values are ≤6dp decimals, so the cast is lossless), then convert
the exact sum to double and round. Cheap JVM-side, deterministic at any
scale and any partitioning — this is what makes the same query
hash-stable on local[32] and on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column, alias: str, ndigits: int = 4) -> Column:
    """Exact decimal sum of a money-scale double → rounded double."""
    return F.round(F.sum(col.cast(DEC)).cast("double"), ndigits).alias(alias)


def o_dsum(expr: str, alias: str, ndigits: int = 4) -> str:
    return f"round(CAST(sum(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE), {ndigits}) AS {alias}"


def ravg(col: Column, alias: str, ndigits: int = 4) -> Column:
    return F.round(F.avg(col), ndigits).alias(alias)


def rnd(col: Column, alias: str, ndigits: int = 4) -> Column:
    return F.round(col, ndigits).alias(alias)
