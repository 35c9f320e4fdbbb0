"""Registry entries for the terasort module, upgraded to exact-oracle
grading (SURVEY.md §2a R1–R5; the binary GraySort pipeline itself lives
in sources/teragen.py with TeraValidate invariants in
tests/test_terasort.py).

The registered queries use a splitmix-style integer mixer whose every
step (multiply, mod 2^32, xor, shift) is exact 64-bit integer
arithmetic expressible identically in Spark and DuckDB, so the
generated keys — unlike the xxhash64-based binary generator — have a
bit-exact SQL oracle:

- ``teragen``: the generated (id, key, value) rows themselves
  hash-compare against a DuckDB regeneration from ``range()``.
- ``terasort``: runs the real pipeline (repartitionByRange +
  sortWithinPartitions) and materializes each row's PHYSICAL global
  position (partition offset + encounter order inside the partition,
  captured by an order-preserving mapInPandas). The oracle assigns
  ``row_number() OVER (ORDER BY key, id)``; an order-insensitive hash
  match on (idx, key, id) therefore proves the engine's range
  partitioner put every row in the right partition AND the
  partition-local sort ordered it correctly — the TeraValidate triple
  as one equality.

Scale: generation is embarrassingly parallel from ``spark.range``; the
sort is one range exchange + local sort (spill-safe); the index
assignment adds only a 16-row partition-count aggregate broadcast back.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from terasort_spark.registry import register

N_ROWS = 100_000  # driver-facing sample; module tests run 1M binary rows
N_PARTS = 16
KEY_LEN = 10
VALUE_LEN = 90


def mix32(v):
    """Splitmix-style mixer on a non-negative bigint column → uniform
    value in [0, 2^32). Every intermediate stays below 2^63: inputs up
    to 2^31 keep the first product under 2^63, and the value is capped
    to 2^31 before the second multiply. Spark ANSI mode and DuckDB
    therefore compute identical values for any v in [0, 2^31)."""
    z = (v * F.lit(2654435761)) % F.lit(4294967296)
    z = z.bitwiseXOR(F.shiftright(z, 16))
    z = ((z % F.lit(2147483648)) * F.lit(2246822519)) % F.lit(4294967296)
    z = z.bitwiseXOR(F.shiftright(z, 13))
    return z


def mix32_sql(v: str) -> str:
    """DuckDB twin of :func:`mix32` — bit-exact by construction."""
    z1 = f"((({v}) * 2654435761) % 4294967296)"
    z2 = f"xor({z1}, {z1} >> 16)"
    z3 = f"((({z2}) % 2147483648) * 2246822519) % 4294967296"
    return f"xor(({z3}), ({z3}) >> 13)"


def _mix(v):
    return mix32(v) % F.lit(95)


def _mix_sql(v: str) -> str:
    return f"(({mix32_sql(v)}) % 95)"


def _gen_df(spark, n_rows: int, n_partitions: int):
    """GraySort-shaped rows: 10-char printable-ASCII key (uniform per
    char), 90-char value carrying the zero-padded row id."""
    ids = spark.range(0, n_rows, numPartitions=n_partitions)
    key = F.concat(
        *[
            F.chr(F.lit(32) + _mix(F.col("id") * KEY_LEN + F.lit(i)))
            for i in range(KEY_LEN)
        ]
    ).alias("key")
    value = F.rpad(
        F.lpad(F.col("id").cast("string"), 32, "0"), VALUE_LEN, "X"
    ).alias("value")
    return ids.select("id", key, value)


_KEY_SQL = "||".join(
    f"chr(CAST(32 + {_mix_sql(f'id * {KEY_LEN} + {i}')} AS INT))"
    for i in range(KEY_LEN)
)
_GEN_SQL = f"""
SELECT id,
       {_KEY_SQL} AS key,
       rpad(lpad(CAST(id AS VARCHAR), 32, '0'), {VALUE_LEN}, 'X') AS value
FROM range(0, {N_ROWS}) t(id)
"""


@register("teragen", oracle=_GEN_SQL)
def teragen_query(spark, sf_dir):
    return _gen_df(spark, N_ROWS, N_PARTS)


@register(
    "terasort",
    oracle=f"""
WITH g AS ({_GEN_SQL})
SELECT CAST(row_number() OVER (ORDER BY key, id) - 1 AS BIGINT) AS idx,
       key, id
FROM g
""",
)
def terasort_query(spark, sf_dir):
    srt = (
        _gen_df(spark, N_ROWS, N_PARTS)
        .repartitionByRange(N_PARTS, "key", "id")
        .sortWithinPartitions("key", "id")
        .withColumn("pid", F.spark_partition_id())
        .select("pid", "key", "id")
    )

    def tag(batches):
        # Encounter order inside the partition — mapInPandas receives
        # this partition's batches in physical row order, so local_idx
        # records what the sort ACTUALLY produced, not a re-sort.
        nxt = 0
        for b in batches:
            n = len(b)
            yield b.assign(local_idx=range(nxt, nxt + n))
            nxt += n

    # localCheckpoint pins ONE physical execution of the range exchange:
    # the offsets branch below derives from the SAME materialized rows
    # as the output branch, so the two can never see different sampled
    # range boundaries (they previously re-executed srt twice and were
    # aligned only by exchange reuse — r5 ADVICE).
    tagged = srt.mapInPandas(
        tag, schema="pid int, key string, id bigint, local_idx bigint"
    ).localCheckpoint(eager=False)
    w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        tagged.groupBy("pid")
        .agg((F.max("local_idx") + 1).alias("n"))
        .select(
            "pid", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("offset")
        )
    )
    return tagged.join(F.broadcast(offsets), "pid").select(
        (F.col("offset") + F.col("local_idx")).alias("idx"), "key", "id"
    )
