"""TeraGen as a custom Python DataSource (PySpark 4 DataSource API) —
the engine's connector-plugin surface.

The expression-based generator in ``teragen.py`` is the fast path
(pure JVM). This module shows the same source as a *pluggable format*:

    spark.dataSource.register(TeraGenDataSource)
    df = (spark.read.format("teragen")
          .option("rows", 100_000).option("partitions", 16).load())

The reader plans its own input partitions (contiguous id ranges), so
parallelism is declared to Spark exactly like any file source's splits
— each executor generates only its range, nothing is materialized on
the driver. Rows are produced from a per-id md5 stream (stdlib-only on
the workers), so the data is deterministic for a (rows, seed) pair at
ANY partition count — retries and re-plans reproduce identical bytes.
This generator intentionally does NOT mirror ``teragen.py``'s
xxhash64-based keys (no xxhash in the Python stdlib); both satisfy the
GraySort shape (10-byte uniform printable key + 90-byte payload).

At 100 TB the same plugin shape wraps any external system: partitions()
enumerates shards/splits, read() streams one shard — Spark handles
scheduling, retries, and locality hints.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

KEY_LEN = 10
VALUE_LEN = 90


@dataclass
class IdRange(InputPartition):
    start: int
    end: int


def _record(i: int, seed: int) -> tuple[bytes, bytes]:
    digest = hashlib.md5(f"{seed}:{i}".encode()).digest()
    key = bytes(32 + b % 95 for b in digest[:KEY_LEN])
    value = str(i).zfill(32).ljust(VALUE_LEN, "X").encode()
    return key, value


class TeraGenReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = (self.rows + self.n_parts - 1) // self.n_parts
        return [
            IdRange(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: IdRange):
        for i in range(partition.start, partition.end):
            yield _record(i, self.seed)


class TeraGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "teragen"

    def schema(self) -> str:
        return "key binary, value binary"

    def reader(self, schema) -> TeraGenReader:
        return TeraGenReader(self.options)
