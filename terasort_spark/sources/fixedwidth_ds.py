"""Fixed-width binary record files as a custom Python DataSource
(PySpark 4 DataSource API) — the engine's file-format-plugin surface
for the reconstructed reference's 100-byte GraySort records (SURVEY.md
§4.2: ``binaryRecords`` covers the read semantics; THIS module is the
pluggable-format version with its own split planning).

    spark.dataSource.register(FixedWidthDataSource)
    df = (spark.read.format("fixedwidth")
          .option("path", dir).option("record_len", 100)
          .option("key_len", 10).load())
    # -> key binary, value binary

Split planning mirrors what a JVM FileFormat does: every ``*.dat`` file
is carved into RECORD-ALIGNED byte ranges of ~``split_bytes`` each, so
a single huge file still fans out across executors (binaryRecords
parallelizes per file via Hadoop splits; this reader makes the
alignment arithmetic explicit and testable). Each task reads only its
[start, end) range — no driver materialization, bounded memory per
task (one IO buffer), and a truncated/misaligned file fails loudly at
planning time instead of silently yielding a short record.

At 100 TB the same plugin shape wraps any blocked binary layout:
partitions() enumerates record-aligned splits, read() streams one
split; Spark handles scheduling, retries, and locality.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_IO_CHUNK = 1 << 20  # stream the split in 1 MiB reads


@dataclass
class ByteRange(InputPartition):
    path: str
    start: int
    end: int


class FixedWidthReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fixedwidth source requires option 'path'")
        self.record_len = int(options.get("record_len", 100))
        self.key_len = int(options.get("key_len", 10))
        if not 0 < self.key_len < self.record_len:
            raise ValueError("need 0 < key_len < record_len")
        # default split ~1 MiB, always a multiple of record_len
        self.split_bytes = int(options.get("split_bytes", _IO_CHUNK))

    def partitions(self):
        rl = self.record_len
        step = max(1, self.split_bytes // rl) * rl
        files = (
            sorted(glob.glob(os.path.join(self.path, "*.dat")))
            if os.path.isdir(self.path)
            else [self.path]
        )
        splits = []
        for fp in files:
            size = os.path.getsize(fp)
            if size % rl:
                raise ValueError(
                    f"{fp}: {size} bytes is not a multiple of record_len={rl}"
                )
            splits += [
                ByteRange(fp, off, min(off + step, size))
                for off in range(0, size, step)
            ]
        # Spark requires >= 1 partition; an empty dir yields one empty split
        return splits or [ByteRange("", 0, 0)]

    def read(self, partition: ByteRange):
        if not partition.path:
            return
        rl, kl = self.record_len, self.key_len
        # splits were planned from the DRIVER's view of the filesystem;
        # on a cluster without a shared FS the file can be absent here
        # even though planning succeeded — name that misconfiguration
        # explicitly so it is not mistaken for data corruption
        if not os.path.exists(partition.path):
            raise FileNotFoundError(
                f"{partition.path}: planned on the driver but not visible "
                "to this executor — the fixedwidth source requires a "
                "filesystem shared by driver and executors (NFS/local)"
            )
        with open(partition.path, "rb") as f:
            f.seek(partition.start)
            remaining = partition.end - partition.start
            while remaining > 0:
                # chunk reads stay record-aligned: _IO_CHUNK is rounded
                # down to a record multiple (and >= one record)
                want = min(remaining, max(rl, (_IO_CHUNK // rl) * rl))
                buf = f.read(want)
                if len(buf) != want:
                    raise IOError(
                        f"{partition.path}: short read at {f.tell()}"
                    )
                for off in range(0, len(buf), rl):
                    rec = buf[off : off + rl]
                    yield (rec[:kl], rec[kl:])
                remaining -= want


class FixedWidthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def schema(self) -> str:
        return "key binary, value binary"

    def reader(self, schema) -> FixedWidthReader:
        return FixedWidthReader(self.options)
