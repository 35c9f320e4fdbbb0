"""Protocol Buffers wire-format streams as a custom Python DataSource
— built from the PUBLIC protobuf encoding spec (varints, zigzag,
little-endian fixed64/fixed32, length-delimited fields), the same
from-scratch approach as the repo's Avro/JPEG/PNG/LZW decoders. No
`protobuf` library is required (this container does not ship one).

    spark.dataSource.register(ProtobufDataSource)
    df = (spark.read.format("pyproto")
          .option("path", dir)
          .option("fields", json.dumps(FIELDS)).load())

File layout is the standard length-delimited stream (each record is a
varint byte-length followed by the message bytes — the
`writeDelimitedTo` convention used for protobuf-at-rest and Kafka
dumps). Unlike Avro there is NO in-file sync marker, so the honest
split unit is the FILE: partitions() emits one task per file, and the
writer shards one file per executor partition. That is the shape a
real protobuf corpus has at 100 TB (many medium files from a
log-shipper), and the documented reason to prefer the Avro source when
single-file splittability matters.

Schema is a field descriptor list (the reader's analogue of a compiled
.proto): `[{"num": 1, "name": "k", "type": "int64"}, ...]` with types
  int64   -> varint, two's-complement (negatives are 10 bytes)
  sint64  -> varint, zigzag
  bool    -> varint 0/1
  double  -> fixed64 little-endian IEEE
  float   -> fixed32 little-endian IEEE
  string  -> length-delimited UTF-8
  bytes   -> length-delimited raw

Proto3 presence semantics are honored on BOTH paths: the writer emits
every non-None value explicitly (explicit presence, so zero/empty
round-trip exactly), None is simply absent from the wire, and a field
absent from a message reads back as NULL. Fields on the wire that the
descriptor does not know are SKIPPED by wire type — the spec's
forward-compatibility rule — which the registered query exercises by
writing an extra undeclared field into every record.
"""

from __future__ import annotations

import glob
import json
import os
import struct
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_MASK64 = (1 << 64) - 1
_IO_CHUNK = 1 << 20

_TYPES = ("int64", "sint64", "bool", "double", "float", "string", "bytes")
_WIRE = {
    "int64": 0,
    "sint64": 0,
    "bool": 0,
    "double": 1,
    "float": 5,
    "string": 2,
    "bytes": 2,
}
_DDL = {
    "int64": "bigint",
    "sint64": "bigint",
    "bool": "boolean",
    "double": "double",
    "float": "float",
    "string": "string",
    "bytes": "binary",
}


# ---------------------------------------------------------------------------
# wire primitives (protobuf encoding spec)


def uvarint_encode(u: int) -> bytes:
    if u < 0:
        raise ValueError("uvarint is unsigned")
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def uvarint_decode(buf: bytes, pos: int) -> tuple[int, int]:
    """(value, new_pos); raises IndexError on truncation."""
    u = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 10 bytes")


def int64_encode(n: int) -> bytes:
    # two's complement on 64 bits: -1 encodes as 10 bytes of 0xFF..0x01
    return uvarint_encode(n & _MASK64)


def int64_from_u(u: int) -> int:
    return u - (1 << 64) if u >> 63 else u


def sint64_encode(n: int) -> bytes:
    return uvarint_encode(((n << 1) ^ (n >> 63)) & _MASK64)


def sint64_from_u(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# ---------------------------------------------------------------------------
# message encode / decode against a descriptor


def _check_fields(fields: list[dict]) -> None:
    seen = set()
    for f in fields:
        if f["type"] not in _TYPES:
            raise ValueError(f"unsupported field type {f['type']!r}")
        if not 1 <= int(f["num"]) <= 536870911:
            raise ValueError(f"field number {f['num']} out of range")
        if int(f["num"]) in seen:
            raise ValueError(f"duplicate field number {f['num']}")
        seen.add(int(f["num"]))


def encode_message(values: dict, fields: list[dict]) -> bytes:
    """dict {name: value} -> message bytes. None values are omitted
    (absent on the wire); everything else is written explicitly."""
    out = bytearray()
    for f in fields:
        v = values.get(f["name"])
        if v is None:
            continue
        num, ft = int(f["num"]), f["type"]
        out += uvarint_encode((num << 3) | _WIRE[ft])
        if ft == "int64":
            out += int64_encode(int(v))
        elif ft == "sint64":
            out += sint64_encode(int(v))
        elif ft == "bool":
            out += uvarint_encode(1 if v else 0)
        elif ft == "double":
            out += struct.pack("<d", float(v))
        elif ft == "float":
            out += struct.pack("<f", float(v))
        elif ft == "string":
            b = str(v).encode("utf-8")
            out += uvarint_encode(len(b)) + b
        elif ft == "bytes":
            b = bytes(v)
            out += uvarint_encode(len(b)) + b
    return bytes(out)


def _skip(buf: bytes, pos: int, wire: int) -> int:
    """Skip one unknown field's payload — the forward-compat rule."""
    if wire == 0:
        _, pos = uvarint_decode(buf, pos)
        return pos
    if wire == 1:
        return pos + 8
    if wire == 2:
        ln, pos = uvarint_decode(buf, pos)
        return pos + ln
    if wire == 5:
        return pos + 4
    raise ValueError(f"unsupported wire type {wire} (groups are proto2-legacy)")


def decode_message(buf: bytes, fields: list[dict]) -> tuple:
    """message bytes -> row tuple in descriptor order; unknown field
    numbers are skipped by wire type; absent fields are None. Last
    occurrence wins for a repeated scalar, per the spec."""
    by_num = {int(f["num"]): f for f in fields}
    vals = {f["name"]: None for f in fields}
    pos = 0
    while pos < len(buf):
        tag, pos = uvarint_decode(buf, pos)
        num, wire = tag >> 3, tag & 7
        f = by_num.get(num)
        if f is None or _WIRE[f["type"]] != wire:
            pos = _skip(buf, pos, wire)
            continue
        ft = f["type"]
        if ft == "int64":
            u, pos = uvarint_decode(buf, pos)
            vals[f["name"]] = int64_from_u(u)
        elif ft == "sint64":
            u, pos = uvarint_decode(buf, pos)
            vals[f["name"]] = sint64_from_u(u)
        elif ft == "bool":
            u, pos = uvarint_decode(buf, pos)
            vals[f["name"]] = bool(u)
        elif ft == "double":
            vals[f["name"]] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif ft == "float":
            vals[f["name"]] = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        else:  # string / bytes
            ln, pos = uvarint_decode(buf, pos)
            raw = bytes(buf[pos : pos + ln])
            if len(raw) != ln:
                raise IndexError("truncated length-delimited field")
            pos += ln
            vals[f["name"]] = raw.decode("utf-8") if ft == "string" else raw
    return tuple(vals[f["name"]] for f in fields)


# ---------------------------------------------------------------------------
# compiled per-row codecs — encode_message/decode_message above are the
# spec-reference implementations (and what the tests pin); these
# precompile the per-field dispatch once so the hot loop does no string
# type-compares or dict building per row. Semantics are identical.


def compile_row_encoder(fields: list[dict]):
    """fields -> fn(tuple_in_descriptor_order) -> message bytes."""
    _check_fields(fields)
    enc = []
    for f in fields:
        tag = uvarint_encode((int(f["num"]) << 3) | _WIRE[f["type"]])
        ft = f["type"]
        if ft == "int64":
            enc.append(lambda v, t=tag: t + uvarint_encode(int(v) & _MASK64))
        elif ft == "sint64":
            enc.append(lambda v, t=tag: t + sint64_encode(int(v)))
        elif ft == "bool":
            enc.append(lambda v, t=tag: t + (b"\x01" if v else b"\x00"))
        elif ft == "double":
            enc.append(lambda v, t=tag: t + struct.pack("<d", float(v)))
        elif ft == "float":
            enc.append(lambda v, t=tag: t + struct.pack("<f", float(v)))
        elif ft == "string":
            def _s(v, t=tag):
                b = str(v).encode("utf-8")
                return t + uvarint_encode(len(b)) + b
            enc.append(_s)
        else:  # bytes
            def _b(v, t=tag):
                b = bytes(v)
                return t + uvarint_encode(len(b)) + b
            enc.append(_b)

    def encode_row(row: tuple) -> bytes:
        return b"".join(e(v) for e, v in zip(enc, row) if v is not None)

    return encode_row


def _compile_tag_table(fields: list[dict]):
    """tag -> (column_index, type) for the fast decode loop."""
    return {
        (int(f["num"]) << 3) | _WIRE[f["type"]]: (i, f["type"])
        for i, f in enumerate(fields)
    }


def decode_message_fast(buf: bytes, by_tag: dict, n_cols: int) -> list:
    """Same semantics as decode_message (unknown/wrong-wire skip,
    last-wins, absent->None) against a precompiled tag table."""
    row = [None] * n_cols
    pos = 0
    blen = len(buf)
    while pos < blen:
        tag, pos = uvarint_decode(buf, pos)
        hit = by_tag.get(tag)
        if hit is None:
            pos = _skip(buf, pos, tag & 7)
            continue
        i, ft = hit
        if ft == "double":
            row[i] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif ft == "float":
            row[i] = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif ft in ("string", "bytes"):
            ln, pos = uvarint_decode(buf, pos)
            raw = bytes(buf[pos : pos + ln])
            if len(raw) != ln:
                raise IndexError("truncated length-delimited field")
            pos += ln
            row[i] = raw.decode("utf-8") if ft == "string" else raw
        else:
            u, pos = uvarint_decode(buf, pos)
            if ft == "int64":
                row[i] = u - (1 << 64) if u >> 63 else u
            elif ft == "sint64":
                row[i] = (u >> 1) ^ -(u & 1)
            else:
                row[i] = bool(u)
    return row


# ---------------------------------------------------------------------------
# file writer (length-delimited stream; one file per executor partition)


def write_pb(path: str, rows, fields: list[dict]) -> int:
    """Write rows (dicts or tuples in descriptor order) as a
    length-delimited protobuf stream; returns the record count."""
    _check_fields(fields)
    names = [f["name"] for f in fields]
    encode_row = compile_row_encoder(fields)
    n = 0
    out = bytearray()
    with open(path, "wb") as f:
        for r in rows:
            if isinstance(r, dict):
                r = tuple(r.get(nm) for nm in names)
            msg = encode_row(r)
            out += uvarint_encode(len(msg))
            out += msg
            n += 1
            if len(out) >= _IO_CHUNK:
                f.write(out)
                out = bytearray()
        f.write(out)
    return n


# ---------------------------------------------------------------------------
# DataSource plugin


@dataclass
class PbSplit(InputPartition):
    path: str
    fields_json: str


class ProtobufReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.fields_json = options.get("fields")
        if not self.path or not self.fields_json:
            raise ValueError("pyproto source requires options 'path' and 'fields'")
        _check_fields(json.loads(self.fields_json))

    def _files(self):
        if os.path.isdir(self.path):
            return sorted(glob.glob(os.path.join(self.path, "*.pb")))
        return [self.path]

    def partitions(self):
        # length-delimited framing has no sync marker: the split unit is
        # the whole file (one task per file; writers shard per partition)
        files = self._files()
        return [PbSplit(fp, self.fields_json) for fp in files] or [
            PbSplit("", self.fields_json)
        ]

    # rows per emitted Arrow batch: large enough to amortize the
    # from_arrays call, small enough to bound per-batch memory
    _BATCH_ROWS = 4096

    def read(self, split: PbSplit):
        # Yields pyarrow.RecordBatch (Spark 4 Python DataSource direct
        # Arrow support) instead of per-row tuples — same decode loop,
        # the worker's row-pickle boundary is skipped (guide §4.1).
        import pyarrow as pa

        if not split.path:
            return
        fields = json.loads(split.fields_json)
        by_tag = _compile_tag_table(fields)
        n_cols = len(fields)
        arrow_types = {
            "int64": pa.int64(),
            "sint64": pa.int64(),
            "bool": pa.bool_(),
            "double": pa.float64(),
            "float": pa.float32(),
            "string": pa.string(),
            "bytes": pa.binary(),
        }
        arrow_schema = pa.schema(
            [(f["name"], arrow_types[f["type"]]) for f in fields]
        )

        def batch(cols):
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(col, type=fld.type)
                    for col, fld in zip(cols, arrow_schema)
                ],
                schema=arrow_schema,
            )

        with open(split.path, "rb") as f:
            buf = f.read()
        pos = 0
        cols = [[] for _ in range(n_cols)]
        n = 0
        while pos < len(buf):
            ln, pos = uvarint_decode(buf, pos)
            msg = buf[pos : pos + ln]
            if len(msg) != ln:
                raise IOError(f"{split.path}: truncated record at {pos}")
            pos += ln
            row = decode_message_fast(msg, by_tag, n_cols)
            for col, v in zip(cols, row):
                col.append(v)
            n += 1
            if n >= self._BATCH_ROWS:
                yield batch(cols)
                cols = [[] for _ in range(n_cols)]
                n = 0
        if n:
            yield batch(cols)


class ProtobufDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pyproto"

    def schema(self) -> str:
        fields_json = self.options.get("fields")
        if not fields_json:
            raise ValueError("pyproto source requires option 'fields'")
        fields = json.loads(fields_json)
        _check_fields(fields)
        return ", ".join(f"{f['name']} {_DDL[f['type']]}" for f in fields)

    def reader(self, schema) -> ProtobufReader:
        return ProtobufReader(self.options)
