"""Pure-Python Apache Avro Object Container File codec.

The container ships neither ``fastavro`` nor the ``avro`` pip package,
but Iceberg's table metadata layer (manifests + manifest lists) is Avro
by spec — so real-format Iceberg interop from this repo needs an Avro
writer/reader that depends on nothing beyond the stdlib.  This module
implements the subset of the Avro 1.12 specification the Iceberg
metadata files use (and nothing speculative beyond it):

- primitives: null, boolean, int, long, float, double, bytes, string
- complex: record, array, map, union, fixed, enum
- object container files (magic ``Obj\\x01``, file-metadata map,
  sync-marker-delimited blocks) with the ``null`` and ``deflate``
  codecs (deflate = raw RFC-1951, ``zlib`` with ``wbits=-15``)

Correctness is pinned two independent ways in ``tests/test_iceberg_meta.py``:
byte-level golden vectors from the Avro spec (zigzag/varint examples),
and a CROSS-IMPLEMENTATION round-trip against the Apache Avro *Java*
library (``avro-1.12.1.jar`` ships on the Spark JVM classpath) — files
written here are read back with ``org.apache.avro.file.DataFileReader``
via py4j, and files written by the Java ``DataFileWriter`` are read
back here.

Scale notes: Avro appears ONLY in the metadata plane (one manifest
entry per data FILE, one manifest-list entry per manifest), so encode
cost is proportional to commit file counts, never to row counts; data
stays parquet.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Iterable

from aws_sdk_pandas_spark.exceptions import InvalidArgument

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


# ---------------------------------------------------------------- encoding


def encode_long(n: int, out: bytearray) -> None:
    """Zigzag + base-128 varint (Avro spec 'Binary encoding / long')."""
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1  # two's complement view for negatives
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _schema_type(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def encode(schema: Any, value: Any, out: bytearray) -> None:
    """Encode one datum against a (parsed-JSON) Avro schema."""
    t = _schema_type(schema)
    if t == "null":
        if value is not None:
            raise InvalidArgument(f"null schema got {value!r}")
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        encode_long(int(value), out)
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "bytes":
        b = bytes(value)
        encode_long(len(b), out)
        out += b
    elif t == "string":
        b = str(value).encode("utf-8")
        encode_long(len(b), out)
        out += b
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise InvalidArgument(
                f"fixed {schema.get('name')} wants {schema['size']} bytes, got {len(b)}"
            )
        out += b
    elif t == "enum":
        out_idx = schema["symbols"].index(value)
        encode_long(out_idx, out)
    elif t == "union":
        idx = _union_branch(schema, value)
        encode_long(idx, out)
        encode(schema[idx], value, out)
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] in value:
                encode(f["type"], value[f["name"]], out)
            elif "default" in f:
                encode(f["type"], f["default"], out)
            else:
                raise InvalidArgument(
                    f"record {schema.get('name')} missing field {f['name']!r}"
                )
    elif t == "array":
        items = list(value)
        if items:
            encode_long(len(items), out)
            for it in items:
                encode(schema["items"], it, out)
        encode_long(0, out)
    elif t == "map":
        if value:
            encode_long(len(value), out)
            for k, v in value.items():
                encode("string", k, out)
                encode(schema["values"], v, out)
        encode_long(0, out)
    else:
        raise InvalidArgument(f"unsupported Avro type: {t!r}")


def _union_branch(schemas: list, value: Any) -> int:
    """Pick the union branch for a python value (null vs not is the only
    ambiguity Iceberg metadata unions have — they are all [null, X])."""
    for i, s in enumerate(schemas):
        if _schema_type(s) == "null" and value is None:
            return i
    for i, s in enumerate(schemas):
        if _schema_type(s) != "null" and value is not None:
            return i
    raise InvalidArgument(f"no union branch in {schemas!r} for {value!r}")


def decode(schema: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    t = _schema_type(schema)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        return decode_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "bytes":
        n, pos = decode_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if t == "string":
        n, pos = decode_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t == "fixed":
        n = schema["size"]
        return bytes(buf[pos : pos + n]), pos + n
    if t == "enum":
        idx, pos = decode_long(buf, pos)
        return schema["symbols"][idx], pos
    if t == "union":
        idx, pos = decode_long(buf, pos)
        return decode(schema[idx], buf, pos)
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = decode(f["type"], buf, pos)
        return rec, pos
    if t == "array":
        out = []
        while True:
            n, pos = decode_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte-size prefix (writers may emit it)
                n = -n
                _, pos = decode_long(buf, pos)
            for _ in range(n):
                v, pos = decode(schema["items"], buf, pos)
                out.append(v)
    if t == "map":
        m = {}
        while True:
            n, pos = decode_long(buf, pos)
            if n == 0:
                return m, pos
            if n < 0:
                n = -n
                _, pos = decode_long(buf, pos)
            for _ in range(n):
                k, pos = decode("string", buf, pos)
                m[k], pos = decode(schema["values"], buf, pos)
    raise InvalidArgument(f"unsupported Avro type: {t!r}")


# ---------------------------------------------------- object container files


def write_container(
    path: str,
    schema: dict | list | str,
    records: Iterable[dict],
    *,
    metadata: dict[str, bytes | str] | None = None,
    codec: str = "deflate",
    sync: bytes | None = None,
) -> int:
    """Write an Avro Object Container File; returns bytes written.

    One block holds all records — Iceberg metadata files are small by
    construction (entries per FILE, not per row), and single-block files
    keep the writer deterministic for a fixed ``sync``.
    """
    if codec not in ("null", "deflate"):
        raise InvalidArgument(f"unsupported Avro codec {codec!r}")
    sync = sync or os.urandom(SYNC_SIZE)
    if len(sync) != SYNC_SIZE:
        raise InvalidArgument("sync marker must be 16 bytes")
    schema_json = schema if isinstance(schema, str) else json.dumps(schema)
    parsed = json.loads(schema_json)

    meta: dict[str, bytes] = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("ascii"),
    }
    for k, v in (metadata or {}).items():
        meta[k] = v.encode("utf-8") if isinstance(v, str) else bytes(v)

    body = bytearray()
    n = 0
    for rec in records:
        encode(parsed, rec, body)
        n += 1
    payload = bytes(body)
    if codec == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = c.compress(payload) + c.flush()

    out = bytearray(MAGIC)
    encode_long(len(meta), out)
    for k in sorted(meta):  # sorted -> byte-deterministic for fixed sync
        encode("string", k, out)
        encode("bytes", meta[k], out)
    encode_long(0, out)
    out += sync
    if n:
        encode_long(n, out)
        encode_long(len(payload), out)
        out += payload
        out += sync

    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(out)
    os.replace(tmp, path)
    return len(out)


def read_container(path: str) -> tuple[dict | list | str, dict[str, bytes], list[dict]]:
    """Read an Avro OCF; returns (parsed schema, file metadata, records)."""
    with open(path, "rb") as fh:
        return read_container_bytes(fh.read(), name=path)


def read_container_bytes(
    buf: bytes, *, name: str = "<bytes>", header_only: bool = False
) -> tuple[dict | list | str, dict[str, bytes], list[dict]]:
    """Read an Avro OCF from memory (the distributed-read path: Spark's
    binaryFile ships whole containers to executors)."""
    path = name
    if buf[:4] != MAGIC:
        raise InvalidArgument(f"not an Avro object container file: {path!r}")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        cnt, pos = decode_long(buf, pos)
        if cnt == 0:
            break
        if cnt < 0:
            cnt = -cnt
            _, pos = decode_long(buf, pos)
        for _ in range(cnt):
            k, pos = decode("string", buf, pos)
            v, pos = decode("bytes", buf, pos)
            meta[k] = v
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("ascii")
    if codec not in ("null", "deflate"):
        raise InvalidArgument(f"unsupported Avro codec {codec!r} in {path!r}")
    sync = buf[pos : pos + SYNC_SIZE]
    pos += SYNC_SIZE
    records: list[dict] = []
    if header_only:
        return schema, meta, records
    while pos < len(buf):
        n, pos = decode_long(buf, pos)
        size, pos = decode_long(buf, pos)
        block = buf[pos : pos + size]
        pos += size
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bpos = 0
        for _ in range(n):
            rec, bpos = decode(schema, block, bpos)
            records.append(rec)
        if buf[pos : pos + SYNC_SIZE] != sync:
            raise InvalidArgument(f"corrupt Avro block (sync mismatch) in {path!r}")
        pos += SYNC_SIZE
    return schema, meta, records
