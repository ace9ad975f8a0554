"""Pure-Python Avro binary codec (SURVEY §2.2 P2 / §2.7 E4).

Implements the public Avro 1.11 *binary encoding* spec
(avro.apache.org/docs/current/specification — "Binary Encoding"):
zigzag-varint ints/longs, little-endian IEEE float/double,
length-prefixed bytes/strings, block-encoded arrays/maps,
union-index-prefixed unions, plus the logical types the reference's
test message exercises (stream-loader-tests ExampleMessage.scala:22-33
via avro4s: timestamp-millis, uuid, decimal(18,6) on bytes).

Why hand-roll it: the spark-avro jar is an EXTERNAL package absent in
this environment, so `from_avro` cannot run. The binary format itself
is tiny and fully public, so the decode moves to an Arrow-batched
``mapInPandas`` stage — executor-parallel, one Python decode per
payload, no JVM dependency. On a cluster where the jar IS present,
``operators/projection.py`` keeps preferring the codegen'd `from_avro`
path; this module is the portable fallback and the golden-test oracle.

Timestamp convention: ``decode`` returns tz-AWARE UTC datetimes
(exact integer epoch-delta arithmetic — the 9999-12-31 sentinel and
post-2242 values decode exactly), while Spark's `from_avro` +
``collect()`` yields tz-NAIVE session-local datetimes. When using this
codec as the oracle against `from_avro` output, normalize first:
``spark_dt.replace(tzinfo=timezone.utc)`` under a UTC session timezone
(`tests/test_wire_formats.py::TestAvroLogicalTypeRoundtrip` pins both
the arithmetic and the awareness contract).

Scale note: decode cost is per-record and embarrassingly parallel —
the stage carries no shuffle and pipelines into whatever follows.
Arrow batches amortize the Python boundary; for a 100 TB Kafka backfill
the decode stage scales linearly with executors exactly like the
reference's per-consumer-thread decode loop.
"""

from __future__ import annotations

import datetime as _dt
import json
import struct
import uuid as _uuid
from decimal import Decimal
from typing import Any, Iterator

__all__ = [
    "AvroSchema",
    "parse_schema",
    "encode",
    "decode",
    "avro_to_spark_ddl",
]

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


class AvroSchema:
    """Parsed Avro schema node: ``kind`` is the (resolved) type name,
    plus kind-specific attributes. Named-type references resolve
    through ``names`` at parse time."""

    def __init__(self, kind: str, **attrs: Any) -> None:
        self.kind = kind
        self.logical = attrs.pop("logical", None)
        self.attrs = attrs

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"AvroSchema({self.kind}, logical={self.logical}, {self.attrs})"


def parse_schema(schema_json: str | dict | list) -> AvroSchema:
    names: dict[str, AvroSchema] = {}
    node = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    return _parse(node, names)


def _parse(node: Any, names: dict[str, AvroSchema]) -> AvroSchema:
    if isinstance(node, str):
        if node in _PRIMITIVES:
            return AvroSchema(node)
        if node in names:
            return names[node]
        raise ValueError(f"unknown Avro type reference: {node!r}")
    if isinstance(node, list):
        return AvroSchema("union", branches=[_parse(b, names) for b in node])
    if not isinstance(node, dict):
        raise ValueError(f"bad Avro schema node: {node!r}")

    t = node["type"]
    logical = node.get("logicalType")
    if t in _PRIMITIVES:
        s = AvroSchema(t, logical=logical)
        if logical == "decimal":
            s.attrs["precision"] = node.get("precision", 38)
            s.attrs["scale"] = node.get("scale", 0)
        return s
    if t == "record":
        s = AvroSchema("record", fields=[])
        if "name" in node:
            names[node["name"]] = s
        s.attrs["name"] = node.get("name", "record")
        s.attrs["fields"] = [
            (f["name"], _parse(f["type"], names)) for f in node["fields"]
        ]
        return s
    if t == "array":
        return AvroSchema("array", items=_parse(node["items"], names))
    if t == "map":
        return AvroSchema("map", values=_parse(node["values"], names))
    if t == "enum":
        s = AvroSchema("enum", symbols=list(node["symbols"]), logical=logical)
        if "name" in node:
            names[node["name"]] = s
        return s
    if t == "fixed":
        s = AvroSchema("fixed", size=int(node["size"]), logical=logical)
        if logical == "decimal":
            s.attrs["precision"] = node.get("precision", 38)
            s.attrs["scale"] = node.get("scale", 0)
        if "name" in node:
            names[node["name"]] = s
        return s
    if isinstance(t, (dict, list)):  # nested {"type": {...}} wrapper
        return _parse(t, names)
    raise ValueError(f"unsupported Avro type: {t!r}")


# -- varint / zigzag ---------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _write_long(n: int, out: bytearray) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
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


# -- encode ------------------------------------------------------------------


# Timestamp convention: decode() returns tz-AWARE UTC datetimes; Spark's
# from_avro + collect() under a UTC session timezone yields the same wall
# values tz-NAIVE. Strip tzinfo (or attach utc) before comparing the two.
# All arithmetic is exact integer epoch-delta: float seconds would drift
# ±1µs past ~2242 and fromtimestamp() raises on the year-9999 sentinel.
_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _timestamp_units(value: _dt.datetime, unit: _dt.timedelta) -> int:
    if value.tzinfo is None:
        value = value.replace(tzinfo=_dt.timezone.utc)
    return (value - _EPOCH) // unit


def encode(value: Any, schema: AvroSchema) -> bytes:
    out = bytearray()
    _encode(value, schema, out)
    return bytes(out)


def _encode(value: Any, s: AvroSchema, out: bytearray) -> None:
    k = s.kind
    if k == "null":
        return
    if k == "boolean":
        out.append(1 if value else 0)
    elif k in ("int", "long"):
        if s.logical == "timestamp-millis" and not isinstance(value, int):
            value = _timestamp_units(value, _dt.timedelta(milliseconds=1))
        elif s.logical == "timestamp-micros" and not isinstance(value, int):
            value = _timestamp_units(value, _dt.timedelta(microseconds=1))
        elif s.logical == "date" and not isinstance(value, int):
            value = value.toordinal() - 719163  # days since 1970-01-01
        _write_long(int(value), out)
    elif k == "float":
        out.extend(struct.pack("<f", value))
    elif k == "double":
        out.extend(struct.pack("<d", value))
    elif k in ("bytes", "string"):
        if s.logical == "decimal" and isinstance(value, Decimal):
            unscaled = int(value.scaleb(s.attrs["scale"]).to_integral_value())
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            data = unscaled.to_bytes(nbytes, "big", signed=True)
        elif k == "string":
            data = str(value).encode("utf-8")
        else:
            data = bytes(value)
        _write_long(len(data), out)
        out.extend(data)
    elif k == "record":
        for fname, fschema in s.attrs["fields"]:
            _encode(value[fname], fschema, out)
    elif k == "array":
        items = list(value)
        if items:
            _write_long(len(items), out)
            for it in items:
                _encode(it, s.attrs["items"], out)
        _write_long(0, out)
    elif k == "map":
        entries = dict(value)
        if entries:
            _write_long(len(entries), out)
            for mk, mv in entries.items():
                _write_long(len(mk.encode()), out)
                out.extend(mk.encode())
                _encode(mv, s.attrs["values"], out)
        _write_long(0, out)
    elif k == "union":
        idx = _union_branch(value, s.attrs["branches"])
        _write_long(idx, out)
        _encode(value, s.attrs["branches"][idx], out)
    elif k == "enum":
        _write_long(s.attrs["symbols"].index(value), out)
    elif k == "fixed":
        if s.logical == "uuid" and isinstance(value, (str, _uuid.UUID)):
            value = _uuid.UUID(str(value)).bytes
        elif s.logical == "decimal" and isinstance(value, Decimal):
            unscaled = int(value.scaleb(s.attrs["scale"]).to_integral_value())
            value = unscaled.to_bytes(s.attrs["size"], "big", signed=True)
        data = bytes(value)
        if len(data) != s.attrs["size"]:
            raise ValueError(f"fixed size mismatch: {len(data)} != {s.attrs['size']}")
        out.extend(data)
    else:  # pragma: no cover
        raise ValueError(f"cannot encode kind {k}")


def _union_branch(value: Any, branches: list[AvroSchema]) -> int:
    if value is None:
        for i, b in enumerate(branches):
            if b.kind == "null":
                return i
        raise ValueError("None for union without null branch")
    # match the value's Python type to a branch — first-non-null chose
    # branch 0 regardless of type, silently stringifying an int in a
    # ['string','int'] union (and crashing on the reverse order). bool
    # is checked before int (bool IS int in Python).
    type_order = [
        ("boolean", bool),
        ("long", int),
        ("int", int),
        ("double", float),
        ("float", float),
        ("string", str),
        ("bytes", (bytes, bytearray)),
    ]
    for kind, pytypes in type_order:
        if isinstance(value, pytypes) and not (
            kind != "boolean" and isinstance(value, bool)
        ):
            for i, b in enumerate(branches):
                if b.kind == kind:
                    return i
    # complex values (records/arrays/maps/enums/fixed): take the first
    # structurally-plausible non-null branch, as before
    for i, b in enumerate(branches):
        if b.kind != "null" and b.kind not in {
            k for k, _ in type_order
        }:
            return i
    for i, b in enumerate(branches):
        if b.kind != "null":
            return i
    raise ValueError("no non-null union branch")


# -- decode ------------------------------------------------------------------


def decode(data: bytes, schema: AvroSchema) -> Any:
    value, pos = _decode(bytes(data), schema, 0)
    if pos != len(data):
        raise ValueError(f"trailing bytes after Avro record: {len(data) - pos}")
    return value


def _decode(buf: bytes, s: AvroSchema, pos: int) -> tuple[Any, int]:
    k = s.kind
    if k == "null":
        return None, pos
    if k == "boolean":
        return buf[pos] != 0, pos + 1
    if k in ("int", "long"):
        n, pos = _read_long(buf, pos)
        if s.logical == "date":
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=n), pos
        if s.logical == "timestamp-millis":
            return _EPOCH + _dt.timedelta(milliseconds=n), pos
        if s.logical == "timestamp-micros":
            return _EPOCH + _dt.timedelta(microseconds=n), pos
        return n, pos
    if k == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if k == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if k in ("bytes", "string"):
        ln, pos = _read_long(buf, pos)
        raw = buf[pos : pos + ln]
        pos += ln
        if s.logical == "decimal":
            unscaled = int.from_bytes(raw, "big", signed=True)
            return Decimal(unscaled).scaleb(-s.attrs["scale"]), pos
        if k == "string":
            return raw.decode("utf-8"), pos
        return raw, pos
    if k == "record":
        rec = {}
        for fname, fschema in s.attrs["fields"]:
            rec[fname], pos = _decode(buf, fschema, pos)
        return rec, pos
    if k == "array":
        items: list[Any] = []
        while True:
            count, pos = _read_long(buf, pos)
            if count == 0:
                return items, pos
            if count < 0:  # block with byte-size prefix
                count = -count
                _, pos = _read_long(buf, pos)
            for _ in range(count):
                v, pos = _decode(buf, s.attrs["items"], pos)
                items.append(v)
    if k == "map":
        entries: dict[str, Any] = {}
        while True:
            count, pos = _read_long(buf, pos)
            if count == 0:
                return entries, pos
            if count < 0:
                count = -count
                _, pos = _read_long(buf, pos)
            for _ in range(count):
                kl, pos = _read_long(buf, pos)
                key = buf[pos : pos + kl].decode("utf-8")
                pos += kl
                entries[key], pos = _decode(buf, s.attrs["values"], pos)
    if k == "union":
        idx, pos = _read_long(buf, pos)
        return _decode(buf, s.attrs["branches"][idx], pos)
    if k == "enum":
        idx, pos = _read_long(buf, pos)
        return s.attrs["symbols"][idx], pos
    if k == "fixed":
        raw = buf[pos : pos + s.attrs["size"]]
        pos += s.attrs["size"]
        if s.logical == "uuid":
            return str(_uuid.UUID(bytes=raw)), pos
        if s.logical == "decimal":
            unscaled = int.from_bytes(raw, "big", signed=True)
            return Decimal(unscaled).scaleb(-s.attrs["scale"]), pos
        return raw, pos
    raise ValueError(f"cannot decode kind {k}")  # pragma: no cover


# -- Avro schema → Spark DDL -------------------------------------------------


def avro_to_spark_ddl(schema: AvroSchema) -> str:
    """Spark DDL for a top-level record schema (decode target)."""
    if schema.kind != "record":
        raise ValueError("top-level Avro schema must be a record")
    cols = [f"{n} {_spark_type(t)}" for n, t in schema.attrs["fields"]]
    return ", ".join(cols)


def _spark_type(s: AvroSchema) -> str:
    k = s.kind
    if s.logical in ("timestamp-millis", "timestamp-micros"):
        return "timestamp"
    if s.logical == "date":
        return "date"
    if s.logical == "decimal":
        return f"decimal({s.attrs['precision']},{s.attrs['scale']})"
    if s.logical == "uuid":
        return "string"
    simple = {
        "null": "string",
        "boolean": "boolean",
        "int": "int",
        "long": "bigint",
        "float": "float",
        "double": "double",
        "bytes": "binary",
        "string": "string",
        "enum": "string",
        "fixed": "binary",
    }
    if k in simple:
        return simple[k]
    if k == "array":
        return f"array<{_spark_type(s.attrs['items'])}>"
    if k == "map":
        return f"map<string,{_spark_type(s.attrs['values'])}>"
    if k == "union":
        non_null = [b for b in s.attrs["branches"] if b.kind != "null"]
        if len(non_null) != 1:
            raise ValueError("only [null, T] unions map to Spark types")
        return _spark_type(non_null[0])
    if k == "record":
        inner = ", ".join(
            f"{n}: {_spark_type(t)}" for n, t in s.attrs["fields"]
        )
        return f"struct<{inner}>"
    raise ValueError(f"no Spark mapping for {k}")
