"""Pure-Python Protocol Buffers wire-format codec (SURVEY §2.7 E5).

Implements the public protobuf *wire format*
(protobuf.dev/programming-guides/encoding): base-128 varints, zigzag
for sint*, little-endian fixed32/64, and length-delimited fields
(string/bytes/nested message/packed repeated). The reference writes
protobuf messages straight to parquet via parquet-protobuf
(hadoop/parquet/ProtoParquetFileBuilder.scala:23-54); here the decode
step is a schema-driven pure-Python reader executed via Arrow-batched
``mapInPandas``, so binary Kafka payloads become typed Spark columns
with no protoc, no descriptor files and no external jar.

Message specs are plain dicts — the shape ``protoc`` would have burned
into generated code, declared inline::

    SPEC = {
        1: ("id", "int32"),
        2: ("name", "string"),
        3: ("scores", "repeated double"),   # packed or unpacked
        4: ("child", ("message", CHILD_SPEC)),
        5: ("tags", "repeated string"),
    }

Unknown fields are skipped by wire type (forward compatibility, the
same contract protoc-generated parsers honor). Missing fields decode
to None/[] (proto3 presence semantics are the caller's concern).

Scale note: same as the Avro codec — per-record decode, no shuffle,
embarrassingly parallel; the Arrow boundary is the only overhead.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

__all__ = ["encode", "decode", "spec_to_spark_ddl"]

_WIRE_VARINT = 0
_WIRE_FIXED64 = 1
_WIRE_LEN = 2
_WIRE_FIXED32 = 5

_VARINT_TYPES = {"int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool", "enum"}
_FIXED64_TYPES = {"fixed64", "sfixed64", "double"}
_FIXED32_TYPES = {"fixed32", "sfixed32", "float"}
_LEN_TYPES = {"string", "bytes"}


def _norm(ftype: Any) -> tuple[str, Any, bool]:
    """→ (base_type, nested_spec|None, repeated)."""
    repeated = False
    if isinstance(ftype, str) and ftype.startswith("repeated "):
        repeated = True
        ftype = ftype[len("repeated ") :]
    if isinstance(ftype, tuple):
        tag = ftype[0]
        if tag == "repeated":
            return (*_norm(ftype[1])[:2], True)
        if tag == "message":
            return "message", ftype[1], repeated
        raise ValueError(f"bad field type: {ftype!r}")
    return ftype, None, repeated


# -- varint ------------------------------------------------------------------


def _write_varint(n: int, out: bytearray) -> None:
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _to_signed64(n: int) -> int:
    return n - (1 << 64) if n >= 1 << 63 else n


def _to_signed32(n: int) -> int:
    n &= 0xFFFFFFFF
    return n - (1 << 32) if n >= 1 << 31 else n


# -- encode ------------------------------------------------------------------


def encode(msg: dict[str, Any], spec: dict[int, tuple[str, Any]]) -> bytes:
    out = bytearray()
    for fnum, (fname, ftype) in sorted(spec.items()):
        if fname not in msg or msg[fname] is None:
            continue
        base, nested, repeated = _norm(ftype)
        values = msg[fname] if repeated else [msg[fname]]
        if repeated and base in _VARINT_TYPES | _FIXED32_TYPES | _FIXED64_TYPES and values:
            # packed encoding (proto3 default for scalar repeated)
            payload = bytearray()
            for v in values:
                _encode_scalar(v, base, payload)
            _write_varint(fnum << 3 | _WIRE_LEN, out)
            _write_varint(len(payload), out)
            out.extend(payload)
            continue
        for v in values:
            if base == "message":
                payload = encode(v, nested)
                _write_varint(fnum << 3 | _WIRE_LEN, out)
                _write_varint(len(payload), out)
                out.extend(payload)
            elif base in _LEN_TYPES:
                data = v.encode("utf-8") if base == "string" else bytes(v)
                _write_varint(fnum << 3 | _WIRE_LEN, out)
                _write_varint(len(data), out)
                out.extend(data)
            else:
                _write_varint(fnum << 3 | _wire_type(base), out)
                _encode_scalar(v, base, out)
    return bytes(out)


def _wire_type(base: str) -> int:
    if base in _VARINT_TYPES:
        return _WIRE_VARINT
    if base in _FIXED64_TYPES:
        return _WIRE_FIXED64
    if base in _FIXED32_TYPES:
        return _WIRE_FIXED32
    raise ValueError(f"no wire type for {base}")


def _encode_scalar(v: Any, base: str, out: bytearray) -> None:
    if base in ("int32", "int64", "uint32", "uint64", "enum"):
        _write_varint(int(v), out)
    elif base in ("sint32", "sint64"):
        _write_varint(_zigzag(int(v)), out)
    elif base == "bool":
        _write_varint(1 if v else 0, out)
    elif base == "double":
        out.extend(struct.pack("<d", v))
    elif base == "float":
        out.extend(struct.pack("<f", v))
    elif base == "fixed64":
        out.extend(struct.pack("<Q", v & 0xFFFFFFFFFFFFFFFF))
    elif base == "sfixed64":
        out.extend(struct.pack("<q", v))
    elif base == "fixed32":
        out.extend(struct.pack("<I", v & 0xFFFFFFFF))
    elif base == "sfixed32":
        out.extend(struct.pack("<i", v))
    else:  # pragma: no cover
        raise ValueError(f"cannot encode scalar {base}")


# -- decode ------------------------------------------------------------------


def decode(data: bytes, spec: dict[int, tuple[str, Any]]) -> dict[str, Any]:
    buf = bytes(data)
    result: dict[str, Any] = {}
    for _, (fname, ftype) in spec.items():
        _, _, repeated = _norm(ftype)
        result[fname] = [] if repeated else None
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        fnum, wt = key >> 3, key & 7
        if fnum not in spec:
            pos = _skip(buf, pos, wt)
            continue
        fname, ftype = spec[fnum]
        base, nested, repeated = _norm(ftype)
        if wt == _WIRE_LEN:
            ln, pos = _read_varint(buf, pos)
            chunk = buf[pos : pos + ln]
            pos += ln
            if base == "message":
                val = decode(chunk, nested)
            elif base == "string":
                val = chunk.decode("utf-8")
            elif base == "bytes":
                val = chunk
            elif repeated:  # packed scalars
                vals, cp = [], 0
                while cp < len(chunk):
                    v, cp = _decode_scalar(chunk, cp, base, _wire_type(base))
                    vals.append(v)
                result[fname].extend(vals)
                continue
            else:
                raise ValueError(f"length-delimited data for scalar field {fname}")
            if repeated:
                result[fname].append(val)
            else:
                result[fname] = val
        else:
            val, pos = _decode_scalar(buf, pos, base, wt)
            if repeated:
                result[fname].append(val)
            else:
                result[fname] = val
    return result


def _decode_scalar(buf: bytes, pos: int, base: str, wt: int) -> tuple[Any, int]:
    if wt == _WIRE_VARINT:
        raw, pos = _read_varint(buf, pos)
        if base in ("sint32", "sint64"):
            return _unzigzag(raw), pos
        if base == "bool":
            return raw != 0, pos
        if base in ("int32", "int64", "enum"):
            # enums are wire-encoded like int32: a negative value is the
            # 10-byte sign-extended varint, so skipping the sign fold
            # returned 2^64-1 for -1 (then overflowed the int column)
            return _to_signed64(raw), pos
        return raw, pos  # uint32/uint64
    if wt == _WIRE_FIXED64:
        if base == "double":
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        raw = struct.unpack_from("<Q", buf, pos)[0]
        return (_to_signed64(raw) if base == "sfixed64" else raw), pos + 8
    if wt == _WIRE_FIXED32:
        if base == "float":
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
        raw = struct.unpack_from("<I", buf, pos)[0]
        return (_to_signed32(raw) if base == "sfixed32" else raw), pos + 4
    raise ValueError(f"unexpected wire type {wt} for {base}")


def _skip(buf: bytes, pos: int, wt: int) -> int:
    if wt == _WIRE_VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wt == _WIRE_FIXED64:
        return pos + 8
    if wt == _WIRE_FIXED32:
        return pos + 4
    if wt == _WIRE_LEN:
        ln, pos = _read_varint(buf, pos)
        return pos + ln
    raise ValueError(f"cannot skip wire type {wt}")


# -- spec → Spark DDL --------------------------------------------------------

_SPARK_TYPES = {
    "int32": "int",
    "sint32": "int",
    "sfixed32": "int",
    "uint32": "bigint",
    "fixed32": "bigint",
    "int64": "bigint",
    "sint64": "bigint",
    "sfixed64": "bigint",
    "uint64": "bigint",  # may overflow; callers needing full range use decimal
    "fixed64": "bigint",
    "bool": "boolean",
    "enum": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "bytes": "binary",
}


def spec_to_spark_ddl(spec: dict[int, tuple[str, Any]]) -> str:
    return ", ".join(
        f"{name} {_field_spark_type(ftype)}" for _, (name, ftype) in sorted(spec.items())
    )


def _field_spark_type(ftype: Any) -> str:
    base, nested, repeated = _norm(ftype)
    if base == "message":
        inner = ", ".join(
            f"{n}: {_field_spark_type(t)}" for _, (n, t) in sorted(nested.items())
        )
        t = f"struct<{inner}>"
    else:
        t = _SPARK_TYPES[base]
    return f"array<{t}>" if repeated else t
