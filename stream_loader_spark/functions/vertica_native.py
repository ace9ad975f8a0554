"""Vertica native binary file format (SURVEY §2.7 E8).

Implements the public format from the Vertica documentation appendix
"Creating native binary format files": a file header (signature,
header-area length, version, column count and fixed widths) followed by
rows of [uint32 row-data size][null bitmap][column values], all
little-endian except where noted. Type encodings per the docs:
INTEGER = signed little-endian of declared width; FLOAT = IEEE-754
double; VARCHAR = uint32 length + bytes; BOOLEAN = 1 byte; DATE =
int64 days since 2000-01-01; TIMESTAMP = int64 microseconds since
2000-01-01 00:00:00. The reference's macro encoder targets the same
format (vertica/file/native/*, cited for parity, not copied).

The encoded stream is what ``COPY tbl FROM STDIN NATIVE`` ingests; a
JDBC sink pairs it with the offsets-table commit for exactly-once.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from datetime import date, datetime, timedelta, timezone
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

SIGNATURE = b"NATIVE\n\xff\r\n\x00"
VERTICA_EPOCH_DATE = date(2000, 1, 1)
VERTICA_EPOCH = datetime(2000, 1, 1, tzinfo=timezone.utc)
VARIABLE = 0xFFFFFFFF


def write_var_string(s: str, max_bytes: int, truncate: bool = True) -> bytes:
    """VARCHAR(n) native value: uint32 LE byte length + UTF-8 bytes,
    boundary-safe-truncated to ``max_bytes`` (the declared length is
    the length of the bytes actually written). ``truncate=False``
    raises on overflow — the reference writer's
    IllegalArgumentException contract."""
    from stream_loader_spark.functions.rowbinary import truncate_utf8_bytes

    b = s.encode("utf-8")
    if len(b) > max_bytes:
        if not truncate:
            raise ValueError(
                f"string of {len(b)} UTF-8 bytes exceeds max {max_bytes} and truncation is disabled"
            )
        b = truncate_utf8_bytes(b, max_bytes)
    return struct.pack("<I", len(b)) + b


def write_fixed_string(s: str, length_bytes: int, truncate: bool = True) -> bytes:
    """CHAR(n) native value: exactly n bytes — boundary-safe truncate
    then SPACE-pad (Vertica pads CHAR with spaces, unlike ClickHouse's
    NUL-padded FixedString)."""
    from stream_loader_spark.functions.rowbinary import truncate_utf8_bytes

    b = s.encode("utf-8")
    if len(b) > length_bytes:
        if not truncate:
            raise ValueError(
                f"string of {len(b)} UTF-8 bytes exceeds fixed length {length_bytes} and truncation is disabled"
            )
        b = truncate_utf8_bytes(b, length_bytes)
    return b + b" " * (length_bytes - len(b))


def write_var_byte_array(b: bytes, max_bytes: int, truncate: bool = True) -> bytes:
    """VARBINARY(n): uint32 LE length + raw bytes, hard-trimmed (no
    UTF-8 boundary logic — not text)."""
    if len(b) > max_bytes:
        if not truncate:
            raise ValueError(
                f"byte array of {len(b)} bytes exceeds max {max_bytes} and truncation is disabled"
            )
        b = b[:max_bytes]
    return struct.pack("<I", len(b)) + b


def write_fixed_byte_array(
    b: bytes, length: int, truncate: bool = True, pad_with: int = 0
) -> bytes:
    """BINARY(n): exactly n raw bytes, hard trim then pad."""
    if len(b) > length:
        if not truncate:
            raise ValueError(
                f"byte array of {len(b)} bytes exceeds fixed length {length} and truncation is disabled"
            )
        b = b[:length]
    return b + bytes([pad_with]) * (length - len(b))


@dataclass(frozen=True)
class VColumn:
    name: str
    vtype: str  # integer | float | boolean | varchar | char | date | timestamp
    width: int = 8  # fixed byte width; VARIABLE for varchar; n for char
    max_bytes: int | None = None  # varchar: VARCHAR(n) byte-truncation
    truncate: bool = True  # False: overflow raises instead of trimming

    @property
    def declared_width(self) -> int:
        return VARIABLE if self.vtype == "varchar" else self.width

    def encode(self, v) -> bytes:
        if self.vtype == "integer":
            return int(v).to_bytes(self.width, "little", signed=True)
        if self.vtype == "float":
            return struct.pack("<d", float(v))
        if self.vtype == "boolean":
            return b"\x01" if v else b"\x00"
        if self.vtype == "varchar":
            if isinstance(v, str):
                if self.max_bytes is not None:
                    return write_var_string(v, self.max_bytes, self.truncate)
                b = v.encode("utf-8")
            else:
                b = bytes(v)
                if self.max_bytes is not None:
                    return write_var_byte_array(b, self.max_bytes, self.truncate)
            return struct.pack("<I", len(b)) + b
        if self.vtype == "char":
            return write_fixed_string(str(v), self.width, self.truncate)
        if self.vtype == "date":
            d = v.date() if isinstance(v, datetime) else v
            return struct.pack("<q", (d - VERTICA_EPOCH_DATE).days)
        if self.vtype == "timestamp":
            ts = v if isinstance(v, datetime) else v.to_pydatetime()
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=timezone.utc)
            # exact integer arithmetic: float total_seconds()*1e6 is off
            # by 1µs from ~2136 and far worse for 9999-12-31 sentinels
            # (the same float-precision trap avro_codec documents)
            micros = (ts - VERTICA_EPOCH) // timedelta(microseconds=1)
            return struct.pack("<q", micros)
        raise ValueError(f"unsupported Vertica type {self.vtype!r}")


class VerticaNativeEncoder:
    def __init__(self, columns: list[VColumn]) -> None:
        self.columns = columns

    def file_header(self) -> bytes:
        ncols = len(self.columns)
        # header area: version(2) + filler(1) + ncols(2) + widths(4*ncols)
        area = struct.pack("<HBH", 1, 0, ncols) + b"".join(
            struct.pack("<I", c.declared_width) for c in self.columns
        )
        return SIGNATURE + struct.pack("<I", len(area)) + area

    def encode_row(self, row: dict) -> bytes:
        ncols = len(self.columns)
        bitmap = bytearray((ncols + 7) // 8)
        values = bytearray()
        for i, col in enumerate(self.columns):
            v = row[col.name]
            if (
                v is None
                or v is pd.NaT
                or v is pd.NA  # pandas extension-dtype null
                or (isinstance(v, float) and pd.isna(v))
            ):
                bitmap[i // 8] |= 0x80 >> (i % 8)  # docs: MSB-first null bits
            else:
                values += col.encode(v)
        return struct.pack("<I", len(values)) + bytes(bitmap) + bytes(values)

    def encode_rows(self, rows: list[dict], with_header: bool = True) -> bytes:
        body = b"".join(self.encode_row(r) for r in rows)
        return (self.file_header() + body) if with_header else body

    def encode_df(self, df: DataFrame) -> DataFrame:
        """→ (num_rows bigint, payload binary) per partition; payloads
        carry no header so a driver can concatenate them after one
        header (or stream each as its own COPY)."""
        columns = self.columns

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            enc = VerticaNativeEncoder(columns)
            total, chunks = 0, []
            for pdf in batches:
                recs = pdf.to_dict("records")
                chunks.append(enc.encode_rows(recs, with_header=False))
                total += len(recs)
            if total:
                yield pd.DataFrame({"num_rows": [total], "payload": [b"".join(chunks)]})

        return df.mapInPandas(run, schema="num_rows bigint, payload binary")


def copy_statement(
    table: str,
    file_ref: str = "STDIN",
    compression: str | None = None,
    load_method: str = "AUTO",
    csv: bool = False,
) -> str:
    """The COPY statement a Vertica sink issues per batch (NO COMMIT so
    the offsets insert + data load commit atomically in one txn)."""
    parts = [f"COPY {table} FROM {file_ref}"]
    if compression:
        parts.append(compression.upper())
    parts.append("DELIMITER E'\\t'" if csv else "NATIVE")
    parts.append("ABORT ON ERROR")
    parts.append(load_method)
    parts.append("NO COMMIT")
    return " ".join(parts)
