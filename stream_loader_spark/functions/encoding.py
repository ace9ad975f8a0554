"""Constraint-enforcing typed encoding (SURVEY §2.2 P5, §2.7 E1).

The reference derives encoders from case classes with constraint
annotations — ``@MaxLength(n)`` / ``@FixedLength(n)`` VARCHAR/CHAR
semantics with UTF-8-safe truncation at character boundaries
(sink/encoding/binary/ByteWriter.scala:87-106,
DataTypeEncodingAnnotation.scala:37-59) and ``@DecimalEncoding(p,s)``
range-checked decimals. Spark enforces none of this at runtime, so the
engine compiles the same constraints to Column expressions applied
before a sink:

- ``truncate_utf8``: longest prefix whose UTF-8 encoding fits the byte
  budget — never splits a multi-byte character. Pure higher-order
  expressions (per-character fold), no Python.
- ``fixed_utf8``: CHAR(n) flavor — truncate, then (byte-)pad with spaces.
- ``checked_decimal``: DECIMAL(p,s) with overflow → NULL (try_cast) or
  error, mirroring the encoder's range check.
- ``ColumnSpec/RecordEncoder``: a declarative record schema that applies
  all of the above and yields the output projection — the moral
  equivalent of the macro-derived encoders, with runtime schema objects
  instead of compile-time derivation.

CSV output contract (CsvRecordStreamWriter.scala:15-19 defaults): tab
separator, ``\\n`` rows, no header, null → empty string, timestamps
``yyyy-MM-dd HH:mm:ss.SSS`` — exposed both as writer options
(``csv_writer_options``) and as a single-line projection (``csv_line``)
for sinks that build records by hand.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CSV_TIMESTAMP_FORMAT = "yyyy-MM-dd HH:mm:ss.SSS"


def truncate_utf8(col: Column, max_bytes: int) -> Column:
    """UTF-8-safe truncation to ``max_bytes`` at a character boundary.

    Works directly on the UTF-8 bytes: cut at the budget, then step the
    cut point back past any continuation bytes (0b10xxxxxx) so a
    multi-byte character — including astral-plane characters, which
    split-by-character approaches corrupt via UTF-16 surrogates — is
    never divided. At most 3 steps (UTF-8 characters are ≤ 4 bytes), so
    the whole thing is a handful of byte probes per row, no per-character
    fold. Matches the reference encoder's truncation contract
    (ByteWriter.scala:87-106). Strings within budget short-circuit.
    """
    b = F.encode(col, "UTF-8")
    blen = F.octet_length(col)
    m = F.least(F.lit(max_bytes), blen)

    def byte_at(p: Column) -> Column:
        # byte value at 0-based index p (NULL-safe: '' → 0)
        return F.conv(F.hex(F.substring(b, p + 1, F.lit(1))), 16, 10).cast("int")

    def boundary(p: Column) -> Column:
        # cutting after p bytes is safe if the next byte starts a character
        return (p >= blen) | (byte_at(p).bitwiseAND(F.lit(0xC0)) != 0x80)

    def clamp(p: Column) -> Column:
        return F.greatest(p, F.lit(0))

    cut = (
        F.when(boundary(m), m)
        .when(boundary(clamp(m - 1)), clamp(m - 1))
        .when(boundary(clamp(m - 2)), clamp(m - 2))
        .otherwise(clamp(m - 3))
    )
    return F.when(blen <= max_bytes, col).otherwise(
        F.decode(F.substring(b, F.lit(1), cut), "UTF-8")
    )


def fixed_utf8(col: Column, n_bytes: int, pad: str = " ") -> Column:
    """CHAR(n) semantics: UTF-8-safe truncate, then pad to the byte size."""
    truncated = truncate_utf8(col, n_bytes)
    return F.concat(truncated, F.repeat(F.lit(pad), n_bytes - F.octet_length(truncated)))


def checked_decimal(col: Column, precision: int, scale: int, on_overflow: str = "null") -> Column:
    """DECIMAL(p,s) with an explicit overflow policy.

    'null' → out-of-range values become NULL (non-ANSI cast semantics);
    'error' → the task fails on the first out-of-range value, mirroring
    the reference encoder's IllegalArgumentException range check
    (LittleEndianByteWriter.scala:55-84).
    """
    target = f"decimal({precision},{scale})"
    if on_overflow == "null":
        return col.try_cast(target)
    if on_overflow == "error":
        # ANSI-independent strictness: a bare cast raises only while
        # spark.sql.ansi.enabled is true — under ANSI-off (common 3.x
        # compat setting) it silently NULLs, the exact behavior the
        # caller opted out of. try_cast + explicit raise keeps the
        # contract under ANY session config.
        tried = col.try_cast(target)
        err = F.raise_error(
            F.concat(
                F.lit(f"decimal({precision},{scale}) overflow: "),
                col.cast("string"),
            )
        ).cast(target)
        return F.when(col.isNotNull() & tried.isNull(), err).otherwise(tried)
    raise ValueError(f"unknown overflow policy {on_overflow!r}")


@dataclass(frozen=True)
class ColumnSpec:
    """One output column with optional constraints.

    ``decimal_overflow``: 'error' (default — ANSI cast fails the job on
    the first out-of-range value, the reference encoder's behavior) or
    'null' (out-of-range → NULL via try_cast).
    """

    name: str
    source: str | None = None  # defaults to name
    max_bytes: int | None = None  # VARCHAR(n): truncate
    fixed_bytes: int | None = None  # CHAR(n): truncate + pad
    decimal: tuple[int, int] | None = None  # (precision, scale)
    decimal_overflow: str = "error"

    def expr(self) -> Column:
        c = F.col(self.source or self.name)
        if self.max_bytes is not None:
            c = truncate_utf8(c, self.max_bytes)
        if self.fixed_bytes is not None:
            c = fixed_utf8(c, self.fixed_bytes)
        if self.decimal is not None:
            p, s = self.decimal
            c = checked_decimal(c, p, s, self.decimal_overflow)
        return c.alias(self.name)


class RecordEncoder:
    """Declarative record schema → constrained output projection.

    The runtime analogue of the reference's macro-derived encoders: the
    column list fixes names, order, and constraints; ``apply`` yields
    the projected DataFrame ready for any sink.
    """

    def __init__(self, *columns: ColumnSpec) -> None:
        self.columns = columns

    def apply(self, df: DataFrame) -> DataFrame:
        return df.select(*[c.expr() for c in self.columns])


def csv_writer_options() -> dict[str, str]:
    """Spark csv-writer options matching the reference's CSV defaults:
    TSV, no header, empty-string nulls, millisecond timestamps."""
    return {
        "sep": "\t",
        "header": "false",
        "nullValue": "",
        "emptyValue": "",
        "timestampFormat": CSV_TIMESTAMP_FORMAT,
    }


def csv_line(*cols: Column, sep: str = "\t") -> Column:
    """Single-column CSV/TSV line: nulls → empty string (concat_ws skips
    nulls only between separators, so nulls are coalesced explicitly).

    Columns are stringified with Spark's CANONICAL cast (timestamps
    print with their natural precision) — NOT the fixed .SSS contract
    ``csv_writer_options`` configures on the writer path. A caller that
    needs a fixed timestamp format must pre-format explicitly:
    ``csv_line(F.date_format(ts, CSV_TIMESTAMP_FORMAT), ...)``."""
    safe = [F.coalesce(c.cast("string"), F.lit("")) for c in cols]
    return F.concat_ws(sep, *safe)


def s3_loader_line(topic: Column, partition: Column, offset: Column, ts: Column, payload: Column) -> Column:
    """The reference S3 test-loader's record shape (loaders/S3.scala:51-57):
    ``{topic};{partition};{offset};{watermarkMillis};{payload}``."""
    return F.concat_ws(
        ";",
        topic,
        partition.cast("string"),
        offset.cast("string"),
        F.unix_millis(ts).cast("string"),
        payload,
    )
