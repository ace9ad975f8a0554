"""Golden-byte tests for the binary wire formats (the reference's
RowBinary/native encoder test layer, SURVEY §5.1) — expected bytes are
hand-derived from the public ClickHouse/Vertica format documentation."""

import struct

import pytest
import uuid
from datetime import date, datetime, timezone
from decimal import Decimal

from pyspark.sql import functions as F

from stream_loader_spark.functions.rowbinary import CHType, RowBinaryEncoder, leb128
from stream_loader_spark.functions.vertica_native import (
    VColumn,
    VerticaNativeEncoder,
    copy_statement,
    SIGNATURE,
)


class TestLeb128:
    def test_known_values(self):
        assert leb128(0) == b"\x00"
        assert leb128(127) == b"\x7f"
        assert leb128(128) == b"\x80\x01"
        assert leb128(300) == b"\xac\x02"


class TestRowBinaryGoldenBytes:
    def test_scalar_row(self):
        enc = RowBinaryEncoder(
            [
                ("a", CHType("Int32")),
                ("s", CHType("String")),
                ("n", CHType("Int64", nullable=True)),
                ("arr", CHType("Int32", array=True)),
            ]
        )
        got = enc.encode_rows([{"a": 3, "s": "hi", "n": None, "arr": [1, 2]}])
        expected = (
            b"\x03\x00\x00\x00"  # Int32 3
            + b"\x02hi"  # String len=2
            + b"\x01"  # NULL marker
            + b"\x02" + b"\x01\x00\x00\x00" + b"\x02\x00\x00\x00"  # Array[1,2]
        )
        assert got == expected

    def test_nullable_present_and_temporal(self):
        enc = RowBinaryEncoder(
            [
                ("n", CHType("Int64", nullable=True)),
                ("d", CHType("Date")),
                ("t", CHType("DateTime")),
                ("t3", CHType("DateTime64(3)")),
            ]
        )
        ts = datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
        got = enc.encode_rows([{"n": 7, "d": date(2024, 1, 2), "t": ts, "t3": ts}])
        epoch_days = (date(2024, 1, 2) - date(1970, 1, 1)).days
        epoch_sec = int(ts.timestamp())
        expected = (
            b"\x00" + struct.pack("<q", 7)
            + struct.pack("<H", epoch_days)
            + struct.pack("<I", epoch_sec)
            + struct.pack("<q", epoch_sec * 1000)
        )
        assert got == expected

    def test_decimal_and_uuid(self):
        enc = RowBinaryEncoder(
            [("m", CHType("Decimal(18,6)")), ("u", CHType("UUID"))]
        )
        u = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
        got = enc.encode_rows([{"m": Decimal("1.5"), "u": u}])
        assert got[:8] == struct.pack("<q", 1_500_000)
        # two little-endian UInt64 halves
        assert got[8:] == bytes.fromhex("7766554433221100ffeeddccbbaa9988")

    def test_unicode_string_length_is_bytes(self):
        enc = RowBinaryEncoder([("s", CHType("String"))])
        got = enc.encode_rows([{"s": "日本"}])
        assert got == leb128(6) + "日本".encode("utf-8")

    def test_distributed_encoding_matches_local(self, spark):
        enc = RowBinaryEncoder([("id", CHType("Int64")), ("name", CHType("String"))])
        df = spark.range(100).select(
            F.col("id"), F.concat(F.lit("n"), F.col("id").cast("string")).alias("name")
        ).coalesce(1)
        out = enc.encode_df(df).collect()
        assert len(out) == 1 and out[0]["num_rows"] == 100
        local = enc.encode_rows([{"id": i, "name": f"n{i}"} for i in range(100)])
        assert bytes(out[0]["payload"]) == local


class TestVerticaNativeGoldenBytes:
    def test_file_header(self):
        enc = VerticaNativeEncoder(
            [VColumn("id", "integer", 8), VColumn("name", "varchar"), VColumn("ok", "boolean", 1)]
        )
        h = enc.file_header()
        assert h.startswith(SIGNATURE)
        area_len = struct.unpack("<I", h[11:15])[0]
        assert area_len == 2 + 1 + 2 + 4 * 3
        version, filler, ncols = struct.unpack("<HBH", h[15:20])
        assert (version, filler, ncols) == (1, 0, 3)
        widths = struct.unpack("<III", h[20:32])
        assert widths == (8, 0xFFFFFFFF, 1)

    def test_row_encoding_with_null_bitmap(self):
        enc = VerticaNativeEncoder(
            [VColumn("id", "integer", 8), VColumn("name", "varchar"), VColumn("ok", "boolean", 1)]
        )
        row = enc.encode_row({"id": 1, "name": None, "ok": True})
        values = struct.pack("<q", 1) + b"\x01"  # name omitted (NULL)
        assert row == struct.pack("<I", len(values)) + b"\x40" + values  # bit 1 set MSB-first

    def test_temporal_epochs(self):
        enc = VerticaNativeEncoder(
            [VColumn("d", "date", 8), VColumn("t", "timestamp", 8)]
        )
        ts = datetime(2000, 1, 2, 0, 0, 1, tzinfo=timezone.utc)
        row = enc.encode_row({"d": date(2000, 1, 3), "t": ts})
        body = row[4 + 1 :]  # skip size + 1-byte bitmap
        assert struct.unpack("<q", body[:8])[0] == 2  # days since 2000-01-01
        assert struct.unpack("<q", body[8:16])[0] == 86_401_000_000  # µs since 2000

    def test_distributed_encoding_roundtrip_sizes(self, spark):
        enc = VerticaNativeEncoder([VColumn("id", "integer", 8), VColumn("v", "float", 8)])
        df = spark.range(50).select(F.col("id"), (F.col("id") * 1.5).alias("v")).coalesce(2)
        parts = enc.encode_df(df).collect()
        assert sum(p["num_rows"] for p in parts) == 50
        # each row: 4 size + 1 bitmap + 16 values
        assert sum(len(bytes(p["payload"])) for p in parts) == 50 * 21

    def test_copy_statement(self):
        assert (
            copy_statement("t", compression="zstd")
            == "COPY t FROM STDIN ZSTD NATIVE ABORT ON ERROR AUTO NO COMMIT"
        )
        assert "DELIMITER" in copy_statement("t", csv=True)


class TestRowBinaryNulls:
    def test_null_temporal_from_pandas_frames(self, spark):
        """Nullable DateTime columns arrive as pd.NaT through mapInPandas;
        they must encode as the 0x01 null marker, not crash. A fixed
        timestamp makes the exact expected payload computable."""
        from pyspark.sql import functions as F

        enc = RowBinaryEncoder(
            [("id", CHType("Int64")), ("t", CHType("DateTime64(3)", nullable=True))]
        )
        fixed = datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
        df = spark.range(4).select(
            "id",
            F.when(F.col("id") % 2 == 0, F.lit(fixed)).alias("t"),
        ).coalesce(1)
        out = enc.encode_df(df).collect()
        assert out[0]["num_rows"] == 4
        payload = bytes(out[0]["payload"])
        present = b"\x00" + struct.pack("<q", int(fixed.timestamp() * 1000))
        expected = b"".join(
            struct.pack("<q", i) + (present if i % 2 == 0 else b"\x01")
            for i in range(4)
        )
        assert payload == expected


class TestRowBinaryVectorizedPath:
    def test_fixed_width_fast_path_matches_row_path(self, spark):
        """The interleaved-numpy fast path must produce byte-identical
        output to the general row loop."""
        import pandas as pd

        enc = RowBinaryEncoder(
            [("a", CHType("Int64")), ("b", CHType("Float64")), ("c", CHType("Int32"))]
        )
        pdf = pd.DataFrame(
            {"a": range(1000), "b": [i * 1.5 for i in range(1000)], "c": range(1000)}
        )
        fast = enc.encode_batch(pdf)
        slow = enc.encode_rows(pdf.to_dict("records"))
        assert fast == slow
        assert len(fast) == 1000 * (8 + 8 + 4)

    def test_mixed_schema_falls_back(self, spark):
        import pandas as pd

        enc = RowBinaryEncoder([("a", CHType("Int64")), ("s", CHType("String"))])
        assert enc._fixed_width_dtype() is None
        got = enc.encode_batch(pd.DataFrame({"a": [1], "s": ["x"]}))
        assert got == struct.pack("<q", 1) + b"\x01x"


class TestRowBinaryNestedArrays:
    """Array(Array(T)) golden bytes — recursive LEB128-counted levels
    (reference RowBinaryClickHouseRecordEncoder.scala:89-116); deeper
    nesting aborts at construction like the reference's compile error."""

    def test_nested_array_golden_bytes(self):
        enc = RowBinaryEncoder([("m", CHType("Int32", array_depth=2))])
        got = enc.encode_rows([{"m": [[1, 2], [], [3]]}])
        expected = (
            b"\x03"  # outer count
            + b"\x02" + b"\x01\x00\x00\x00" + b"\x02\x00\x00\x00"  # [1, 2]
            + b"\x00"  # []
            + b"\x01" + b"\x03\x00\x00\x00"  # [3]
        )
        assert got == expected

    def test_nested_string_array(self):
        enc = RowBinaryEncoder([("m", CHType("String", array_depth=2))])
        got = enc.encode_rows([{"m": [["ab"], ["c", ""]]}])
        expected = (
            b"\x02"
            + b"\x01" + b"\x02ab"
            + b"\x02" + b"\x01c" + b"\x00"
        )
        assert got == expected

    def test_null_outer_array_encodes_empty(self):
        enc = RowBinaryEncoder([("m", CHType("Int32", array_depth=2))])
        assert enc.encode_rows([{"m": None}]) == b"\x00"

    def test_nested_nullable_elements(self):
        enc = RowBinaryEncoder([("m", CHType("Int64", nullable=True, array_depth=2))])
        got = enc.encode_rows([{"m": [[5, None]]}])
        expected = b"\x01" + b"\x02" + b"\x00" + struct.pack("<q", 5) + b"\x01"
        assert got == expected

    def test_depth_three_aborts(self):
        with pytest.raises(ValueError, match="nest at most 2"):
            CHType("Int32", array_depth=3)

    def test_depth_one_via_array_flag_unchanged(self):
        assert CHType("Int32", array=True).encode([1]) == b"\x01\x01\x00\x00\x00"


# ---------------------------------------------------------------------------
# Reference writer-primitive parity: one test per vector in
# RowBinaryClickHousePrimitiveTypeWriterTest.scala:54-160 and
# NativeVerticaPrimitiveTypeWriterTest.scala:34-123 (same inputs, same
# expected bytes/strings/errors), plus the reference's three property
# tests ported to hypothesis.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

from stream_loader_spark.functions import rowbinary as rb  # noqa: E402
from stream_loader_spark.functions import vertica_native as vn  # noqa: E402


def _leb_decode(b: bytes) -> tuple[int, int]:
    val, shift, i = 0, 0, 0
    while True:
        val |= (b[i] & 0x7F) << shift
        if not b[i] & 0x80:
            return val, i + 1
        shift += 7
        i += 1


class TestRowBinaryStringPrimitives:
    """RowBinaryClickHousePrimitiveTypeWriterTest parity."""

    @settings(max_examples=200, deadline=None)
    @given(st.text(), st.integers(1, 32767))
    def test_always_writes_correct_string_byte_length(self, s, max_bytes):
        out = rb.write_string(s, max_bytes, truncate=True)
        length, used = _leb_decode(out)
        assert len(out[used:]) == length

    @settings(max_examples=200, deadline=None)
    @given(st.text(), st.integers(1, 32767))
    def test_trimmed_strings_fit_max_bytes(self, s, max_bytes):
        out = rb.write_string(s, max_bytes, truncate=True)
        _, used = _leb_decode(out)
        assert len(out[used:]) <= max_bytes

    @settings(max_examples=200, deadline=None)
    @given(st.text(), st.integers(1, 32767))
    def test_trimmed_strings_are_prefixes(self, s, max_bytes):
        out = rb.write_string(s, max_bytes, truncate=True)
        _, used = _leb_decode(out)
        assert s.startswith(out[used:].decode("utf-8"))

    def test_trims_simple_example_strings(self):
        out = rb.write_string("123456789", 5, truncate=True)
        assert out == leb128(5) + b"12345"

    def test_trims_multibyte_character_strings(self):
        # 4 x 2-byte characters (U+0080), two should remain
        out = rb.write_string("\u0080\u0080\u0080\u0080", 5, truncate=True)
        _, used = _leb_decode(out)
        assert out[used:].decode("utf-8") == "\u0080\u0080"
        # 2 x 4-byte characters (U+10000), one should remain
        out = rb.write_string("\U00010000\U00010000", 5, truncate=True)
        _, used = _leb_decode(out)
        assert out[used:].decode("utf-8") == "\U00010000"

    def test_trims_fixed_length_strings(self):
        assert rb.write_fixed_string("123456789", 5, truncate=True) == b"12345"

    def test_pads_fixed_length_strings(self):
        assert (
            rb.write_fixed_string("123456789", 15, truncate=True)
            == b"123456789" + b"\x00" * 6
        )

    def test_trims_fixed_length_byte_arrays(self):
        assert (
            rb.write_fixed_byte_array(bytes([1, 2, 3, 4, 5, 6]), 5, truncate=True)
            == bytes([1, 2, 3, 4, 5])
        )

    def test_pads_fixed_length_byte_arrays(self):
        assert (
            rb.write_fixed_byte_array(bytes([1, 2, 3, 4]), 10, truncate=True)
            == bytes([1, 2, 3, 4]) + b"\x00" * 6
        )

    def test_truncation_disabled_variable_string_raises(self):
        with pytest.raises(ValueError):
            rb.write_string("123456", 5, truncate=False)

    def test_truncation_disabled_fixed_string_raises(self):
        with pytest.raises(ValueError):
            rb.write_fixed_string("123456", 5, truncate=False)

    def test_truncation_disabled_byte_array_raises(self):
        with pytest.raises(ValueError):
            rb.write_fixed_byte_array(bytes([1, 2, 3, 4]), 3, truncate=False)

    def test_schema_level_varchar_and_fixedstring(self):
        enc = RowBinaryEncoder(
            [
                ("v", CHType("String", max_bytes=5)),
                ("f", CHType("String", fixed_bytes=6)),
            ]
        )
        out = enc.encode_rows([{"v": "123456789", "f": "abc"}])
        assert out == leb128(5) + b"12345" + b"abc\x00\x00\x00"


class TestVerticaStringPrimitives:
    """NativeVerticaPrimitiveTypeWriterTest parity."""

    @settings(max_examples=200, deadline=None)
    @given(st.text(), st.integers(1, 32767))
    def test_always_writes_correct_string_byte_length(self, s, max_bytes):
        out = vn.write_var_string(s, max_bytes, truncate=True)
        (length,) = struct.unpack("<I", out[:4])
        assert len(out[4:]) == length

    @settings(max_examples=200, deadline=None)
    @given(st.text(), st.integers(1, 32767))
    def test_trimmed_strings_fit_max_bytes(self, s, max_bytes):
        out = vn.write_var_string(s, max_bytes, truncate=True)
        assert len(out[4:]) <= max_bytes

    @settings(max_examples=200, deadline=None)
    @given(st.text(), st.integers(1, 32767))
    def test_trimmed_strings_are_prefixes(self, s, max_bytes):
        out = vn.write_var_string(s, max_bytes, truncate=True)
        assert s.startswith(out[4:].decode("utf-8"))

    def test_trims_simple_example_strings(self):
        assert vn.write_var_string("123456789", 5, truncate=True) == struct.pack("<I", 5) + b"12345"

    def test_trims_multibyte_character_strings(self):
        out = vn.write_var_string("\u0080\u0080\u0080\u0080", 5, truncate=True)
        assert out[4:].decode("utf-8") == "\u0080\u0080"
        out = vn.write_var_string("\U00010000\U00010000", 5, truncate=True)
        assert out[4:].decode("utf-8") == "\U00010000"

    def test_trims_fixed_length_strings(self):
        assert vn.write_fixed_string("123456789", 5, truncate=True) == b"12345"

    def test_pads_fixed_length_strings_with_spaces(self):
        # Vertica CHAR pads with SPACES (ClickHouse FixedString uses NULs)
        assert vn.write_fixed_string("123456789", 15, truncate=True) == b"123456789" + b" " * 6

    def test_trims_fixed_length_byte_arrays(self):
        assert (
            vn.write_fixed_byte_array(bytes([1, 2, 3, 4, 5, 6]), 5, truncate=True)
            == bytes([1, 2, 3, 4, 5])
        )

    def test_pads_fixed_length_byte_arrays(self):
        assert (
            vn.write_fixed_byte_array(bytes([1, 2, 3, 4]), 10, truncate=True)
            == bytes([1, 2, 3, 4]) + b"\x00" * 6
        )

    def test_truncation_disabled_variable_string_raises(self):
        with pytest.raises(ValueError):
            vn.write_var_string("123456", 5, truncate=False)

    def test_truncation_disabled_fixed_string_raises(self):
        with pytest.raises(ValueError):
            vn.write_fixed_string("123456", 5, truncate=False)

    def test_truncation_disabled_var_byte_array_raises(self):
        with pytest.raises(ValueError):
            vn.write_var_byte_array(bytes([1, 2, 3, 4]), 3, truncate=False)

    def test_truncation_disabled_fixed_byte_array_raises(self):
        with pytest.raises(ValueError):
            vn.write_fixed_byte_array(bytes([1, 2, 3, 4]), 3, truncate=False)

    def test_schema_level_varchar_truncation_and_char_padding(self):
        enc = VerticaNativeEncoder(
            [
                VColumn("v", "varchar", max_bytes=5),
                VColumn("c", "char", width=6),
            ]
        )
        row = enc.encode_row({"v": "123456789", "c": "abc"})
        # row: uint32 size + 1-byte null bitmap + values
        values = row[5:]
        assert values == struct.pack("<I", 5) + b"12345" + b"abc   "


# ---------------------------------------------------------------------------
# Avro logical-type roundtrips (encode -> decode identity, boundary values).
# Reference vectors: the avro4s-encoded ExampleMessage of
# stream-loader-tests ExampleMessage.scala:22-33 exercises
# timestamp-millis; the spec sentinel 9999-12-31T23:59:59.999999 must
# decode exactly (integer epoch-delta arithmetic, no float seconds).
# ---------------------------------------------------------------------------

from stream_loader_spark.functions import avro_codec as ac  # noqa: E402


def _ts_schema(logical: str) -> ac.AvroSchema:
    return ac.parse_schema({"type": "long", "logicalType": logical})


_UTC = timezone.utc


class TestAvroLogicalTypeRoundtrip:
    @pytest.mark.parametrize(
        "dt",
        [
            datetime(1970, 1, 1, tzinfo=_UTC),
            datetime(1969, 12, 31, 23, 59, 59, 999000, tzinfo=_UTC),  # pre-epoch
            datetime(1901, 2, 3, 4, 5, 6, 7000, tzinfo=_UTC),
            datetime(2024, 1, 15, 12, 34, 56, 789000, tzinfo=_UTC),
            datetime(9999, 12, 31, 23, 59, 59, 999000, tzinfo=_UTC),  # sentinel
        ],
    )
    def test_timestamp_millis_roundtrip(self, dt):
        s = _ts_schema("timestamp-millis")
        assert ac.decode(ac.encode(dt, s), s) == dt

    @pytest.mark.parametrize(
        "dt",
        [
            datetime(1970, 1, 1, tzinfo=_UTC),
            datetime(1969, 12, 31, 23, 59, 59, 999999, tzinfo=_UTC),
            datetime(2242, 3, 16, 12, 56, 31, 145224, tzinfo=_UTC),  # 2^53 µs edge
            datetime(9999, 12, 31, 23, 59, 59, 999999, tzinfo=_UTC),  # sentinel
        ],
    )
    def test_timestamp_micros_roundtrip(self, dt):
        s = _ts_schema("timestamp-micros")
        assert ac.decode(ac.encode(dt, s), s) == dt

    def test_timestamp_millis_known_bytes(self):
        # 1ms after epoch -> long 1 -> zigzag varint 0x02
        s = _ts_schema("timestamp-millis")
        assert ac.encode(datetime(1970, 1, 1, 0, 0, 0, 1000, tzinfo=_UTC), s) == b"\x02"
        # -1ms -> long -1 -> zigzag 0x01
        assert (
            ac.encode(datetime(1969, 12, 31, 23, 59, 59, 999000, tzinfo=_UTC), s)
            == b"\x01"
        )

    def test_naive_datetime_encodes_as_utc(self):
        s = _ts_schema("timestamp-micros")
        naive = datetime(2024, 1, 15, 12, 0, 0)
        aware = naive.replace(tzinfo=_UTC)
        assert ac.encode(naive, s) == ac.encode(aware, s)

    def test_decode_returns_aware_utc(self):
        s = _ts_schema("timestamp-millis")
        out = ac.decode(ac.encode(datetime(2024, 1, 1, tzinfo=_UTC), s), s)
        assert out.tzinfo == _UTC

    @pytest.mark.parametrize(
        "d",
        [date(1970, 1, 1), date(1969, 12, 31), date(1, 1, 1), date(9999, 12, 31)],
    )
    def test_date_roundtrip(self, d):
        s = ac.parse_schema({"type": "int", "logicalType": "date"})
        assert ac.decode(ac.encode(d, s), s) == d

    def test_integer_passthrough_still_roundtrips(self):
        s = _ts_schema("timestamp-micros")
        raw = 253402300799999999  # 9999-12-31T23:59:59.999999 in micros
        assert ac.encode(raw, s) == ac.encode(
            datetime(9999, 12, 31, 23, 59, 59, 999999, tzinfo=_UTC), s
        )


class TestWireFormatReviewRegressions:
    def test_nullable_fixed_string_keeps_width(self):
        """The nullable branch bypassed the fixed/max byte writers,
        misframing every later column of a Nullable(FixedString)."""
        from stream_loader_spark.functions.rowbinary import CHType

        t = CHType("String", nullable=True, fixed_bytes=6)
        assert t.encode("ab") == b"\x00ab\x00\x00\x00\x00"
        assert t.encode(None) == b"\x01"

    def test_string_column_stringifies_non_str(self):
        from stream_loader_spark.functions.rowbinary import CHType

        assert CHType("String").encode(5) == b"\x015"  # '5', not 5 NUL bytes

    def test_datetime64_exact_beyond_float_precision(self):
        from datetime import datetime, timezone

        from stream_loader_spark.functions.rowbinary import CHType
        import struct

        ts = datetime(2264, 6, 1, 0, 56, 14, 786000, tzinfo=timezone.utc)
        (ms,) = struct.unpack("<q", CHType("DateTime64(3)").encode(ts))
        assert ms % 1000 == 786  # float *1000 rounded this to 785

    def test_vertica_timestamp_exact_for_sentinels(self):
        from datetime import datetime, timedelta, timezone

        from stream_loader_spark.functions.vertica_native import (
            VERTICA_EPOCH,
            VColumn,
        )
        import struct

        ts = datetime(9999, 12, 31, 23, 59, 59, tzinfo=timezone.utc)
        (us,) = struct.unpack("<q", VColumn("t", "timestamp").encode(ts))
        assert us == (ts - VERTICA_EPOCH) // timedelta(microseconds=1)

    def test_proto_negative_enum_roundtrip(self):
        from stream_loader_spark.functions.proto_codec import decode, encode

        spec = {1: ("e", "enum")}
        assert decode(encode({"e": -1}, spec), spec)["e"] == -1

    def test_avro_union_matches_value_type(self):
        from stream_loader_spark.functions.avro_codec import (
            decode,
            encode,
            parse_schema,
        )

        s = parse_schema(["string", "int"])
        assert decode(encode(5, s), s) == 5  # was encoded as the string '5'
        assert decode(encode("abc", s), s) == "abc"
        s2 = parse_schema(["int", "string"])
        assert decode(encode("abc", s2), s2) == "abc"  # was int('abc') crash

    def test_batch_path_raises_on_null_like_row_path(self, spark):
        import pandas as pd
        import pytest as _pytest

        from stream_loader_spark.functions.rowbinary import (
            CHType,
            RowBinaryEncoder,
        )

        enc = RowBinaryEncoder([("a", CHType("Int64"))])
        pdf = pd.DataFrame({"a": [1.0, float("nan")]})
        with _pytest.raises(ValueError, match="non-nullable"):
            enc.encode_batch(pdf)
