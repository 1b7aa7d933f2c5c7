"""Byte-exact encoder tests — mirrors the reference's
PgRowConvertersSuite (text/binary encodings per type, PG epoch math,
JSON array/map/struct rendering) and PgWireProtocolSuite (DataRow
layout)."""

from __future__ import annotations

import struct
from datetime import date, datetime, timedelta
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from spark_sql_server_spark.protocol import messages as M
from spark_sql_server_spark.protocol import pgtypes as P
from spark_sql_server_spark.protocol.encoders import (
    RowSerializer,
    binary_encoder,
    text_encoder,
)
from spark_sql_server_spark.protocol.params import decode_param


class TestTextEncoders:
    def test_bool(self):
        enc = text_encoder(T.BooleanType())
        assert enc(True) == "t" and enc(False) == "f"

    def test_ints(self):
        assert text_encoder(T.IntegerType())(42) == "42"
        assert text_encoder(T.LongType())(-7) == "-7"

    def test_double_repr(self):
        enc = text_encoder(T.DoubleType())
        assert enc(1.5) == "1.5"
        assert enc(float("nan")) == "NaN"
        assert enc(float("inf")) == "Infinity"

    def test_decimal(self):
        assert text_encoder(T.DecimalType(10, 2))(Decimal("1.20")) == "1.20"

    def test_binary_hex(self):
        assert text_encoder(T.BinaryType())(b"\x01\xff") == "\\x01ff"

    def test_timestamp(self):
        enc = text_encoder(T.TimestampType())
        assert enc(datetime(2020, 1, 2, 3, 4, 5, 6)) == "2020-01-02 03:04:05.000006"

    def test_json_decimal_shortest_repr(self):
        # r9 ADVICE (medium): fractional decimals whose SHORTEST float
        # repr round-trips exactly must keep the historical float form
        # in JSON cells — the old binary-expansion test Decimal(f) == v
        # silently demoted 0.1/1.1/123.456 to quoted strings
        from spark_sql_server_spark.protocol.encoders import _json_decimal

        assert _json_decimal(Decimal("0.1")) == 0.1
        assert _json_decimal(Decimal("1.1")) == 1.1
        assert _json_decimal(Decimal("123.456")) == 123.456
        assert _json_decimal(Decimal("2.5")) == 2.5
        assert _json_decimal(Decimal("1.0")) == 1.0
        # r10 ADVICE: the float form must also preserve SCALE —
        # numeric 1.10 must not collapse to 1.1 (PG's row_to_json
        # keeps the trailing zero; we keep it as an exact string)
        assert _json_decimal(Decimal("1.10")) == "1.10"
        assert _json_decimal(Decimal("5.00")) == "5.00"
        # scale-0 decimals are JSON ints (PG prints 5, never 5.0)
        assert _json_decimal(Decimal("5")) == 5
        assert isinstance(_json_decimal(Decimal("5")), int)
        # beyond float precision: exact forms, never lossy floats
        assert _json_decimal(Decimal(2**53 + 1)) == 2**53 + 1
        assert isinstance(_json_decimal(Decimal(2**53 + 1)), int)
        assert _json_decimal(
            Decimal("1.23456789012345678901")
        ) == "1.23456789012345678901"

    def test_array_braces(self):
        # braced PG array text (the reference's converters.scala:370-388
        # JSON-swap produced the same shape for simple int arrays; the
        # r9 element-wise renderer fixes its NULL/bool/struct cases)
        enc = text_encoder(T.ArrayType(T.IntegerType()))
        assert enc([1, 2, 3]) == "{1,2,3}"

    def test_array_of_strings(self):
        enc = text_encoder(T.ArrayType(T.StringType()))
        assert enc(["a", "b"]) == '{"a","b"}'

    def test_array_string_with_brackets(self):
        # only the outermost [] are swapped (reference regex \[(.*)\]);
        # brackets inside string elements must survive
        enc = text_encoder(T.ArrayType(T.StringType()))
        assert enc(["a[1]", "b]c["]) == '{"a[1]","b]c["}'

    def test_array_null_bool_elements(self):
        # PG prints unquoted uppercase NULL for null elements (psycopg2's
        # array parser only accepts that spelling) and t/f for booleans —
        # the r9 element-wise renderer replaced the JSON [] swap
        enc = text_encoder(T.ArrayType(T.IntegerType()))
        assert enc([1, 2, None]) == "{1,2,NULL}"
        encb = text_encoder(T.ArrayType(T.BooleanType()))
        assert encb([True, False, None]) == "{t,f,NULL}"

    def test_array_nested_braces(self):
        enc = text_encoder(T.ArrayType(T.ArrayType(T.IntegerType())))
        assert enc([[1, 2], [3]]) == "{{1,2},{3}}"

    def test_array_of_structs_quoted_json(self):
        # struct elements render as their JSON text, PG-quoted like a
        # composite-in-array (escaped inner quotes)
        st = T.StructType([T.StructField("a", T.IntegerType())])
        enc = text_encoder(T.ArrayType(st))
        assert enc([{"a": 1}, None]) == '{"{\\"a\\":1}",NULL}'

    def test_map_json(self):
        enc = text_encoder(T.MapType(T.StringType(), T.IntegerType()))
        assert enc({"k": 1}) == '{"k":1}'

    def test_interval_in_map_renders_pg_style(self):
        # a day-time interval nested in a map/struct JSON cell renders
        # PG-style, not Python's '1 day, 0:00:00'
        day = T.DayTimeIntervalType(
            T.DayTimeIntervalType.DAY, T.DayTimeIntervalType.SECOND
        )
        enc = text_encoder(T.MapType(T.IntegerType(), day))
        assert enc({1: timedelta(days=1), 2: timedelta(days=21)}) == \
            '{"1":"1 day","2":"21 days"}'

    def test_interval_day_typed(self):
        # DAY-typed intervals split a day component (PG style)
        day = T.DayTimeIntervalType(
            T.DayTimeIntervalType.DAY, T.DayTimeIntervalType.SECOND
        )
        enc = text_encoder(day)
        assert enc(timedelta(days=1, hours=2, minutes=3, seconds=4)) == \
            "1 day 02:03:04"
        # PG pluralizes on the SIGNED value: '1 day' but '-1 days'
        assert enc(timedelta(days=1)) == "1 day"
        assert enc(timedelta(days=-1)) == "-1 days"
        # negative fractional intervals: every component carries the
        # sign of the ONE true total (Python normalizes microseconds
        # positive — the pre-r9 renderer printed '-00:00:01.500000')
        assert enc(timedelta(microseconds=-500000)) == "-00:00:00.5"
        assert enc(
            timedelta(days=-86, hours=-13, minutes=-48, seconds=-47,
                      microseconds=-654322)
        ) == "-86 days -13:48:47.654322"
        # every printed component of a negative interval carries a sign
        assert enc(-timedelta(days=1, hours=2, minutes=3, seconds=4)) == \
            "-1 days -02:03:04"

    def test_interval_hour_typed_never_rolls_days(self):
        # PG never justifies hours into days: '999' hour is '999:00:00'
        hour = T.DayTimeIntervalType(
            T.DayTimeIntervalType.HOUR, T.DayTimeIntervalType.SECOND
        )
        enc = text_encoder(hour)
        assert enc(timedelta(hours=999)) == "999:00:00"
        assert enc(timedelta(seconds=999)) == "00:16:39"
        assert enc(timedelta(seconds=-999)) == "-00:16:39"
        # PG trims trailing fractional zeros (r9 wave-48 fidelity fix)
        assert enc(timedelta(seconds=1, microseconds=500000)) == \
            "00:00:01.5"


class TestBinaryEncoders:
    def test_int_widths(self):
        assert binary_encoder(T.ShortType())(1) == b"\x00\x01"
        assert binary_encoder(T.IntegerType())(1) == b"\x00\x00\x00\x01"
        assert binary_encoder(T.LongType())(1) == b"\x00" * 7 + b"\x01"

    def test_negative_int(self):
        assert binary_encoder(T.IntegerType())(-1) == b"\xff\xff\xff\xff"

    def test_floats(self):
        assert binary_encoder(T.FloatType())(1.5) == struct.pack("!f", 1.5)
        assert binary_encoder(T.DoubleType())(-2.25) == struct.pack("!d", -2.25)

    def test_date_pg_epoch(self):
        # PG epoch is 2000-01-01 (converters.scala:255-302)
        enc = binary_encoder(T.DateType())
        assert enc(date(2000, 1, 1)) == struct.pack("!i", 0)
        assert enc(date(2000, 1, 2)) == struct.pack("!i", 1)
        assert enc(date(1999, 12, 31)) == struct.pack("!i", -1)

    def test_timestamp_pg_micros(self):
        enc = binary_encoder(T.TimestampType())
        assert enc(datetime(2000, 1, 1)) == struct.pack("!q", 0)
        assert enc(datetime(2000, 1, 1, 0, 0, 1)) == struct.pack("!q", 1_000_000)

    def test_no_binary_for_decimal(self):
        # reference: numeric is text-only (converters.scala:446)
        assert binary_encoder(T.DecimalType(10, 2)) is None

    def test_no_binary_for_string(self):
        assert binary_encoder(T.StringType()) is None


class TestRowSerializer:
    def test_null_and_values(self):
        schema = T.StructType(
            [
                T.StructField("a", T.IntegerType()),
                T.StructField("b", T.StringType()),
            ]
        )
        ser = RowSerializer(schema)
        assert ser.serialize((None, "x")) == [None, b"x"]

    def test_single_format_broadcast(self):
        schema = T.StructType(
            [
                T.StructField("a", T.IntegerType()),
                T.StructField("b", T.LongType()),
            ]
        )
        ser = RowSerializer(schema, [1])
        assert ser.formats == [1, 1]
        assert ser.serialize((1, 2)) == [b"\x00\x00\x00\x01", b"\x00" * 7 + b"\x02"]

    def test_binary_unsupported_type_raises(self):
        schema = T.StructType([T.StructField("a", T.StringType())])
        with pytest.raises(ValueError):
            RowSerializer(schema, [1])


class TestDataRowLayout:
    def test_datarow_bytes(self):
        # mirror PgWireProtocolSuite: 'D' | len | ncols | (len,data)*
        msg = M.data_row([b"ab", None])
        assert msg[0:1] == b"D"
        (length,) = struct.unpack("!i", msg[1:5])
        assert length == len(msg) - 1
        ncols = struct.unpack("!h", msg[5:7])[0]
        assert ncols == 2
        (l1,) = struct.unpack("!i", msg[7:11])
        assert l1 == 2 and msg[11:13] == b"ab"
        (l2,) = struct.unpack("!i", msg[13:17])
        assert l2 == -1

    def test_row_description(self):
        msg = M.row_description([("col", 23, 4, 0)])
        assert msg[0:1] == b"T"
        assert b"col\x00" in msg


class TestPgTypeMap:
    @pytest.mark.parametrize(
        "dt,oid",
        [
            (T.BooleanType(), 16),
            (T.LongType(), 20),
            (T.IntegerType(), 23),
            (T.DoubleType(), 701),
            (T.DecimalType(10, 2), 1700),
            (T.StringType(), 1043),
            (T.DateType(), 1082),
            (T.TimestampType(), 1114),
            (T.ArrayType(T.IntegerType()), 1007),
            (T.ArrayType(T.DoubleType()), 1022),
            (T.MapType(T.StringType(), T.IntegerType()), 6201),
        ],
    )
    def test_oid(self, dt, oid):
        assert P.pg_type_for(dt).oid == oid

    def test_nested_array_rejected(self):
        # catalog.scala:206-207 + PgJdbcSuite.scala:367-375
        with pytest.raises(ValueError):
            P.pg_type_for(T.ArrayType(T.ArrayType(T.IntegerType())))


class TestParamDecode:
    def test_text_params(self):
        assert decode_param(23, 0, b"42") == 42
        assert decode_param(701, 0, b"1.5") == 1.5
        assert decode_param(16, 0, b"t") is True
        assert decode_param(1043, 0, b"abc") == "abc"

    def test_binary_params(self):
        assert decode_param(23, 1, struct.pack("!i", 7)) == 7
        assert decode_param(20, 1, struct.pack("!q", -9)) == -9
        assert decode_param(701, 1, struct.pack("!d", 2.5)) == 2.5

    def test_null(self):
        assert decode_param(23, 0, None) is None

    def test_unspecified_binary_rejected(self):
        # Date/Timestamp arrive as UNSPECIFIED; reference rejects binary
        # (PgJdbcSuite.scala:744-777)
        with pytest.raises(ValueError):
            decode_param(0, 1, b"\x00\x01")
