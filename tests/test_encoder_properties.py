"""Property-based roundtrips for the wire encoders.

* PG binary cell format: ``binary_decoder`` must invert
  ``binary_encoder`` exactly for every binary-capable type (this pair
  carries COPY BINARY and binary Bind results).
* COPY text escaping: the TO-STDOUT escape composed with the
  FROM-STDIN single-pass unescape must be the identity on arbitrary
  cell text (the r1 chained-replace unescape corrupted ``\\\\t`` — this
  pins the fixed version against regressions).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from spark_sql_server_spark.protocol.encoders import (
    binary_decoder,
    binary_encoder,
)
from spark_sql_server_spark.protocol.server import _copy_unescape

_CASES = [
    (T.ShortType(), st.integers(-(2**15), 2**15 - 1)),
    (T.IntegerType(), st.integers(-(2**31), 2**31 - 1)),
    (T.LongType(), st.integers(-(2**63), 2**63 - 1)),
    (T.DoubleType(), st.floats(allow_nan=False)),
    (T.BooleanType(), st.booleans()),
    (T.BinaryType(), st.binary(max_size=64)),
    (
        T.DateType(),
        st.dates(min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 12, 31)),
    ),
    (
        T.TimestampNTZType(),
        st.datetimes(
            min_value=dt.datetime(1, 1, 1), max_value=dt.datetime(9999, 12, 31)
        ),
    ),
]


class TestBinaryRoundtrip:
    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(st.data())
    def test_decoder_inverts_encoder(self, data):
        for dtype, strat in _CASES:
            v = data.draw(strat, label=dtype.simpleString())
            enc, dec = binary_encoder(dtype), binary_decoder(dtype)
            out = dec(enc(v))
            if isinstance(dtype, T.BinaryType):
                assert out == bytes(v)
            else:
                assert out == v, dtype.simpleString()

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(st.floats(allow_nan=True, width=32))
    def test_float4_roundtrip(self, v):
        import math
        import struct

        enc, dec = binary_encoder(T.FloatType()), binary_decoder(T.FloatType())
        out = dec(enc(v))
        # float4 roundtrips at float32 precision
        expect = struct.unpack("!f", struct.pack("!f", v))[0]
        assert (math.isnan(out) and math.isnan(expect)) or out == expect


def _copy_escape(s: str) -> str:
    # mirror of the COPY TO text-format escape in server._copy_out
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


class TestCopyTextEscapeRoundtrip:
    @settings(max_examples=500, deadline=None, derandomize=True)
    @given(st.text(max_size=50))
    def test_unescape_inverts_escape(self, s):
        assert _copy_unescape(_copy_escape(s)) == s
