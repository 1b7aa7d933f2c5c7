"""Bind-message parameter decoding: (oid, format, bytes) → Python value.

Python twin of ``PgParamConverters.apply`` (``converters.scala:39-102``).
The decoded values feed parameterized ``spark.sql(sql, args={...})`` —
replacing the reference's ``ParameterPlaceHolder`` Catalyst expression
(SURVEY.md §2.A34) with Spark's own named-parameter binding.

Like the reference, Date/Timestamp params arriving as Oid.UNSPECIFIED
in binary format are rejected; in text format we go further and pass
the raw string through (Spark coerces), which covers the common JDBC
``setString`` path.
"""

from __future__ import annotations

import struct

from spark_sql_server_spark.protocol import pgtypes as P


def decode_param(oid: int, fmt: int, data: bytes | None):
    """fmt: 0=text, 1=binary."""
    if data is None:
        return None
    if fmt == 0:
        text = data.decode("utf-8")
        return _from_text(oid, text)
    return _from_binary(oid, data)


def _from_text(oid: int, s: str):
    if oid == P.BOOL.oid:
        return s in ("t", "true", "1", "y", "yes", "on")
    if oid in (P.INT2.oid, P.INT4.oid, P.INT8.oid):
        return int(s)
    if oid in (P.FLOAT4.oid, P.FLOAT8.oid):
        return float(s)
    if oid == P.NUMERIC.oid:
        from decimal import Decimal

        return Decimal(s)
    # varchar / unspecified / anything else: let Spark coerce the string
    return s


def _from_binary(oid: int, b: bytes):
    if oid == P.BOOL.oid:
        return b != b"\x00"
    if oid == P.INT2.oid:
        return struct.unpack("!h", b)[0]
    if oid == P.INT4.oid:
        return struct.unpack("!i", b)[0]
    if oid == P.INT8.oid:
        return struct.unpack("!q", b)[0]
    if oid == P.FLOAT4.oid:
        return struct.unpack("!f", b)[0]
    if oid == P.FLOAT8.oid:
        return struct.unpack("!d", b)[0]
    if oid == P.VARCHAR.oid or oid == P.TEXT.oid:
        return b.decode("utf-8")
    if oid == P.BYTEA.oid:
        return bytes(b)
    raise ValueError(
        f"Cannot bind a binary-format parameter with oid={oid} "
        "(the reference rejects these too, PgJdbcSuite.scala:744-777)"
    )
