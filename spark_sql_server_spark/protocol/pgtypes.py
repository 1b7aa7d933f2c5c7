"""Spark ⇄ PostgreSQL type bridge: oids and type names.

Mirrors the reference's ``getPgType`` / ``getPgArrayType`` maps
(``service/postgresql/catalog.scala:122-209``) — including its invented
oids ≥ 6200 for Spark types with no PG equivalent (byte/map/struct).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass(frozen=True)
class PgType:
    oid: int
    name: str
    len: int  # typlen, -1 = varlena
    elemoid: int = 0  # for arrays


# pg_type oids (catalog.scala:122-153)
BOOL = PgType(16, "bool", 1)
BYTEA = PgType(17, "bytea", -1)
CHAR = PgType(18, "char", 1)
NAME = PgType(19, "name", 64)
INT8 = PgType(20, "int8", 8)
INT2 = PgType(21, "int2", 2)
INT4 = PgType(23, "int4", 4)
TID = PgType(27, "tid", 6)
FLOAT4 = PgType(700, "float4", 4)
FLOAT8 = PgType(701, "float8", 8)
BOOL_ARRAY = PgType(1000, "_bool", -1, 16)
INT2_ARRAY = PgType(1005, "_int2", -1, 21)
INT4_ARRAY = PgType(1007, "_int4", -1, 23)
TEXT_ARRAY = PgType(1009, "_text", -1, 25)
VARCHAR_ARRAY = PgType(1015, "_varchar", -1, 1043)
INT8_ARRAY = PgType(1016, "_int8", -1, 20)
FLOAT4_ARRAY = PgType(1021, "_float4", -1, 700)
FLOAT8_ARRAY = PgType(1022, "_float8", -1, 701)
VARCHAR = PgType(1043, "varchar", -1)
DATE = PgType(1082, "date", 4)
TIME = PgType(1083, "time", 8)
TIMESTAMP = PgType(1114, "timestamp", 8)
TIMESTAMP_ARRAY = PgType(1115, "_timestamp", -1, 1114)
DATE_ARRAY = PgType(1182, "_date", -1, 1082)
INTERVAL = PgType(1186, "interval", 16)
INTERVAL_ARRAY = PgType(1187, "_interval", -1, 1186)
NUMERIC = PgType(1700, "numeric", -1)
NUMERIC_ARRAY = PgType(1231, "_numeric", -1, 1700)
TEXT = PgType(25, "text", -1)

# Invented oids for Spark types with no PG counterpart
# (catalog.scala:150-152 uses the "unused oid" range >= 6200).
BYTE = PgType(6200, "byte", 1)
MAP = PgType(6201, "map", -1)
STRUCT = PgType(6202, "struct", -1)
BYTE_ARRAY = PgType(6203, "_byte", -1, 6200)

UNSPECIFIED_OID = 0

ALL_PG_TYPES = [
    BOOL, BYTEA, CHAR, NAME, INT8, INT2, INT4, TID, TEXT, FLOAT4, FLOAT8,
    BOOL_ARRAY, INT2_ARRAY, INT4_ARRAY, TEXT_ARRAY, VARCHAR_ARRAY, INT8_ARRAY,
    FLOAT4_ARRAY, FLOAT8_ARRAY, VARCHAR, DATE, TIME, TIMESTAMP, TIMESTAMP_ARRAY,
    DATE_ARRAY, INTERVAL, INTERVAL_ARRAY, NUMERIC, NUMERIC_ARRAY,
    BYTE, MAP, STRUCT, BYTE_ARRAY,
]


def pg_type_for(dt: T.DataType) -> PgType:
    """Spark DataType → PgType (catalog.scala:169-209 semantics)."""
    if isinstance(dt, T.BooleanType):
        return BOOL
    if isinstance(dt, T.ByteType):
        return BYTE
    if isinstance(dt, T.ShortType):
        return INT2
    if isinstance(dt, (T.IntegerType,)):
        return INT4
    if isinstance(dt, T.LongType):
        return INT8
    if isinstance(dt, T.FloatType):
        return FLOAT4
    if isinstance(dt, T.DoubleType):
        return FLOAT8
    if isinstance(dt, T.DecimalType):
        return NUMERIC
    if isinstance(dt, T.StringType):
        return VARCHAR
    if isinstance(dt, T.BinaryType):
        return BYTEA
    if isinstance(dt, T.DateType):
        return DATE
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return TIMESTAMP
    if isinstance(dt, (T.DayTimeIntervalType, T.YearMonthIntervalType)):
        return INTERVAL
    if isinstance(dt, T.MapType):
        return MAP
    if isinstance(dt, T.StructType):
        return STRUCT
    if isinstance(dt, T.NullType):
        return VARCHAR  # reference reports NullType as varchar (catalog.scala:187)
    if isinstance(dt, T.ArrayType):
        return _pg_array_type_for(dt.elementType)
    return VARCHAR  # UDTs and anything else: text via toString


def _pg_array_type_for(elem: T.DataType) -> PgType:
    """Array oid per element type (catalog.scala:192-209). Nested arrays
    are unsupported — the reference throws (catalog.scala:206-207)."""
    if isinstance(elem, T.ArrayType):
        raise ValueError("Nested array types are not supported over the PG protocol")
    m: list[tuple[type, PgType]] = [
        (T.BooleanType, BOOL_ARRAY),
        (T.ByteType, BYTE_ARRAY),
        (T.ShortType, INT2_ARRAY),
        (T.IntegerType, INT4_ARRAY),
        (T.LongType, INT8_ARRAY),
        (T.FloatType, FLOAT4_ARRAY),
        (T.DoubleType, FLOAT8_ARRAY),
        (T.DecimalType, NUMERIC_ARRAY),
        (T.StringType, VARCHAR_ARRAY),
        (T.DateType, DATE_ARRAY),
        (T.TimestampType, TIMESTAMP_ARRAY),
    ]
    for klass, pgt in m:
        if isinstance(elem, klass):
            return pgt
    return VARCHAR_ARRAY
