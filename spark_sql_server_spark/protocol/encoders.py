"""Per-column value encoders: Python row values → PG text/binary bytes.

Python re-expression of the reference's ``ColumnWriter`` family
(``service/postgresql/protocol/v3/converters.scala:107-461``):

* text mode: ``toString``-style rendering; bool as ``t``/``f``;
  array/map/struct as JSON with arrays rewritten ``[..]`` → ``{..}``
  (converters.scala:370-416).
* binary mode (only for the 8 fixed-width-friendly types,
  protocol.scala:214-228): big-endian ints/floats; date as days since
  the PG epoch 2000-01-01; timestamp as micros since the PG epoch.

Values arrive as the Python objects ``DataFrame.toLocalIterator()``
yields (datetime, Decimal, list, dict, Row, bytearray…).
"""

from __future__ import annotations

import json
import math
import struct
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal

from pyspark.sql import types as T

PG_EPOCH_DATE = date(2000, 1, 1)
PG_EPOCH_DT = datetime(2000, 1, 1, tzinfo=timezone.utc)
PG_EPOCH_NAIVE = datetime(2000, 1, 1)

#: Types eligible for binary transfer (protocol.scala:214-228).
BINARY_CAPABLE = (
    T.BinaryType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)


def _json_default(v):
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if hasattr(v, "asDict"):  # pyspark Row
        return v.asDict(recursive=False)
    return str(v)


def _to_jsonable(v):
    if hasattr(v, "asDict"):
        return {k: _to_jsonable(x) for k, x in v.asDict(recursive=False).items()}
    if isinstance(v, dict):
        return {str(k): _to_jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_to_jsonable(x) for x in v]
    return v


def _pg_array_text(v) -> str:
    """JSON-render then swap the outermost [] for {} — the reference's
    array text form (converters.scala:370-388 uses ``\\[(.*)\\]``, i.e.
    only the first '[' and last ']'; a global replace would corrupt
    string elements containing brackets)."""
    s = json.dumps(_to_jsonable(list(v)), default=_json_default, separators=(",", ","))
    return "{" + s[1:-1] + "}"


def _float_text(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    return repr(v)


def text_encoder(dt: T.DataType):
    """Return fn(value) -> str for a Spark data type (text mode)."""
    if isinstance(dt, T.BooleanType):
        return lambda v: "t" if v else "f"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return _float_text
    if isinstance(dt, T.BinaryType):
        return lambda v: "\\x" + bytes(v).hex()
    if isinstance(dt, T.ArrayType):
        return _pg_array_text
    if isinstance(dt, T.MapType):
        return lambda v: json.dumps(
            _to_jsonable(v), default=_json_default, separators=(",", ":")
        )
    if isinstance(dt, T.StructType):
        return lambda v: json.dumps(
            _to_jsonable(v), default=_json_default, separators=(",", ":")
        )
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return lambda v: (
            v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
            if isinstance(v, datetime)
            else str(v)
        )
    if isinstance(dt, T.DayTimeIntervalType):
        return _interval_text
    return lambda v: str(v)


def _interval_text(v) -> str:
    """PG-style interval rendering: '3 days 02:03:04.500000'."""
    if not isinstance(v, timedelta):
        return str(v)
    total = v.days * 86400 + v.seconds
    sign = "-" if total < 0 or (total == 0 and v.microseconds < 0) else ""
    days, rem = divmod(abs(total), 86400)
    h, rem = divmod(rem, 3600)
    m, s = divmod(rem, 60)
    out = []
    if days:
        out.append(f"{sign}{days} day" + ("s" if days != 1 else ""))
    us = abs(v.microseconds)
    if h or m or s or us or not days:
        t = f"{h:02d}:{m:02d}:{s:02d}"
        if us:
            t += f".{us:06d}"
        out.append((sign if not days else "") + t)
    return " ".join(out)


def _date_to_pg_days(v: date) -> int:
    return (v - PG_EPOCH_DATE).days


def _ts_to_pg_micros(v: datetime) -> int:
    if v.tzinfo is not None:
        delta = v - PG_EPOCH_DT
    else:
        delta = v - PG_EPOCH_NAIVE
    return (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds


def binary_encoder(dt: T.DataType):
    """Return fn(value) -> bytes for binary-capable types, else None."""
    if isinstance(dt, T.BinaryType):
        return lambda v: bytes(v)
    if isinstance(dt, T.ShortType):
        return lambda v: struct.pack("!h", v)
    if isinstance(dt, T.IntegerType):
        return lambda v: struct.pack("!i", v)
    if isinstance(dt, T.LongType):
        return lambda v: struct.pack("!q", v)
    if isinstance(dt, T.FloatType):
        return lambda v: struct.pack("!f", v)
    if isinstance(dt, T.DoubleType):
        return lambda v: struct.pack("!d", v)
    if isinstance(dt, T.DateType):
        return lambda v: struct.pack("!i", _date_to_pg_days(v))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return lambda v: struct.pack("!q", _ts_to_pg_micros(v))
    if isinstance(dt, T.BooleanType):
        return lambda v: b"\x01" if v else b"\x00"
    return None


class RowSerializer:
    """Pre-bound per-column encoders for one result schema — built once
    per statement, reused for every row (the hot loop allocates only the
    output buffer)."""

    def __init__(self, schema: T.StructType, formats: list[int] | None = None):
        """formats: per-column 0=text 1=binary (PG Bind semantics: empty
        → all text, single value → applies to all columns)."""
        n = len(schema.fields)
        if not formats:
            formats = [0] * n
        elif len(formats) == 1:
            formats = formats * n
        self.formats = formats
        self.encoders = []
        for f, fmt in zip(schema.fields, formats):
            if fmt == 1:
                enc = binary_encoder(f.dataType)
                if enc is None:
                    raise ValueError(
                        f"column {f.name}: type {f.dataType.simpleString()} "
                        "has no binary representation"
                    )
                self.encoders.append((enc, True))
            else:
                self.encoders.append((text_encoder(f.dataType), False))

        self._ncols = struct.pack("!h", n)

    def serialize(self, row) -> list[bytes | None]:
        out: list[bytes | None] = []
        for v, (enc, is_bin) in zip(row, self.encoders):
            if v is None:
                out.append(None)
            elif is_bin:
                out.append(enc(v))
            else:
                out.append(enc(v).encode("utf-8"))
        return out

    def serialize_arrow_table(self, tbl) -> tuple[int, bytes]:
        """Columnar fast path: encode a whole PyArrow table to one
        DataRow byte stream.

        ``df.toArrow()`` skips Row-object materialization entirely (the
        dominant cost of the collect path — measured 1.7 s collect vs
        0.4 s toArrow for 60k×11). Cells are length-prefixed per column
        first, so row assembly is a single join of precomputed buffers.
        Byte output is identical to the row path.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        null_cell = b"\xff\xff\xff\xff"
        enc_cols: list[list[bytes]] = []
        for col, (enc, is_bin) in zip(tbl.columns, self.encoders):
            # C-level fast path for text-mode timestamp/date columns:
            # arrow strftime emits the exact same format as the python
            # encoder (pinned by the iterator-vs-arrow equality test),
            # ~5× cheaper than datetime.isoformat per value
            if not is_bin and pa.types.is_timestamp(col.type):
                # arrow's %S on timestamp[us] always includes the 6-digit
                # fraction — matches isoformat(timespec="microseconds")
                strs = pc.strftime(
                    col.combine_chunks(), format="%Y-%m-%d %H:%M:%S"
                ).to_pylist()
                cells = [
                    null_cell if s is None
                    else (b := s.encode()) and len(b).to_bytes(4, "big") + b
                    for s in strs
                ]
                enc_cols.append(cells)
                continue
            if not is_bin and pa.types.is_date(col.type):
                strs = pc.strftime(col.combine_chunks(), format="%Y-%m-%d").to_pylist()
                cells = [
                    null_cell if s is None
                    else (b := s.encode()) and len(b).to_bytes(4, "big") + b
                    for s in strs
                ]
                enc_cols.append(cells)
                continue
            cells = []
            for v in col.to_pylist():
                if v is None:
                    cells.append(null_cell)
                else:
                    c = enc(v) if is_bin else enc(v).encode("utf-8")
                    cells.append(len(c).to_bytes(4, "big") + c)
            enc_cols.append(cells)
        ncols = self._ncols
        parts = []
        for row_cells in zip(*enc_cols):
            # msg len field = itself(4) + ncols(2) + cells
            body_len = 6 + sum(len(c) for c in row_cells)
            parts.append(
                b"D" + body_len.to_bytes(4, "big") + ncols + b"".join(row_cells)
            )
        return tbl.num_rows, b"".join(parts)

    def serialize_datarow(self, row) -> bytes:
        """Fused cell-encode + DataRow assembly — the hot loop. One
        bytearray per row, no intermediate cell list, int.to_bytes for
        length headers (C-level)."""
        body = bytearray(self._ncols)
        for v, (enc, is_bin) in zip(row, self.encoders):
            if v is None:
                body += b"\xff\xff\xff\xff"  # length -1
                continue
            c = enc(v) if is_bin else enc(v).encode("utf-8")
            body += len(c).to_bytes(4, "big")
            body += c
        return b"D" + (len(body) + 4).to_bytes(4, "big") + bytes(body)
