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
    if isinstance(v, timedelta):
        # intervals nested in array/map/struct cells render PG-style
        # ('1 day'), not Python's '1 day, 0:00:00'
        return _interval_text(v)
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, Decimal):
        return _json_decimal(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if hasattr(v, "asDict"):  # pyspark Row
        return v.asDict(recursive=False)
    return str(v)


def _json_decimal(v: Decimal):
    """Decimal inside a JSON cell: keep the historical float form when
    it round-trips exactly; beyond float precision render EXACTLY —
    integral as a JSON int, fractional as a quoted fixed-point string
    (a decimal(19,0) map value rendered '9.223372036854776e+18'
    before — precision silently lost; found porting mapconcat.sql)."""
    f = float(v)
    if not (math.isinf(f) or math.isnan(f)) and abs(v) < 1 << 53:
        r = repr(f)
        # values whose shortest float repr reads back exactly AND at
        # the same scale keep the historical float form ('1.0', '0.1',
        # '123.456') — the binary expansion test Decimal(f) == v failed
        # for most fractional decimals (r9 ADVICE medium), and a
        # numeric-equality-only test dropped trailing-zero scale
        # (Decimal('1.10') rendered 1.1 where PG keeps 1.10 —
        # r10 ADVICE low): the fixed-point form must equal the repr.
        if Decimal(r) == v and format(v, "f") == r:
            return f
    if v == v.to_integral_value() and v.as_tuple().exponent >= 0:
        # scale-0 decimals print as JSON ints — PG's row_to_json of
        # numeric 5 is 5, never 5.0. Trailing-zero integral forms
        # ('5.00') fall through to the exact fixed-point string.
        return int(v)
    return format(v, "f")


def _json_key(k):
    """Map keys must be JSON strings; use the JSON value spellings
    (true/false, fixed-point decimals, hex bytes) — str() printed
    Python's 'True'/'False' for boolean keys."""
    if isinstance(k, bool):
        return "true" if k else "false"
    if isinstance(k, Decimal):
        return format(k, "f")
    if isinstance(k, (bytes, bytearray)):
        return k.hex()
    return str(k)


def _to_jsonable(v):
    if hasattr(v, "asDict"):
        return {k: _to_jsonable(x) for k, x in v.asDict(recursive=False).items()}
    if isinstance(v, dict):
        return {_json_key(k): _to_jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_to_jsonable(x) for x in v]
    return v


def _pg_quote_elem(s: str) -> str:
    """PG array-element quoting: backslash-escape ``\\`` and ``\"``."""
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _pg_array_text(v) -> str:
    """PG-shaped array text. The reference JSON-renders and swaps the
    outermost [] for {} (converters.scala:370-388) — that form prints
    null elements as lowercase ``null`` (PG prints unquoted ``NULL``,
    and psycopg2's array parser only recognizes that spelling), bools
    as ``true``/``false`` (PG: ``t``/``f``), keeps inner arrays as
    ``[..]``, and renders struct elements as malformed pseudo-JSON.
    Render element-by-element instead: NULL / t / f / bare numbers,
    JSON-quoted strings (pinned form since r1), braced inner arrays,
    and struct/map elements as their JSON text PG-quoted (escaped)
    like a composite-in-array."""
    parts = []
    for x in v:
        if x is None:
            parts.append("NULL")
        elif isinstance(x, bool):
            parts.append("t" if x else "f")
        elif isinstance(x, int):
            parts.append(str(x))
        elif isinstance(x, float):
            parts.append(_float_text(x))
        elif isinstance(x, Decimal):
            parts.append(format(x, "f"))
        elif isinstance(x, str):
            parts.append(json.dumps(x))
        # Row is a tuple subclass — the struct check must come first
        elif hasattr(x, "asDict") or isinstance(x, dict):
            parts.append(
                _pg_quote_elem(
                    json.dumps(
                        _to_jsonable(x),
                        default=_json_default,
                        separators=(",", ":"),
                    )
                )
            )
        elif isinstance(x, (list, tuple)):
            parts.append(_pg_array_text(x))
        else:  # datetime/date/bytes/interval — quoted via the JSON default
            parts.append(json.dumps(_json_default(x)))
    return "{" + ",".join(parts) + "}"


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
        # PG text form trims trailing fractional zeros and drops the
        # fraction entirely for whole seconds ('2001-01-01 00:00:00',
        # not '...00.000000') — psql scripts parse this shape
        def _ts_text(v):
            if not isinstance(v, datetime):
                return str(v)
            s = v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
            return s.rstrip("0").rstrip(".")

        return _ts_text
    if isinstance(dt, T.DecimalType):
        # PG numeric text NEVER uses scientific notation; Python's
        # str(Decimal) does for small-magnitude values (str(Decimal
        # ('0E-10')) == '0E-10' where PG prints '0.0000000000').
        # format(..., 'f') renders fixed-point, preserving the scale.
        return lambda v: format(v, "f") if isinstance(v, Decimal) else str(v)
    if isinstance(dt, T.DayTimeIntervalType):
        # PG never rolls hours into days: an HOUR-or-finer interval
        # ('999' hour) prints '999:00:00'. Only split a day component
        # out when the interval type itself has a DAY field.
        with_days = dt.startField == T.DayTimeIntervalType.DAY
        return lambda v: _interval_text(v, with_days)
    return lambda v: str(v)


def _interval_text(v, with_days: bool = True) -> str:
    """PG-style interval rendering: '3 days 02:03:04.500000'. PG signs
    EVERY printed component of a negative interval ('-1 days
    -02:03:04') and pluralizes on the signed value ('-1 days' but
    '1 day'); hour-or-finer interval types print unbounded hours
    ('999:00:00') because PG never justifies hours into days."""
    if not isinstance(v, timedelta):
        return str(v)
    # derive every component from ONE signed total: Python timedeltas
    # normalize microseconds to 0..999999 (a negative interval carries
    # a MORE negative integer-second part + a positive fraction), so
    # handling seconds and microseconds independently mis-rendered
    # negative fractional intervals ('-13:48:48.345678' where PG prints
    # '-13:48:47.654322' — caught by the r9 datetime.sql corpus wave)
    total_us = (v.days * 86400 + v.seconds) * 1_000_000 + v.microseconds
    sign = "-" if total_us < 0 else ""
    rem, us = divmod(abs(total_us), 1_000_000)
    days = 0
    if with_days:
        days, rem = divmod(rem, 86400)
    h, rem = divmod(rem, 3600)
    m, s = divmod(rem, 60)
    out = []
    if days:
        # plural unless the signed value is exactly +1 (PG interval.c)
        plural = "s" if (days != 1 or sign == "-") else ""
        out.append(f"{sign}{days} day{plural}")
    if h or m or s or us or not days:
        t = f"{h:02d}:{m:02d}:{s:02d}"
        if us:
            # PG trims trailing fractional zeros ('00:00:01.5', never
            # '...01.500000') — interval.c %g-style seconds
            t += f".{us:06d}".rstrip("0")
        out.append(sign + t)
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


def binary_decoder(dt: T.DataType):
    """Return fn(bytes) -> value for binary-capable types (the COPY
    BINARY / binary-param receive direction), else None. Exact inverse
    of :func:`binary_encoder`."""
    if isinstance(dt, T.BinaryType):
        return bytes
    if isinstance(dt, T.StringType):
        return lambda b: b.decode("utf-8")
    if isinstance(dt, T.ShortType):
        return lambda b: struct.unpack("!h", b)[0]
    if isinstance(dt, T.IntegerType):
        return lambda b: struct.unpack("!i", b)[0]
    if isinstance(dt, T.LongType):
        return lambda b: struct.unpack("!q", b)[0]
    if isinstance(dt, T.FloatType):
        return lambda b: struct.unpack("!f", b)[0]
    if isinstance(dt, T.DoubleType):
        return lambda b: struct.unpack("!d", b)[0]
    if isinstance(dt, T.DateType):
        return lambda b: PG_EPOCH_DATE + timedelta(days=struct.unpack("!i", b)[0])
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return lambda b: PG_EPOCH_NAIVE + timedelta(
            microseconds=struct.unpack("!q", b)[0]
        )
    if isinstance(dt, T.BooleanType):
        return lambda b: b != b"\x00"
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
        self._arrow_types = self._batch_arrow_types(schema, formats)

    @staticmethod
    def _batch_arrow_types(schema: T.StructType, formats: list[int]):
        """Arrow types for the Row-batch fast path, or None if any
        column needs the scalar encoder (binary format / exotic type)."""
        if any(f != 0 for f in formats):
            return None
        try:
            import pyarrow as pa
        except Exception:  # pragma: no cover
            return None
        m = {
            T.ShortType: pa.int16(),
            T.IntegerType: pa.int32(),
            T.LongType: pa.int64(),
            T.FloatType: pa.float32(),
            T.DoubleType: pa.float64(),
            T.StringType: pa.string(),
            T.BooleanType: pa.bool_(),
            T.DateType: pa.date32(),
            T.TimestampType: pa.timestamp("us"),
            T.TimestampNTZType: pa.timestamp("us"),
        }
        out = []
        for f in schema.fields:
            t = m.get(type(f.dataType))
            if t is None:
                return None
            out.append(t)
        return out

    def serialize_rows_batch(self, rows) -> bytes:
        """One DataRow byte stream for a batch of Row objects.

        The incremental/cursor path materializes Rows (toLocalIterator),
        so the columnar toArrow shortcut is unavailable — but the
        *formatting and assembly* can still be vectorized: transpose the
        batch, build Arrow arrays (C-level conversion), and reuse the
        same assembler as the full-result path. Byte output is identical
        to per-row serialize_datarow (which remains the fallback for
        binary formats and exotic types).
        """
        if not rows:
            return b""
        if not self.encoders:
            # zero-column result (a quotedRegexColumnNames projection
            # matching no columns): one empty DataRow per row — the
            # transpose below would lose the row count
            return b"D\x00\x00\x00\x06\x00\x00" * len(rows)
        if self._arrow_types is not None:
            import pyarrow as pa

            arrs = [
                pa.array(col, type=t)
                for col, t in zip(zip(*rows), self._arrow_types)
            ]
            return self._serialize_arrow_vectorized(arrs)[1]
        ser = self.serialize_datarow
        return b"".join(ser(r) for r in rows)

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

    def serialize_copy_text_batch(self, rows) -> bytes | None:
        """PG COPY text-format lines for a batch of Rows, fully
        vectorized: the same per-column text cells as the DataRow path,
        escaped with four C-level replace kernels, NULLs as ``\\N``,
        tab-joined per row. Returns None when a column needs the scalar
        path (caller falls back to its per-row renderer)."""
        if not rows or self._arrow_types is None:
            return None
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        parts = []
        for col, t in zip(zip(*rows), self._arrow_types):
            arr = pa.array(col, type=t)
            cells, valid = self._vec_text_cells(arr)
            s = pc.cast(cells, pa.string())
            for old, new in (("\\", "\\\\"), ("\t", "\\t"), ("\n", "\\n"), ("\r", "\\r")):
                s = pc.replace_substring(s, pattern=old, replacement=new)
            parts.append(pc.if_else(pa.array(valid), s, pa.scalar("\\N")))
        parts.append(pa.nulls(len(rows), pa.string()).fill_null("\n"))
        line = pc.binary_join_element_wise(*parts[:-1], pa.scalar("\t"))
        line = pc.binary_join_element_wise(line, parts[-1], pa.scalar(""))
        joined = line.combine_chunks() if isinstance(line, pa.ChunkedArray) else line
        off_dtype = np.int64 if pa.types.is_large_string(joined.type) else np.int32
        off = np.frombuffer(joined.buffers()[1], dtype=off_dtype)
        start = int(off[joined.offset])
        end = int(off[joined.offset + len(joined)])
        return joined.buffers()[2].to_pybytes()[start:end]

    # ------------------------------------------------------------------ #
    # Arrow columnar fast path

    @staticmethod
    def _vec_supported(t) -> bool:
        import pyarrow.types as pat

        return (
            pat.is_integer(t)
            or pat.is_floating(t)
            or pat.is_boolean(t)
            or pat.is_string(t)
            or pat.is_large_string(t)
            or pat.is_timestamp(t)
            or pat.is_date(t)
        )

    @staticmethod
    def _fixed_width_cells(mat, valid):
        """(N, W) uint8 matrix of fixed-width renderings + validity →
        compacted pa.BinaryArray (null rows become empty cells)."""
        import numpy as np
        import pyarrow as pa

        n, w = mat.shape
        if valid.all():
            data = np.ascontiguousarray(mat)
            offsets = np.arange(0, w * (n + 1), w, dtype=np.int32)
        else:
            data = np.ascontiguousarray(mat[valid])
            offsets = np.zeros(n + 1, np.int32)
            offsets[1:] = np.cumsum(valid, dtype=np.int32) * w
        return pa.Array.from_buffers(
            pa.binary(), n, [None, pa.py_buffer(offsets), pa.py_buffer(data)]
        )

    @staticmethod
    def _varwidth_cells(mat, lengths, valid):
        """(N, W) uint8 matrix + per-row byte lengths (≤ W) + validity →
        compacted pa.BinaryArray (null rows become empty cells)."""
        import numpy as np
        import pyarrow as pa

        n, w = mat.shape
        lens = np.where(valid, lengths, 0).astype(np.int32)
        offsets = np.zeros(n + 1, np.int32)
        np.cumsum(lens, out=offsets[1:])
        keep = np.arange(w, dtype=np.int32)[None, :] < lens[:, None]
        data = np.ascontiguousarray(mat[keep])
        return pa.Array.from_buffers(
            pa.binary(), n, [None, pa.py_buffer(offsets), pa.py_buffer(data)]
        )

    @staticmethod
    def _vec_text_cells(arr):
        """One Arrow column → (cells: null-free pa.BinaryArray of utf-8
        text payloads — empty where the value is NULL —, valid mask),
        computed without per-value Python.

        * ints/bools render via Arrow C kernels (cast / if_else) whose
          output matches the per-value Python encoders exactly (pinned
          by the iterator-vs-arrow equality test).
        * timestamps/dates go through ``np.datetime_as_string`` into a
          fixed-width byte matrix (measured ~5× faster than Arrow
          strftime), then rows are shortened to the PG text form —
          trailing fractional zeros trimmed, '.' dropped for whole
          seconds — matching the scalar encoder.
        * floats must match Python ``repr`` (shortest round-trip — what
          the iterator path emits; Arrow's own float→string cast differs
          on integral values, -0.0 and exponent thresholds). repr runs
          once per *distinct bit pattern* (unique on the int64 view
          keeps -0.0/0.0 and NaN payloads apart), then one C-level take
          expands to rows — TPC-H-shaped money/discount columns have few
          distinct values; worst case degrades to one repr per row,
          never worse than the scalar path.
        """
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        t = arr.type
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        n = len(arr)
        if pa.types.is_floating(t):
            width = np.float32 if pa.types.is_float32(t) else np.float64
            buf = np.frombuffer(arr.buffers()[1], dtype=width)[
                arr.offset : arr.offset + n
            ]
            # widen exactly like Row/Arrow materialization does before
            # the Python encoder sees the value
            bits = np.ascontiguousarray(buf.astype(np.float64)).view(np.int64)
            uniq, inv = np.unique(bits, return_inverse=True)
            texts = [_float_text(v).encode() for v in uniq.view(np.float64)]
            texts.append(b"")  # nulls take the empty cell
            inv = np.where(valid, inv, len(texts) - 1)
            cells = pc.take(pa.array(texts, pa.binary()), pa.array(inv))
            return cells, valid
        if pa.types.is_timestamp(t) and t.tz in (None, "UTC"):
            ints = np.frombuffer(arr.buffers()[1], np.int64)[
                arr.offset : arr.offset + n
            ]
            ints = np.where(valid, ints, 0)  # null slots: render epoch, drop later
            vals = ints.view(f"datetime64[{t.unit}]").astype("datetime64[us]")
            strs = np.datetime_as_string(vals, unit="us")
            if strs.dtype == np.dtype("<U26"):  # years 1-9999 (always, for
                # values the Python datetime iterator path could carry at all)
                mat = strs.astype("S26").view(np.uint8).reshape(n, 26).copy()
                mat[:, 10] = 0x20  # 'T' -> ' '
                # PG trims trailing fractional zeros; a whole-second value
                # loses the '.' too. Count the run of trailing '0' in the
                # 6-digit fraction (cols 20-25), then shorten each row.
                tz = np.zeros(n, np.int32)
                cont = np.ones(n, bool)
                for j in range(25, 19, -1):
                    cont &= mat[:, j] == 0x30
                    tz += cont
                lengths = 26 - tz - (tz == 6)
                return RowSerializer._varwidth_cells(mat, lengths, valid), valid
        if pa.types.is_date(t):
            width = np.int32 if pa.types.is_date32(t) else np.int64
            ints = np.frombuffer(arr.buffers()[1], width)[arr.offset : arr.offset + n]
            ints = np.where(valid, ints, 0)
            unit = "D" if pa.types.is_date32(t) else "ms"
            vals = ints.astype(f"datetime64[{unit}]").astype("datetime64[D]")
            strs = np.datetime_as_string(vals, unit="D")
            if strs.dtype == np.dtype("<U10"):
                mat = strs.astype("S10").view(np.uint8).reshape(n, 10)
                return RowSerializer._fixed_width_cells(mat, valid), valid
            sarr = pc.fill_null(pc.strftime(arr, format="%Y-%m-%d"), "")
            return pc.cast(sarr, pa.binary()), valid
        if pa.types.is_timestamp(t):  # exotic tz (or pre-CE years above)
            # arrow %S includes the 6-digit fraction; trim PG-style
            sarr = pc.replace_substring_regex(
                pc.strftime(arr, format="%Y-%m-%d %H:%M:%S"),
                pattern=r"(\.\d*?)0+$",
                replacement=r"\1",
            )
            sarr = pc.replace_substring_regex(sarr, pattern=r"\.$", replacement="")
        elif pa.types.is_boolean(t):
            sarr = pc.if_else(arr, pa.scalar("t"), pa.scalar("f"))
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            sarr = arr
        else:  # integers
            sarr = pc.cast(arr, pa.string())
        if isinstance(sarr, pa.ChunkedArray):
            sarr = sarr.combine_chunks()
        if sarr.null_count:
            sarr = pc.fill_null(sarr, "")
        if pa.types.is_large_string(sarr.type):
            sarr = pc.cast(sarr, pa.large_binary())
        else:
            sarr = pc.cast(sarr, pa.binary())
        return sarr, valid

    def _serialize_arrow_vectorized(self, cols) -> tuple[int, bytes]:
        """Assemble every DataRow with one variadic
        ``binary_join_element_wise`` kernel: per-row 7-byte headers and
        per-cell 4-byte length prefixes are built as big-endian numpy
        matrices (C-level views), payload cells stay in Arrow buffers,
        and the element-wise join interleaves header + prefix + payload
        per row at memcpy speed. No per-row Python anywhere."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        nrows = len(cols[0])
        parts = [self._vec_text_cells(a) for a in cols]
        slens = []
        for cells, valid in parts:
            off_dtype = (
                np.int64 if pa.types.is_large_binary(cells.type) else np.int32
            )
            off = np.frombuffer(cells.buffers()[1], dtype=off_dtype)[
                cells.offset : cells.offset + nrows + 1
            ].astype(np.int64)
            slens.append(off[1:] - off[:-1])
        row_len = 7 + sum(4 + s for s in slens)  # D + len(4) + ncols(2) + cells
        # headers: 'D' + int32 msg-len (excludes the tag byte) + int16 ncols
        hdr = np.empty((nrows, 7), np.uint8)
        hdr[:, 0] = 0x44
        hdr[:, 1:5] = (row_len - 1).astype(">u4").view(np.uint8).reshape(nrows, 4)
        hdr[:, 5] = self._ncols[0]
        hdr[:, 6] = self._ncols[1]
        all_valid = np.ones(nrows, bool)
        pieces = [self._fixed_width_cells(hdr, all_valid)]
        for (cells, valid), slen in zip(parts, slens):
            prefix = (
                np.where(valid, slen, 0xFFFFFFFF)
                .astype(">u4")
                .view(np.uint8)
                .reshape(nrows, 4)
            )
            pieces.append(self._fixed_width_cells(prefix, all_valid))
            pieces.append(cells)
        joined = pc.binary_join_element_wise(*pieces, pa.scalar(b"", pa.binary()))
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        off_dtype = np.int64 if pa.types.is_large_binary(joined.type) else np.int32
        off = np.frombuffer(joined.buffers()[1], dtype=off_dtype)
        start = int(off[joined.offset])
        end = int(off[joined.offset + len(joined)])
        return nrows, joined.buffers()[2].to_pybytes()[start:end]

    def serialize_arrow_table(self, tbl) -> tuple[int, bytes]:
        """Columnar fast path: encode a whole PyArrow table to one
        DataRow byte stream.

        ``df.toArrow()`` skips Row-object materialization entirely (the
        dominant cost of the collect path — measured 1.7 s collect vs
        0.4 s toArrow for 60k×11). All-text results over the common
        scalar types take the fully vectorized assembler above; anything
        else (binary formats, arrays/maps/structs/decimals/intervals)
        falls back to the per-cell loop below. Byte output is identical
        to the row path either way.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        if tbl.num_rows and all(f == 0 for f in self.formats):
            cols = [c.combine_chunks() for c in tbl.columns]
            if cols and all(self._vec_supported(c.type) for c in cols):
                # keep each assembled slice's offsets well inside int32
                # (binary_join_element_wise output is 32-bit-offset
                # binary); the text rendering of a row can't exceed ~4×
                # its arrow footprint for these types
                max_rows = tbl.num_rows
                if tbl.nbytes > 256 << 20:
                    per_row = max(tbl.nbytes // tbl.num_rows, 1)
                    max_rows = max((256 << 20) // per_row, 1)
                if max_rows >= tbl.num_rows:
                    return self._serialize_arrow_vectorized(cols)
                parts = []
                for start in range(0, tbl.num_rows, max_rows):
                    sl = [c.slice(start, max_rows) for c in cols]
                    parts.append(self._serialize_arrow_vectorized(sl)[1])
                return tbl.num_rows, b"".join(parts)

        null_cell = b"\xff\xff\xff\xff"
        enc_cols: list[list[bytes]] = []
        for col, (enc, is_bin) in zip(tbl.columns, self.encoders):
            # C-level fast path for text-mode timestamp/date columns:
            # arrow strftime emits the exact same format as the python
            # encoder (pinned by the iterator-vs-arrow equality test),
            # ~5× cheaper than datetime.isoformat per value
            if not is_bin and pa.types.is_timestamp(col.type):
                # arrow's %S on timestamp[us] always includes the 6-digit
                # fraction; trim it PG-style like the scalar encoder
                strs = pc.replace_substring_regex(
                    pc.replace_substring_regex(
                        pc.strftime(col.combine_chunks(), format="%Y-%m-%d %H:%M:%S"),
                        pattern=r"(\.\d*?)0+$",
                        replacement=r"\1",
                    ),
                    pattern=r"\.$",
                    replacement="",
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
