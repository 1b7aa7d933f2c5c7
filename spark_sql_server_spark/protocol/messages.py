"""PG V3 wire message encoding/decoding.

Backend (server→client) encoders and frontend (client→server) decoders,
``struct.pack``-based — the Python twin of the reference's
``PgWireProtocol`` object (``protocol.scala:66-201, :750-903``).

Framing: every message after startup is ``byte tag | int32 len | body``
where len includes itself but not the tag.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

PROTOCOL_V3 = 196608  # 3.0
SSL_REQUEST_CODE = 80877103
CANCEL_REQUEST_CODE = 80877102
GSSENC_REQUEST_CODE = 80877104

# ---------------------------------------------------------------------------
# Backend message builders
# ---------------------------------------------------------------------------


def _msg(tag: bytes, body: bytes = b"") -> bytes:
    return tag + struct.pack("!i", len(body) + 4) + body


def authentication_ok() -> bytes:
    return _msg(b"R", struct.pack("!i", 0))


def authentication_cleartext_password() -> bytes:
    return _msg(b"R", struct.pack("!i", 3))


def authentication_md5_password(salt: bytes) -> bytes:
    """AuthenticationMD5Password: 4-byte random salt; the client answers
    ``'md5' + hex(md5(hex(md5(password + user)) + salt))``."""
    assert len(salt) == 4
    return _msg(b"R", struct.pack("!i", 5) + salt)


def authentication_sasl(mechanisms: list[str]) -> bytes:
    """AuthenticationSASL: advertised mechanism list, NUL-separated,
    double-NUL terminated."""
    body = struct.pack("!i", 10)
    for m in mechanisms:
        body += m.encode() + b"\x00"
    return _msg(b"R", body + b"\x00")


def authentication_sasl_continue(data: bytes) -> bytes:
    return _msg(b"R", struct.pack("!i", 11) + data)


def authentication_sasl_final(data: bytes) -> bytes:
    return _msg(b"R", struct.pack("!i", 12) + data)


def parameter_status(key: str, value: str) -> bytes:
    return _msg(b"S", key.encode() + b"\x00" + value.encode() + b"\x00")


def backend_key_data(pid: int, secret: int) -> bytes:
    return _msg(b"K", struct.pack("!ii", pid, secret))


def ready_for_query(status: bytes = b"I") -> bytes:
    return _msg(b"Z", status)


def command_complete(tag: str) -> bytes:
    return _msg(b"C", tag.encode() + b"\x00")


def empty_query_response() -> bytes:
    return _msg(b"I")


def parse_complete() -> bytes:
    return _msg(b"1")


def bind_complete() -> bytes:
    return _msg(b"2")


def close_complete() -> bytes:
    return _msg(b"3")


def no_data() -> bytes:
    return _msg(b"n")


def portal_suspended() -> bytes:
    return _msg(b"s")


def parameter_description(oids: list[int]) -> bytes:
    return _msg(b"t", struct.pack("!h", len(oids)) + b"".join(struct.pack("!i", o) for o in oids))


def row_description(
    fields: list[tuple[str, int, int, int]],  # (name, oid, typlen, format)
) -> bytes:
    body = struct.pack("!h", len(fields))
    for name, oid, typlen, fmt in fields:
        body += (
            name.encode("utf-8")
            + b"\x00"
            + struct.pack("!ihihih", 0, 0, oid, typlen, -1, fmt)
        )
    return _msg(b"T", body)


def data_row(cells: list[bytes | None]) -> bytes:
    parts = [struct.pack("!h", len(cells))]
    for c in cells:
        if c is None:
            parts.append(struct.pack("!i", -1))
        else:
            parts.append(struct.pack("!i", len(c)))
            parts.append(c)
    return _msg(b"D", b"".join(parts))


def notification_response(pid: int, channel: str, payload: str) -> bytes:
    """'A' — asynchronous NOTIFY delivery to a LISTENing session."""
    body = (
        struct.pack("!i", pid)
        + channel.encode("utf-8") + b"\x00"
        + payload.encode("utf-8") + b"\x00"
    )
    return _msg(b"A", body)


def copy_in_response(ncols: int, binary: bool = False) -> bytes:
    fmt = 1 if binary else 0
    body = struct.pack("!bh", fmt, ncols) + struct.pack("!h", fmt) * ncols
    return _msg(b"G", body)


def copy_out_response(ncols: int, binary: bool = False) -> bytes:
    fmt = 1 if binary else 0
    body = struct.pack("!bh", fmt, ncols) + struct.pack("!h", fmt) * ncols
    return _msg(b"H", body)


def copy_data(data: bytes) -> bytes:
    return _msg(b"d", data)


def copy_done() -> bytes:
    return _msg(b"c")


def error_response(message: str, code: str = "XX000", severity: str = "ERROR") -> bytes:
    body = (
        b"S" + severity.encode() + b"\x00"
        + b"C" + code.encode() + b"\x00"
        + b"M" + message.encode("utf-8", "replace") + b"\x00"
        + b"\x00"
    )
    return _msg(b"E", body)


def notice_response(message: str, severity: str = "NOTICE") -> bytes:
    body = (
        b"S" + severity.encode() + b"\x00C00000\x00M"
        + message.encode("utf-8", "replace") + b"\x00\x00"
    )
    return _msg(b"N", body)


# ---------------------------------------------------------------------------
# Frontend message decoders
# ---------------------------------------------------------------------------


class Reader:
    """Cursor over one message body."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def cstring(self) -> str:
        end = self.buf.index(b"\x00", self.pos)
        s = self.buf[self.pos : end].decode("utf-8")
        self.pos = end + 1
        return s

    def int32(self) -> int:
        (v,) = struct.unpack_from("!i", self.buf, self.pos)
        self.pos += 4
        return v

    def int16(self) -> int:
        (v,) = struct.unpack_from("!h", self.buf, self.pos)
        self.pos += 2
        return v

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b


@dataclass
class StartupMessage:
    protocol: int
    params: dict[str, str] = field(default_factory=dict)


def parse_startup(body: bytes) -> StartupMessage:
    r = Reader(body)
    proto = r.int32()
    params: dict[str, str] = {}
    while r.pos < len(body) - 1:
        k = r.cstring()
        if not k:
            break
        params[k] = r.cstring()
    return StartupMessage(proto, params)


@dataclass
class ParseMessage:
    name: str
    sql: str
    param_oids: list[int]


def parse_parse(body: bytes) -> ParseMessage:
    r = Reader(body)
    name = r.cstring()
    sql = r.cstring()
    n = r.int16()
    oids = [r.int32() for _ in range(n)]
    return ParseMessage(name, sql, oids)


@dataclass
class BindMessage:
    portal: str
    statement: str
    param_formats: list[int]
    params: list[bytes | None]
    result_formats: list[int]


def parse_bind(body: bytes) -> BindMessage:
    r = Reader(body)
    portal = r.cstring()
    stmt = r.cstring()
    nfmt = r.int16()
    fmts = [r.int16() for _ in range(nfmt)]
    nparams = r.int16()
    params: list[bytes | None] = []
    for _ in range(nparams):
        ln = r.int32()
        params.append(None if ln == -1 else r.read(ln))
    nrfmt = r.int16()
    rfmts = [r.int16() for _ in range(nrfmt)]
    return BindMessage(portal, stmt, fmts, params, rfmts)


@dataclass
class DescribeMessage:
    kind: str  # 'S' or 'P'
    name: str


def parse_describe(body: bytes) -> DescribeMessage:
    return DescribeMessage(chr(body[0]), Reader(body[1:]).cstring())


@dataclass
class ExecuteMessage:
    portal: str
    max_rows: int


def parse_execute(body: bytes) -> ExecuteMessage:
    r = Reader(body)
    portal = r.cstring()
    return ExecuteMessage(portal, r.int32())


@dataclass
class CloseMessage:
    kind: str
    name: str


def parse_close(body: bytes) -> CloseMessage:
    return CloseMessage(chr(body[0]), Reader(body[1:]).cstring())


def parse_query(body: bytes) -> str:
    return Reader(body).cstring()


def parse_cancel(body: bytes) -> tuple[int, int]:
    r = Reader(body)
    return r.int32(), r.int32()
