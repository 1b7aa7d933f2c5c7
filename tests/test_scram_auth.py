"""SCRAM-SHA-256 authentication tests (RFC 5802/7677).

Beyond-reference surface (the reference only stubs GSS,
``protocol.scala:703-729``): unit tests of the server state machine
against a hand-rolled RFC client, raw-socket SASL e2e, and a real-psql
drive (libpq negotiates SCRAM natively from AuthenticationSASL).
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import hmac
import secrets as pysecrets
import shutil
import struct
import subprocess
import threading

import pytest

from spark_sql_server_spark.protocol import scram
from spark_sql_server_spark.protocol.server import SparkPGServer
from tests.test_protocol_e2e import PgClient, _startup, rows_of


# --------------------------------------------------------------------- #
# RFC 5802 client side (test-local — drives the server state machine)
# --------------------------------------------------------------------- #


def _hmac(key: bytes, msg: bytes) -> bytes:
    return hmac.new(key, msg, hashlib.sha256).digest()


class _RfcClient:
    def __init__(
        self,
        password: str,
        gs2: str = "n,,",
        nonce: str | None = None,
        cbind_data: bytes = b"",
    ):
        self.password = password
        self.gs2 = gs2
        self.cbind_data = cbind_data  # RFC 5929 data for p= exchanges
        self.nonce = nonce or pysecrets.token_urlsafe(18)
        self.first_bare = f"n=,r={self.nonce}"

    def first(self) -> bytes:
        return (self.gs2 + self.first_bare).encode()

    def final(self, server_first: bytes) -> tuple[bytes, bytes]:
        """Returns (client-final bytes, expected ServerSignature)."""
        attrs = dict(p.split("=", 1) for p in server_first.decode().split(","))
        assert attrs["r"].startswith(self.nonce)
        salt = base64.b64decode(attrs["s"])
        i = int(attrs["i"])
        salted = hashlib.pbkdf2_hmac("sha256", self.password.encode(), salt, i)
        client_key = _hmac(salted, b"Client Key")
        stored_key = hashlib.sha256(client_key).digest()
        c = base64.b64encode(self.gs2.encode() + self.cbind_data).decode()
        without_proof = f"c={c},r={attrs['r']}"
        auth_message = ",".join(
            (self.first_bare, server_first.decode(), without_proof)
        ).encode()
        sig = _hmac(stored_key, auth_message)
        proof = bytes(a ^ b for a, b in zip(client_key, sig))
        final = f"{without_proof},p={base64.b64encode(proof).decode()}"
        server_sig = _hmac(_hmac(salted, b"Server Key"), auth_message)
        return final.encode(), b"v=" + base64.b64encode(server_sig)


class TestScramStateMachine:
    def test_full_exchange(self):
        cli = _RfcClient("hunter2")
        srv = scram.ScramServer("hunter2")
        sfirst = srv.handle_client_first(cli.first())
        assert sfirst.startswith(b"r=" + cli.nonce.encode())
        assert b",s=" in sfirst and b",i=4096" in sfirst
        cfinal, want_sig = cli.final(sfirst)
        assert srv.handle_client_final(cfinal) == want_sig

    def test_rfc7677_vector(self):
        # the published RFC 7677 example exchange, replayed verbatim
        srv = scram.ScramServer(
            "pencil",
            salt=base64.b64decode("W22ZaJ0SNY7soEsUEjb6gQ=="),
            server_nonce="%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0",
            iterations=4096,
        )
        sfirst = srv.handle_client_first(
            b"n,,n=user,r=rOprNGfwEbeRWgbNEkqO"
        )
        assert sfirst == (
            b"r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
            b"s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
        )
        sfinal = srv.handle_client_final(
            b"c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
            b"p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
        )
        assert sfinal == b"v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="

    def test_y_gs2_header_accepted(self):
        # "y,," = client supports channel binding, server offered no
        # -PLUS (libpq sends this over SSL when only SCRAM-SHA-256 is
        # advertised)
        cli = _RfcClient("pw", gs2="y,,")
        srv = scram.ScramServer("pw")
        cfinal, want = cli.final(srv.handle_client_first(cli.first()))
        assert srv.handle_client_final(cfinal) == want

    def test_wrong_password_is_28p01(self):
        cli = _RfcClient("wrong")
        srv = scram.ScramServer("right")
        cfinal, _ = cli.final(srv.handle_client_first(cli.first()))
        with pytest.raises(scram.ScramError) as ei:
            srv.handle_client_final(cfinal)
        assert ei.value.sqlstate == "28P01"

    def test_channel_binding_required_rejected(self):
        srv = scram.ScramServer("pw")
        with pytest.raises(scram.ScramError):
            srv.handle_client_first(b"p=tls-server-end-point,,n=,r=abc")

    def test_nonce_mismatch_rejected(self):
        cli = _RfcClient("pw")
        srv = scram.ScramServer("pw")
        sfirst = srv.handle_client_first(cli.first())
        cfinal, _ = cli.final(sfirst)
        # tamper: replace the combined nonce
        bad = cfinal.replace(cli.nonce.encode(), b"XXXX", 1)
        with pytest.raises(scram.ScramError):
            srv.handle_client_final(bad)

    def test_cbind_data_mismatch_rejected(self):
        cli = _RfcClient("pw")
        srv = scram.ScramServer("pw")
        cfinal, _ = cli.final(srv.handle_client_first(cli.first()))
        with pytest.raises(scram.ScramError):
            # c=eSws claims a "y,," gs2 header the client never sent
            srv.handle_client_final(cfinal.replace(b"c=biws", b"c=eSws"))

    def test_malformed_first_rejected(self):
        srv = scram.ScramServer("pw")
        for bad in (b"", b"x,,n=,r=a", b"n,,garbage", b"n,,n=u"):
            with pytest.raises(scram.ScramError):
                scram.ScramServer("pw").handle_client_first(bad)
        with pytest.raises(scram.ScramError):
            srv.handle_client_final(b"c=biws,r=a,p=AAAA")  # before first


# --------------------------------------------------------------------- #
# socket e2e
# --------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def scram_server(spark):
    loop = asyncio.new_event_loop()
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()

    async def make():
        srv = SparkPGServer(
            spark,
            port=0,
            pg_catalog=False,
            auth="scram-sha-256",
            password_lookup=lambda user: "s3cret" if user == "alice" else None,
        )
        await srv.start()
        return srv

    srv = asyncio.run_coroutine_threadsafe(make(), loop).result(120)
    yield srv, loop
    asyncio.run_coroutine_threadsafe(srv.stop(), loop).result(30)
    loop.call_soon_threadsafe(loop.stop)


def _pmsg(data: bytes) -> bytes:
    return b"p" + struct.pack("!i", len(data) + 4) + data


async def _read_msg(r):
    hdr = await r.readexactly(5)
    (ln,) = struct.unpack("!i", hdr[1:])
    return hdr[:1], await r.readexactly(ln - 4)


async def _sasl_login(port: int, user: str, password: str):
    """Full SASL exchange; returns (reader, writer, server_sig_ok) on
    success or (None, None, error_body) on auth failure."""
    r, w = await asyncio.open_connection("127.0.0.1", port)
    w.write(_startup({"user": user}))
    await w.drain()
    tag, body = await _read_msg(r)
    assert tag == b"R" and struct.unpack("!i", body[:4])[0] == 10
    mechs = body[4:].rstrip(b"\x00").split(b"\x00")
    assert b"SCRAM-SHA-256" in mechs
    cli = _RfcClient(password)
    first = cli.first()
    w.write(_pmsg(b"SCRAM-SHA-256\x00" + struct.pack("!i", len(first)) + first))
    await w.drain()
    tag, body = await _read_msg(r)
    assert tag == b"R" and struct.unpack("!i", body[:4])[0] == 11
    cfinal, want_sig = cli.final(body[4:])
    w.write(_pmsg(cfinal))
    await w.drain()
    tag, body = await _read_msg(r)
    if tag == b"E":
        w.close()
        return None, None, body
    assert tag == b"R" and struct.unpack("!i", body[:4])[0] == 12
    return r, w, body[4:] == want_sig


class TestScramSocketE2E:
    def test_login_and_query(self, scram_server):
        srv, loop = scram_server

        async def go():
            r, w, sig_ok = await _sasl_login(srv.port, "alice", "s3cret")
            assert sig_ok is True  # server proved knowledge of the password
            c = PgClient(r, w)
            msgs = await c.until_ready()
            assert msgs[0][0] == b"R"  # AuthenticationOk
            result = await c.simple("SELECT 7 AS v")
            await c.close()
            return result

        assert rows_of(asyncio.run_coroutine_threadsafe(go(), loop).result(120)) == [[b"7"]]

    def test_wrong_password_28p01(self, scram_server):
        srv, loop = scram_server
        r, w, err = asyncio.run_coroutine_threadsafe(
            _sasl_login(srv.port, "alice", "nope"), loop
        ).result(120)
        assert r is None and b"28P01" in err

    def test_unknown_user_28p01_after_mock_exchange(self, scram_server):
        # unknown users get a full mock exchange (no enumeration), then
        # the same 28P01 as a wrong password
        srv, loop = scram_server
        r, w, err = asyncio.run_coroutine_threadsafe(
            _sasl_login(srv.port, "mallory", "s3cret"), loop
        ).result(120)
        assert r is None and b"28P01" in err

    def test_unsupported_mechanism_rejected(self, scram_server):
        srv, loop = scram_server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            await _read_msg(r)  # AuthenticationSASL
            w.write(_pmsg(b"SCRAM-SHA-256-PLUS\x00" + struct.pack("!i", 3) + b"n,,"))
            await w.drain()
            tag, body = await _read_msg(r)
            w.close()
            return tag, body

        tag, body = asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        assert tag == b"E" and b"28000" in body


# --------------------------------------------------------------------- #
# real psql (libpq SCRAM)
# --------------------------------------------------------------------- #

psql_missing = shutil.which("psql") is None


@pytest.mark.skipif(psql_missing, reason="psql binary not available")
class TestScramPsql:
    def _psql(self, srv, password: str, sql: str):
        return subprocess.run(
            ["psql", "-h", "127.0.0.1", "-p", str(srv.port), "-U", "alice",
             "-d", "default", "-X", "-At", "-c", sql],
            capture_output=True,
            text=True,
            timeout=120,
            env={"PATH": "/usr/bin:/bin", "PGPASSWORD": password,
                 "PGCONNECT_TIMEOUT": "30"},
        )

    def test_psql_scram_login(self, scram_server):
        srv, _ = scram_server
        out = self._psql(srv, "s3cret", "SELECT 1+1")
        assert out.returncode == 0, out.stderr
        assert out.stdout.strip() == "2"

    def test_psql_scram_wrong_password(self, scram_server):
        srv, _ = scram_server
        out = self._psql(srv, "wrong", "SELECT 1")
        assert out.returncode != 0
        assert "password authentication failed" in out.stderr


# --------------------------------------------------------------------- #
# md5 challenge-response (PG `md5` hba method; the pre-SCRAM default
# older clients negotiate)
# --------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def md5_server(spark):
    loop = asyncio.new_event_loop()
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()

    async def make():
        srv = SparkPGServer(
            spark,
            port=0,
            pg_catalog=False,
            auth="md5",
            password_lookup=lambda user: "s3cret" if user == "alice" else None,
        )
        await srv.start()
        return srv

    srv = asyncio.run_coroutine_threadsafe(make(), loop).result(120)
    yield srv, loop
    asyncio.run_coroutine_threadsafe(srv.stop(), loop).result(30)
    loop.call_soon_threadsafe(loop.stop)


def _md5_answer(user: str, password: str, salt: bytes) -> bytes:
    """libpq's pg_md5_encrypt: 'md5' + hex(md5(hex(md5(pw+user)) + salt))."""
    inner = hashlib.md5((password + user).encode()).hexdigest()
    return b"md5" + hashlib.md5(inner.encode() + salt).hexdigest().encode()


async def _md5_login(port: int, user: str, password: str):
    """Returns (reader, writer, None) on success or (None, None, err)."""
    r, w = await asyncio.open_connection("127.0.0.1", port)
    w.write(_startup({"user": user}))
    await w.drain()
    tag, body = await _read_msg(r)
    assert tag == b"R" and struct.unpack("!i", body[:4])[0] == 5
    salt = body[4:8]
    assert len(salt) == 4
    w.write(_pmsg(_md5_answer(user, password, salt) + b"\x00"))
    await w.drain()
    tag, body = await _read_msg(r)
    if tag == b"E":
        w.close()
        return None, None, body
    assert tag == b"R" and struct.unpack("!i", body[:4])[0] == 0
    return r, w, None


class TestMd5SocketE2E:
    def test_login_and_query(self, md5_server):
        srv, loop = md5_server

        async def go():
            r, w, err = await _md5_login(srv.port, "alice", "s3cret")
            assert err is None
            c = PgClient(r, w)
            await c.until_ready()
            result = await c.simple("SELECT 6*7 AS v")
            await c.close()
            return result

        assert rows_of(
            asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        ) == [[b"42"]]

    def test_salts_are_random_per_connection(self, md5_server):
        srv, loop = md5_server

        async def salt_of():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            tag, body = await _read_msg(r)
            w.close()
            return body[4:8]

        async def go():
            return await salt_of(), await salt_of()

        s1, s2 = asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        assert s1 != s2

    def test_wrong_password_28p01(self, md5_server):
        srv, loop = md5_server
        r, w, err = asyncio.run_coroutine_threadsafe(
            _md5_login(srv.port, "alice", "nope"), loop
        ).result(120)
        assert r is None and b"28P01" in err

    def test_unknown_user_28p01(self, md5_server):
        srv, loop = md5_server
        r, w, err = asyncio.run_coroutine_threadsafe(
            _md5_login(srv.port, "mallory", "s3cret"), loop
        ).result(120)
        assert r is None and b"28P01" in err


@pytest.mark.skipif(psql_missing, reason="psql binary not available")
class TestMd5Psql:
    def _psql(self, srv, password: str, sql: str):
        return subprocess.run(
            ["psql", "-h", "127.0.0.1", "-p", str(srv.port), "-U", "alice",
             "-d", "default", "-X", "-At", "-c", sql],
            capture_output=True,
            text=True,
            timeout=120,
            env={"PATH": "/usr/bin:/bin", "PGPASSWORD": password,
                 "PGCONNECT_TIMEOUT": "30"},
        )

    def test_psql_md5_login(self, md5_server):
        srv, _ = md5_server
        out = self._psql(srv, "s3cret", "SELECT 2+3")
        assert out.returncode == 0, out.stderr
        assert out.stdout.strip() == "5"

    def test_psql_md5_wrong_password(self, md5_server):
        srv, _ = md5_server
        out = self._psql(srv, "wrong", "SELECT 1")
        assert out.returncode != 0
        assert "password authentication failed" in out.stderr


# --------------------------------------------------------------------- #
# r12: auth-phase fuzz battery (VERDICT r11 task 7 + the r11 ADVICE
# plen bound) — a hostile client poking the UNauthenticated handshake
# must get 08P01/28P01 and never crash the server or buffer ~2 GB.


async def _good_scram_login_works(port: int) -> bool:
    r, w, sig_ok = await _sasl_login(port, "alice", "s3cret")
    ok = sig_ok is True
    if r is not None:
        c = PgClient(r, w)
        await c.until_ready()
        await c.close()
    return ok


class TestAuthFuzzBattery:
    def test_oversized_plen_in_sasl_initial(self, scram_server):
        # plen 10 MB blows the 64 KiB pre-auth bound → FATAL 08P01 at
        # receipt (no buffering), server stays alive
        srv, loop = scram_server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            await _read_msg(r)  # AuthenticationSASL
            w.write(b"p" + struct.pack("!i", 10_000_000))
            await w.drain()
            tag, body = await _read_msg(r)
            w.close()
            alive = await _good_scram_login_works(srv.port)
            return tag, body, alive

        tag, body, alive = asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        assert tag == b"E" and b"08P01" in body
        assert alive

    def test_negative_plen_in_sasl_initial(self, scram_server):
        srv, loop = scram_server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            await _read_msg(r)
            w.write(b"p" + struct.pack("!i", -5))
            await w.drain()
            tag, body = await _read_msg(r)
            w.close()
            alive = await _good_scram_login_works(srv.port)
            return tag, body, alive

        tag, body, alive = asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        assert tag == b"E" and b"08P01" in body
        assert alive

    def test_garbage_sasl_initial_body(self, scram_server):
        # no NUL-terminated mechanism / bogus length word inside the
        # SASLInitialResponse → malformed, 08P01/28000, server alive
        srv, loop = scram_server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            await _read_msg(r)
            w.write(_pmsg(b"\xff\xfe\xfd\xfc\xfb\xfa"))
            await w.drain()
            tag, body = await _read_msg(r)
            w.close()
            alive = await _good_scram_login_works(srv.port)
            return tag, body, alive

        tag, body, alive = asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        assert tag == b"E"
        assert b"08P01" in body or b"28000" in body
        assert alive

    def test_truncated_sasl_initial_data_length(self, scram_server):
        # mechanism ok but the declared data length exceeds the bytes
        # present — the sliced-short client-first fails SCRAM parsing
        srv, loop = scram_server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            await _read_msg(r)
            w.write(_pmsg(b"SCRAM-SHA-256\x00" + struct.pack("!i", 999) + b"n,,"))
            await w.drain()
            tag, body = await _read_msg(r)
            w.close()
            alive = await _good_scram_login_works(srv.port)
            return tag, body, alive

        tag, body, alive = asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        assert tag == b"E"
        assert alive

    def test_disconnect_mid_scram(self, scram_server):
        # vanish after the server-first message — the handler's quiet
        # path reaps the connection; the next login is unaffected
        srv, loop = scram_server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            await _read_msg(r)
            cli = _RfcClient("s3cret")
            first = cli.first()
            w.write(
                _pmsg(b"SCRAM-SHA-256\x00" + struct.pack("!i", len(first)) + first)
            )
            await w.drain()
            await _read_msg(r)  # server-first (SASLContinue)
            w.close()  # die mid-exchange
            return await _good_scram_login_works(srv.port)

        assert asyncio.run_coroutine_threadsafe(go(), loop).result(120)

    def test_garbage_sasl_final(self, scram_server):
        # a syntactically hostile client-final → ScramError → 28P01/08P01
        srv, loop = scram_server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            await _read_msg(r)
            cli = _RfcClient("s3cret")
            first = cli.first()
            w.write(
                _pmsg(b"SCRAM-SHA-256\x00" + struct.pack("!i", len(first)) + first)
            )
            await w.drain()
            await _read_msg(r)
            w.write(_pmsg(b"\x00garbage\xffnot-scram"))
            await w.drain()
            tag, body = await _read_msg(r)
            w.close()
            alive = await _good_scram_login_works(srv.port)
            return tag, body, alive

        tag, body, alive = asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        assert tag == b"E"
        # 28P01 (bad proof), 28000 (malformed/not-UTF-8) and 08P01
        # (protocol violation) are all acceptable rejections
        assert b"28P01" in body or b"08P01" in body or b"28000" in body
        assert alive

    def test_oversized_plen_in_md5(self, md5_server):
        srv, loop = md5_server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            tag, body = await _read_msg(r)  # AuthenticationMD5Password
            assert tag == b"R" and struct.unpack("!i", body[:4])[0] == 5
            w.write(b"p" + struct.pack("!i", 1 << 29))
            await w.drain()
            tag, body = await _read_msg(r)
            w.close()
            # server alive: a real MD5 login still succeeds
            r2, w2, _ = await _md5_login(srv.port, "alice", "s3cret")
            alive = r2 is not None
            if r2 is not None:
                w2.close()
            return tag, body, alive

        tag, body, alive = asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        assert tag == b"E" and b"08P01" in body
        assert alive

    def test_garbage_md5_response(self, md5_server):
        srv, loop = md5_server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            await _read_msg(r)
            w.write(_pmsg(b"\xde\xad\xbe\xef not an md5 hash"))
            await w.drain()
            tag, body = await _read_msg(r)
            w.close()
            r2, w2, _ = await _md5_login(srv.port, "alice", "s3cret")
            alive = r2 is not None
            if r2 is not None:
                w2.close()
            return tag, body, alive

        tag, body, alive = asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        assert tag == b"E" and b"28P01" in body
        assert alive


# --------------------------------------------------------------------- #
# r12: SCRAM-SHA-256-PLUS channel binding (RFC 5929 tls-server-end-point)
# — VERDICT r11 task 4.


class TestScramPlusStateMachine:
    CB = b"\x01\x02" * 16  # fake 32-byte binding data

    def _plus_srv(self, password="pw"):
        return scram.ScramServer(
            password, cbind_data=self.CB, plus_advertised=True
        )

    def test_plus_exchange_green(self):
        cli = _RfcClient(
            "pw", gs2="p=tls-server-end-point,,", cbind_data=self.CB
        )
        srv = self._plus_srv()
        cfinal, want = cli.final(srv.handle_client_first(cli.first()))
        assert srv.handle_client_final(cfinal) == want
        assert srv._cbind_used

    def test_plus_wrong_cbind_data_rejected(self):
        # a MITM terminating TLS presents a different cert → different
        # tls-server-end-point hash → c= mismatch before the proof
        cli = _RfcClient(
            "pw", gs2="p=tls-server-end-point,,", cbind_data=b"\xff" * 32
        )
        srv = self._plus_srv()
        cfinal, _ = cli.final(srv.handle_client_first(cli.first()))
        with pytest.raises(scram.ScramError, match="channel-binding"):
            srv.handle_client_final(cfinal)

    def test_y_downgrade_rejected_when_plus_advertised(self):
        # RFC 5802: gs2 'y' claims "server can't do CB"; if we DID
        # advertise -PLUS that claim is a downgrade attack
        with pytest.raises(scram.ScramError, match="downgrade"):
            self._plus_srv().handle_client_first(b"y,,n=,r=abc")

    def test_y_still_fine_when_plus_not_advertised(self):
        cli = _RfcClient("pw", gs2="y,,")
        srv = scram.ScramServer("pw")
        cfinal, want = cli.final(srv.handle_client_first(cli.first()))
        assert srv.handle_client_final(cfinal) == want

    def test_unsupported_cb_type_rejected(self):
        with pytest.raises(scram.ScramError, match="tls-server-end-point"):
            self._plus_srv().handle_client_first(b"p=tls-unique,,n=,r=abc")

    def test_tls_server_end_point_is_cert_hash(self):
        cryptography = pytest.importorskip("cryptography")  # noqa: F841
        from cryptography import x509
        from cryptography.hazmat.primitives.serialization import Encoding

        from spark_sql_server_spark.protocol.tls import (
            generate_self_signed_cert,
        )

        cert_path, _ = generate_self_signed_cert()
        pem = open(cert_path, "rb").read()
        data = scram.tls_server_end_point(pem)
        cert = x509.load_pem_x509_certificate(pem)
        assert data == hashlib.sha256(cert.public_bytes(Encoding.DER)).digest()
        assert len(data) == 32


@pytest.fixture(scope="module")
def scram_tls_server(spark):
    pytest.importorskip("cryptography")
    loop = asyncio.new_event_loop()
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()

    async def make():
        srv = SparkPGServer(
            spark,
            port=0,
            pg_catalog=False,
            auth="scram-sha-256",
            ssl_self_signed=True,
            password_lookup=lambda user: "s3cret" if user == "alice" else None,
        )
        await srv.start()
        return srv

    srv = asyncio.run_coroutine_threadsafe(make(), loop).result(120)
    yield srv, loop
    asyncio.run_coroutine_threadsafe(srv.stop(), loop).result(30)
    loop.call_soon_threadsafe(loop.stop)


@pytest.mark.skipif(psql_missing, reason="psql binary not available")
class TestScramPlusPsql:
    """Real libpq over TLS: sslmode=require + channel_binding=require
    forces SCRAM-SHA-256-PLUS — the hardened-auth story end-to-end."""

    def _psql(self, srv, password: str, sql: str, channel_binding: str):
        conninfo = (
            f"host=127.0.0.1 port={srv.port} user=alice dbname=default "
            f"sslmode=require channel_binding={channel_binding}"
        )
        return subprocess.run(
            ["psql", conninfo, "-X", "-At", "-c", sql],
            capture_output=True,
            text=True,
            timeout=120,
            env={"PATH": "/usr/bin:/bin", "PGPASSWORD": password,
                 "PGCONNECT_TIMEOUT": "30"},
        )

    def test_channel_binding_require_green(self, scram_tls_server):
        srv, _ = scram_tls_server
        out = self._psql(srv, "s3cret", "SELECT 2+3", "require")
        assert out.returncode == 0, out.stderr
        assert out.stdout.strip() == "5"

    def test_channel_binding_prefer_green(self, scram_tls_server):
        # libpq's default over SSL — picks -PLUS when offered
        srv, _ = scram_tls_server
        out = self._psql(srv, "s3cret", "SELECT 1", "prefer")
        assert out.returncode == 0, out.stderr

    def test_channel_binding_disable_still_plain_scram(self, scram_tls_server):
        srv, _ = scram_tls_server
        out = self._psql(srv, "s3cret", "SELECT 7", "disable")
        assert out.returncode == 0, out.stderr
        assert out.stdout.strip() == "7"

    def test_wrong_password_with_binding(self, scram_tls_server):
        srv, _ = scram_tls_server
        out = self._psql(srv, "nope", "SELECT 1", "require")
        assert out.returncode != 0
        assert "password authentication failed" in out.stderr


class TestScramPlusAdvertising:
    def test_non_tls_connection_gets_plain_only(self, scram_tls_server):
        # same server, no SSLRequest: the mechanism list must not
        # contain -PLUS (RFC 5802 — binding needs the TLS channel)
        srv, loop = scram_tls_server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            tag, body = await _read_msg(r)
            w.close()
            return tag, body

        tag, body = asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        assert tag == b"R" and struct.unpack("!i", body[:4])[0] == 10
        mechs = body[4:].rstrip(b"\x00").split(b"\x00")
        assert b"SCRAM-SHA-256" in mechs
        assert b"SCRAM-SHA-256-PLUS" not in mechs

    def test_plus_over_plain_socket_rejected(self, scram_tls_server):
        srv, loop = scram_tls_server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "alice"}))
            await w.drain()
            await _read_msg(r)
            w.write(
                _pmsg(b"SCRAM-SHA-256-PLUS\x00" + struct.pack("!i", 3) + b"n,,")
            )
            await w.drain()
            tag, body = await _read_msg(r)
            w.close()
            return tag, body

        tag, body = asyncio.run_coroutine_threadsafe(go(), loop).result(120)
        assert tag == b"E" and b"28000" in body
