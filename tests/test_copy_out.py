"""COPY ... TO STDOUT extension tests (reference gap: it rejects COPY)."""

from __future__ import annotations

import asyncio
import struct

import pytest

from spark_sql_server_spark.dialect.commands import StatementClass, classify_statement
from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import PgClient, _q, completes_of, rows_of


class TestClassify:
    def test_copy_query_to_stdout(self):
        st = classify_statement("COPY (SELECT 1 AS a) TO STDOUT")
        assert st.cls is StatementClass.COPY_OUT
        assert st.copy_query == "SELECT 1 AS a"
        assert st.copy_format == "text"

    def test_copy_table_csv_header(self):
        st = classify_statement("COPY nation TO STDOUT WITH (FORMAT CSV, HEADER)")
        assert st.cls is StatementClass.COPY_OUT
        assert st.copy_query == "SELECT * FROM nation"
        assert st.copy_format == "csv"
        assert st.copy_header

    def test_copy_from_stdin(self):
        st = classify_statement("COPY t (a, b) FROM STDIN WITH (FORMAT CSV, HEADER)")
        assert st.cls is StatementClass.COPY_IN
        assert st.cursor_name == "t"
        assert st.copy_query == "a, b"
        assert st.copy_format == "csv" and st.copy_header

    def test_copy_from_file_not_matched(self):
        # only STDIN is supported; file paths fall through → Spark errors
        st = classify_statement("COPY t FROM '/tmp/file.csv'")
        assert st.cls is StatementClass.QUERY


@pytest.fixture(scope="module")
def server(spark):
    loop = asyncio.new_event_loop()

    async def _run():
        srv = SparkPGServer(
            spark, port=0, init_session=lambda s: register_tables(s, SF_SMOKE)
        )
        await srv.start()
        return srv

    srv = loop.run_until_complete(_run())
    yield srv, loop
    loop.run_until_complete(srv.stop())
    loop.close()


def copy_payload(msgs) -> bytes:
    return b"".join(b for t, b in msgs if t == b"d")


class TestCopyOut:
    def test_text_format(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                "COPY (SELECT n_nationkey, n_name FROM nation "
                "WHERE n_nationkey < 3 ORDER BY n_nationkey) TO STDOUT"
            )
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        tags = [t for t, _ in msgs]
        assert tags[0] == b"H" and b"c" in tags
        lines = copy_payload(msgs).decode().splitlines()
        assert lines == ["0\tNATION_0", "1\tNATION_1", "2\tNATION_2"]
        completes = [b.rstrip(b"\0").decode() for t, b in msgs if t == b"C"]
        assert completes == ["COPY 3"]

    def test_csv_with_header(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                "COPY (SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey) "
                "TO STDOUT WITH (FORMAT CSV, HEADER)"
            )
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        lines = copy_payload(msgs).decode().splitlines()
        assert lines[0] == "r_regionkey,r_name"
        assert len(lines) == 6

    def test_null_rendering(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            text = await c.simple(
                "COPY (SELECT CAST(NULL AS INT) AS a, 1 AS b) TO STDOUT"
            )
            csv = await c.simple(
                "COPY (SELECT CAST(NULL AS INT) AS a, 1 AS b) TO STDOUT WITH (FORMAT CSV)"
            )
            await c.close()
            return text, csv

        text, csv = loop.run_until_complete(go())
        assert copy_payload(text).decode() == "\\N\t1\n"
        assert copy_payload(csv).decode() == ",1\n"

    def test_copy_in_roundtrip(self, server, spark, tmp_path):
        """COPY FROM STDIN ingests rows into a real table; read back
        over the same connection."""
        import struct as _s

        srv, loop = server
        spark.sql("DROP TABLE IF EXISTS copy_target")
        spark.sql(
            f"""CREATE TABLE copy_target (k INT, name STRING, price DOUBLE)
                USING parquet LOCATION '{tmp_path}/copy_target'"""
        )

        def _m(tag, body=b""):
            return tag + _s.pack("!i", len(body) + 4) + body

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(_q("COPY copy_target FROM STDIN WITH (FORMAT CSV)"))
            # server answers CopyInResponse 'G'
            hdr = await c.reader.readexactly(5)
            (ln,) = _s.unpack("!i", hdr[1:])
            await c.reader.readexactly(ln - 4)
            assert hdr[:1] == b"G"
            await c.send(
                _m(b"d", b"1,alpha,1.5\n2,beta,2.5\n"),
                _m(b"d", b"3,,\n"),  # empty CSV fields → NULL
                _m(b"c"),
            )
            msgs = await c.until_ready()
            rows = await c.simple(
                "SELECT k, name, price FROM copy_target ORDER BY k"
            )
            await c.close()
            return msgs, rows

        msgs, rows = loop.run_until_complete(go())
        assert completes_of(msgs) == ["COPY 3"]
        got = rows_of(rows)
        assert got == [
            [b"1", b"alpha", b"1.5"],
            [b"2", b"beta", b"2.5"],
            [b"3", None, None],
        ]
        spark.sql("DROP TABLE copy_target")

    def test_copy_in_text_format(self, server, spark, tmp_path):
        import struct as _s

        srv, loop = server
        spark.sql("DROP TABLE IF EXISTS copy_target2")
        spark.sql(
            f"""CREATE TABLE copy_target2 (k INT, v STRING)
                USING parquet LOCATION '{tmp_path}/copy_target2'"""
        )

        def _m(tag, body=b""):
            return tag + _s.pack("!i", len(body) + 4) + body

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(_q("COPY copy_target2 FROM STDIN"))
            hdr = await c.reader.readexactly(5)
            (ln,) = _s.unpack("!i", hdr[1:])
            await c.reader.readexactly(ln - 4)
            await c.send(_m(b"d", b"1\tab\\tcd\n2\t\\N\n"), _m(b"c"))
            msgs = await c.until_ready()
            rows = await c.simple("SELECT k, v FROM copy_target2 ORDER BY k")
            await c.close()
            return msgs, rows

        msgs, rows = loop.run_until_complete(go())
        assert completes_of(msgs) == ["COPY 2"]
        assert rows_of(rows) == [[b"1", b"ab\tcd"], [b"2", None]]
        spark.sql("DROP TABLE copy_target2")

    def test_escaping(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                "COPY (SELECT 'a\tb' AS t, 'x,\"y\"' AS c) TO STDOUT WITH (FORMAT CSV)"
            )
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        assert copy_payload(msgs).decode() == 'a\tb,"x,""y"""\n'


class TestCopyBinary:
    def test_classify_binary(self):
        st = classify_statement("COPY (SELECT 1) TO STDOUT WITH (FORMAT BINARY)")
        assert st.cls is StatementClass.COPY_OUT and st.copy_format == "binary"
        st = classify_statement("COPY t FROM STDIN WITH (FORMAT BINARY)")
        assert st.cls is StatementClass.COPY_IN and st.copy_format == "binary"

    def test_copy_out_binary_framing(self, server):
        """PGCOPY v1: signature header, per-row int16 nfields +
        int32-prefixed cells, int16 -1 trailer; int4 cells big-endian."""
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _q(
                    "COPY (SELECT n_nationkey FROM nation "
                    "WHERE n_nationkey < 2 ORDER BY n_nationkey) "
                    "TO STDOUT WITH (FORMAT BINARY)"
                )
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        assert msgs[0][0] == b"H"
        assert msgs[0][1][0:1] == b"\x01"  # overall format = binary
        payload = b"".join(b for t, b in msgs if t == b"d")
        sig = b"PGCOPY\n\xff\r\n\x00"
        assert payload.startswith(sig + struct.pack("!ii", 0, 0))
        body = payload[len(sig) + 8 :]
        # n_nationkey is int32 → two rows of one 4-byte cell
        row = struct.pack("!hi", 1, 4)
        assert body == (
            row + struct.pack("!i", 0) + row + struct.pack("!i", 1)
            + struct.pack("!h", -1)
        )
        assert completes_of(msgs) == ["COPY 2"]

    def test_copy_binary_roundtrip(self, server, spark, tmp_path):
        """COPY TO BINARY output re-ingests bit-exact through COPY FROM
        BINARY — covering int/string/double/timestamp/null cells."""
        import struct as _s

        srv, loop = server
        spark.sql("DROP TABLE IF EXISTS copy_bin_t")
        spark.sql(
            f"""CREATE TABLE copy_bin_t (k INT, name STRING, price DOUBLE,
                ts TIMESTAMP_NTZ)
                USING parquet LOCATION '{tmp_path}/copy_bin_t'"""
        )

        def _m(tag, body=b""):
            return tag + _s.pack("!i", len(body) + 4) + body

        async def go():
            c = await PgClient.connect(srv.port)
            # export a shaped result in binary
            await c.send(
                _q(
                    "COPY (SELECT CAST(1 AS INT) k, 'héllo' name, "
                    "CAST(2.5 AS DOUBLE) price, "
                    "TIMESTAMP_NTZ '2024-03-01 12:34:56.789' ts "
                    "UNION ALL SELECT 2, NULL, NULL, NULL "
                    "ORDER BY k) TO STDOUT WITH (FORMAT BINARY)"
                )
            )
            out_msgs = await c.until_ready()
            payload = b"".join(b for t, b in out_msgs if t == b"d")
            # feed the identical bytes back in
            await c.send(_q("COPY copy_bin_t FROM STDIN WITH (FORMAT BINARY)"))
            hdr = await c.reader.readexactly(5)
            (ln,) = _s.unpack("!i", hdr[1:])
            await c.reader.readexactly(ln - 4)
            assert hdr[:1] == b"G"
            await c.send(_m(b"d", payload), _m(b"c"))
            in_msgs = await c.until_ready()
            rows = await c.simple(
                "SELECT k, name, price, ts FROM copy_bin_t ORDER BY k"
            )
            await c.close()
            return in_msgs, rows

        in_msgs, rows = loop.run_until_complete(go())
        assert completes_of(in_msgs) == ["COPY 2"]
        assert rows_of(rows) == [
            [b"1", "héllo".encode(), b"2.5", b"2024-03-01 12:34:56.789"],
            [b"2", None, None, None],
        ]
        spark.sql("DROP TABLE copy_bin_t")


class TestCopyInParsing:
    """Unit tests for the COPY FROM STDIN payload decoders."""

    def test_unescape_single_pass(self):
        from spark_sql_server_spark.protocol.server import _copy_unescape

        # '\\t' (escaped backslash + literal t) must decode to '\' + 't',
        # not backslash+TAB — the chained-replace bug
        assert _copy_unescape("\\\\t") == "\\t"
        assert _copy_unescape("\\t") == "\t"
        assert _copy_unescape("a\\nb") == "a\nb"
        assert _copy_unescape("\\\\n") == "\\n"
        assert _copy_unescape("\\\\\\\\") == "\\\\"
        assert _copy_unescape("plain") == "plain"
        assert _copy_unescape("\\b\\f\\v\\r") == "\b\f\v\r"

    def test_csv_quoted_empty_vs_null(self):
        from spark_sql_server_spark.protocol.server import _csv_copy_rows

        # unquoted empty field → NULL; quoted empty string → ''
        assert _csv_copy_rows('1,,""\n') == [["1", None, ""]]
        assert _csv_copy_rows('a,"b,c",d\n') == [["a", "b,c", "d"]]
        assert _csv_copy_rows('"he said ""hi""",2\n') == [['he said "hi"', "2"]]
        assert _csv_copy_rows('"multi\nline",x\n') == [["multi\nline", "x"]]
        assert _csv_copy_rows("1,2\r\n3,4\r\n") == [["1", "2"], ["3", "4"]]
        assert _csv_copy_rows("") == []
        assert _csv_copy_rows("\n") == []
        assert _csv_copy_rows("a,b") == [["a", "b"]]  # no trailing newline


class TestCopyOptions:
    """DELIMITER / NULL options (modern and legacy spellings)."""

    def test_classify_options(self):
        st = classify_statement(
            "COPY (SELECT 1) TO STDOUT WITH (FORMAT CSV, DELIMITER ';', "
            "NULL 'NA')"
        )
        assert st.copy_delim == ";" and st.copy_null == "NA"
        st = classify_statement("COPY t FROM STDIN WITH DELIMITER AS '|'")
        assert st.copy_delim == "|" and st.copy_format == "text"

    def test_out_custom_delimiter_and_null(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            csv = await c.simple(
                "COPY (SELECT CAST(NULL AS INT) AS a, n_nationkey AS b, "
                "n_name AS c FROM nation WHERE n_nationkey < 2 "
                "ORDER BY n_nationkey) TO STDOUT "
                "WITH (FORMAT CSV, DELIMITER ';', NULL 'NA', HEADER)"
            )
            txt = await c.simple(
                "COPY (SELECT CAST(NULL AS INT) AS a, 'x|y' AS s) TO STDOUT "
                "WITH DELIMITER AS '|'"
            )
            await c.close()
            return csv, txt

        csv, txt = loop.run_until_complete(go())
        lines = copy_payload(csv).decode().splitlines()
        assert lines[0] == "a;b;c"
        assert lines[1] == "NA;0;NATION_0"
        assert lines[2] == "NA;1;NATION_1"
        # text format: custom delimiter escaped inside data
        assert copy_payload(txt).decode() == "\\N|x\\|y\n"

    def test_in_custom_delimiter_roundtrip(self, server, spark, tmp_path):
        import struct as _s

        srv, loop = server
        spark.sql("DROP TABLE IF EXISTS copy_opt_t")
        spark.sql(
            f"""CREATE TABLE copy_opt_t (k INT, name STRING)
                USING parquet LOCATION '{tmp_path}/copy_opt_t'"""
        )

        def _m(tag, body=b""):
            return tag + _s.pack("!i", len(body) + 4) + body

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _q("COPY copy_opt_t FROM STDIN WITH (DELIMITER ';', NULL 'NA')")
            )
            hdr = await c.reader.readexactly(5)
            (ln,) = _s.unpack("!i", hdr[1:])
            await c.reader.readexactly(ln - 4)
            assert hdr[:1] == b"G"
            await c.send(_m(b"d", b"1;alpha\n2;NA\n"), _m(b"c"))
            msgs = await c.until_ready()
            rows = await c.simple(
                "SELECT k, name FROM copy_opt_t ORDER BY k"
            )
            await c.close()
            return msgs, rows

        try:
            msgs, rows = loop.run_until_complete(go())
            completes = [b.rstrip(b"\0").decode() for t, b in msgs if t == b"C"]
            assert completes == ["COPY 2"]
            assert rows_of(rows) == [[b"1", b"alpha"], [b"2", None]]
        finally:
            # shared-session catalog: a leftover table fails the parity
            # suite's hygiene gate for every downstream test
            spark.sql("DROP TABLE IF EXISTS copy_opt_t")


class TestCopyDelimiterValidation:
    """PG rejects multi-character COPY delimiters up front (0A000)
    instead of silently producing one-column garbled rows."""

    def test_multichar_delimiter_classify_raises(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="single one-byte"):
            classify_statement(
                "COPY (SELECT 1) TO STDOUT WITH (DELIMITER 'ab')"
            )

    def test_multichar_delimiter_over_wire(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            m = await c.simple(
                "COPY (SELECT 1 AS a) TO STDOUT WITH (DELIMITER 'ab')"
            )
            await c.close()
            return m

        m = loop.run_until_complete(go())
        err = next(b for t, b in m if t == b"E")
        assert b"C0A000\x00" in err and b"single one-byte" in err

    def test_single_char_still_fine(self):
        st = classify_statement(
            "COPY (SELECT 1) TO STDOUT WITH (DELIMITER ';')"
        )
        assert st.copy_delim == ";"


class TestCopyInChunked:
    """Chunked COPY FROM STDIN: payloads larger than
    ``copy_in_batch_bytes`` spill complete-row batches to a parquet
    staging dir, so driver buffering is bounded by the batch size —
    never by the payload (the 100-TB bulk-load contract)."""

    BATCH = 4096  # tiny bound so a ~100 KiB payload spills many times

    @pytest.fixture(scope="class")
    def small_server(self, spark):
        loop = asyncio.new_event_loop()

        async def _run():
            srv = SparkPGServer(
                spark,
                port=0,
                init_session=lambda s: register_tables(s, SF_SMOKE),
                copy_in_batch_bytes=self.BATCH,
            )
            await srv.start()
            return srv

        srv = loop.run_until_complete(_run())
        yield srv, loop
        loop.run_until_complete(srv.stop())
        loop.close()

    @staticmethod
    def _m(tag, body=b""):
        return tag + struct.pack("!i", len(body) + 4) + body

    async def _start_copy_in(self, c, sql):
        await c.send(_q(sql))
        hdr = await c.reader.readexactly(5)
        (ln,) = struct.unpack("!i", hdr[1:])
        await c.reader.readexactly(ln - 4)
        assert hdr[:1] == b"G"

    def _drive(self, srv, loop, copy_sql, payload: bytes, msg_bytes=1000,
               readback=None):
        async def go():
            c = await PgClient.connect(srv.port)
            await self._start_copy_in(c, copy_sql)
            # deliberately misaligned chunks: row/quote boundaries land
            # mid-message so every carve path is exercised
            msgs = [
                self._m(b"d", payload[i : i + msg_bytes])
                for i in range(0, len(payload), msg_bytes)
            ]
            await c.send(*msgs, self._m(b"c"))
            done = await c.until_ready()
            rows = await c.simple(readback) if readback else None
            await c.close()
            return done, rows

        return loop.run_until_complete(go())

    def test_csv_large_payload_bounded_buffer(self, small_server, spark,
                                              tmp_path):
        srv, loop = small_server
        spark.sql("DROP TABLE IF EXISTS copy_chunk_csv")
        spark.sql(
            f"""CREATE TABLE copy_chunk_csv (k INT, body STRING, v DOUBLE)
                USING parquet LOCATION '{tmp_path}/copy_chunk_csv'"""
        )
        try:
            n_rows = 3000
            lines = []
            for i in range(n_rows):
                if i % 7 == 0:
                    # quoted field with embedded newline + doubled quote —
                    # must never be split across a spill batch
                    lines.append(f'{i},"multi\nline ""{i}"" text",{i}.5')
                else:
                    lines.append(f"{i},plain_{i},{i}.5")
            payload = ("\n".join(lines) + "\n").encode()
            assert len(payload) > 10 * self.BATCH
            done, rows = self._drive(
                srv, loop,
                "COPY copy_chunk_csv FROM STDIN WITH (FORMAT CSV)",
                payload,
                readback="SELECT COUNT(*) AS n, SUM(k) AS sk, "
                "SUM(CASE WHEN body LIKE '%' || CHR(10) || '%' THEN 1 "
                "ELSE 0 END) AS nl FROM copy_chunk_csv",
            )
            assert completes_of(done) == [f"COPY {n_rows}"]
            exp_sum = n_rows * (n_rows - 1) // 2
            exp_nl = sum(1 for i in range(n_rows) if i % 7 == 0)
            assert rows_of(rows) == [
                [str(n_rows).encode(), str(exp_sum).encode(),
                 str(exp_nl).encode()]
            ]
            # bounded driver buffer: batch bound + in-flight message slack
            assert srv.last_copy_in_peak_buffer <= self.BATCH + 2 * 1000
            # a quoted-newline row survives intact across chunk edges
            got = loop.run_until_complete(
                self._read_one(srv, loop,
                               "SELECT body FROM copy_chunk_csv "
                               "WHERE k = 7")
            )
            assert got == 'multi\nline "7" text'
        finally:
            spark.sql("DROP TABLE IF EXISTS copy_chunk_csv")

    async def _read_one(self, srv, loop, sql):
        c = await PgClient.connect(srv.port)
        rows = await c.simple(sql)
        await c.close()
        return rows_of(rows)[0][0].decode()

    def test_text_format_chunked(self, small_server, spark, tmp_path):
        srv, loop = small_server
        spark.sql("DROP TABLE IF EXISTS copy_chunk_txt")
        spark.sql(
            f"""CREATE TABLE copy_chunk_txt (k INT, body STRING)
                USING parquet LOCATION '{tmp_path}/copy_chunk_txt'"""
        )
        try:
            n_rows = 2000
            # text format escapes in-value newlines/tabs — raw \n is
            # always a row boundary, so carving is exact
            payload = "".join(
                f"{i}\tv\\t{i}\\nx\n" for i in range(n_rows)
            ).encode()
            assert len(payload) > 5 * self.BATCH
            done, rows = self._drive(
                srv, loop,
                "COPY copy_chunk_txt FROM STDIN",
                payload, msg_bytes=777,
                readback="SELECT COUNT(*) AS n, SUM(k) AS sk "
                "FROM copy_chunk_txt WHERE body = 'v' || CHR(9) || "
                "CAST(k AS STRING) || CHR(10) || 'x'",
            )
            assert completes_of(done) == [f"COPY {n_rows}"]
            assert rows_of(rows) == [
                [str(n_rows).encode(),
                 str(n_rows * (n_rows - 1) // 2).encode()]
            ]
            assert srv.last_copy_in_peak_buffer <= self.BATCH + 2 * 777
        finally:
            spark.sql("DROP TABLE IF EXISTS copy_chunk_txt")

    def test_csv_header_dropped_once(self, small_server, spark, tmp_path):
        srv, loop = small_server
        spark.sql("DROP TABLE IF EXISTS copy_chunk_hdr")
        spark.sql(
            f"""CREATE TABLE copy_chunk_hdr (k INT, name STRING)
                USING parquet LOCATION '{tmp_path}/copy_chunk_hdr'"""
        )
        try:
            n_rows = 1500
            payload = (
                "k,name\n"
                + "".join(f"{i},name_{i}\n" for i in range(n_rows))
            ).encode()
            assert len(payload) > 3 * self.BATCH
            done, rows = self._drive(
                srv, loop,
                "COPY copy_chunk_hdr FROM STDIN WITH (FORMAT CSV, HEADER)",
                payload,
                readback="SELECT COUNT(*) AS n FROM copy_chunk_hdr",
            )
            assert completes_of(done) == [f"COPY {n_rows}"]
            assert rows_of(rows) == [[str(n_rows).encode()]]
        finally:
            spark.sql("DROP TABLE IF EXISTS copy_chunk_hdr")

    def test_binary_chunked(self, small_server, spark, tmp_path):
        srv, loop = small_server
        spark.sql("DROP TABLE IF EXISTS copy_chunk_bin")
        spark.sql(
            f"""CREATE TABLE copy_chunk_bin (k INT, name STRING)
                USING parquet LOCATION '{tmp_path}/copy_chunk_bin'"""
        )
        try:
            n_rows = 2000
            body = bytearray(b"PGCOPY\n\xff\r\n\x00" + struct.pack("!ii", 0, 0))
            for i in range(n_rows):
                name = f"bin_name_{i}".encode()
                body += struct.pack("!h", 2)
                body += struct.pack("!i", 4) + struct.pack("!i", i)
                body += struct.pack("!i", len(name)) + name
            body += struct.pack("!h", -1)
            payload = bytes(body)
            assert len(payload) > 5 * self.BATCH
            done, rows = self._drive(
                srv, loop,
                "COPY copy_chunk_bin FROM STDIN WITH (FORMAT BINARY)",
                payload, msg_bytes=513,
                readback="SELECT COUNT(*) AS n, SUM(k) AS sk "
                "FROM copy_chunk_bin WHERE name = 'bin_name_' || "
                "CAST(k AS STRING)",
            )
            assert completes_of(done) == [f"COPY {n_rows}"]
            assert rows_of(rows) == [
                [str(n_rows).encode(),
                 str(n_rows * (n_rows - 1) // 2).encode()]
            ]
        finally:
            spark.sql("DROP TABLE IF EXISTS copy_chunk_bin")

    def test_binary_data_after_eof_rejected(self, small_server, spark,
                                            tmp_path):
        # r7 ADVICE: bytes after the -1 end-of-data trailer must be
        # rejected (PG: "received copy data after EOF marker"), not
        # parsed as tuples and inserted as junk rows
        srv, loop = small_server
        spark.sql("DROP TABLE IF EXISTS copy_bin_eof")
        spark.sql(
            f"""CREATE TABLE copy_bin_eof (k INT, name STRING)
                USING parquet LOCATION '{tmp_path}/copy_bin_eof'"""
        )
        try:
            body = bytearray(
                b"PGCOPY\n\xff\r\n\x00" + struct.pack("!ii", 0, 0)
            )
            for i in range(3):
                name = f"n_{i}".encode()
                body += struct.pack("!h", 2)
                body += struct.pack("!i", 4) + struct.pack("!i", i)
                body += struct.pack("!i", len(name)) + name
            body += struct.pack("!h", -1)
            # junk "tuple" after the trailer — a well-formed 2-field row
            junk = struct.pack("!h", 2)
            junk += struct.pack("!i", 4) + struct.pack("!i", 99)
            junk += struct.pack("!i", 4) + b"junk"
            payload = bytes(body) + junk

            async def go():
                c = await PgClient.connect(srv.port)
                await self._start_copy_in(
                    c, "COPY copy_bin_eof FROM STDIN WITH (FORMAT BINARY)"
                )
                await c.send(self._m(b"d", payload), self._m(b"c"))
                msgs = await c.until_ready()
                rows = await c.simple(
                    "SELECT COUNT(*) AS n FROM copy_bin_eof"
                )
                await c.close()
                return msgs, rows

            msgs, rows = loop.run_until_complete(go())
            assert any(t == b"E" for t, _ in msgs)
            assert rows_of(rows) == [[b"0"]]
        finally:
            spark.sql("DROP TABLE IF EXISTS copy_bin_eof")

    def test_copyfail_cleans_staging(self, small_server, spark, tmp_path):
        import glob
        import os
        import tempfile

        srv, loop = small_server
        spark.sql("DROP TABLE IF EXISTS copy_chunk_fail")
        spark.sql(
            f"""CREATE TABLE copy_chunk_fail (k INT, name STRING)
                USING parquet LOCATION '{tmp_path}/copy_chunk_fail'"""
        )
        try:
            payload = "".join(
                f"{i},name_{i}\n" for i in range(3000)
            ).encode()

            async def go():
                c = await PgClient.connect(srv.port)
                await self._start_copy_in(
                    c, "COPY copy_chunk_fail FROM STDIN WITH (FORMAT CSV)"
                )
                # enough data to force at least one spill, then abort
                await c.send(
                    self._m(b"d", payload[: 6 * self.BATCH]),
                    self._m(b"f", b"client abort\x00"),
                )
                msgs = await c.until_ready()
                rows = await c.simple(
                    "SELECT COUNT(*) AS n FROM copy_chunk_fail"
                )
                await c.close()
                return msgs, rows

            msgs, rows = loop.run_until_complete(go())
            assert any(t == b"E" for t, _ in msgs)  # CopyFail surfaces
            assert rows_of(rows) == [[b"0"]]  # nothing inserted
            leftovers = glob.glob(
                os.path.join(tempfile.gettempdir(), "pgcopy_in_*")
            )
            assert leftovers == []  # staging dir removed
        finally:
            spark.sql("DROP TABLE IF EXISTS copy_chunk_fail")
