"""Property-based tests (hypothesis) for the dialect layer.

The rewriter sits in front of every query the server executes, so its
failure mode is silent corruption — properties pin down: string/comment
opacity, idempotence on already-Spark SQL, and splitter round-tripping.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_sql_server_spark.dialect.commands import split_statements
from spark_sql_server_spark.dialect.rewriter import rewrite_sql

# identifiers and plain words that contain no PG-specific constructs
ident = st.from_regex(r"[a-zA-Z_][a-zA-Z_0-9]{0,10}", fullmatch=True)
literal_text = st.text(
    alphabet=st.characters(blacklist_characters="'\";$~:\\-/"),
    max_size=20,
)


class TestRewriterProperties:
    @given(s=literal_text)
    @settings(max_examples=200)
    def test_string_literals_opaque(self, s):
        """Whatever is inside a string literal must pass through
        byte-identical — including things that look like casts/regex."""
        for payload in (f"{s}::int4", f"{s} ~ 'x'", f"$1 {s}"):
            sql = "SELECT '" + payload.replace("'", "''") + "'"
            assert rewrite_sql(sql) == sql

    @given(w=ident)
    @settings(max_examples=100)
    def test_plain_select_unchanged(self, w):
        sql = f"SELECT {w} FROM {w} WHERE {w} = {w}"
        assert rewrite_sql(sql) == sql

    @given(w=ident)
    @settings(max_examples=100)
    def test_idempotent(self, w):
        sql = f"SELECT {w}::int4, substring({w} from 1 for 2) FROM t WHERE {w} ~ 'x'"
        once = rewrite_sql(sql)
        assert rewrite_sql(once) == once

    @given(n=st.integers(min_value=1, max_value=99))
    @settings(max_examples=50)
    def test_params_numbered(self, n):
        assert rewrite_sql(f"SELECT ${n}") == f"SELECT :p{n}"

    @given(w=ident)
    @settings(max_examples=100)
    def test_comments_opaque(self, w):
        sql = f"SELECT {w} -- {w}::int4 ~ $1\nFROM t"
        assert rewrite_sql(sql) == sql

    @given(body=st.text(alphabet="ab c,()*'x1;\n", max_size=40))
    @settings(max_examples=300)
    def test_rewrite_never_crashes(self, body):
        rewrite_sql("SELECT " + body.replace("'", "''"))


class TestSplitterProperties:
    @given(parts=st.lists(ident, min_size=1, max_size=5))
    @settings(max_examples=100)
    def test_split_joins_back(self, parts):
        stmts = [f"SELECT {p}" for p in parts]
        assert split_statements("; ".join(stmts) + ";") == stmts

    @given(s=literal_text)
    @settings(max_examples=200)
    def test_semicolons_in_strings_preserved(self, s):
        payload = (s + ";x").replace("'", "''")
        out = split_statements(f"SELECT '{payload}'")
        assert len(out) == 1
        assert out[0] == f"SELECT '{payload}'"

    @given(n=st.integers(min_value=0, max_value=6))
    @settings(max_examples=50)
    def test_empty_statements_dropped(self, n):
        assert split_statements(";" * n) == []
