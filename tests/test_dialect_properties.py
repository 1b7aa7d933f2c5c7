"""Property-based robustness for the PG→Spark dialect rewriter.

The rewriter is a token-aware string transform on the wire's hottest
path — every statement from every client passes through it. Three
invariants must hold for arbitrary input, not just the curated dialect
corpus:

1. *Idempotence*: rewriting twice equals rewriting once (a rewrite
   output never re-triggers a rule).
2. *Plain-SQL identity*: statements with no PG-isms pass through
   byte-identical.
3. *Literal preservation*: the contents of single-quoted string
   literals survive untouched (rules must never fire inside literals).
"""

from __future__ import annotations

import re

from hypothesis import example, given, settings
from hypothesis import strategies as st

from spark_sql_server_spark.dialect.rewriter import rewrite_sql

#: function names the rewriter transforms in call position — a random
#: identifier landing before '(' must not be one of them, or the
#: plain-SQL-identity property would legitimately fail. 'as'/'using'
#: are excluded too: a column NAMED as/using aborts the DDL-type scan
#: (the pass must stop at the real CTAS/USING keyword), so e.g. 'text'
#: after it would legitimately stay unmapped (r8 ADVICE latent flake).
#: 'date' can fire the r9 date-literal pass when a random string
#: literal follows it; justify_*/date_trunc fire in call position
_REWRITTEN_FNS = {"log", "ltrim", "rtrim", "btrim", "timestamptz",
                  "as", "using", "date", "date_trunc", "justify_hours",
                  "justify_days", "justify_interval", "interval",
                  # r10: unnest(…) → explode(…) fires in call position
                  "unnest"}
_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s.lower() not in _REWRITTEN_FNS
)
# literal contents: anything printable except the quote itself (escaped
# quotes are a separate lexer concern covered by unit tests)
_lit = st.text(
    alphabet=st.characters(
        codec="ascii", categories=("L", "N", "P", "Zs")
    ).filter(lambda c: c != "'"),
    max_size=20,
)

# PG-ism snippets the rewriter is supposed to transform
_pgisms = st.sampled_from(
    [
        "x::text",
        "col ~ 'a.c'",
        "generate_series(1, 5)",
        "E'\\n'",
        "substring(s from 2 for 3)",
        "pg_catalog.pg_stat_activity",
        "ARRAY[1,2]",
        "a ->> 'k'",
        "$1",
        # r8 passes: base-10 log, trim argument order, typed
        # timestamptz literals, NULL array items
        "log(x)",
        "ltrim(s, 'ab')",
        "pg_catalog.btrim(s, 'ab')",
        "timestamptz '2020-01-01 00:00:00'",
        "'{1, NULL}'::int[]",
        "CAST(x AS DOUBLE PRECISION)",
        # r9 passes: coarse EXTRACT/date_trunc fields, PG date-literal
        # spellings, justify family over interval literals
        "EXTRACT(CENTURY FROM d)",
        "EXTRACT(DECADE FROM d)",
        "date_trunc('century', d)",
        "date '1999 Jan 08'",
        "justify_hours(interval '52 hours')",
        "justify_interval(interval '1 month -1 hour')",
    ]
)


@st.composite
def plain_statements(draw):
    """SQL-shaped text with no PG-isms: identifiers, numbers, literals,
    commas, parens, comparison operators."""
    n = draw(st.integers(1, 8))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(_ident))
        elif kind == 1:
            parts.append(str(draw(st.integers(-1000, 1000))))
        elif kind == 2:
            parts.append("'" + draw(_lit) + "'")
        else:
            parts.append(draw(st.sampled_from([",", "(", ")", "=", "<", ">", "+", "-", "*"])))
    return "SELECT " + " ".join(parts)


@st.composite
def mixed_statements(draw):
    base = draw(plain_statements())
    isms = draw(st.lists(_pgisms, max_size=3))
    return base + (" " + " ".join(isms) if isms else "")


class TestRewriterProperties:
    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(mixed_statements())
    @example("SELECT A generate_series(1, 5) generate_series(1, 5)")
    @example("SELECT A generate_series(1, 5) E'\\n'")
    @example("SELECT A generate_series(1, 5) pg_catalog.pg_stat_activity")
    def test_idempotent(self, sql):
        once = rewrite_sql(sql)
        assert rewrite_sql(once) == once

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(plain_statements())
    def test_plain_sql_unchanged(self, sql):
        assert rewrite_sql(sql, params=False) == sql

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(plain_statements())
    def test_string_literals_preserved(self, sql):
        lits_in = re.findall(r"'[^']*'", sql)
        lits_out = re.findall(r"'[^']*'", rewrite_sql(sql, params=False))
        assert lits_in == lits_out

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(
        st.lists(
            st.tuples(
                _ident,
                st.sampled_from(
                    ["int", "text", "int8", "float8", "varchar(12)",
                     "numeric(10,2)", "bigint", "bytea", "char",
                     "text[]", "varchar(10)[]", "numeric(6,2)[]"]
                ),
            ),
            min_size=1,
            max_size=6,
        )
    )
    def test_ddl_types_idempotent_and_spark_parsable(self, cols):
        # the r8 DDL-type pass: every PG column type maps to a
        # Spark-DDL-valid spelling, and the rewrite is idempotent
        # (valid-type check is a static allowlist — this file runs
        # without a SparkSession by design)
        valid = {
            "INT", "BIGINT", "SMALLINT", "TINYINT", "STRING", "DOUBLE",
            "FLOAT", "BOOLEAN", "BINARY", "DATE", "TIMESTAMP", "DECIMAL",
            "VARCHAR", "CHAR",
        }
        body = ", ".join(f"{n} {t}" for n, t in cols)
        sql = f"CREATE TABLE t ({body}) USING parquet"
        once = rewrite_sql(sql, params=False)
        assert rewrite_sql(once, params=False) == once
        inner = once.split("(", 1)[1].rsplit(")", 1)[0]
        for part in _split_cols(inner):
            typ = part.strip().split(None, 1)[1]
            assert "[" not in typ, f"unmapped PG array type: {typ!r}"
            if typ.upper().startswith("ARRAY<"):
                typ = typ[6:].rstrip(">")
            head = typ.split("(", 1)[0].strip().upper()
            assert head in valid, f"unmapped DDL type: {typ!r}"


def _split_cols(s: str) -> list[str]:
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return out
