"""Dialect rewriter unit tests — mirrors the reference's PgDialectSuite
(``service/postgresql/PgDialectSuite.scala:49-120``) plus the command
interception cases."""

from __future__ import annotations

import pytest

from spark_sql_server_spark.dialect.commands import (
    StatementClass,
    classify_statement,
    split_statements,
)
from spark_sql_server_spark.dialect.rewriter import rewrite_sql


class TestCasts:
    def test_simple_cast(self):
        assert rewrite_sql("SELECT 1::text") == "SELECT CAST(1 AS STRING)"

    def test_int_casts(self):
        assert rewrite_sql("SELECT a::int4 FROM t") == "SELECT CAST(a AS INT) FROM t"
        assert rewrite_sql("SELECT a::int8") == "SELECT CAST(a AS BIGINT)"
        assert rewrite_sql("SELECT a::float8") == "SELECT CAST(a AS DOUBLE)"

    def test_chained_cast(self):
        assert (
            rewrite_sql("SELECT a::int4::text")
            == "SELECT CAST(CAST(a AS INT) AS STRING)"
        )

    def test_cast_of_parenthesized(self):
        assert (
            rewrite_sql("SELECT (a + b)::int8 FROM t")
            == "SELECT CAST((a + b) AS BIGINT) FROM t"
        )

    def test_cast_of_function_call(self):
        assert (
            rewrite_sql("SELECT substr(x, 1, 2)::int4 FROM t")
            == "SELECT CAST(substr(x, 1, 2) AS INT) FROM t"
        )

    def test_cast_dotted_column(self):
        assert (
            rewrite_sql("SELECT t.a::text FROM t")
            == "SELECT CAST(t.a AS STRING) FROM t"
        )

    def test_cast_with_precision(self):
        assert (
            rewrite_sql("SELECT a::numeric(10,2)")
            == "SELECT CAST(a AS DECIMAL(10,2))"
        )
        assert rewrite_sql("SELECT a::varchar(24)") == "SELECT CAST(a AS STRING)"

    def test_regclass_identity(self):
        # ::regclass / ::regtype / ::regproc are identity-ish lookups
        # (reference PgParser.scala:163-186); r10: a STRING literal
        # ::regclass resolves to the relation's oid (psql \dx compares
        # it against pg_description.classoid, an INT column)
        assert rewrite_sql("SELECT 'pg_type'::regclass") == "SELECT 1247"
        assert (
            rewrite_sql("SELECT 'pg_catalog.pg_extension'::regclass")
            == "SELECT 3079"
        )
        # non-literal operands stay identity passthrough
        assert rewrite_sql("SELECT c.oid::regclass") == "SELECT c.oid"

    def test_cast_not_in_string(self):
        assert rewrite_sql("SELECT 'a::b'") == "SELECT 'a::b'"

    def test_standard_cast_untouched(self):
        sql = "SELECT CAST(a AS INT) FROM t"
        assert rewrite_sql(sql) == sql

    def test_array_type_casts(self):
        # PG array-type syntax (r5 ADVICE: previously the subscript
        # rewrite turned the empty [] into try_element_at(expr, ))
        assert rewrite_sql("SELECT '{1,2}'::int[]") == "SELECT array(1, 2)"
        assert rewrite_sql("SELECT '{}'::int[]") == "SELECT array()"
        assert (
            rewrite_sql("SELECT x::text[] FROM t")
            == "SELECT CAST(x AS ARRAY<STRING>) FROM t"
        )
        assert (
            rewrite_sql("SELECT CAST(x AS int8[]) FROM t")
            == "SELECT CAST(x AS ARRAY<BIGINT>) FROM t"
        )
        assert (
            rewrite_sql("SELECT CAST(x AS text[][]) FROM t")
            == "SELECT CAST(x AS ARRAY<ARRAY<STRING>>) FROM t"
        )

    def test_trim_set_argument_order(self):
        # PG two-arg trim family is (string, characters); Spark's is
        # the reverse, so the rewriter emits the unambiguous TRIM
        # syntax instead of passing the call through
        assert (
            rewrite_sql("SELECT ltrim('zzzytrim', 'xyz')")
            == "SELECT TRIM(LEADING 'xyz' FROM 'zzzytrim')"
        )
        assert (
            rewrite_sql("SELECT rtrim(a, b) FROM t")
            == "SELECT TRIM(TRAILING b FROM a) FROM t"
        )
        assert (
            rewrite_sql("SELECT btrim(a, b) FROM t")
            == "SELECT TRIM(BOTH b FROM a) FROM t"
        )
        # one-arg btrim maps to trim; one-arg ltrim/rtrim untouched
        assert rewrite_sql("SELECT btrim(a) FROM t") == "SELECT trim(a) FROM t"
        assert rewrite_sql("SELECT ltrim(a) FROM t") == "SELECT ltrim(a) FROM t"
        # nested calls in either argument survive
        assert (
            rewrite_sql("SELECT ltrim(upper(c1), chr(32)) FROM t")
            == "SELECT TRIM(LEADING chr(32) FROM upper(c1)) FROM t"
        )
        # r7 ADVICE (medium): the qualified spelling must get the same
        # argument-order fix — the trim pass now runs AFTER the
        # pg_catalog. strip, so this no longer reaches Spark's
        # reversed two-arg ltrim
        assert (
            rewrite_sql("SELECT pg_catalog.ltrim('xxabc', 'x')")
            == "SELECT TRIM(LEADING 'x' FROM 'xxabc')"
        )
        assert (
            rewrite_sql("SELECT pg_catalog.btrim(a, b) FROM t")
            == "SELECT TRIM(BOTH b FROM a) FROM t"
        )
        # a genuine user-schema qualification stays untouched
        assert (
            rewrite_sql("SELECT myschema.ltrim(a, b) FROM t")
            == "SELECT myschema.ltrim(a, b) FROM t"
        )

    def test_ddl_column_types(self):
        # PG type spellings in CREATE TABLE column lists (found
        # replaying postgreSQL/insert.sql: `text` is
        # UNSUPPORTED_DATATYPE in Spark DDL)
        assert (
            rewrite_sql("CREATE TABLE t (col1 int, col3 text) USING parquet")
            == "CREATE TABLE t (col1 int, col3 STRING) USING parquet"
        )
        assert (
            rewrite_sql(
                "CREATE TABLE t (a int8, b float8, c numeric(10,2), "
                "d varchar(20), e varchar, f bytea, g serial)"
            )
            == "CREATE TABLE t (a BIGINT, b DOUBLE, c DECIMAL(10,2), "
            "d varchar(20), e STRING, f BINARY, g INT)"
        )
        assert (
            rewrite_sql("CREATE TABLE t (tags text[], k int2)")
            == "CREATE TABLE t (tags ARRAY<STRING>, k SMALLINT)"
        )
        # multi-word spellings fold first, then map as DDL types
        assert (
            rewrite_sql("CREATE TABLE t (x double precision, y "
                        "timestamp with time zone)")
            == "CREATE TABLE t (x DOUBLE, y TIMESTAMP)"
        )
        # CTAS has no column list — the SELECT body is untouched
        assert (
            rewrite_sql(
                "CREATE TABLE t USING parquet AS SELECT 'x' AS text"
            )
            == "CREATE TABLE t USING parquet AS SELECT 'x' AS text"
        )
        # non-DDL statements never touched ('text' as identifier)
        assert (
            rewrite_sql("SELECT text FROM t WHERE text = 'a'")
            == "SELECT text FROM t WHERE text = 'a'"
        )

    def test_single_arg_log_is_base10(self):
        # PG log(x) is base-10; Spark's single-arg log(x) is the
        # NATURAL log (silent wrong results — found porting
        # postgreSQL/numeric.sql)
        assert (
            rewrite_sql("SELECT log(100) AS l")
            == "SELECT log10(100) AS l"
        )
        assert (
            rewrite_sql("SELECT pg_catalog.log(nullif(x, 0)) FROM t")
            == "SELECT log10(nullif(x, 0)) FROM t"
        )
        # the two-arg base form agrees between dialects — untouched
        assert (
            rewrite_sql("SELECT log(2, 64) AS l")
            == "SELECT log(2, 64) AS l"
        )
        # user-schema qualification and non-call uses stay untouched
        assert (
            rewrite_sql("SELECT myschema.log(x) FROM t")
            == "SELECT myschema.log(x) FROM t"
        )
        assert rewrite_sql("SELECT log FROM t") == "SELECT log FROM t"

    def test_multiword_type_names(self):
        # PG's canonical multi-word spellings (found via a real-psql
        # drive: CAST(x AS DOUBLE PRECISION) hit Spark's parser raw)
        assert (
            rewrite_sql("SELECT CAST(x AS DOUBLE PRECISION) FROM t")
            == "SELECT CAST(x AS DOUBLE) FROM t"
        )
        assert (
            rewrite_sql("SELECT x::double precision FROM t")
            == "SELECT CAST(x AS DOUBLE) FROM t"
        )
        assert (
            rewrite_sql("SELECT CAST(x AS character varying(24)) FROM t")
            == "SELECT CAST(x AS STRING) FROM t"
        )
        assert (
            rewrite_sql("SELECT CAST(a AS double precision[]) FROM t")
            == "SELECT CAST(a AS ARRAY<DOUBLE>) FROM t"
        )
        assert (
            rewrite_sql("SELECT CAST(ts AS timestamp with time zone) FROM t")
            == "SELECT CAST(ts AS TIMESTAMP) FROM t"
        )
        # typed literals and ordinary identifiers must survive
        assert (
            rewrite_sql("SELECT timestamp '2020-01-01 00:00:00'")
            == "SELECT timestamp '2020-01-01 00:00:00'"
        )
        # r7 ADVICE: a PG typed literal TIMESTAMP WITH TIME ZONE '...'
        # (and the bare timestamptz spelling) must become Spark's
        # TIMESTAMP literal (LTZ — matching PG timestamptz semantics),
        # not an unparseable timestamptz keyword
        assert (
            rewrite_sql(
                "SELECT TIMESTAMP WITH TIME ZONE '2020-01-01 00:00:00+00'"
            )
            == "SELECT TIMESTAMP '2020-01-01 00:00:00+00'"
        )
        assert (
            rewrite_sql("SELECT timestamptz '2020-01-01 00:00:00+00'")
            == "SELECT TIMESTAMP '2020-01-01 00:00:00+00'"
        )
        # cast positions keep the PG_TYPE_MAP path
        assert (
            rewrite_sql("SELECT x::timestamptz FROM t")
            == "SELECT CAST(x AS TIMESTAMP) FROM t"
        )
        assert (
            rewrite_sql("SELECT double_col, characters FROM t")
            == "SELECT double_col, characters FROM t"
        )

    def test_array_literal_declared_type(self):
        # r6 ADVICE: element rendering must honor the DECLARED type —
        # '{1,2}'::text[] yields STRING elements, float8[] DOUBLEs
        assert (
            rewrite_sql("SELECT '{1,2}'::text[]")
            == "SELECT array('1', '2')"
        )
        assert (
            rewrite_sql("SELECT '{a, b}'::text[]")
            == "SELECT array('a', 'b')"
        )
        assert (
            rewrite_sql("SELECT '{}'::text[]")
            == "SELECT CAST(array() AS ARRAY<STRING>)"
        )
        assert (
            rewrite_sql("SELECT '{1.5,2}'::float8[]")
            == "SELECT CAST(array(1.5, 2) AS ARRAY<DOUBLE>)"
        )
        assert (
            rewrite_sql("SELECT '{1,2}'::bigint[]")
            == "SELECT CAST(array(1, 2) AS ARRAY<BIGINT>)"
        )
        # unknown element type falls through to a plain CAST (clean
        # ANSI error, like PG on an unparseable literal)
        assert (
            rewrite_sql("SELECT '{1,2}'::bool[]")
            == "SELECT CAST('{1,2}' AS ARRAY<BOOLEAN>)"
        )
        # r7 ADVICE: a bare unquoted NULL item is a NULL element in PG,
        # not the string 'NULL' — and numeric literals containing NULL
        # must not fall through to an ANSI-error CAST
        assert (
            rewrite_sql("SELECT '{NULL}'::text[]")
            == "SELECT CAST(array(NULL) AS ARRAY<STRING>)"
        )
        assert (
            rewrite_sql("SELECT '{a, null, b}'::text[]")
            == "SELECT array('a', NULL, 'b')"
        )
        assert (
            rewrite_sql("SELECT '{1, NULL, 3}'::int[]")
            == "SELECT array(1, NULL, 3)"
        )
        assert (
            rewrite_sql("SELECT '{NULL,2.5}'::float8[]")
            == "SELECT CAST(array(NULL, 2.5) AS ARRAY<DOUBLE>)"
        )
        assert (
            rewrite_sql("SELECT '{NULL}'::int[]")
            == "SELECT CAST(array(NULL) AS ARRAY<INT>)"
        )

    def test_parenthesized_array_type_casts(self):
        # r6 ADVICE: bracket consumption must survive precision args
        assert (
            rewrite_sql("SELECT CAST(x AS numeric(10,2)[]) FROM t")
            == "SELECT CAST(x AS ARRAY<DECIMAL(10,2)>) FROM t"
        )
        assert (
            rewrite_sql("SELECT x::numeric(10,2)[] FROM t")
            == "SELECT CAST(x AS ARRAY<DECIMAL(10,2)>) FROM t"
        )
        assert (
            rewrite_sql("SELECT CAST(x AS varchar(10)[]) FROM t")
            == "SELECT CAST(x AS ARRAY<STRING>) FROM t"
        )

    def test_subscript_of_cast_array_literal(self):
        assert (
            rewrite_sql("SELECT ('{10,20}'::int[])[2]")
            == "SELECT try_element_at((array(10, 20)), 2)"
        )


class TestTilde:
    def test_tilde_to_rlike(self):
        assert rewrite_sql("SELECT 'abc' ~ 'a.c'") == "SELECT 'abc' RLIKE 'a.c'"

    def test_tilde_column(self):
        assert (
            rewrite_sql("SELECT * FROM t WHERE name ~ '^foo'")
            == "SELECT * FROM t WHERE name RLIKE '^foo'"
        )

    def test_not_tilde(self):
        assert (
            rewrite_sql("SELECT * FROM t WHERE name !~ 'x'")
            == "SELECT * FROM t WHERE name NOT RLIKE 'x'"
        )

    def test_operator_tilde(self):
        assert (
            rewrite_sql("SELECT a OPERATOR(~) 'p' FROM t")
            == "SELECT a RLIKE 'p' FROM t"
        )

    def test_tilde_in_string_untouched(self):
        assert rewrite_sql("SELECT '~'") == "SELECT '~'"

    def test_tilde_star_case_insensitive(self):
        assert (
            rewrite_sql("SELECT 'ABC' ~* 'a.c'") == "SELECT 'ABC' RLIKE '(?i)a.c'"
        )


class TestJsonOps:
    def test_double_arrow(self):
        assert (
            rewrite_sql("SELECT props->>'k' FROM events")
            == "SELECT get_json_object(props, '$.k') FROM events"
        )

    def test_single_arrow(self):
        assert (
            rewrite_sql("SELECT e.props->'k' FROM events e")
            == "SELECT get_json_object(e.props, '$.k') FROM events e"
        )

    def test_numeric_index(self):
        assert (
            rewrite_sql("SELECT arr_col->0 FROM t")
            == "SELECT get_json_object(arr_col, '$[0]') FROM t"
        )

    def test_executes(self, spark):
        row = spark.sql(
            rewrite_sql("""SELECT '{"k": 7}'->>'k' AS v""")
        ).collect()[0]
        assert row.v == "7"

    def test_arrow_in_lambda_untouched(self):
        # HOF lambdas use `->` with a non-literal rhs — must not rewrite
        sql = "SELECT transform(a, x -> x + 1) FROM t"
        assert rewrite_sql(sql) == sql


class TestSubstring:
    def test_from_for(self):
        assert (
            rewrite_sql("SELECT substring('hello' from 2 for 3)")
            == "SELECT substring('hello' , 2 , 3)"
        )

    def test_from_only(self):
        assert (
            rewrite_sql("SELECT substring(x from 2) FROM t")
            == "SELECT substring(x , 2) FROM t"
        )

    def test_comma_form_untouched(self):
        sql = "SELECT substring(x, 1, 2) FROM t"
        assert rewrite_sql(sql) == sql


class TestExtractDow:
    def test_dow_rewrites_to_zero_based(self):
        assert (
            rewrite_sql("SELECT EXTRACT(DOW FROM ts) FROM t")
            == "SELECT (EXTRACT(DAYOFWEEK FROM ts) - 1) FROM t"
        )

    def test_isodow_maps_to_dow_iso(self):
        assert (
            rewrite_sql("SELECT EXTRACT(ISODOW FROM ts) FROM t")
            == "SELECT EXTRACT(DOW_ISO FROM ts) FROM t"
        )

    def test_other_fields_untouched(self):
        sql = "SELECT EXTRACT(YEAR FROM ts) FROM t"
        assert rewrite_sql(sql) == sql

    def test_epoch_maps_to_unix_micros(self):
        out = rewrite_sql("SELECT EXTRACT(EPOCH FROM ts) AS e FROM t")
        assert "unix_micros" in out and "DECIMAL(26,6)" in out
        assert rewrite_sql(out) == out  # idempotent

    def test_epoch_live(self, spark):
        row = spark.sql(
            rewrite_sql(
                "SELECT EXTRACT(EPOCH FROM TIMESTAMP '2001-02-16 20:38:40') AS e"
            )
        ).collect()[0]
        assert float(row["e"]) == 982355920.0

    def test_idempotent_and_nested(self):
        out = rewrite_sql(
            "SELECT EXTRACT(dow FROM a + EXTRACT(dow FROM b)) FROM t"
        )
        assert out.count("DAYOFWEEK") == 2
        assert rewrite_sql(out) == out

    def test_pg_semantics_live(self, spark):
        # 2001-02-16 is a Friday: PG DOW=5 (Sunday=0), ISODOW Sunday=7
        row = spark.sql(
            rewrite_sql(
                "SELECT EXTRACT(DOW FROM TIMESTAMP '2001-02-16 20:38:40') AS d, "
                "EXTRACT(ISODOW FROM DATE '2001-02-18') AS i"
            )
        ).collect()[0]
        assert (row.d, row.i) == (5, 7)


class TestGenerateSeries:
    def test_basic(self, spark):
        out = rewrite_sql("SELECT * FROM generate_series(1, 5)")
        rows = spark.sql(out).collect()
        assert [r[0] for r in rows] == [1, 2, 3, 4, 5]

    def test_with_alias_column(self, spark):
        out = rewrite_sql("SELECT r FROM generate_series(2, 4) AS s(r)")
        rows = spark.sql(out).collect()
        assert [r.r for r in rows] == [2, 3, 4]

    def test_with_step(self, spark):
        out = rewrite_sql("SELECT r FROM generate_series(1, 9, 3) AS g(r)")
        rows = spark.sql(out).collect()
        assert [r.r for r in rows] == [1, 4, 7]

    def test_inclusive_end(self):
        out = rewrite_sql("SELECT * FROM generate_series(1, 3)")
        assert "range(1, (3)+1)" in out


class TestParams:
    def test_dollar_params(self):
        assert (
            rewrite_sql("SELECT * FROM t WHERE a = $1 AND b = $2")
            == "SELECT * FROM t WHERE a = :p1 AND b = :p2"
        )

    def test_dollar_in_string_untouched(self):
        assert rewrite_sql("SELECT '$1'") == "SELECT '$1'"


class TestPgNamespace:
    def test_bare_qualified(self):
        assert (
            rewrite_sql("SELECT * FROM pg_namespace")
            == "SELECT * FROM pg_catalog.pg_namespace"
        )

    def test_already_qualified_untouched(self):
        sql = "SELECT * FROM pg_catalog.pg_namespace"
        assert rewrite_sql(sql) == sql


class TestDistinctOn:
    def test_basic_rewrite(self):
        out = rewrite_sql(
            "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v DESC"
        )
        assert "ROW_NUMBER() OVER (PARTITION BY k ORDER BY k, v DESC" in out
        assert "__pg_rn = 1" in out
        assert out.rstrip().endswith("ORDER BY k, v DESC")

    def test_no_order_by_uses_on_exprs(self):
        out = rewrite_sql("SELECT DISTINCT ON (a) a, b FROM t")
        assert "PARTITION BY a ORDER BY a" in out

    def test_limit_preserved(self):
        out = rewrite_sql("SELECT DISTINCT ON (a) a, b FROM t ORDER BY a LIMIT 3")
        assert out.rstrip().endswith("LIMIT 3")

    def test_plain_distinct_untouched(self):
        sql = "SELECT DISTINCT a FROM t"
        assert rewrite_sql(sql) == sql

    def test_set_operator_bails_out(self):
        sql = "SELECT DISTINCT ON (a) a FROM t UNION SELECT b FROM u"
        assert rewrite_sql(sql) == sql

    def test_executes(self, spark):
        rows = spark.sql(
            rewrite_sql(
                "SELECT DISTINCT ON (k) k, v FROM VALUES (1, 'x'), (1, 'z'), "
                "(2, 'y') AS t(k, v) ORDER BY k, v DESC"
            )
        ).collect()
        assert [(r.k, r.v) for r in rows] == [(1, "z"), (2, "y")]


class TestCommands:
    def test_begin(self):
        assert classify_statement("BEGIN").cls is StatementClass.BEGIN
        assert classify_statement("begin work;").cls is StatementClass.BEGIN
        assert classify_statement("START TRANSACTION").cls is StatementClass.BEGIN

    def test_commit_rollback(self):
        assert classify_statement("COMMIT").cls is StatementClass.COMMIT
        assert classify_statement("ROLLBACK;").cls is StatementClass.ROLLBACK
        assert classify_statement("abort").cls is StatementClass.ROLLBACK

    def test_set(self):
        st = classify_statement("SET spark.sql.shuffle.partitions = 16")
        assert st.cls is StatementClass.SET
        assert st.set_kv == ("spark.sql.shuffle.partitions", "16")

    def test_set_to_quoted(self):
        st = classify_statement("SET application_name TO 'my app'")
        assert st.set_kv == ("application_name", "my app")

    def test_select_is_query(self):
        assert classify_statement("SELECT 1").cls is StatementClass.QUERY

    def test_split_statements(self):
        assert split_statements("SELECT 1; SELECT 2;") == ["SELECT 1", "SELECT 2"]

    def test_split_respects_strings(self):
        assert split_statements("SELECT 'a;b'; SELECT 2") == ["SELECT 'a;b'", "SELECT 2"]

    def test_split_respects_comments(self):
        out = split_statements("SELECT 1 -- ; not a split\n; SELECT 2")
        assert len(out) == 2


class TestExtractCoarseFields:
    def test_century(self):
        out = rewrite_sql("SELECT EXTRACT(CENTURY FROM d) FROM t")
        assert "YEAR" in out and "DIV 100" in out and "EXTRACT" not in out

    def test_millennium_and_decade(self):
        assert "DIV 1000" in rewrite_sql("SELECT EXTRACT(MILLENNIUM FROM d)")
        assert "DIV 10 " in rewrite_sql("SELECT EXTRACT(DECADE FROM d)")

    def test_values(self, spark):
        rows = spark.sql(rewrite_sql(
            "SELECT EXTRACT(CENTURY FROM DATE '2001-01-01'), "
            "EXTRACT(CENTURY FROM DATE '2000-12-31'), "
            "EXTRACT(MILLENNIUM FROM DATE '1001-01-01'), "
            "EXTRACT(DECADE FROM DATE '1994-12-25')"
        )).collect()[0]
        assert tuple(rows) == (21, 20, 2, 199)

    def test_normal_fields_untouched(self):
        sql = "SELECT EXTRACT(YEAR FROM d) FROM t"
        assert rewrite_sql(sql) == sql

    def test_isoyear_nested_pg_constructs_rewritten(self, spark):
        # r9 ADVICE (low): the ISOYEAR splice used to fold the argument
        # into one opaque token, hiding nested PG-only constructs from
        # every later pass; the re-tokenized splice keeps them visible
        out = rewrite_sql("SELECT EXTRACT(ISOYEAR FROM DATE '1999 Jan 08')")
        assert "1999-01-08" in out and "Jan" not in out
        out2 = rewrite_sql(
            "SELECT EXTRACT(ISOYEAR FROM "
            "make_date(EXTRACT(CENTURY FROM d)::int, 1, 1))"
        )
        assert "CENTURY" not in out2.upper().replace("DIV 100", "")
        assert "DIV 100" in out2 and "::" not in out2

    def test_isoyear_values(self, spark):
        rows = spark.sql(rewrite_sql(
            "SELECT EXTRACT(ISOYEAR FROM DATE '2005-01-01'), "
            "EXTRACT(ISOYEAR FROM DATE '1999 Jan 08')"
        )).collect()[0]
        assert tuple(rows) == (2004, 1999)


class TestDateTruncCoarse:
    def test_century_rewrites(self):
        out = rewrite_sql("SELECT DATE_TRUNC('CENTURY', d) FROM t")
        assert "MAKE_DATE" in out and "date_trunc" not in out.lower()

    def test_supported_fields_untouched(self):
        sql = "SELECT date_trunc('year', d) FROM t"
        assert rewrite_sql(sql) == sql

    def test_values(self, spark):
        rows = spark.sql(rewrite_sql(
            "SELECT DATE_TRUNC('CENTURY', DATE '2004-08-10'), "
            "DATE_TRUNC('DECADE', DATE '1993-12-25'), "
            "DATE_TRUNC('MILLENNIUM', TIMESTAMP '1970-03-20 04:30:00')"
        )).collect()[0]
        assert str(rows[0]) == "2001-01-01 00:00:00"
        assert str(rows[1]) == "1990-01-01 00:00:00"
        assert str(rows[2]) == "1001-01-01 00:00:00"


class TestPgDateLiterals:
    @pytest.mark.parametrize(
        "lit,iso",
        [
            ("1999 Jan 08", "1999-01-08"),
            ("1999 08 Jan", "1999-01-08"),
            ("1999 01 08", "1999-01-08"),
            ("1999 08 01", "1999-08-01"),
        ],
    )
    def test_year_first_forms(self, lit, iso):
        assert rewrite_sql(f"SELECT date '{lit}'") == f"SELECT date '{iso}'"

    def test_iso_and_specials_untouched(self):
        for lit in ("1999-01-08", "today", "epoch"):
            sql = f"SELECT date '{lit}'"
            assert rewrite_sql(sql) == sql

    def test_ambiguous_untouched(self):
        sql = "SELECT date '08 01 1999'"  # not year-first — leave alone
        assert rewrite_sql(sql) == sql


class TestJustifyRewrites:
    def test_justify_hours_mixed(self):
        out = rewrite_sql(
            "SELECT justify_hours(interval "
            "'6 months 3 days 52 hours 3 minutes 2 seconds')"
        )
        assert "make_interval(0, 6, 0, 5, 4, 3, 2)" in out

    def test_justify_days_pure_daytime_becomes_ym(self):
        out = rewrite_sql("SELECT justify_days(interval '60 days')")
        assert "INTERVAL '0-2' YEAR TO MONTH" in out

    def test_justify_interval_sign_fixup(self):
        out = rewrite_sql(
            "SELECT justify_interval(interval '1 month -1 hour')"
        )
        assert "INTERVAL '29 23:00:00' DAY TO SECOND" in out

    def test_non_literal_untouched(self):
        sql = "SELECT justify_hours(col) FROM t"
        assert rewrite_sql(sql) == sql

    def test_unparseable_untouched(self):
        sql = "SELECT justify_hours(interval 'bogus')"
        assert rewrite_sql(sql) == sql


@pytest.mark.parametrize(
    "pg_sql,expected",
    [
        # the reference's own dialect test expressions (PgDialectSuite.scala)
        ("SELECT 1::text", [("1",)]),
        ("SELECT 'abc' ~ 'b'", [(True,)]),
        ("SELECT 'a' || 'b'", [("ab",)]),
        ("SELECT substring('spark' from 2 for 3)", [("par",)]),
    ],
)
def test_rewritten_sql_executes(spark, pg_sql, expected):
    rows = [tuple(r) for r in spark.sql(rewrite_sql(pg_sql)).collect()]
    assert rows == expected


class TestPgDumpDialect:
    """The rewrites the real pg_dump binary exercises (r11 — see
    tests/test_pg_dump.py for the end-to-end drive)."""

    def test_operator_syntax(self):
        assert (
            rewrite_sql("SELECT 1 WHERE a OPERATOR(pg_catalog.=) b")
            == "SELECT 1 WHERE a = b"
        )

    def test_operator_syntax_regex(self):
        assert (
            rewrite_sql("SELECT c.relname OPERATOR(pg_catalog.~) '^x$'")
            == "SELECT c.relname RLIKE '^x$'"
        )

    def test_operator_any_folds_to_array_contains(self):
        out = rewrite_sql(
            "SELECT 1 WHERE c.relkind OPERATOR(pg_catalog.=) ANY "
            "(array['r', 'v'])"
        )
        assert "array_contains(array('r', 'v'), c.relkind)" in out

    def test_unqualified_operator(self):
        assert rewrite_sql("SELECT a OPERATOR(<>) b") == "SELECT a <> b"

    def test_zero_subscript_is_first_char(self):
        # pg_dump's array-type probe: typname[0] = '_' — PG name columns
        # are C-strings where [0] is the first byte
        out = rewrite_sql("SELECT typname[0] = '_' FROM pg_type")
        assert "substring(typname, 1, 1)" in out

    def test_positive_subscript_untouched_by_zero_rule(self):
        assert "try_element_at(a, 1)" in rewrite_sql("SELECT a[1]")

    def test_quoted_char_cast_is_identity(self):
        assert rewrite_sql("SELECT 's'::\"char\"") == "SELECT 's'"

    def test_oid_array_literal_cast(self):
        assert (
            rewrite_sql("SELECT '{1,2}'::pg_catalog.oid[]")
            == "SELECT array(1, 2)"
        )

    def test_pg_options_to_table_becomes_empty_relation(self):
        out = rewrite_sql(
            "SELECT option_name FROM pg_options_to_table(fdwoptions)"
        )
        assert "option_name" in out and "WHERE false" in out
        assert "fdwoptions" not in out

    def test_array_subquery_keyed_order(self):
        out = rewrite_sql("SELECT ARRAY(SELECT f(x) FROM t ORDER BY y)")
        # NULL-flag field rides first so NULL keys land NULLS LAST on
        # ASC (PG's default; bare sort_array puts them first)
        assert "transform(sort_array(collect_list(struct((y) IS NULL AS _n0, y AS _o0," in out
        assert "s -> s._x" in out

    def test_array_subquery_keyed_order_desc(self):
        out = rewrite_sql("SELECT ARRAY(SELECT x FROM t ORDER BY y DESC)")
        assert ", false), s -> s._x)" in out
        # DESC default is NULLS FIRST — under a descending struct sort
        # the IS NULL flag (true first) gives exactly that
        assert "(y) IS NULL AS _n0" in out

    def test_array_subquery_two_keys(self):
        out = rewrite_sql("SELECT ARRAY(SELECT x FROM t ORDER BY a, b)")
        assert "(a) IS NULL AS _n0, a AS _o0" in out
        assert "(b) IS NULL AS _n1, b AS _o1" in out
        assert "s -> s._x" in out

    def test_array_subquery_three_keys_desc(self):
        out = rewrite_sql(
            "SELECT ARRAY(SELECT x FROM t ORDER BY a DESC, b DESC, c DESC)"
        )
        assert "(c) IS NULL AS _n2, c AS _o2" in out
        assert ", false), s -> s._x)" in out

    def test_array_subquery_nulls_first(self):
        # explicit NULLS FIRST on ASC flips the flag polarity
        out = rewrite_sql(
            "SELECT ARRAY(SELECT x FROM t ORDER BY a NULLS FIRST)"
        )
        assert "(a) IS NOT NULL AS _n0" in out

    def test_array_subquery_mixed_directions_fall_through(self):
        # one sort_array bool can't express ASC+DESC — keep the plain
        # conversion, which fails loudly (UNRESOLVED_COLUMN) instead of
        # silently mis-ordering
        out = rewrite_sql(
            "SELECT ARRAY(SELECT x FROM t ORDER BY a ASC, b DESC)"
        )
        assert "collect_list( x )" in out and "ORDER BY a ASC, b DESC" in out

    def test_array_subquery_using_falls_through(self):
        out = rewrite_sql("SELECT ARRAY(SELECT x FROM t ORDER BY a USING <)")
        assert "sort_array" not in out

    def test_array_subquery_func_key_with_comma(self):
        # commas inside a key's own parens must not split the key list
        out = rewrite_sql(
            "SELECT ARRAY(SELECT x FROM t ORDER BY f(a, b), c)"
        )
        assert "_o0" in out and "(c) IS NULL AS _n1" in out

    def test_recursive_union_over_empty_catalog(self):
        out = rewrite_sql(
            "WITH RECURSIVE w AS (SELECT objid FROM pg_depend UNION "
            "SELECT objid FROM w) SELECT * FROM w"
        )
        assert "UNION ALL" in out

    def test_recursive_union_over_user_data_untouched(self):
        # a user's genuine recursive UNION keeps Spark's clean error —
        # switching it to UNION ALL could change termination
        sql = (
            "WITH RECURSIVE w AS (SELECT a FROM edges UNION "
            "SELECT a + 1 FROM w) SELECT * FROM w"
        )
        assert "UNION ALL" not in rewrite_sql(sql)


class TestPgDumpCommands:
    """Statement-classification additions pg_dump's preamble needs."""

    def test_set_config_is_a_real_set(self):
        from spark_sql_server_spark.dialect.commands import (
            StatementClass,
            classify_statement,
        )

        st = classify_statement(
            "SELECT pg_catalog.set_config('search_path', '', false);"
        )
        assert st.cls is StatementClass.SET_CONFIG
        assert st.set_kv == ("search_path", "")

    def test_set_config_null_value(self):
        from spark_sql_server_spark.dialect.commands import (
            StatementClass,
            classify_statement,
        )

        st = classify_statement("SELECT set_config('x', NULL, true)")
        assert st.cls is StatementClass.SET_CONFIG
        assert st.set_kv == ("x", "")

    def test_lock_table_is_noop_with_pg_tag(self):
        from spark_sql_server_spark.dialect.commands import (
            StatementClass,
            classify_statement,
        )

        st = classify_statement(
            "LOCK TABLE spark.region IN ACCESS SHARE MODE"
        )
        assert st.cls is StatementClass.MAINT
        assert st.tag == "LOCK TABLE"

    def test_set_transaction_is_noop(self):
        from spark_sql_server_spark.dialect.commands import (
            StatementClass,
            classify_statement,
        )

        st = classify_statement(
            "SET TRANSACTION ISOLATION LEVEL REPEATABLE READ, READ ONLY"
        )
        assert st.cls is StatementClass.MAINT
        assert st.tag == "SET"

    def test_plain_set_still_works(self):
        from spark_sql_server_spark.dialect.commands import (
            StatementClass,
            classify_statement,
        )

        st = classify_statement("SET search_path = 'x'")
        assert st.cls is StatementClass.SET
        assert st.set_kv == ("search_path", "x")

    def test_copy_out_with_schema_and_columns(self):
        from spark_sql_server_spark.dialect.commands import (
            StatementClass,
            classify_statement,
        )

        st = classify_statement(
            "COPY spark.region (r_regionkey, r_name) TO stdout;"
        )
        assert st.cls is StatementClass.COPY_OUT
        assert st.copy_query == "SELECT r_regionkey, r_name FROM region"


class TestPgbenchDialect:
    """The statement shapes pgbench -i sends (r11 — see
    tests/test_pgbench.py for the end-to-end drive)."""

    def test_multi_table_drop_expands(self):
        from spark_sql_server_spark.dialect.commands import split_statements

        assert split_statements(
            "drop table if exists a, b, c"
        ) == ["DROP table IF EXISTS a", "DROP table IF EXISTS b",
              "DROP table IF EXISTS c"]

    def test_multi_table_truncate_expands(self):
        from spark_sql_server_spark.dialect.commands import split_statements

        assert split_statements("truncate a, b") == [
            "TRUNCATE TABLE a", "TRUNCATE TABLE b"
        ]

    def test_single_drop_untouched(self):
        from spark_sql_server_spark.dialect.commands import split_statements

        assert split_statements("DROP TABLE t1") == ["DROP TABLE t1"]

    def test_storage_options_stripped(self):
        out = rewrite_sql(
            "create table t(a int not null, f char(84)) "
            "with (fillfactor=100)"
        )
        assert "fillfactor" not in out and "with" not in out.lower()

    def test_ctas_with_cte_untouched(self):
        sql = "CREATE TABLE t AS WITH c AS (SELECT 1 AS x) SELECT * FROM c"
        assert rewrite_sql(sql) == sql
