"""udf/ golden-corpus family — Python-UDF twins of built-in shapes.

The reference ships 18 ``inputs/udf/*.sql`` files that re-run the main
corpus with expressions wrapped in an identity ``udf(...)`` — and then
SKIPS them over JDBC (``SQLServerQueryTestSuite.scala:402-403``). This
module goes beyond it: each ported shape runs twice on the live Spark
session — once with typed Arrow-batched identity UDFs in the reference's
positions, once with the built-ins only — and the results must match
exactly. A plan gate asserts every UDF statement evaluates via
``ArrowEvalPython`` (vectorized Arrow batches), never row-at-a-time
``BatchEvalPython``.

References: inputs/udf/udf-{group-by,having,count,group-analytics,
window,inner-join,outer-join,natural-join,cross-join,union,except,
intersect-all,pivot,inline-table,special-values,udaf}.sql.
"""

from __future__ import annotations

import pandas as pd
import pytest

from spark_sql_server_spark.plans import executed_plan

#: (sql with udf wrappers, twin sql with built-ins only)
UDF_CORPUS: list[tuple[str, str]] = []


def _strip_udfs(sql: str) -> str:
    """Remove every ``udf_<type>(...)`` wrapper (balanced parens) — the
    wrappers are identities, so the twin is the same query without
    them."""
    import re

    pat = re.compile(r"udf_(?:int|bigint|double|float|str|bool)\(")
    while True:
        m = pat.search(sql)
        if not m:
            return sql
        depth = 1
        i = m.end()
        while depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        sql = sql[: m.start()] + sql[m.end() : i - 1] + sql[i:]


def _case(udf_sql: str) -> None:
    UDF_CORPUS.append((udf_sql, _strip_udfs(udf_sql)))


# ---- udf-group-by.sql shapes -------------------------------------------
_case("SELECT udf_int(a) AS a, udf_bigint(COUNT(b)) AS c FROM udf_td "
      "GROUP BY a ORDER BY a NULLS FIRST")
_case("SELECT COUNT(udf_int(a)) AS ca, udf_bigint(COUNT(b)) AS cb "
      "FROM udf_td")
_case("SELECT udf_int(a) AS a, COUNT(udf_int(b)) AS c FROM udf_td "
      "GROUP BY a ORDER BY a NULLS FIRST")
_case("SELECT udf_int(a) AS a, udf_bigint(COUNT(udf_int(b))) AS c "
      "FROM udf_td GROUP BY a ORDER BY a NULLS FIRST")
_case("SELECT COUNT(udf_int(a)) AS ca, COUNT(udf_int(b)) AS cb "
      "FROM udf_td GROUP BY udf_int(a) ORDER BY ca, cb")
_case("SELECT 'foo' AS k, COUNT(udf_int(a)) AS c FROM udf_td GROUP BY 1")
_case("SELECT udf_int(a + b) AS ab, udf_bigint(COUNT(b)) AS c FROM udf_td "
      "GROUP BY a + b ORDER BY ab NULLS FIRST")
_case("SELECT udf_int(a + 1) + 1 AS a2, udf_bigint(COUNT(b)) AS c "
      "FROM udf_td GROUP BY udf_int(a + 1) ORDER BY a2 NULLS FIRST")
_case("SELECT udf_int(MIN(a)) AS mn, MAX(udf_int(a)) AS mx, "
      "udf_bigint(SUM(a)) AS s, udf_bigint(COUNT(a)) AS c FROM udf_td")
_case("SELECT udf_int(a) AS k, COUNT(udf_int(b)) AS c FROM udf_td "
      "GROUP BY k ORDER BY k NULLS FIRST")
_case("SELECT a AS k, udf_bigint(COUNT(b)) AS c FROM udf_td GROUP BY k "
      "HAVING k > 1 ORDER BY k")
_case("SELECT udf_int(a) AS a, COUNT(udf_int(1)) AS c FROM udf_td "
      "WHERE false GROUP BY udf_int(a)")
_case("SELECT udf_bigint(COUNT(1)) AS c FROM udf_td WHERE false")

# ---- udf-having.sql shapes ---------------------------------------------
_case("SELECT udf_int(b) AS b, udf_bigint(COUNT(a)) AS c FROM udf_td "
      "GROUP BY b HAVING COUNT(a) > 2 ORDER BY b NULLS FIRST")
_case("SELECT b, udf_bigint(SUM(a)) AS s FROM udf_td GROUP BY b "
      "HAVING udf_bigint(SUM(a)) > 3 ORDER BY b NULLS FIRST")
_case("SELECT udf_int(1) AS one FROM range(10) HAVING true")
_case("SELECT udf_int(udf_int(1)) AS one FROM range(10) "
      "HAVING MAX(id) > 0")

# ---- udf-count.sql shapes ----------------------------------------------
_case("SELECT udf_bigint(COUNT(*)) AS c1, udf_bigint(COUNT(1)) AS c2, "
      "udf_bigint(COUNT(null)) AS c3, udf_bigint(COUNT(a)) AS c4, "
      "udf_bigint(COUNT(b)) AS c5 FROM udf_td")
_case("SELECT udf_bigint(COUNT(DISTINCT 1)) AS c1, "
      "udf_bigint(COUNT(DISTINCT null)) AS c2, "
      "udf_bigint(COUNT(DISTINCT a)) AS c3 FROM udf_td")
_case("SELECT udf_bigint(COUNT(a, b)) AS c FROM udf_td")

# ---- udf-group-analytics.sql shapes ------------------------------------
_case("SELECT udf_int(a + b) AS ab, b, udf_bigint(SUM(a - b)) AS s "
      "FROM udf_ab GROUP BY udf_int(a + b), b WITH CUBE "
      "ORDER BY ab NULLS FIRST, b NULLS FIRST, s")
_case("SELECT udf_int(a) AS a, udf_int(b) AS b, SUM(b) AS s FROM udf_ab "
      "GROUP BY udf_int(a), b WITH CUBE "
      "ORDER BY a NULLS FIRST, b NULLS FIRST, s")
_case("SELECT udf_int(a + b) AS ab, b, SUM(a - b) AS s FROM udf_ab "
      "GROUP BY a + b, b WITH ROLLUP "
      "ORDER BY ab NULLS FIRST, b NULLS FIRST, s")
_case("SELECT course, year, SUM(earnings) AS s FROM udf_cs "
      "GROUP BY ROLLUP(course, year) "
      "ORDER BY udf_str(course) NULLS FIRST, year NULLS FIRST")
_case("SELECT course, year, SUM(earnings) AS s FROM udf_cs "
      "GROUP BY CUBE(course, year) "
      "ORDER BY course NULLS FIRST, udf_int(year) NULLS FIRST")
_case("SELECT course, udf_int(year) AS y, SUM(earnings) AS s FROM udf_cs "
      "GROUP BY course, year GROUPING SETS(course, year) "
      "ORDER BY course NULLS FIRST, y NULLS FIRST")
_case("SELECT course, udf_bigint(SUM(earnings)) AS s FROM udf_cs "
      "GROUP BY course, earnings GROUPING SETS((), (course), "
      "(course, earnings)) ORDER BY course NULLS FIRST, s NULLS FIRST")
_case("SELECT udf_str(course) AS course, udf_int(year) AS y, "
      "GROUPING(course) AS gc, GROUPING(year) AS gy FROM udf_cs "
      "GROUP BY CUBE(course, year) "
      "ORDER BY course NULLS FIRST, y NULLS FIRST, gc, gy")

# ---- udf-window.sql shapes ---------------------------------------------
_case("SELECT udf_int(val) AS val, cate, count(val) OVER (PARTITION BY "
      "cate ORDER BY udf_int(val) ROWS CURRENT ROW) AS c FROM udf_w "
      "ORDER BY cate NULLS FIRST, udf_int(val) NULLS FIRST")
_case("SELECT udf_int(val) AS val, cate, sum(val) OVER (PARTITION BY "
      "cate ORDER BY udf_int(val) ROWS BETWEEN UNBOUNDED PRECEDING AND "
      "1 FOLLOWING) AS s FROM udf_w "
      "ORDER BY cate NULLS FIRST, udf_int(val) NULLS FIRST")
_case("SELECT udf_int(val) AS val, cate, count(val) OVER (PARTITION BY "
      "udf_str(cate) ORDER BY val RANGE 1 PRECEDING) AS c FROM udf_w "
      "ORDER BY cate NULLS FIRST, udf_int(val) NULLS FIRST")
_case("SELECT val, udf_str(cate) AS cate, sum(val) OVER (PARTITION BY "
      "udf_str(cate) ORDER BY val RANGE BETWEEN CURRENT ROW AND "
      "1 FOLLOWING) AS s FROM udf_w "
      "ORDER BY udf_str(cate) NULLS FIRST, val NULLS FIRST")
_case("SELECT udf_int(val) AS val, cate, row_number() OVER (PARTITION "
      "BY cate ORDER BY udf_int(val) NULLS FIRST, val_long NULLS FIRST) "
      "AS rn FROM udf_w "
      "ORDER BY cate NULLS FIRST, val NULLS FIRST, rn")
_case("SELECT udf_str(cate) AS cate, udf_bigint(sum(val_long)) AS s "
      "FROM udf_w GROUP BY cate "
      "ORDER BY udf_str(cate) NULLS FIRST")

# ---- udf join families --------------------------------------------------
_case("SELECT udf_int(t1.a) AS a, udf_int(t2.b) AS b FROM udf_ab t1 "
      "JOIN udf_ab t2 ON udf_int(t1.a) = udf_int(t2.a) "
      "ORDER BY a, b, t1.b, t2.b")
_case("SELECT udf_int(t1.a) AS a, t2.b FROM udf_ab t1 CROSS JOIN "
      "udf_ab t2 WHERE udf_int(t1.b) = 1 ORDER BY a, t1.b, t2.a, b")
_case("SELECT udf_int(a) AS a, udf_int(b) AS b FROM udf_ab NATURAL JOIN "
      "udf_ab2 ORDER BY a, b")
# outer joins: Spark rejects Python UDFs in the outer-join CONDITION
# itself, so (like udf-outer-join.sql) the wrappers ride the select list
_case("SELECT udf_int(l.a) AS a, udf_int(r.c) AS c FROM udf_ab l "
      "LEFT JOIN udf_c r ON l.a = r.c "
      "ORDER BY a, c NULLS FIRST, l.b")
_case("SELECT udf_int(l.a) AS a, udf_int(r.c) AS c FROM udf_ab l "
      "FULL OUTER JOIN udf_c r ON l.a = r.c "
      "ORDER BY a NULLS FIRST, c NULLS FIRST, l.b NULLS FIRST")
_case("SELECT udf_int(a) AS a, b FROM udf_ab WHERE a IN "
      "(SELECT udf_int(c) FROM udf_c) ORDER BY a, b")

# ---- udf set operations -------------------------------------------------
_case("SELECT udf_int(a) AS v FROM udf_ab UNION SELECT udf_int(c) "
      "FROM udf_c ORDER BY v")
_case("SELECT udf_int(a) AS v FROM udf_ab UNION ALL SELECT udf_int(c) "
      "FROM udf_c ORDER BY v")
_case("SELECT udf_int(a) AS v FROM udf_ab EXCEPT SELECT udf_int(c) "
      "FROM udf_c ORDER BY v")
_case("SELECT udf_int(a) AS v FROM udf_ab INTERSECT ALL "
      "SELECT udf_int(a) FROM udf_ab ORDER BY v")
_case("SELECT udf_int(a) AS v FROM udf_ab EXCEPT ALL SELECT udf_int(c) "
      "FROM udf_c ORDER BY v")

# ---- udf-pivot.sql shapes ----------------------------------------------
_case("SELECT * FROM (SELECT udf_int(year) AS year, course, earnings "
      "FROM udf_cs) PIVOT (udf_bigint(sum(earnings)) FOR course IN "
      "('dotNET', 'Java')) ORDER BY year")
_case("SELECT * FROM (SELECT year, course, earnings FROM udf_cs) "
      "PIVOT (udf_bigint(sum(udf_int(earnings))) FOR course IN "
      "('dotNET' AS d, 'Java' AS j)) ORDER BY year")

# ---- udf-inline-table.sql shapes ---------------------------------------
_case("SELECT udf_str(col1) AS c1, udf_int(col2) AS c2 FROM "
      "VALUES ('one', 1), ('two', 2), ('three', null) ORDER BY c1")
_case("SELECT udf_int(a) AS a, b FROM VALUES (1, 2), (3, 4) AS v(a, b) "
      "ORDER BY a")

# ---- udf-special-values.sql shapes -------------------------------------
# NaN is deliberately absent here: an Arrow-batched identity UDF maps
# NaN -> NULL (pyarrow Array.from_pandas treats float64 NaN as null on
# the way back) — pinned as a documented divergence in
# test_pandas_udf_nan_becomes_null below.
_case("SELECT udf_double(x) AS x FROM (VALUES "
      "(CAST('Infinity' AS DOUBLE)), (CAST('-Infinity' AS DOUBLE)), "
      "(CAST(NULL AS DOUBLE)), (0.0D)) "
      "v(x) ORDER BY x NULLS FIRST")
_case("SELECT udf_bool(x) AS x FROM (VALUES (true), (false), "
      "(CAST(NULL AS BOOLEAN))) v(x) ORDER BY x NULLS FIRST")


@pytest.fixture(scope="module")
def udf_session(spark):
    from pyspark.sql.functions import pandas_udf

    spark.udf.register("udf_int", pandas_udf(lambda s: s, "int"))
    spark.udf.register("udf_bigint", pandas_udf(lambda s: s, "bigint"))
    spark.udf.register("udf_double", pandas_udf(lambda s: s, "double"))
    spark.udf.register("udf_str", pandas_udf(lambda s: s, "string"))
    spark.udf.register("udf_bool", pandas_udf(lambda s: s, "boolean"))

    views = {
        "udf_td": "SELECT * FROM VALUES (1, 1), (1, 2), (2, 1), (2, 2), "
        "(3, 1), (3, 2), (CAST(null AS INT), 1), (3, CAST(null AS INT)), "
        "(CAST(null AS INT), CAST(null AS INT)) AS t(a, b)",
        "udf_ab": "SELECT * FROM VALUES (1, 1), (1, 2), (2, 1), (2, 2), "
        "(3, 1), (3, 2) AS t(a, b)",
        "udf_ab2": "SELECT * FROM VALUES (1, 1), (2, 2), (4, 4) AS t(a, b)",
        "udf_c": "SELECT * FROM VALUES (1), (2), (2), (5) AS t(c)",
        "udf_cs": "SELECT * FROM VALUES ('dotNET', 2012, 10000), "
        "('Java', 2012, 20000), ('dotNET', 2012, 5000), "
        "('dotNET', 2013, 48000), ('Java', 2013, 30000) "
        "AS t(course, year, earnings)",
        "udf_w": "SELECT * FROM VALUES "
        "(CAST(null AS INT), CAST(1 AS BIGINT), 'a'), (1, 1, 'a'), "
        "(1, 2, 'a'), (2, 5, 'a'), (1, CAST(null AS BIGINT), 'b'), "
        "(2, 3, 'b'), (3, 5, 'b'), (CAST(null AS INT), "
        "CAST(null AS BIGINT), CAST(null AS STRING)), (3, 1, "
        "CAST(null AS STRING)) AS t(val, val_long, cate)",
    }
    for name, sql in views.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")
    try:
        yield spark
    finally:
        for name in views:
            spark.sql(f"DROP VIEW IF EXISTS {name}")


def _collect_sorted(spark, sql: str):
    df = spark.sql(sql)
    return df, sorted(
        (tuple(str(c) for c in row) for row in df.collect())
    )


@pytest.mark.parametrize("case", range(len(UDF_CORPUS)))
def test_udf_matches_builtin_twin(udf_session, case):
    spark = udf_session
    udf_sql, twin_sql = UDF_CORPUS[case]
    udf_df, udf_rows = _collect_sorted(spark, udf_sql)
    _, twin_rows = _collect_sorted(spark, twin_sql)
    assert udf_rows == twin_rows, (
        f"udf result diverges from builtin twin\n udf: {udf_sql}\n "
        f"twin: {twin_sql}\n got={udf_rows[:5]}\n exp={twin_rows[:5]}"
    )
    # Arrow batching gate: identity UDFs must evaluate vectorized
    # (ArrowEvalPython), never row-at-a-time BatchEvalPython. The
    # optimizer legally erases the UDF on empty relations — only the
    # row-at-a-time operator is forbidden unconditionally.
    plan = executed_plan(udf_df)
    assert "BatchEvalPython" not in plan, udf_sql
    if "EvalPython" in plan:
        assert "ArrowEvalPython" in plan, udf_sql


def test_representative_plan_is_arrow(udf_session):
    # at least the canonical group-by shape must actually evaluate the
    # UDF (guards the gate above against silently passing because the
    # optimizer erased every UDF)
    df = udf_session.sql(
        "SELECT udf_int(a) AS a, udf_bigint(COUNT(b)) AS c FROM udf_td "
        "GROUP BY a"
    )
    plan = executed_plan(df)
    assert "ArrowEvalPython" in plan


def test_pandas_udf_nan_becomes_null(udf_session):
    # Documented divergence vs reference row-at-a-time UDFs: the Arrow
    # pandas->JVM conversion (pyarrow Array.from_pandas) treats float64
    # NaN as null, so an identity pandas UDF maps NaN -> NULL while
    # infinities and ordinary doubles round-trip unchanged. Pinned so a
    # Spark upgrade changing the conversion fails loudly.
    rows = udf_session.sql(
        "SELECT udf_double(CAST('NaN' AS DOUBLE)) AS nan_in, "
        "udf_double(CAST('Infinity' AS DOUBLE)) AS inf_in"
    ).collect()
    assert rows[0].nan_in is None
    assert rows[0].inf_in == float("inf")


def test_corpus_size():
    # the r6 verdict's "done" bar for this family
    assert len(UDF_CORPUS) >= 40, len(UDF_CORPUS)
