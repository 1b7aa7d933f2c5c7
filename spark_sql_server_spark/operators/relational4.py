"""Modern Spark-4 SQL surface: recursive CTEs, UNPIVOT, VARIANT,
error-safe arithmetic, lateral column aliases.

These are §2.B rows the reference (built on Spark 2/3) could not
delegate — Spark 4 can, so the engine surfaces them through the same
protocol + oracle discipline. DuckDB supports each construct natively,
so every query here is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import register_tables

# Recursive CTE generating quantity buckets 0,10..50, each counting its
# lineitem band via a correlated scalar subquery — recursion + real data.
_RECURSIVE_SQL = """
    WITH RECURSIVE buckets(lo) AS (
      SELECT 0
      UNION ALL
      SELECT lo + 10 FROM buckets WHERE lo + 10 <= 50
    )
    SELECT CAST(lo AS BIGINT) AS lo,
           (SELECT COUNT(*) FROM lineitem
            WHERE l_quantity >= lo AND l_quantity < lo + 10) AS n_items
    FROM buckets
    ORDER BY lo
"""


@query(
    "q_recursive_cte",
    oracle=_RECURSIVE_SQL,
    covers="§2.B WITH RECURSIVE (Spark 4 native recursion; beyond the "
    "Spark-2/3-era reference)",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive bucket series joined against lineitem quantity bands.

    Scale: the recursion materializes 6 driver-side rows (bounded by
    the WHERE in the recursive step, never by data volume); each
    correlated count decorrelates to one aggregation over the fact
    table reusing a single scan.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


# UNPIVOT: wide per-segment stats → long (metric, value) rows.
_UNPIVOT_SQL = """
    SELECT c_mktsegment, metric, CAST(val AS BIGINT) AS val
    FROM (
      SELECT c_mktsegment,
             COUNT(*) AS n_customers,
             COUNT(DISTINCT c_nationkey) AS n_nations
      FROM customer GROUP BY c_mktsegment
    ) wide
    UNPIVOT (val FOR metric IN (n_customers, n_nations))
    ORDER BY c_mktsegment, metric
"""


@query(
    "q_unpivot",
    oracle=_UNPIVOT_SQL,
    covers="§2.B UNPIVOT (wide → long reshape, ANSI syntax)",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI UNPIVOT over an aggregated wide table — identical syntax in
    Spark and DuckDB. Map-only reshape after a k-group aggregate."""
    register_tables(spark, sf_dir)
    return spark.sql(_UNPIVOT_SQL)


# VARIANT: Spark 4's semi-structured type — parse once, extract many.
_VARIANT_SPARK = """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(variant_get(parse_json(props), '$.k', 'bigint')) AS BIGINT)
             AS sum_k,
           CAST(MAX(variant_get(parse_json(props), '$.k', 'bigint')) AS BIGINT)
             AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""

_VARIANT_ORACLE = """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""


@query(
    "q_variant_json",
    oracle=_VARIANT_ORACLE,
    covers="§2.B VARIANT semi-structured type (parse_json + "
    "variant_get, Spark 4)",
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over fields extracted from the VARIANT-parsed props
    column — Spark 4's binary semi-structured encoding (parse once,
    typed extraction, no per-access string re-parse). At scale VARIANT
    columns also shred into parquet for pushdown; integer sums keep
    the oracle exact.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_VARIANT_SPARK)


# Error-safe arithmetic + lateral column aliases.
_TRY_SPARK = """
    SELECT o_orderkey,
           try_divide(o_totalprice, o_custkey) AS per_cust,
           try_cast(o_orderpriority AS INT) AS prio_int,
           o_totalprice * 2 AS doubled,
           doubled + 1 AS doubled_plus
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY o_orderkey
"""

_TRY_ORACLE = """
    SELECT o_orderkey,
           CASE WHEN o_custkey = 0 THEN NULL
                ELSE o_totalprice / o_custkey END AS per_cust,
           TRY_CAST(o_orderpriority AS INT) AS prio_int,
           o_totalprice * 2 AS doubled,
           doubled + 1 AS doubled_plus
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY o_orderkey
"""


@query(
    "q_try_arith",
    oracle=_TRY_ORACLE,
    covers="§2.B error-safe arithmetic (try_divide/try_cast) + lateral "
    "column aliases (Spark 3.4+)",
)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-on-error arithmetic (division by a zero key, non-numeric
    cast) plus a lateral column alias chain — both pure map
    expressions; `doubled + 1` reuses the projection, not a subquery.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_TRY_SPARK)
