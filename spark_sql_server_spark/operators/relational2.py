"""Relational coverage, part 2 — expression-level §2.B rows: predicate
forms, array/map/struct functions, JSON, interval arithmetic, bitwise
operators, misc null-handling. Each is a thin oracle-checked query; the
operators themselves are Spark built-ins (the reference delegates all
of these identically)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import register_tables

_PREDICATES_SQL = """
    SELECT o_orderkey,
           o_totalprice BETWEEN 50000 AND 150000 AS in_band,
           o_orderstatus IN ('O', 'P') AS is_open_or_pending,
           o_orderpriority LIKE '%URGENT' AS is_urgent,
           o_orderpriority LIKE '1!%%' ESCAPE '!' AS starts_one_percent,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END
             IS NULL AS forced_null,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END
             IS NOT DISTINCT FROM 'O' AS null_safe_open
    FROM orders
    ORDER BY o_orderkey
"""


@query(
    "q_predicates",
    oracle=_PREDICATES_SQL,
    covers="§2.B BETWEEN / IN / LIKE ESCAPE / IS NULL / IS [NOT] DISTINCT FROM",
)
def q_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_PREDICATES_SQL)


_ARRAY_SQL = """
    SELECT n_nationkey,
           array_join(sort_array(array(n_name, r_name)), '|') AS pair,
           element_at(array(n_nationkey, n_regionkey), 1) AS first_elem,
           array_contains(array(0, 2, 4), n_regionkey) AS in_even,
           size(sequence(1, n_regionkey + 1)) AS seq_len,
           array_join(slice(sequence(1, 5), 2, 3), ',') AS sliced
    FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY n_nationkey
"""

_ARRAY_ORACLE = """
    SELECT n_nationkey,
           array_to_string(list_sort([n_name, r_name]), '|') AS pair,
           [n_nationkey, n_regionkey][1] AS first_elem,
           list_contains([0, 2, 4], n_regionkey) AS in_even,
           CAST(len(generate_series(1, n_regionkey + 1)) AS INT) AS seq_len,
           array_to_string(generate_series(1, 5)[2:4], ',') AS sliced
    FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY n_nationkey
"""


@query(
    "q_array_funcs",
    oracle=_ARRAY_ORACLE,
    covers="§2.B array constructors/access/slice/contains/sort",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_ARRAY_SQL)


_STRUCT_MAP_SQL = """
    SELECT n_nationkey,
           named_struct('name', n_name, 'region', n_regionkey).name AS s_name,
           map('key', n_nationkey, 'region', n_regionkey)['region'] AS m_region,
           struct(n_nationkey, n_name).n_name AS tuple_name
    FROM nation
    ORDER BY n_nationkey
"""

_STRUCT_MAP_ORACLE = """
    SELECT n_nationkey,
           struct_pack(name := n_name, region := n_regionkey).name AS s_name,
           map(['key', 'region'], [n_nationkey, n_regionkey])['region'][1] AS m_region,
           struct_pack(n_nationkey := n_nationkey, n_name := n_name).n_name AS tuple_name
    FROM nation
    ORDER BY n_nationkey
"""


@query(
    "q_struct_map",
    oracle=_STRUCT_MAP_ORACLE,
    covers="§2.B struct/map constructors + field/key access",
)
def q_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_STRUCT_MAP_SQL)


_JSON_SQL = """
    SELECT event_id,
           from_json(props, 'k BIGINT').k AS k_typed,
           to_json(named_struct('id', event_id, 'type', event_type)) AS packed
    FROM events
    WHERE event_type = 'signup'
    ORDER BY event_id
"""

_JSON_ORACLE = """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           '{"id":' || CAST(event_id AS VARCHAR) || ',"type":"' || event_type || '"}'
             AS packed
    FROM events
    WHERE event_type = 'signup'
    ORDER BY event_id
"""


@query(
    "q_json_funcs",
    oracle=_JSON_ORACLE,
    covers="§2.B from_json / to_json / get_json_object",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_JSON_SQL)


_INTERVAL_SQL = """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 DAY AS TIMESTAMP) AS plus_3d,
           CAST(o_orderdate - INTERVAL 1 MONTH AS TIMESTAMP) AS minus_1mo,
           datediff(TIMESTAMP '2001-01-01 00:00:00', o_orderdate) AS days_to_2001
    FROM orders
    WHERE o_orderkey <= 50
    ORDER BY o_orderkey
"""

_INTERVAL_ORACLE = """
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 DAY AS plus_3d,
           o_orderdate - INTERVAL 1 MONTH AS minus_1mo,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2001-01-01 00:00:00') AS INT)
             AS days_to_2001
    FROM orders
    WHERE o_orderkey <= 50
    ORDER BY o_orderkey
"""


@query(
    "q_interval_arith",
    oracle=_INTERVAL_ORACLE,
    covers="§2.B interval literals + date arithmetic, datediff",
)
def q_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_INTERVAL_SQL)


_NULL_FUNCS_SQL = """
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_or_default,
           GREATEST(o_totalprice, 100000.0) AS floored,
           LEAST(CAST(o_orderkey AS DOUBLE), o_totalprice) AS smaller,
           IFNULL(NULLIF(o_orderkey % 3, 0), -1) AS mod_or_neg
    FROM orders
    WHERE o_orderkey <= 60
    ORDER BY o_orderkey
"""

_NULL_FUNCS_ORACLE = """
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_or_default,
           GREATEST(o_totalprice, 100000.0) AS floored,
           LEAST(CAST(o_orderkey AS DOUBLE), o_totalprice) AS smaller,
           COALESCE(NULLIF(o_orderkey % 3, 0), -1) AS mod_or_neg
    FROM orders
    WHERE o_orderkey <= 60
    ORDER BY o_orderkey
"""


@query(
    "q_null_funcs",
    oracle=_NULL_FUNCS_ORACLE,
    covers="§2.B null propagation: coalesce/nullif/ifnull/greatest/least",
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_NULL_FUNCS_SQL)


_BITWISE_SQL = """
    SELECT n_nationkey,
           n_nationkey & 12 AS band,
           n_nationkey | 1 AS bor,
           CAST(n_nationkey ^ 5 AS INT) AS bxor,
           shiftleft(n_nationkey, 2) AS shl,
           shiftright(n_nationkey, 1) AS shr
    FROM nation
    ORDER BY n_nationkey
"""

_BITWISE_ORACLE = """
    SELECT n_nationkey,
           n_nationkey & 12 AS band,
           n_nationkey | 1 AS bor,
           CAST(xor(n_nationkey, 5) AS INT) AS bxor,
           CAST(n_nationkey << 2 AS INT) AS shl,
           CAST(n_nationkey >> 1 AS INT) AS shr
    FROM nation
    ORDER BY n_nationkey
"""


@query(
    "q_bitwise",
    oracle=_BITWISE_ORACLE,
    covers="§2.B bitwise operators",
)
def q_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_BITWISE_SQL)


_CORR_SQL = """
    SELECT l_returnflag,
           -- negative-capable value: FLOOR(x*1e6+0.5)/1e6 is half-up
           -- toward +inf for negatives — consistent across engines,
           -- which is all the hash gate needs (ROUND(double,6) is not)
           CAST(FLOOR((n * sxy - sx * sy)
                      / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
                      * 1000000 + 0.5) AS DOUBLE) / 1000000.0
             AS corr_qty_price
    FROM (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    ) m
    ORDER BY l_returnflag
"""


@query(
    "q_corr",
    oracle=_CORR_SQL,
    covers="§2.B correlation / covariance family via exact moment sums",
)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from decimal-exact moment sums — the
    engine-reproducible spelling of corr() (native corr's float
    accumulation order is engine-specific). One aggregation pass;
    moments are associative so partial aggregation holds at any scale."""
    register_tables(spark, sf_dir)
    return spark.sql(_CORR_SQL)


_DISTINCT_ON_PG = """
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
"""


@query(
    "q_distinct_on",
    oracle=_DISTINCT_ON_PG,  # DuckDB supports DISTINCT ON natively
    covers="PG dialect: SELECT DISTINCT ON → row_number rewrite (§2.A16 family)",
)
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG's DISTINCT ON through the dialect rewriter (Spark has no such
    operator — rewritten to a row_number window + filter); the oracle is
    DuckDB's native DISTINCT ON, so the rewrite's semantics are checked
    against a real implementation."""
    from spark_sql_server_spark.dialect.rewriter import rewrite_sql

    register_tables(spark, sf_dir)
    return spark.sql(rewrite_sql(_DISTINCT_ON_PG))


_STRING_AGG_SQL = """
    SELECT n_regionkey,
           string_agg(n_name, ',') AS nations
    FROM (SELECT n_regionkey, n_name FROM nation ORDER BY n_name)
    GROUP BY n_regionkey
    ORDER BY n_regionkey
"""

_STRING_AGG_ORACLE = """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
"""


@query(
    "q_string_agg",
    oracle=_STRING_AGG_ORACLE,
    covers="§2.B ordered string aggregation (PG string_agg)",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG's string_agg — Spark 4 has it natively; element order pinned
    by pre-sorting (Spark) / ORDER BY inside the aggregate (DuckDB)."""
    register_tables(spark, sf_dir)
    return spark.sql(_STRING_AGG_SQL)


_APPROX_DISTINCT_ORACLE = """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           true AS approx_ok,
           true AS median_rank_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query(
    "q_approx_distinct",
    oracle=_APPROX_DISTINCT_ORACLE,
    covers="§2.B approximate aggregates: approx_count_distinct / "
    "percentile_approx, certified via exact quantities + guarantee "
    "booleans (sk_* pattern)",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates — the only sane distinct-count at 100 TB
    (HLL merges are associative; exact distinct shuffles every value).

    Certification follows the sketches.py pattern: the sketch values
    themselves are engine-specific, so the driver row carries the exact
    quantities plus booleans computed IN SPARK from the sketch outputs —
    HLL within 3× its configured relative error, and the approx median's
    true rank inside [0.4, 0.6] (percentile_approx guarantees rank error
    ≤ 1/accuracy = 1e-4, so the band holds with huge slack). The raw
    estimate accuracy is pinned tighter in pytest
    (tests/test_llm_ops.py::TestApproxAggregates)."""
    from pyspark.sql import functions as F

    from spark_sql_server_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.percentile_approx("l_quantity", 0.5).alias("approx_median"),
    )
    # rank of the returned median within its group — one extra pass,
    # broadcast of the 3-row agg result back onto the fact scan
    ranked = (
        li.select("l_returnflag", "l_quantity")
        .join(F.broadcast(agg), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("approx_parts").alias("approx_parts"),
            F.first("exact_parts").alias("exact_parts"),
            (
                F.sum(
                    F.when(
                        F.col("l_quantity") <= F.col("approx_median"), 1
                    ).otherwise(0)
                )
                / F.count("*")
            ).alias("med_frac"),
        )
    )
    return ranked.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.15 * F.col("exact_parts")
        ).alias("approx_ok"),
        F.col("med_frac").between(0.4, 0.6).alias("median_rank_ok"),
    ).orderBy("l_returnflag")


_UNION_BY_NAME_SQL_ORACLE = """
    SELECT k, v, extra FROM (
      SELECT n_nationkey AS k, n_name AS v, NULL AS extra FROM nation
      UNION ALL
      SELECT r_regionkey AS k, r_name AS v, 'region' AS extra FROM region
    ) t
    ORDER BY k, v
"""


@query(
    "q_union_by_name",
    oracle=_UNION_BY_NAME_SQL_ORACLE,
    covers="§2.B unionByName with allowMissingColumns (schema-evolving union)",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-name-aligned union with missing-column fill — the schema
    evolution primitive for appending heterogeneous batches."""
    from pyspark.sql import functions as F

    from spark_sql_server_spark.session import load_table

    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("v")
    )
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k"),
        F.col("r_name").alias("v"),
        F.lit("region").alias("extra"),
    )
    return nation.unionByName(region, allowMissingColumns=True).orderBy("k", "v")


_TIME_RANGE_SQL = """
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS events_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS value_last_hour
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts, event_id
"""


@query(
    "q_window_time_range",
    oracle=_TIME_RANGE_SQL,
    covers="§2.B RANGE frames with interval bounds (sliding time window)",
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding one-hour window per user over event time — the batch
    form of a sliding stream window. One shuffle on user_id; the frame
    is evaluated by a moving pointer over the sorted partition, O(n)
    per user."""
    register_tables(spark, sf_dir)
    return spark.sql(_TIME_RANGE_SQL)


_POSEXPLODE_SQL = """
    SELECT doc_id, CAST(pos AS INT) AS pos, word
    FROM (SELECT doc_id, posexplode(split(text, ' ')) AS (pos, word)
          FROM documents WHERE doc_id < 5)
    ORDER BY doc_id, pos
"""

_POSEXPLODE_ORACLE = """
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, words[i] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents WHERE doc_id < 5) t,
         unnest(generate_series(1, len(words))) u(i)
    ORDER BY doc_id, pos
"""


@query(
    "q_posexplode",
    oracle=_POSEXPLODE_ORACLE,
    covers="§2.B posexplode (ordinal-preserving UDTF)",
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_POSEXPLODE_SQL)


_EXPLODE_OUTER_SQL = """
    SELECT n_nationkey, tok
    FROM nation
    LATERAL VIEW OUTER explode(
      CASE WHEN n_nationkey % 2 = 0 THEN split(n_name, '_')
           ELSE array() END) t AS tok
    WHERE n_nationkey < 6
    ORDER BY n_nationkey, tok NULLS FIRST
"""

_EXPLODE_OUTER_ORACLE = """
    SELECT n_nationkey, u.tok
    FROM nation LEFT JOIN LATERAL (
      SELECT unnest(CASE WHEN n_nationkey % 2 = 0
                         THEN string_split(n_name, '_') ELSE [] END) AS tok
    ) u ON true
    WHERE n_nationkey < 6
    ORDER BY n_nationkey, u.tok NULLS FIRST
"""


@query(
    "q_explode_outer",
    oracle=_EXPLODE_OUTER_ORACLE,
    covers="§2.B LATERAL VIEW OUTER (null row for empty arrays)",
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_EXPLODE_OUTER_SQL)


_MINMAX_BY_SQL = """
    SELECT o_custkey,
           MAX_BY(o_orderkey, o_totalprice) AS biggest_order,
           MIN_BY(o_orderkey, o_totalprice) AS smallest_order,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
"""

_MINMAX_BY_ORACLE = """
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
"""


@query(
    "q_minmax_by",
    oracle=_MINMAX_BY_ORACLE,
    covers="§2.B min_by/max_by (argmin/argmax aggregates)",
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_MINMAX_BY_SQL)


_ORDINAL_SQL = """
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    GROUP BY 1
    ORDER BY 2 DESC, 1
"""


@query(
    "q_ordinals",
    oracle=_ORDINAL_SQL,
    covers="§2.B GROUP BY / ORDER BY ordinal",
)
def q_ordinals(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_ORDINAL_SQL)


_MATH_SQL = """
    SELECT l_orderkey, l_linenumber,
           -- micro-space rounding: ROUND(quotient, n) is cross-engine
           -- unsafe (see relational.round6); FLOOR form is identical
           -- IEEE ops in Spark and DuckDB
           CAST(FLOOR(l_extendedprice / l_quantity * 10000 + 0.5)
                AS DOUBLE) / 10000.0 AS unit_price,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct,
           ABS(l_quantity - 25.0) AS dist_from_25,
           CAST(l_quantity AS INT) % 7 AS qty_mod,
           POWER(2.0, CAST(l_linenumber AS DOUBLE)) AS pow2,
           SQRT(l_quantity) AS root_qty
    FROM lineitem
    WHERE l_orderkey <= 30
    ORDER BY l_orderkey, l_linenumber
"""

_MATH_ORACLE = """
    SELECT l_orderkey, l_linenumber,
           -- micro-space rounding: ROUND(quotient, n) is cross-engine
           -- unsafe (see relational.round6); FLOOR form is identical
           -- IEEE ops in Spark and DuckDB
           CAST(FLOOR(l_extendedprice / l_quantity * 10000 + 0.5)
                AS DOUBLE) / 10000.0 AS unit_price,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct,
           ABS(l_quantity - 25.0) AS dist_from_25,
           CAST(l_quantity AS INT) % 7 AS qty_mod,
           POWER(2.0, CAST(l_linenumber AS DOUBLE)) AS pow2,
           SQRT(l_quantity) AS root_qty
    FROM lineitem
    WHERE l_orderkey <= 30
    ORDER BY l_orderkey, l_linenumber
"""


@query(
    "q_math_funcs",
    oracle=_MATH_ORACLE,
    covers="§2.B math functions / operators / div-mod",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_MATH_SQL)


_CSV_FUNC_SQL = """
    SELECT n_nationkey,
           from_csv(CAST(n_nationkey AS STRING) || ',' || n_name,
                    'id INT, name STRING').name AS parsed_name,
           to_csv(named_struct('a', n_nationkey, 'b', n_name)) AS packed
    FROM nation
    ORDER BY n_nationkey
"""

_CSV_FUNC_ORACLE = """
    SELECT n_nationkey,
           n_name AS parsed_name,
           CAST(n_nationkey AS VARCHAR) || ',' || n_name AS packed
    FROM nation
    ORDER BY n_nationkey
"""


@query(
    "q_csv_funcs",
    oracle=_CSV_FUNC_ORACLE,
    covers="§2.B from_csv / to_csv",
)
def q_csv_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_CSV_FUNC_SQL)
