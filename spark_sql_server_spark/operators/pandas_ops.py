"""Pandas-UDF-backed operators (§2.B UDAF surface + grouped-map).

The reference exposes UDAF via Spark jars (PgJdbcSuite ADD JAR tests);
the PySpark-native equivalents are Arrow-batched pandas UDFs. These are
the *slow path* by design — used only where built-in expressions can't
express the semantics; both examples here exist to prove the surface
(each has an exact-SQL oracle so the Arrow boundary is verified too).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, PandasUDFType

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table

_WAVG_ORACLE = """
    SELECT l_returnflag,
           -- FLOOR micro-space rounding, mirrored exactly by the UDF
           -- (math.floor over the same IEEE quotient) — ROUND of a
           -- quotient is the documented cross-engine trap
           FLOOR(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6)))
                 AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0
             AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@query(
    "p_pandas_udaf",
    oracle=_WAVG_ORACLE,
    covers="§2.B UDAF surface: pandas GROUPED_AGG (quantity-weighted avg price)",
)
def p_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average via a pandas grouped-agg UDF.

    Determinism across the Arrow boundary: the UDF reduces with exact
    integer-scaled arithmetic (cents × centi-units) so the result is
    bit-identical to the decimal-SQL oracle, not merely close.
    """

    import math

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        # exact: scale to int64 micro-units, like DECIMAL(38,6); final
        # rounding in FLOOR micro-space (Python round() is banker's —
        # not the oracle's rule)
        num = int((price * qty * 1_000_000).round().astype("int64").sum())
        den = int((qty * 1_000_000).round().astype("int64").sum())
        q = (num / 1_000_000) / (den / 1_000_000)
        return math.floor(q * 1_000_000 + 0.5) / 1_000_000

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(wavg("l_extendedprice", "l_quantity").alias("wavg_price"))
        .orderBy("l_returnflag")
    )


_UDTF_ORACLE = """
    SELECT n_nationkey, word, CAST(length(word) AS INT) AS n
    FROM (SELECT n_nationkey, unnest(string_split(n_name, '_')) AS word
          FROM nation) t
    WHERE n_nationkey < 5
    ORDER BY n_nationkey, word
"""


@query(
    "p_python_udtf",
    oracle=_UDTF_ORACLE,
    covers="§2.B UDTF surface: Python UDTF via LATERAL join",
)
def p_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+) joined laterally — the PySpark-native
    equivalent of the reference's ADD JAR + LATERAL VIEW udtf tests
    (PgJdbcSuite.scala:1050-1101)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, n: int")
    class SplitWords:
        def eval(self, text: str):
            for w in text.split("_"):
                yield w, len(w)

    spark.udtf.register("split_words", SplitWords)
    from spark_sql_server_spark.session import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """SELECT n_nationkey, s.word, s.n
           FROM nation, LATERAL split_words(n_name) s
           WHERE n_nationkey < 5
           ORDER BY n_nationkey, word"""
    )


_ZSCORE_ORACLE = """
    WITH stats AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s2,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           -- FLOOR micro-space rounding (mirrored by np.floor in the
           -- UDF); z is negative-capable — FLOOR(x*1e6+0.5) is half-up
           -- toward +inf, consistently in both engines
           FLOOR((l.l_quantity - s.s1 / s.n)
                 / SQRT(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n))
                 * 1000000 + 0.5) / 1000000.0 AS qty_z
    FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
    WHERE l.l_orderkey <= 100
    ORDER BY l.l_orderkey, l.l_linenumber
"""


@query(
    "p_grouped_map_zscore",
    oracle=_ZSCORE_ORACLE,
    covers="§2.B grouped-map surface: applyInPandas per-group normalization",
)
def p_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization via applyInPandas.

    The whole group streams through one Arrow batch per partition-group;
    moments are computed with exact integer-scaled sums so the oracle
    (decimal-sum SQL) reproduces the values bit-for-bit after 6dp
    rounding. Scale: state is O(1) per group; groups are
    hash-partitioned — the standard normalize-features step of a
    training pipeline.
    """
    out_schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("qty_z", T.DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["l_quantity"]
        n = float(len(q))
        s1 = int((q * 1_000_000).round().astype("int64").sum()) / 1_000_000
        s2 = int((q * q * 1_000_000).round().astype("int64").sum()) / 1_000_000
        mean = s1 / n
        var = s2 / n - mean * mean
        # FLOOR micro-space, same IEEE op order as the oracle SQL
        # (np .round(6) is half-even — not the oracle's rule)
        import numpy as np

        z = np.floor((q - mean) / (var ** 0.5) * 1_000_000 + 0.5) / 1_000_000
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "l_returnflag": pdf["l_returnflag"],
                "qty_z": z,
            }
        )

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .applyInPandas(zscore, schema=out_schema)
        .filter(F.col("l_orderkey") <= 100)
        .orderBy("l_orderkey", "l_linenumber")
    )
