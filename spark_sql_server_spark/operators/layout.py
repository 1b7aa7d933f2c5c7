"""Data-layout operators — multi-dimensional clustering for scan pruning.

At 100 TB the scan is the cost, and the scan is only cheap if files can
be *skipped*. Single-column sort keys prune one predicate dimension;
a Z-order (Morton) interleave of two keys gives every file a narrow
min/max range in BOTH dimensions, so parquet footer stats prune
selective predicates on either column (the technique behind Delta's
``OPTIMIZE ZORDER BY`` and Iceberg's z-ordered rewrites).

Everything here is pure integer/double arithmetic expressible
identically in Spark SQL and DuckDB — bit extraction via
``FLOOR(x / 2^i) % 2`` (exact: all operands ≪ 2^53) instead of
engine-specific shift operators — so the layout manifest is fully
oracle-certifiable. The physical write path (range-partition by zval →
one file per bucket) is exercised by tests/test_layout.py; its file
boundaries come from Spark's sampled RangePartitioner and are therefore
NOT certified (sampling is nondeterministic), while the certified
manifest uses fixed arithmetic buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import register_tables

_Z_BITS = 16  # 16 bits per dimension → 32-bit z-values
_Z_BUCKETS = 16


def _z_expr(a: str, b: str) -> str:
    """Morton interleave of two pre-scaled 16-bit keys, as portable SQL:
    bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(
            f"(CAST(FLOOR({a} / {1 << i}.0) AS BIGINT) % 2) * {1 << (2 * i + 1)}"
        )
        terms.append(
            f"(CAST(FLOOR({b} / {1 << i}.0) AS BIGINT) % 2) * {1 << (2 * i)}"
        )
    return " + ".join(terms)


#: Scale a key to the full 0..65535 domain so all 16 bits carry signal
#: (raw keys span only the low bits and every row would share bucket 0).
#: Exact-integer inputs through identical IEEE multiply/divide in both
#: engines → identical FLOOR.
def _scaled(col: str, mn: str, rng: str) -> str:
    return (
        f"CAST(FLOOR(({col} - {mn}) * 65535.0 / {rng}) AS BIGINT)"
    )


_ZORDER_SQL = f"""
    WITH ext AS (
      SELECT CAST(MIN(l_partkey) AS DOUBLE) AS pk_min,
             CAST(MAX(l_partkey) - MIN(l_partkey) AS DOUBLE) AS pk_rng,
             CAST(MIN(l_suppkey) AS DOUBLE) AS sk_min,
             CAST(MAX(l_suppkey) - MIN(l_suppkey) AS DOUBLE) AS sk_rng
      FROM lineitem
    ),
    z AS (
      SELECT l_partkey, l_suppkey,
             ({_z_expr(_scaled('l_partkey', 'pk_min', 'pk_rng'),
                       _scaled('l_suppkey', 'sk_min', 'sk_rng'))}) AS zval
      FROM lineitem CROSS JOIN ext
    ),
    bucketed AS (
      SELECT l_partkey, l_suppkey,
             CAST(FLOOR(zval / {(1 << (2 * _Z_BITS)) // _Z_BUCKETS}.0)
                  AS BIGINT) AS bucket
      FROM z
    )
    SELECT bucket, COUNT(*) AS n_rows,
           MIN(l_partkey) AS pk_lo, MAX(l_partkey) AS pk_hi,
           MIN(l_suppkey) AS sk_lo, MAX(l_suppkey) AS sk_hi
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
"""


@query(
    "q_zorder_layout",
    oracle=_ZORDER_SQL,
    covers="data layout: Z-order (Morton) multi-dimensional clustering "
    "manifest — per-bucket min/max footer stats narrow in BOTH key "
    "dimensions (OPTIMIZE ZORDER analogue)",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout manifest for lineitem on (l_partkey, l_suppkey).

    Each output row is what a file footer would advertise after a
    z-ordered rewrite: row count plus min/max of both clustering keys
    per bucket. Because the z-curve interleaves bits, every one of the
    {_Z_BUCKETS} fixed buckets spans ≤ half of each key's range —
    a predicate on EITHER key prunes ~half the buckets, where a
    single-key sort prunes only its own dimension (asserted in
    tests/test_layout.py against a lexicographic baseline). The whole
    computation is two scan-side projections and one 6-column hash
    aggregate keyed on the 4-bit bucket — no global sort anywhere; the
    physical rewrite path uses repartitionByRange(zval), tested
    separately because Spark samples range boundaries."""
    register_tables(spark, sf_dir)
    return spark.sql(_ZORDER_SQL)


def zorder_write(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """The physical rewrite: range-partition lineitem by zval and write
    one parquet file per partition (what OPTIMIZE ZORDER materializes).
    Kept out of the certified surface: RangePartitioner samples its
    boundaries, so file contents are only *statistically* stable."""
    register_tables(spark, sf_dir)
    z = spark.sql(
        f"""
        SELECT l.*,
               ({_z_expr(_scaled('l_partkey', 'pk_min', 'pk_rng'),
                         _scaled('l_suppkey', 'sk_min', 'sk_rng'))}) AS zval
        FROM lineitem l CROSS JOIN (
          SELECT CAST(MIN(l_partkey) AS DOUBLE) AS pk_min,
                 CAST(MAX(l_partkey) - MIN(l_partkey) AS DOUBLE) AS pk_rng,
                 CAST(MIN(l_suppkey) AS DOUBLE) AS sk_min,
                 CAST(MAX(l_suppkey) - MIN(l_suppkey) AS DOUBLE) AS sk_rng
          FROM lineitem) ext
        """
    )
    (
        z.repartitionByRange(_Z_BUCKETS, F.col("zval"))
        .drop("zval")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
