"""Physical-layout helpers: bucketing, partitioning, skew salting.

These are the three levers that remove or survive shuffles at 100 TB:

* **Bucketing** — write both join sides bucketed+sorted on the join key
  and Spark's planner elides the exchange entirely (SortMergeJoin with
  zero Exchange operators). Pay one shuffle at write time, join free
  forever after.
* **Partitioned layout** — directory partitioning on a low-cardinality
  filter column → partition pruning at the scan.
* **Salting** — for skewed keys, explode the small side over a salt
  domain and randomize the big side's salt so one hot key spreads over
  N reducers; AQE's skew-join handles moderate skew, salting handles
  the pathological tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Save as a bucketed (+sorted) table — managed, or external when
    ``path`` is given (for callers whose session warehouse dir is not
    theirs to write, e.g. the driver-owned correctness session).

    Both sides of a recurring equi-join written with the same
    (num_buckets, bucket_cols) join with NO exchange — check the plan
    with :func:`assert` in tests/test_layout.py.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog forgets tables across processes but the
    # warehouse dir does not — clear any orphaned location
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[5:]
    if warehouse and path is None:
        shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Directory-partitioned parquet — filters on partition_cols prune
    whole directories at the scan (PartitionFilters in the plan)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, explode the small side.

    The big side gets a uniform random salt in [0, salt_buckets); the
    small side is replicated once per salt value. The join key becomes
    (key, salt), so a hot key's rows spread over `salt_buckets`
    reducers instead of melting one. Cost: small side × salt_buckets —
    use only when the small side is genuinely small or the skew is
    pathological.
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    salted_small = small.withColumn("__salt", salts)
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
