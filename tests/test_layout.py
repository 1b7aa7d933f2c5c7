"""Z-order layout: Morton-curve correctness, pruning advantage over a
single-key sort, and the physical range-partitioned write."""

from __future__ import annotations

import duckdb
import pytest

from spark_sql_server_spark.operators import REGISTRY
from spark_sql_server_spark.operators.layout import (
    _Z_BUCKETS,
    _z_expr,
    zorder_write,
)
from tests.conftest import SF_SMOKE


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


class TestMorton:
    def test_sql_interleave_matches_python(self):
        con = duckdb.connect()
        cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 64)]
        for a, b in cases:
            got = con.execute(f"SELECT {_z_expr(str(a), str(b))}").fetchone()[0]
            assert got == _py_morton(a, b), (a, b)

    def test_buckets_fix_top_bits_of_both_dims(self):
        # all z-values inside one of the 16 fixed buckets share their
        # top 4 bits, i.e. the top 2 bits of EACH dimension → each
        # bucket spans ≤ 1/4 of each scaled key domain
        width = (1 << 32) // _Z_BUCKETS
        for bucket in (0, 5, 15):
            lo, hi = bucket * width, (bucket + 1) * width - 1
            assert lo >> 28 == hi >> 28 == bucket


class TestManifest:
    def test_all_buckets_narrow_in_both_dims(self, spark):
        rows = REGISTRY["q_zorder_layout"].fn(spark, SF_SMOKE).collect()
        assert 2 <= len(rows) <= _Z_BUCKETS
        pk_rng = max(r["pk_hi"] for r in rows) - min(r["pk_lo"] for r in rows)
        sk_rng = max(r["sk_hi"] for r in rows) - min(r["sk_lo"] for r in rows)
        # z-order: every bucket narrow in BOTH dims (≤ ~half the range,
        # with slack for scaling granularity on small keys)
        for r in rows:
            assert r["pk_hi"] - r["pk_lo"] <= 0.6 * pk_rng
            assert r["sk_hi"] - r["sk_lo"] <= 0.6 * sk_rng
        # contrast: a single-key sort leaves the OTHER dim unclustered —
        # bucket by partkey quartile and suppkey spans stay ~full-range
        import collections

        data = spark.sql(
            "SELECT l_partkey, l_suppkey FROM lineitem"
        ).collect()
        pk_sorted = sorted(data, key=lambda r: r["l_partkey"])
        quarter = len(pk_sorted) // 4
        spans = []
        for q in range(4):
            chunk = pk_sorted[q * quarter : (q + 1) * quarter]
            sks = [r["l_suppkey"] for r in chunk]
            spans.append(max(sks) - min(sks))
        assert min(spans) > 0.6 * sk_rng  # single-key sort does NOT prune dim 2

    def test_row_total_preserved(self, spark):
        rows = REGISTRY["q_zorder_layout"].fn(spark, SF_SMOKE).collect()
        total = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
        assert sum(r["n_rows"] for r in rows) == total


class TestPhysicalWrite:
    def test_range_partitioned_files_cluster_both_dims(self, spark, tmp_path):
        out = str(tmp_path / "zorder")
        zorder_write(spark, SF_SMOKE, out)
        from pyspark.sql import functions as F

        per_file = (
            spark.read.parquet(out)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("l_partkey").alias("pk_lo"),
                F.max("l_partkey").alias("pk_hi"),
                F.min("l_suppkey").alias("sk_lo"),
                F.max("l_suppkey").alias("sk_hi"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        assert 2 <= len(per_file) <= _Z_BUCKETS
        pk_rng = max(r["pk_hi"] for r in per_file) - min(r["pk_lo"] for r in per_file)
        sk_rng = max(r["sk_hi"] for r in per_file) - min(r["sk_lo"] for r in per_file)
        narrow_pk = sum(1 for r in per_file if r["pk_hi"] - r["pk_lo"] <= 0.7 * pk_rng)
        narrow_sk = sum(1 for r in per_file if r["sk_hi"] - r["sk_lo"] <= 0.7 * sk_rng)
        # sampled range boundaries wobble, so assert bulk behavior, not
        # exact per-file bounds
        assert narrow_pk >= len(per_file) - 2
        assert narrow_sk >= len(per_file) - 2
