"""Physical-plan assertions — the 100 TB design gate.

Correctness tests prove the operators work on small data; these prove
the *plans* are the ones that survive scale-up: filters pushed to the
parquet scan, column pruning, dimension broadcasts, top-k as
TakeOrderedAndProject (per-partition heaps), no accidental
cartesian/nested-loop joins on the fact path.
"""

from __future__ import annotations

import pytest

from spark_sql_server_spark.operators import REGISTRY
from spark_sql_server_spark.plans import executed_plan
from spark_sql_server_spark.plans.inspect import (
    join_strategies,
    optimized_plan,
    pushed_filters,
    read_schemas,
)
from tests.conftest import SF_CORRECT


def plan_of(spark, name: str) -> str:
    return executed_plan(REGISTRY[name].fn(spark, SF_CORRECT))


def optimized_of(spark, name: str) -> str:
    return optimized_plan(REGISTRY[name].fn(spark, SF_CORRECT))


class TestInspectHelpers:
    def test_pushed_filters_and_read_schema(self, spark):
        df = REGISTRY["q1_pricing_summary"].fn(spark, SF_CORRECT)
        pf = pushed_filters(df)
        assert any("l_shipdate" in f for f in pf)
        rs = read_schemas(df)
        assert rs and all("l_partkey" not in s for s in rs)

    def test_join_strategies(self, spark):
        df = REGISTRY["q5_region_revenue"].fn(spark, SF_CORRECT)
        strategies = join_strategies(df)
        assert strategies.count("BroadcastHashJoin") >= 4
        assert "CartesianProduct" not in strategies


class TestPushdownAndPruning:
    def test_q1_filter_pushed_to_scan(self, spark):
        plan = plan_of(spark, "q1_pricing_summary")
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan

    def test_q1_column_pruning(self, spark):
        plan = plan_of(spark, "q1_pricing_summary")
        read = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
        # 7 needed columns only — never the full 11-column row
        assert "l_orderkey" not in read and "l_partkey" not in read

    def test_q3_selective_filters_pushed(self, spark):
        plan = plan_of(spark, "q3_shipping_priority")
        assert "EqualTo(c_mktsegment,BUILDING)" in plan
        assert plan.count("PushedFilters") >= 3  # all three scans filtered

    def test_text_stats_reads_minimum(self, spark):
        plan = plan_of(spark, "t_text_stats")
        read = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
        assert "lang" not in read and "source" not in read


class TestJoinStrategies:
    def test_q3_broadcasts_customer(self, spark):
        plan = plan_of(spark, "q3_shipping_priority")
        assert "BroadcastHashJoin" in plan

    def test_q5_all_dims_broadcast(self, spark):
        plan = plan_of(spark, "q5_region_revenue")
        # 4 dimension joins broadcast; the only shuffle join is fact-fact
        assert plan.count("BroadcastHashJoin") >= 4
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_q2_semi_join_not_expanded(self, spark):
        plan = plan_of(spark, "q2_order_priority")
        assert "LeftSemi" in plan

    def test_theta_join_uses_equi_anchor(self, spark):
        # non-equi predicate must ride a hash join on the equality, not
        # force a nested-loop cross product
        plan = plan_of(spark, "q_theta_join")
        assert "CartesianProduct" not in plan
        assert "Join" in plan

    def test_ann_bruteforce_map_only_scoring(self, spark):
        plan = plan_of(spark, "s_ann_bruteforce")
        # r12: scoring is one Arrow-batched corpus pass against the
        # sc.broadcast query set — no join of the corpus side at all
        assert "MapInPandas" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan


class TestTopKAndAgg:
    def test_q3_topk_is_take_ordered(self, spark):
        plan = plan_of(spark, "q3_shipping_priority")
        assert "TakeOrderedAndProject" in plan  # heap top-k, no global sort

    def test_q1_partial_aggregation(self, spark):
        plan = plan_of(spark, "q1_pricing_summary")
        # two-phase agg: map-side partial before the shuffle
        assert plan.count("HashAggregate") >= 2

    def test_dedup_exact_single_shuffle(self, spark):
        plan = plan_of(spark, "d_dedup_exact")
        # one exchange for the window partition (+ optional final sort)
        body = plan.split("AdaptiveSparkPlan")[-1]
        assert body.count("Exchange") <= 3


class TestNoDriverCollect:
    @pytest.mark.parametrize(
        "name", ["q1_pricing_summary", "q5_region_revenue", "d_minhash_lsh"]
    )
    def test_no_local_relation_on_fact_path(self, spark, name):
        # a LocalTableScan of real data in the optimized plan would mean
        # something got collected to the driver and re-parallelized
        opt = optimized_of(spark, name)
        assert "LocalRelation" not in opt or "planes" in opt


class TestScaleReworks:
    """Plans for the two r1 scale-killers, reworked in r2."""

    def test_pack_contexts_window_is_shard_partitioned(self, spark):
        plan = plan_of(spark, "t_pack_contexts")
        # the heavy running-sum window must be partitioned by shard
        assert "hashpartitioning(shard" in plan
        # the only single-partition exchange feeds the per-shard offsets
        # window (one row per shard — constant size at any corpus scale)
        body = plan.split("AdaptiveSparkPlan")[-1]
        assert body.count("Exchange SinglePartition") <= 1

    def test_embedding_neardup_no_cartesian(self, spark):
        plan = plan_of(spark, "d_embedding_neardup")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # candidate generation is a hash shuffle on (tbl, bucket)
        assert "hashpartitioning(tbl" in plan

    def test_ann_fused_single_pass_no_join(self, spark):
        """s_ann_lsh / s_ann_ivf broadcast the constant-size query set
        (and codebook) as numpy and score in one map-only corpus pass —
        the executed plan must contain no join at all; the only shuffle
        feeds the per-query top-k window over scored triples."""
        for name in ("s_ann_lsh", "s_ann_ivf"):
            plan = plan_of(spark, name)
            assert "Join" not in plan, name
            body = plan.split("AdaptiveSparkPlan")[-1]
            assert body.count("Exchange") <= 2, name  # window + final sort

    def test_minhash_only_shuffle_is_bucket_join(self, spark):
        plan = plan_of(spark, "d_minhash_lsh")
        # signatures are checkpointed once (Scan ExistingRDD), so the
        # mapInPandas signature pass never re-runs per join side
        assert "MapInPandas" not in plan
        assert plan.count("Scan ExistingRDD") == 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestTpchWave2:
    """Plan gates for the round-3 advanced TPC-H shapes."""

    def test_q7_dims_broadcast_no_cartesian(self, spark):
        plan = plan_of(spark, "q7_nation_trade")
        assert plan.count("BroadcastHashJoin") >= 3  # supplier + 2× nation
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_q9_part_filter_pushed_and_broadcast(self, spark):
        plan = plan_of(spark, "q9_product_profit")
        # LIKE '%red%' → StringContains pushed into the part scan
        assert "StringContains(p_name,red)" in plan
        assert plan.count("BroadcastHashJoin") >= 3  # part, supplier, nation

    def test_q10_topk_take_ordered(self, spark):
        plan = plan_of(spark, "q10_returned_items")
        assert "TakeOrderedAndProject" in plan
        assert "EqualTo(l_returnflag,R)" in plan  # fact filter at the scan

    def test_q16_anti_join_broadcast(self, spark):
        plan = plan_of(spark, "q16_supplier_cnt")
        assert "BroadcastHashJoin" in plan
        assert "LeftAnti" in plan
        # brand/type/size predicates pushed to the part scan (the full
        # IN-list is elided by plan-string truncation)
        assert "Not(EqualTo(p_brand,Brand#1))" in plan

    def test_q18_semi_join_same_key(self, spark):
        plan = plan_of(spark, "q18_large_orders")
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan

    def test_q21_exists_decorrelated_to_joins(self, spark):
        # both correlated subqueries must decorrelate: semi + anti join
        # on l_orderkey, no per-row subquery nodes
        plan = plan_of(spark, "q21_last_shipper")
        assert "LeftSemi" in plan or "ExistenceJoin" in plan
        assert "LeftAnti" in plan
        assert "CartesianProduct" not in plan

    def test_q6_all_predicates_at_scan(self, spark):
        df = REGISTRY["q6_forecast_revenue"].fn(spark, SF_CORRECT)
        # every predicate must reach the parquet reader (the plan string
        # truncates PushedFilters, so use the inspector)
        pf = " ".join(pushed_filters(df))
        assert "GreaterThanOrEqual(l_shipdate" in pf
        assert "GreaterThanOrEqual(l_discount,0.05)" in pf
        assert "LessThan(l_quantity,24.0)" in pf
        assert "Join" not in plan_of(spark, "q6_forecast_revenue")

    def test_salted_join_keys_include_salt(self, spark):
        # the join must run as a shuffle join keyed on (key, salt) —
        # a broadcast would make the salting demo vacuous
        plan = plan_of(spark, "q_salted_join")
        assert "SortMergeJoin" in plan
        assert "__salt" in plan
        assert "CartesianProduct" not in plan

    def test_asof_join_is_join_free(self, spark):
        # the union+window formulation must contain NO join node — the
        # scale property that kills per-probe fan-out
        plan = plan_of(spark, "q_asof_join")
        assert "Join" not in plan
        assert "Window" in plan

    def test_range_join_binned_no_nested_loop(self, spark):
        # the bin rewrite must keep the range join out of nested-loop
        # territory — left join on the bin key plus bounds re-check
        plan = plan_of(spark, "q_range_join")
        assert "CartesianProduct" not in plan
        body = plan.split("AdaptiveSparkPlan")[-1]
        assert "BroadcastNestedLoopJoin" not in body

    def test_bucketed_join_elides_join_exchanges(self, spark):
        # gate the pre-checkpoint plan: the registered operator
        # materializes eagerly then drops its tables/dirs (leak fix),
        # so its returned DF is a checkpoint scan — the builder exposes
        # the actual executed join plan
        import shutil

        from spark_sql_server_spark.operators.relational3 import (
            _bucketed_join_build,
        )

        joined, tables, dirs = _bucketed_join_build(spark, SF_CORRECT)
        try:
            plan = executed_plan(joined)
            assert "SortMergeJoin" in plan
            body = plan.split("AdaptiveSparkPlan")[-1]
            # matching bucket specs → no exchange feeds the join; the
            # only shuffles left are the final rollup + its output sort
            assert body.count("Exchange") <= 2, body
            assert "SelectedBucketsCount: 8 out of 8" in plan
        finally:
            for t in tables:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            for d in dirs:
                shutil.rmtree(d, ignore_errors=True)

    def test_bucketed_join_cleans_up(self, spark):
        # leak regression gate: the registered operator must leave no
        # metastore tables and no /tmp projection dirs behind, and its
        # (checkpointed) result must still be collectable afterwards
        import glob

        before = set(glob.glob("/tmp/bkt-*"))
        tables_before = {t.name for t in spark.catalog.listTables()}
        df = REGISTRY["q_bucketed_join"].fn(spark, SF_CORRECT)
        assert len(df.collect()) > 0
        assert set(glob.glob("/tmp/bkt-*")) == before
        assert {t.name for t in spark.catalog.listTables()} == tables_before

    def test_q8_snowflake_dims_broadcast(self, spark):
        plan = plan_of(spark, "q8_market_share")
        # part, region, both nation roles, supplier all broadcast; the
        # only shuffles are the two fact joins
        assert plan.count("BroadcastHashJoin") >= 5
        assert "EqualTo(p_type,ECONOMY)" in plan
        assert "CartesianProduct" not in plan

    def test_q11_semi_filter_and_scalar_broadcast(self, spark):
        plan = plan_of(spark, "q11_important_parts")
        # r12: the semi-joined fact pass aggregates ONCE into a
        # checkpointed per-part frame (the LeftSemi runs inside the
        # checkpoint); cutoff + filter read the materialized rows.
        # The one-row cutoff joins as a broadcast nested loop (no
        # key), but never a shuffled cartesian
        assert "ExistingRDD" in plan
        assert plan.count("Scan parquet") == 0
        assert "CartesianProduct" not in plan

    def test_q12_date_filter_pushed(self, spark):
        plan = plan_of(spark, "q12_priority_lines")
        assert "GreaterThanOrEqual(l_shipdate" in plan
        assert "CartesianProduct" not in plan

    def test_q19_disjunction_stays_hash_join(self, spark):
        # the OR brackets must not break the equi-join extraction
        plan = plan_of(spark, "q19_bracket_revenue")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_q13_outer_join_preserved_filter_pushed(self, spark):
        plan = plan_of(spark, "q13_customer_distribution")
        # the priority predicate must hit the orders SCAN (pre-join),
        # never post-join where it would drop NULL-extended customers
        assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan
        assert "LeftOuter" in plan
        assert "CartesianProduct" not in plan

    def test_q17_per_part_cutoff_broadcast(self, spark):
        plan = plan_of(spark, "q17_small_qty_revenue")
        # part filter pushed to the scan; both the dim and the
        # part-sized cutoff table broadcast into the fact
        assert "EqualTo(p_brand,Brand#3)" in plan
        assert plan.count("BroadcastHashJoin") >= 2
        assert "CartesianProduct" not in plan

    def test_q20_semi_joins_no_cartesian(self, spark):
        plan = plan_of(spark, "q20_excess_suppliers")
        # part-key prune and supplier probe both plan as semi joins
        assert plan.count("LeftSemi") >= 2
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "StringStartsWith(p_name,small)" in plan

    def test_q22_anti_join_scalar_broadcast(self, spark):
        plan = plan_of(spark, "q22_global_sales_opp")
        assert "LeftAnti" in plan
        # urgent-order exclusion list filtered at the orders scan
        assert "EqualTo(o_orderpriority,1-URGENT)" in plan
        assert "CartesianProduct" not in plan

    def test_decontaminate_eval_grams_broadcast(self, spark):
        plan = plan_of(spark, "t_decontaminate")
        # eval gram set broadcast; training grams join at most once each
        assert "BroadcastHashJoin" in plan
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan

    def test_weighted_sample_is_map_plus_topk(self, spark):
        plan = plan_of(spark, "t_weighted_sample")
        assert "TakeOrderedAndProject" in plan
        assert "Join" not in plan  # pure map + heap top-k


class TestTpcdsShapes:
    """TPC-DS-specific plan families (relational5.py): the four shapes
    the TPC-H corpus doesn't exercise."""

    def test_qds63_window_over_aggregate(self, spark):
        plan = plan_of(spark, "qds63_monthly_deviation")
        # aggregate feeds a window over the 25-brand subtotal table;
        # the final LIMIT is a heap, not a global sort
        assert "Window" in plan
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
        # part dimension broadcast into the fact scan
        assert "BroadcastHashJoin" in plan

    def test_qds14_intersect_no_row_explosion(self, spark):
        plan = plan_of(spark, "qds14_cross_channel")
        # INTERSECT must plan as distinct + semi joins — set semantics,
        # never a row×row join; the only nested-loop is the 1-row
        # global-average broadcast
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastNestedLoopJoin") <= 1

    def test_qds67_rollup_expand_then_rank(self, spark):
        plan = plan_of(spark, "qds67_topk_rollup")
        # ROLLUP = map-side Expand into ONE hash aggregation, then the
        # rank window over the subtotal table only
        assert "Expand" in plan
        assert "Window" in plan
        assert "CartesianProduct" not in plan

    def test_qds81_returns_cte_reused_not_recomputed(self, spark):
        from spark_sql_server_spark.plans import executed_plan

        df = REGISTRY["qds81_returns_above_avg"].fn(spark, SF_CORRECT)
        plan = executed_plan(df)
        # the returns aggregate is checkpointed and read twice — the
        # expensive fact join must NOT appear in this plan at all
        assert "lineitem" not in plan
        # per-nation thresholds broadcast back onto the checkpointed CTE
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestTpcdsWave2Plans:
    def test_qds11_four_way_self_join_all_equi(self, spark):
        plan = plan_of(spark, "qds11_yoy_growth")
        # r12: the four year_total arms are conditional sums of ONE
        # per-customer aggregation over one lineitem⋈orders pass — no
        # self-join, no checkpoint, two parquet scans
        assert "Scan ExistingRDD" not in plan
        assert plan.count("Scan parquet") == 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "TakeOrderedAndProject" in plan  # LIMIT 100 is a heap

    def test_qds23_semi_joins_and_scalar_broadcast(self, spark):
        plan = plan_of(spark, "qds23_cte_reuse")
        # both IN-filters plan as semi joins; the 0.5*MAX threshold is
        # a one-row subquery, never a row×row join
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan

    def test_qds95_semi_join_stack_no_cartesian(self, spark):
        plan = plan_of(spark, "qds95_reused_subquery")
        # r12: multi_supp is a grouped MIN≠MAX suppkey screen consumed
        # once — no lineitem self-join, no pair expansion; both
        # IN-filters still plan as semi joins
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert plan.count("Scan parquet") <= 3

    def test_qds88_scalars_no_join_between_slices(self, spark):
        plan = plan_of(spark, "qds88_multi_scalar")
        # r12: the six scalar slices fold into ONE conditional
        # aggregation over a single fact join; the OR-of-bands screen
        # still reaches the scan
        assert "CartesianProduct" not in plan
        assert plan.count("Scan parquet") <= 2
        df = REGISTRY["qds88_multi_scalar"].fn(spark, SF_CORRECT)
        assert any("l_quantity" in f for f in pushed_filters(df))

    def test_qds72_wide_dims_broadcast_no_nested_loop(self, spark):
        plan = plan_of(spark, "qds72_wide_dim_join")
        strategies = join_strategies(
            REGISTRY["qds72_wide_dim_join"].fn(spark, SF_CORRECT)
        )
        # five joins: the date inequality rides the orders equi-join as
        # a residual; part/supplier/nation/region broadcast
        assert strategies.count("BroadcastHashJoin") >= 4
        assert "CartesianProduct" not in strategies
        assert "BroadcastNestedLoopJoin" not in strategies
        # the retailprice filter reaches the part scan
        assert "p_retailprice" in plan[plan.find("PushedFilters"):][:2000] or \
            any("p_retailprice" in f for f in pushed_filters(
                REGISTRY["qds72_wide_dim_join"].fn(spark, SF_CORRECT)))


class TestTpcdsWave3Plans:
    def test_qds51_full_outer_of_windows_no_cartesian(self, spark):
        plan = plan_of(spark, "qds51_cumulative_windows")
        # r12: the two channel series pivot into one conditional
        # aggregation + ONE window pass; the FULL OUTER presence test
        # became `amt IS NOT NULL`, so the plan has no join at all and
        # exactly one orders scan
        assert "Window" in plan
        assert "Join" not in plan
        assert plan.count("Scan parquet") <= 1
        assert "CartesianProduct" not in plan

    def test_qds34_band_filter_before_dim_join(self, spark):
        plan = plan_of(spark, "qds34_frequent_buyers")
        # the banded HAVING shrinks the aggregate before the customer
        # join, so the join is a broadcast, not a fact-sized shuffle
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        # count band applied on the aggregate (a Filter over the agg,
        # not a post-join filter): the agg side carries the HAVING
        assert "count(1)" in plan or "count(*)" in plan

    def test_qds93_left_join_equi_heap_limit(self, spark):
        plan = plan_of(spark, "qds93_returns_adjustment")
        # r12: the returns LEFT self-join became a per-grain R-count
        # window (exact under fan-out) — one lineitem scan + orders,
        # no self-join; the LIMIT is a bounded heap
        assert "Window" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "TakeOrderedAndProject" in plan
        assert plan.count("Scan parquet") <= 2

    def test_qds17_three_fact_legs_all_equi(self, spark):
        plan = plan_of(spark, "qds17_sale_return_repurchase")
        # sale→return→re-purchase: both fact-fact joins are equi with
        # the date predicate as residual; part broadcasts onto the
        # tiny trips set
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_qds49_single_pass_two_windows(self, spark):
        plan = plan_of(spark, "qds49_channel_return_ranks")
        # channels split via CASE in ONE aggregation pass (no per-channel
        # rescan, no union of three scans); both rank windows share the
        # (channel) partitioning
        assert plan.count("Scan parquet") <= 2  # lineitem + orders once
        assert "Window" in plan
        assert "CartesianProduct" not in plan

    def test_qds39_agg_filter_offset_self_join(self, spark):
        plan = plan_of(spark, "qds39_volatile_supply")
        # r12: the volatile stats are checkpointed once — both self-join
        # sides read the ExistingRDD, no parquet scan per side; the CoV
        # filter shrinks the stats BEFORE the join; the join is pure equi
        assert "Scan ExistingRDD" in plan
        assert plan.count("Scan parquet") == 0
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds35_existence_join_for_or_exists(self, spark):
        plan = plan_of(spark, "qds35_multi_channel_exists")
        # the AND-side EXISTS is a plain semi join; EXISTS under OR
        # must plan as ExistenceJoin (boolean-appending semi variant)
        assert "ExistenceJoin" in plan
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan

    def test_qds54_cohort_distinct_before_join(self, spark):
        plan = plan_of(spark, "qds54_cohort_spend_bands")
        # r12: ONE orders aggregation (spend + urgent flag), the
        # BUILDING screen joins the aggregate to the customer dim, then
        # the band histogram — a single orders scan, no cartesian
        assert plan.count("HashAggregate") >= 4  # 2 aggs x partial/final
        assert plan.count("Scan parquet") <= 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds31_six_way_self_join_all_equi(self, spark):
        plan = plan_of(spark, "qds31_quarterly_acceleration")
        # r12: the six quarterly cells are conditional sums of ONE
        # per-nation aggregation over one star pass — no self-join,
        # three parquet scans (orders, customer, nation)
        assert "Scan ExistingRDD" not in plan
        assert plan.count("Scan parquet") == 3
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds36_rollup_expand_then_rank_window(self, spark):
        plan = plan_of(spark, "qds36_hierarchy_rank")
        # ROLLUP = one Expand + hash aggregate; the rank window runs
        # over the subtotal rows only (after the aggregate, its input
        # is k rows — no second pass over the fact)
        assert "Expand" in plan
        assert "Window" in plan
        assert "CartesianProduct" not in plan

    def test_qds47_single_window_exchange(self, spark):
        plan = plan_of(spark, "qds47_moving_avg_rank")
        # lag/lead/rank + the year mean all ride window passes over the
        # aggregated rows — never a self-join back to the fact (the
        # reference SQL self-joins its CTE three times on rn=rn±1)
        assert "Window" in plan
        assert "HashAggregate" in plan  # windows ride the aggregated rows
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds64_single_star_pivot(self, spark):
        df = REGISTRY["qds64_two_cycle_sales"].fn(spark, SF_CORRECT)
        plan = executed_plan(df)
        # r12: the two-cycle pairing is per-year conditional aggregation
        # inside ONE star pass — no checkpoint, no self-join of the
        # aggregate, and lineitem is scanned exactly twice (cs_ui
        # screen + star); the 1996/1997 year screen reaches the scan
        assert "Scan ExistingRDD" not in plan
        assert plan.count("lineitem.parquet") == 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds78_single_fact_pass_with_anti_join(self, spark):
        plan = plan_of(spark, "qds78_channel_rollup")
        # returns removed via a genuine anti join; the three-channel
        # rollup is CASE-split inside ONE aggregation (qds49 pattern) —
        # lineitem is scanned twice (fact + returns side), orders once
        assert "LeftAnti" in plan
        assert plan.count("Scan parquet") <= 3
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds75_checkpointed_aggregate_self_join(self, spark):
        df = REGISTRY["qds75_yoy_channel_decline"].fn(spark, SF_CORRECT)
        plan = executed_plan(df)
        # r12: prev/curr are conditional year cells of ONE per-(brand,
        # type) aggregation — no checkpoint, no self-join; the
        # UNION-as-DISTINCT rewrite keeps the star to one pass over
        # each relation (lineitem twice: fact + returns pre-aggregate)
        assert "Scan ExistingRDD" not in plan
        assert plan.count("Scan parquet") <= 4  # lineitem×2, orders, part
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds97_full_outer_on_prededuped_pairs(self, spark):
        plan = plan_of(spark, "qds97_channel_overlap")
        # r12: the two channel legs fold into ONE fact join + one
        # (ck, pk) aggregation with MAX(CASE) membership flags — no
        # FULL OUTER join, each base relation scanned once
        assert "FullOuter" not in plan
        assert plan.count("Scan parquet") <= 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds21_single_aggregate_pushed_filters(self, spark):
        plan = plan_of(spark, "qds21_shipflow_balance")
        # one CASE-split hash aggregation (partial + final), dims
        # broadcast, and both the date fringe and the price band reach
        # the parquet scans as pushed filters
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert plan.count("Scan parquet") <= 4
        assert "PushedFilters: [" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds16_exists_as_semi_and_anti_joins(self, spark):
        plan = plan_of(spark, "qds16_multi_supplier_clean")
        # the correlated EXISTS probes are pre-aggregated orderkey sets
        # joined semi/anti on the natural shuffle key — never a per-row
        # subquery or nested loop
        assert "LeftSemi" in plan
        assert "LeftAnti" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds66_single_pass_pivot(self, spark):
        plan = plan_of(spark, "qds66_monthly_pivot")
        # all 24 monthly columns are CASE arms inside ONE aggregation
        # chain — each relation is scanned once; no per-month re-scan,
        # no window, no self-join
        assert plan.count("Scan parquet") <= 4
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds98_window_over_aggregate_not_join_back(self, spark):
        plan = plan_of(spark, "qds98_class_revenue_ratio")
        # the class total is a window SUM over the aggregated rows —
        # never a join of the aggregate back to a per-class total
        assert "Window" in plan
        assert plan.count("Scan parquet") <= 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds9_scalar_subqueries_no_joins(self, spark):
        plan = plan_of(spark, "qds9_quantity_buckets")
        # r12: the oracle's fifteen scalar subqueries fold into ONE
        # conditional aggregation — a single lineitem scan, zero joins
        assert "Join" not in plan
        assert plan.count("Scan parquet") == 1
        assert "CartesianProduct" not in plan

    def test_qds33_in_subquery_as_semi_join(self, spark):
        plan = plan_of(spark, "qds33_union_leg_reagg")
        # r12: the three priority legs fold into ONE star pass (the
        # combined IN filter); the IN-subquery item filter still plans
        # as a (broadcast) semi join — no Union, no nested loop
        assert "LeftSemi" in plan
        assert "Union" not in plan
        assert plan.count("Scan parquet") <= 4
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds1_window_not_correlated_rescan(self, spark):
        plan = plan_of(spark, "qds1_returns_above_avg")
        # the oracle's correlated AVG subquery re-aggregates the CTE
        # per outer row; the Spark plan is ONE window over the grouped
        # rows — the fact table is scanned exactly once and there is
        # no subquery re-scan
        assert "Window" in plan
        assert plan.count("Scan parquet") <= 5
        assert "Subquery" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds59_single_fact_pass_weekday_pivot(self, spark):
        plan = plan_of(spark, "qds59_weekday_ratio")
        # r12: the weekly aggregate materializes ONCE (localCheckpoint)
        # and both 52-week-offset join sides read the checkpointed
        # rows — the 4-relation star no longer re-runs per side
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "ExistingRDD" in plan
        assert plan.count("Scan parquet") == 0

    def test_qds65_fact_scanned_once(self, spark):
        plan = plan_of(spark, "qds65_store_min_avg")
        # the reference aggregates (store, item) twice; this plan
        # builds it once and folds the store mean over it — four base
        # relations (lineitem, supplier, nation, part) and at most four
        # scans means the fact table is read exactly once
        assert plan.count("Scan parquet") <= 4
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds99_single_aggregation_bucket_matrix(self, spark):
        plan = plan_of(spark, "qds99_ship_lag_buckets")
        # five lag bands are CASE arms in ONE hash aggregation — one
        # fact pass; no window, no per-band re-scan
        assert plan.count("Scan parquet") <= 5
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds38_one_pass_channel_membership(self, spark):
        plan = plan_of(spark, "qds38_channel_intersect")
        # the oracle INTERSECTs three DISTINCT subqueries (three fact
        # scans + two intersect shuffles); the Spark plan is MAX(CASE)
        # channel flags in ONE aggregation — one orders scan, one
        # customer scan, no set operator anywhere
        assert plan.count("Scan parquet") <= 2
        assert "Intersect" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds13_single_pass_disjunct_residual(self, spark):
        plan = plan_of(spark, "qds13_disjunct_bands")
        # both OR-of-AND disjunct groups evaluate as residual predicates
        # on the joined row — one scan per base relation, no per-branch
        # union of fact scans
        assert plan.count("Scan parquet") <= 5
        assert "Union" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds90_one_pass_ampm(self, spark):
        plan = plan_of(spark, "qds90_ampm_ratio")
        # the reference cross-joins two single-row whole-fact
        # subqueries; here both time-window counts are CASE arms in ONE
        # aggregation — a single events scan and no join at all
        assert plan.count("Scan parquet") == 1
        assert "Join" not in plan
        assert "CartesianProduct" not in plan

    def test_qds28_one_pass_band_census(self, spark):
        plan = plan_of(spark, "qds28_quantity_band_census")
        # the reference cross-joins six whole-fact subqueries; here the
        # disjoint bands are ONE derived CASE key — a single lineitem
        # scan, no Union of per-band scans, no join at all
        assert plan.count("Scan parquet") == 1
        assert "Union" not in plan
        assert "Join" not in plan
        assert "CartesianProduct" not in plan

    def test_qds44_distributed_topk_single_fact_pass(self, spark):
        plan = plan_of(spark, "qds44_best_worst_rank_join")
        # the per-part aggregate is localCheckpoint-ed (shows as an
        # ExistingRDD scan), so the fact join tree is gone from this
        # plan; both rank heads are TakeOrderedAndProject (distributed
        # top-K), never a global single-partition sort of all parts
        assert "Scan ExistingRDD" in plan
        assert "TakeOrderedAndProject" in plan
        assert plan.count("Scan parquet") <= 2  # the two part lookups
        assert "CartesianProduct" not in plan

    def test_qds58_one_pass_channel_split(self, spark):
        plan = plan_of(spark, "qds58_channel_balance")
        # the oracle joins three per-channel CTEs (three fact scans);
        # the Spark plan CASE-splits the channel inside ONE aggregation
        # — one lineitem scan, one orders scan, no CTE self-join
        assert plan.count("Scan parquet") <= 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds61_one_pass_promo_share(self, spark):
        plan = plan_of(spark, "qds61_promo_share")
        # promotional and total sums are CASE arms of the same
        # aggregation — one pass, no two-subquery cross join
        assert plan.count("Scan parquet") <= 3
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds70_checkpointed_single_aggregation(self, spark):
        plan = plan_of(spark, "qds70_hierarchy_rank_rollup")
        # the (region, nation) aggregate is localCheckpoint-ed (shows
        # as ExistingRDD) — the shared-SQL CTE spelling re-ran the
        # whole fact join per reference (16 parquet scans)
        assert "Scan ExistingRDD" in plan
        assert plan.count("Scan parquet") == 0
        assert "Expand" in plan  # the ROLLUP
        assert "CartesianProduct" not in plan

    def test_qds77_one_pass_channel_rollup(self, spark):
        plan = plan_of(spark, "qds77_channel_profit_rollup")
        # the oracle UNION-ALLs three whole-fact channel legs; the
        # Spark plan CASE-splits inside ONE aggregation then ROLLUPs
        # the 3-row pre-aggregate — one lineitem scan, one orders scan
        assert plan.count("Scan parquet") <= 2
        assert "Union" not in plan
        assert "Expand" in plan  # the ROLLUP
        assert "CartesianProduct" not in plan

    def test_qds7_pushed_dimension_screens(self, spark):
        plan = plan_of(spark, "qds7_dimension_avg_report")
        # every dimension screen reaches its scan pushed
        assert "c_mktsegment" in plan and "BUILDING" in plan
        assert plan.count("Scan parquet") <= 4
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds87_one_pass_except_flags(self, spark):
        plan = plan_of(spark, "qds87_channel_except")
        # the EXCEPT chain is MAX(CASE) membership flags in ONE
        # aggregation — no set operator, two scans (orders, customer)
        assert plan.count("Scan parquet") <= 2
        assert "Except" not in plan
        assert "CartesianProduct" not in plan

    def test_qds89_window_over_grouped_rows(self, spark):
        plan = plan_of(spark, "qds89_monthly_deviation")
        # the partition average is a window over the grouped rows —
        # one pass through the five-relation join, no self-join
        assert "Window" in plan
        assert plan.count("Scan parquet") <= 5
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds18_single_pass_rollup(self, spark):
        plan = plan_of(spark, "qds18_rollup_avg_report")
        assert "Expand" in plan  # the ROLLUP
        assert plan.count("Scan parquet") <= 5
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds46_order_grain_aggregate(self, spark):
        plan = plan_of(spark, "qds46_order_geo_mismatch")
        # the mismatch flag is a map-side CASE on the joined row; the
        # customer join-back adds one extra customer scan (5 total)
        assert plan.count("Scan parquet") <= 5
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds6_dimension_side_window(self, spark):
        plan = plan_of(spark, "qds6_pricey_item_states")
        # the per-type average screens the PART DIMENSION via a window
        # before joining the fact — the fact is never re-scanned for
        # the correlated average
        assert "Window" in plan
        assert plan.count("Scan parquet") <= 5
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds41_dimension_only_semi_join(self, spark):
        plan = plan_of(spark, "qds41_sibling_exists")
        # the correlated EXISTS is a LeftSemi self-join on the part
        # DIMENSION only — two part scans, the fact never appears
        assert "LeftSemi" in plan
        assert plan.count("Scan parquet") == 2
        assert "lineitem" not in plan
        assert "CartesianProduct" not in plan

    def test_qds15_residual_disjunct_date_pushed(self, spark):
        plan = plan_of(spark, "qds15_cross_table_disjunct")
        # the OR spans customer and fact columns (post-join residual),
        # but the date fringe must still reach the orders scan pushed
        assert "o_orderdate" in plan
        assert plan.count("Scan parquet") <= 4
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds32_window_not_correlated_rescan(self, spark):
        plan = plan_of(spark, "qds32_excess_discount")
        # the per-part 1.3x-average screen is a window over the
        # filtered rows, not the oracle's correlated per-row re-scan —
        # the fact is read once and the brand/date fringe is pushed
        assert "Window" in plan
        assert plan.count("Scan parquet") <= 2
        assert "PushedFilters: [IsNotNull(p_brand), EqualTo(p_brand,Brand#13)" in plan or "p_brand" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestTpcdsWave10Plans:
    """r8 wave 10: three-fact chains, inventory windows, q24
    CTE-reuse checkpoint, star reports, one-pass channel unions."""

    def test_qds25_chain_no_cartesian(self, spark):
        plan = plan_of(spark, "qds25_profit_chain")
        # three instances of the fact chain on (custkey, partkey) equi
        # keys; dims broadcast; never a nested loop
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_qds29_chain_no_cartesian(self, spark):
        plan = plan_of(spark, "qds29_quantity_chain")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds37_semi_join_and_pushed_screens(self, spark):
        plan = plan_of(spark, "qds37_inventory_window")
        # the sales-channel existence leg is a genuine semi join (no
        # row explosion before the dedup), and the item/inventory
        # screens reach their scans
        assert "LeftSemi" in plan
        assert "p_retailprice" in plan
        assert "l_shipdate" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds82_semi_join_shape(self, spark):
        plan = plan_of(spark, "qds82_inventory_store_window")
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds24_checkpointed_ssales(self, spark):
        plan = plan_of(spark, "qds24_netpaid_threshold")
        # the ssales aggregate is localCheckpoint-ed (ExistingRDD), so
        # the five-relation star is NOT re-run per consumer — the
        # CTE-referenced-twice inline trap (qds70/qds64 class)
        assert "Scan ExistingRDD" in plan
        assert plan.count("Scan parquet") == 0
        assert "CartesianProduct" not in plan

    def test_qds42_star_report_topk(self, spark):
        plan = plan_of(spark, "qds42_category_report")
        # single-star report: ≤3 scans, distributed top-K head
        assert "TakeOrderedAndProject" in plan
        assert plan.count("Scan parquet") <= 3
        assert "CartesianProduct" not in plan

    def test_qds52_star_report_topk(self, spark):
        plan = plan_of(spark, "qds52_brand_report")
        assert "TakeOrderedAndProject" in plan
        assert plan.count("Scan parquet") <= 3
        assert "CartesianProduct" not in plan

    def test_qds55_star_report_topk(self, spark):
        plan = plan_of(spark, "qds55_manager_brand_head")
        assert "TakeOrderedAndProject" in plan
        assert plan.count("Scan parquet") <= 3
        assert "CartesianProduct" not in plan

    def test_qds96_broadcast_count(self, spark):
        plan = plan_of(spark, "qds96_selectivity_count")
        # pure selectivity count: every dimension screen is a
        # broadcast hash join; the fact never widens
        assert "BroadcastHashJoin" in plan
        assert plan.count("Scan parquet") <= 4
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds56_one_pass_union_fold(self, spark):
        plan = plan_of(spark, "qds56_brandset_union")
        # the oracle UNION-ALLs three per-priority legs (three fact
        # scans); the Spark plan folds the disjoint legs into ONE
        # aggregation — a single lineitem scan, no Union, and the
        # brand-set IN subquery is a broadcast semi join
        assert "Union" not in plan
        assert "LeftSemi" in plan
        assert plan.count("Scan parquet") <= 5
        assert "CartesianProduct" not in plan

    def test_qds60_one_pass_union_fold(self, spark):
        plan = plan_of(spark, "qds60_category_union")
        assert "Union" not in plan
        assert plan.count("Scan parquet") <= 5
        assert "CartesianProduct" not in plan

    def test_qds74_checkpointed_year_totals(self, spark):
        plan = plan_of(spark, "qds74_yoy_channel_growth")
        # r12: the four year-total arms are conditional sums of ONE
        # per-customer aggregation over one fact pass — no checkpoint,
        # no arm joins, three parquet scans (lineitem, orders, customer)
        assert "Scan ExistingRDD" not in plan
        assert plan.count("Scan parquet") == 3
        assert "CartesianProduct" not in plan

    def test_qds76_one_pass_channel_census(self, spark):
        plan = plan_of(spark, "qds76_channel_census")
        # channel is a derived CASE column: one lineitem scan, no Union
        assert "Union" not in plan
        assert plan.count("Scan parquet") <= 3
        assert "CartesianProduct" not in plan

    def test_qds83_one_pass_return_channels(self, spark):
        plan = plan_of(spark, "qds83_return_channel_devs")
        # the three return-channel CTEs are disjoint priority slices of
        # one week-screened pass — CASE-split aggregation, no join of
        # channel legs (the only joins are the fact→orders/part star)
        assert "Union" not in plan
        assert plan.count("Scan parquet") <= 3
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds4_single_pass_pivot(self, spark):
        plan = plan_of(spark, "qds4_triple_channel_growth")
        # r12: the six arms are per-(channel, period) conditional sums
        # in ONE per-customer aggregation — no checkpoint, no self-join,
        # three parquet scans (lineitem, orders, customer), one shuffle
        assert "Scan ExistingRDD" not in plan
        assert plan.count("Scan parquet") == 3
        assert "CartesianProduct" not in plan

    def test_qds2_checkpointed_week_pivot(self, spark):
        plan = plan_of(spark, "qds2_weekly_yoy_ratios")
        # r12: both year legs are conditional day×year cells of ONE
        # per-week aggregation — no checkpoint, no self-join, two
        # parquet scans (lineitem, orders)
        assert "Scan ExistingRDD" not in plan
        assert plan.count("Scan parquet") == 2
        assert "CartesianProduct" not in plan

    def test_qds50_fact_fact_band_census(self, spark):
        plan = plan_of(spark, "qds50_return_lag_bands")
        # sale×return equi join on (ck, pk) with the date residual —
        # never a nested loop; the five bands are ONE aggregation
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan  # supplier dim

    def test_qds45_existence_join_under_or(self, spark):
        plan = plan_of(spark, "qds45_geo_or_itemset")
        # the IN-subquery leg of the two-dimension OR must plan as an
        # ExistenceJoin (a plain semi join would drop rows that pass
        # only the literal leg)
        assert "ExistenceJoin" in plan
        assert "CartesianProduct" not in plan

    def test_qds85_single_band_residual(self, spark):
        plan = plan_of(spark, "qds85_banded_return_reasons")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds5_one_pass_rollup(self, spark):
        plan = plan_of(spark, "qds5_channel_sales_returns")
        # sales/returns union and the three channels are all CASE
        # splits of ONE fact pass feeding the ROLLUP Expand
        assert "Union" not in plan
        assert plan.count("Scan parquet") <= 3
        assert "Expand" in plan  # the ROLLUP
        assert "CartesianProduct" not in plan

    def test_qds8_broadcast_semi_on_derived_key(self, spark):
        plan = plan_of(spark, "qds8_zip_prefix_semi")
        # the INTERSECT-fed prefix set semi-joins on the computed
        # substring — a broadcast, never a per-row probe
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds22_rollup_topk(self, spark):
        plan = plan_of(spark, "qds22_inventory_hierarchy_avg")
        assert "Expand" in plan
        assert "TakeOrderedAndProject" in plan
        assert plan.count("Scan parquet") <= 2
        assert "CartesianProduct" not in plan

    def test_qds43_one_pass_weekday_pivot(self, spark):
        plan = plan_of(spark, "qds43_store_weekday_pivot")
        # seven day columns are CASE arms of ONE aggregation
        assert "Union" not in plan
        assert plan.count("Scan parquet") <= 3
        assert "CartesianProduct" not in plan

    def test_qds80_one_pass_screened_rollup(self, spark):
        plan = plan_of(spark, "qds80_promo_screened_rollup")
        # the promo screen is a row-level disjunction — the report is
        # still one fact pass into the ROLLUP Expand
        assert "Union" not in plan
        assert "Expand" in plan
        assert plan.count("Scan parquet") <= 4
        assert "CartesianProduct" not in plan

    def test_qds91_pushed_disjunctive_residual(self, spark):
        plan = plan_of(spark, "qds91_callcenter_losses")
        # the OR-of-ANDs demographic screen rides the customer scan
        # (single-dim residual), never a post-join filter over the fact
        assert "c_mktsegment" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    # --- r9 wave 12 (q10/q40/q84 promotions) ---

    def test_qds10_both_semi_flavors(self, spark):
        plan = plan_of(spark, "qds10_demographic_census")
        # the AND-side EXISTS (subquery contains its own join) plans
        # as a plain LeftSemi; the EXISTS-under-OR pair must plan as
        # ExistenceJoin — both semi flavors in one query
        assert "ExistenceJoin" in plan
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds40_netting_join_shape(self, spark):
        plan = plan_of(spark, "qds40_price_change_netting")
        # returns pre-aggregate per (order, item) BEFORE the outer
        # join; all three dims broadcast; the 60-day date screen
        # reaches the orders scan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert plan.count("BroadcastHashJoin") >= 3
        assert any(
            "o_orderdate" in f for f in
            [ln for ln in plan.splitlines() if "PushedFilters" in ln]
        )

    def test_qds84_broadcast_chain_topk(self, spark):
        plan = plan_of(spark, "qds84_chained_dim_lookup")
        # the dimension chain broadcasts; the LIMIT head is a
        # TakeOrderedAndProject (per-partition heaps, no global sort)
        assert plan.count("BroadcastHashJoin") >= 2
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_qds30_window_not_rescan(self, spark):
        plan = plan_of(spark, "qds30_state_excess_returners")
        # the per-state average rides a window over the grouped CTE —
        # the returns aggregation must appear ONCE (no CTE re-scan for
        # the correlated scalar: at most one scan-side returnflag
        # filter), and the head is a TakeOrderedAndProject
        assert "Window" in plan
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        li_scans = [
            ln for ln in plan.splitlines()
            if "Scan parquet" in ln and "lineitem" in ln
        ]
        assert len(li_scans) <= 1, f"returns CTE re-scanned: {li_scans}"

    def test_qds69_semi_and_two_antis(self, spark):
        plan = plan_of(spark, "qds69_semi_anti_census")
        # one EXISTS and two NOT EXISTS stacked in a single plan:
        # LeftSemi once, LeftAnti twice
        assert "LeftSemi" in plan
        assert plan.count("LeftAnti") >= 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def _no_nlj(plan: str) -> None:
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


class TestTpcdsWave14Plans:
    """r9 waves 14-15: the final 17 sibling promotions (relational10).

    Every op must stay equi-join-only (no cartesian / BNLJ even where
    the WHERE carries cross-dimension <> residuals), broadcast its
    dims, and head LIMITs with TakeOrderedAndProject."""

    def test_qds3_star_topk(self, spark):
        plan = plan_of(spark, "qds3_brand_month_star")
        _no_nlj(plan)
        assert "BroadcastHashJoin" in plan
        assert "TakeOrderedAndProject" in plan

    def test_qds12_window_share(self, spark):
        plan = plan_of(spark, "qds12_class_revenue_ratio")
        _no_nlj(plan)
        assert "Window" in plan
        assert "TakeOrderedAndProject" in plan

    def test_qds20_window_share(self, spark):
        plan = plan_of(spark, "qds20_catalog_class_ratio")
        _no_nlj(plan)
        assert "Window" in plan
        assert "TakeOrderedAndProject" in plan

    def test_qds19_cross_dim_residual_stays_equi(self, spark):
        # the c_nationkey <> s_nationkey residual must NOT degrade the
        # join tree to a nested loop — every join stays equi-keyed
        plan = plan_of(spark, "qds19_brand_geo_mismatch")
        _no_nlj(plan)
        assert plan.count("BroadcastHashJoin") >= 3
        assert "TakeOrderedAndProject" in plan

    def test_qds26_means_broadcast_star(self, spark):
        plan = plan_of(spark, "qds26_promo_demographic_means")
        _no_nlj(plan)
        assert plan.count("BroadcastHashJoin") >= 3
        assert "TakeOrderedAndProject" in plan

    def test_qds27_rollup_expand(self, spark):
        plan = plan_of(spark, "qds27_rollup_demographic_means")
        _no_nlj(plan)
        assert "Expand" in plan
        assert "TakeOrderedAndProject" in plan

    def test_qds48_single_pass_disjunction(self, spark):
        # the two OR blocks evaluate on one joined fact pass — no
        # UNION rewrite, exactly one lineitem scan
        plan = plan_of(spark, "qds48_disjunct_band_sum")
        _no_nlj(plan)
        li_scans = [
            ln for ln in plan.splitlines()
            if "Scan parquet" in ln and "lineitem" in ln
        ]
        assert len(li_scans) <= 1

    def test_qds53_window_no_rescan(self, spark):
        plan = plan_of(spark, "qds53_quarterly_cov_screen")
        _no_nlj(plan)
        assert "Window" in plan
        li_scans = [
            ln for ln in plan.splitlines()
            if "Scan parquet" in ln and "lineitem" in ln
        ]
        assert len(li_scans) <= 1

    def test_qds57_one_pass_neighbors(self, spark):
        # LAG/LEAD + the year-average window replace the reference's
        # TRIPLE self-join of the monthly CTE: one lineitem scan only
        plan = plan_of(spark, "qds57_entity_monthly_neighbors")
        _no_nlj(plan)
        assert "Window" in plan
        li_scans = [
            ln for ln in plan.splitlines()
            if "Scan parquet" in ln and "lineitem" in ln
        ]
        assert len(li_scans) <= 1

    def test_qds62_broadcast_buckets(self, spark):
        plan = plan_of(spark, "qds62_warehouse_ship_buckets")
        _no_nlj(plan)
        assert "BroadcastHashJoin" in plan
        assert "TakeOrderedAndProject" in plan

    def test_qds68_basket_joinback(self, spark):
        plan = plan_of(spark, "qds68_city_basket_detail")
        _no_nlj(plan)
        assert plan.count("BroadcastHashJoin") >= 3
        assert "TakeOrderedAndProject" in plan

    def test_qds71_union_broadcast(self, spark):
        plan = plan_of(spark, "qds71_time_of_day_union")
        _no_nlj(plan)
        assert "BroadcastHashJoin" in plan
        assert "TakeOrderedAndProject" in plan
        # r12: the three slices fold to one IN-filtered scan
        assert plan.count("Scan parquet") <= 2
        # the combined event_type screen still pushes to the scan
        assert any(
            "event_type" in ln for ln in plan.splitlines()
            if "PushedFilters" in ln
        )

    def test_qds73_guarded_band(self, spark):
        plan = plan_of(spark, "qds73_guarded_count_band")
        _no_nlj(plan)
        assert "TakeOrderedAndProject" in plan

    def test_qds79_weekday_report(self, spark):
        plan = plan_of(spark, "qds79_weekday_ticket_profit")
        _no_nlj(plan)
        assert plan.count("BroadcastHashJoin") >= 3
        assert "TakeOrderedAndProject" in plan

    def test_qds86_rollup_rank(self, spark):
        plan = plan_of(spark, "qds86_rollup_rank_parent")
        _no_nlj(plan)
        assert "Expand" in plan
        assert "Window" in plan
        assert "TakeOrderedAndProject" in plan

    def test_qds92_window_not_correlated_rescan(self, spark):
        # the per-item 1.3x-avg threshold rides a window — the
        # reference's correlated subquery would re-scan the fact
        plan = plan_of(spark, "qds92_excess_discount")
        _no_nlj(plan)
        assert "Window" in plan
        li_scans = [
            ln for ln in plan.splitlines()
            if "Scan parquet" in ln and "lineitem" in ln
        ]
        assert len(li_scans) <= 1

    def test_qds94_self_semi_and_anti(self, spark):
        plan = plan_of(spark, "qds94_multiwarehouse_no_returns")
        _no_nlj(plan)
        assert "LeftSemi" in plan
        assert "LeftAnti" in plan


class TestKmeansTreeReduce:
    def test_partials_reduced_before_collect(self, spark):
        """The k-means-family codebook fold must shuffle-reduce the
        per-batch partials so the driver-side collect is O(k×dim) rows,
        independent of the input partition count."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from spark_sql_server_spark.operators.similarity import (
            _tree_reduce_partials,
        )
        from spark_sql_server_spark.plans import executed_plan

        schema = T.StructType(
            [
                T.StructField("cluster", T.IntegerType()),
                T.StructField("s", T.ArrayType(T.DoubleType())),
                T.StructField("n", T.LongType()),
            ]
        )
        # simulate P=16 partitions each emitting k=3 partials of dim=4
        parts = spark.createDataFrame(
            [(c, [float(c), 1.0, 2.0, 3.0], 5) for _ in range(16) for c in range(3)],
            schema,
        ).repartition(16)
        reduced = _tree_reduce_partials(parts, ["cluster"])
        plan = executed_plan(reduced)
        # the reduction is a real exchange (partial agg map-side, final
        # agg after the shuffle) — not a driver fold
        assert "Exchange hashpartitioning" in plan
        assert plan.count("HashAggregate") >= 2
        rows = reduced.collect()
        assert len(rows) == 3 * 4  # k×dim, NOT P×k
        byk = {(r.cluster, r.pos): (r.sv, r.cn) for r in rows}
        assert byk[(2, 0)] == (2.0 * 16, 5 * 16)
        assert byk[(1, 3)] == (3.0 * 16, 5 * 16)


class TestTpcdsBVariantPlans:
    """r10: the q14b/q23b/q24b/q39b promotions (relational11) — the
    last four reference-validated TPC-DS files (103/103)."""

    def test_qds14b_gated_self_join_no_explosion(self, spark):
        plan = plan_of(spark, "qds14b_period_self_join")
        # both period legs semi-join the INTERSECT item set; the final
        # brand join is equi over two ~25-row gated aggregates; the
        # only nested-loops are the two 1-row average broadcasts
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastNestedLoopJoin") <= 2

    def test_qds23b_per_customer_head(self, spark):
        plan = plan_of(spark, "qds23b_best_customer_names")
        # r12: one checkpointed fact join feeds every consumer;
        # frequent_parts / best_customers filter as semi joins; the two
        # UNION ALL branches are one (custkey, priority) grouping; the
        # customer name attaches broadcast post-aggregation; the
        # ordered LIMIT is a heap
        assert "LeftSemi" in plan
        assert "TakeOrderedAndProject" in plan
        assert "Union" not in plan
        assert plan.count("Scan parquet") <= 1  # customer dim only
        assert "CartesianProduct" not in plan

    def test_qds24b_checkpointed_ssales(self, spark):
        plan = plan_of(spark, "qds24b_netpaid_alt_slice")
        # shares the localCheckpoint discipline with qds24: the
        # five-relation star must NOT re-run per consumer
        assert "Scan ExistingRDD" in plan
        assert plan.count("Scan parquet") == 0
        assert "CartesianProduct" not in plan

    def test_qds39b_tightened_screen_stays_equi(self, spark):
        plan = plan_of(spark, "qds39b_sustained_volatility")
        # r12: shares qds39's checkpointed volatile stats (single fact
        # pass); the added first-month CoV predicate is a scalar filter
        # on the a side — the self-join stays pure equi
        assert "Scan ExistingRDD" in plan
        assert plan.count("Scan parquet") == 0
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
