"""Pipeline analytics operators: deterministic data splits, funnels,
cohort retention — the everyday queries of a training-data/eventing
pipeline, all oracle-checked portable SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import register_tables

# deterministic hash split: md5 prefix buckets — stable across runs,
# engines, and data order; the standard way to carve train/val/test
_HASH_SPLIT_SQL = """
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT doc_id, n_chars,
             CASE
               WHEN (ascii(substring(md5(text), 1, 1)) % 10) < 8 THEN 'train'
               WHEN (ascii(substring(md5(text), 1, 1)) % 10) = 8 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    ) t
    GROUP BY split
    ORDER BY split
"""


@query(
    "t_hash_split",
    oracle=_HASH_SPLIT_SQL,
    covers="north-star pipeline: deterministic content-hash train/val/test split",
)
def t_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash split — unlike random splits, membership is a pure
    function of the document, so re-runs, engine changes and data
    reorderings never leak documents across splits. Map-only."""
    register_tables(spark, sf_dir)
    return spark.sql(_HASH_SPLIT_SQL)


# funnel: view → click → purchase, strictly ordered per user
_FUNNEL_SQL = """
    WITH stage1 AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    stage2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN stage1 s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t_view
      GROUP BY e.user_id
    ),
    stage3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN stage2 s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.t_click
      GROUP BY e.user_id
    )
    SELECT
      (SELECT COUNT(*) FROM stage1) AS n_view,
      (SELECT COUNT(*) FROM stage2) AS n_view_click,
      (SELECT COUNT(*) FROM stage3) AS n_view_click_purchase
"""


@query(
    "q_funnel",
    oracle=_FUNNEL_SQL,
    covers="events analytics: ordered conversion funnel (view→click→purchase)",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel via per-stage min-timestamp joins.

    Scale: three hash aggregations keyed on user_id reusing the same
    partitioning; each stage's output is ≤ distinct users. No window
    over the full event stream, no per-user collect.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_FUNNEL_SQL)


# cohort retention: users grouped by first-activity day, tracked over
# day offsets
_RETENTION_SQL = """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff(CAST(e.ts AS DATE), f.cohort_day) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, COUNT(*) AS active_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
"""

_RETENTION_ORACLE = _RETENTION_SQL.replace(
    "datediff(CAST(e.ts AS DATE), f.cohort_day)",
    "CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS INT)",
)


@query(
    "q_cohort_retention",
    oracle=_RETENTION_ORACLE,
    covers="events analytics: cohort retention matrix (first-day cohorts × day offsets)",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: one aggregation for cohort assignment, one
    distinct-reduce for activity, one final rollup — all shuffles on
    user_id / (cohort, offset), both uniform keys."""
    register_tables(spark, sf_dir)
    return spark.sql(_RETENTION_SQL)
