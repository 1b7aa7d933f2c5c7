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

# r12 single-scan form of the executed query (oracle keeps the staged
# CTE spelling): Catalyst inlined stage1/stage2 once per consumer —
# six events scans, three aggregation exchanges and two joins. The
# same per-user milestones fall out of ONE scan shuffled once by
# user_id: t_view is a partition-wide MIN window, t_click a second
# window over the same partitioning (ts > NULL is NULL, so users
# without a view can never acquire a click milestone — exactly the
# stage1⋈stage2 semantics), and t_purchase needs no third window
# because t_click is a per-user constant by then (grouped MIN). The
# final counts of non-null milestones equal the stage COUNT(*)s.
_FUNNEL_SPARK_SQL = """
    WITH v AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    vc AS (
      SELECT user_id, ts, event_type, t_view,
             MIN(CASE WHEN event_type = 'click' AND ts > t_view
                      THEN ts END)
               OVER (PARTITION BY user_id) AS t_click
      FROM v
    ),
    per_user AS (
      SELECT user_id,
             MAX(t_view) AS t_view,
             MAX(t_click) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' AND ts > t_click
                      THEN ts END) AS t_purchase
      FROM vc
      GROUP BY user_id
    )
    SELECT COUNT(t_view) AS n_view,
           COUNT(t_click) AS n_view_click,
           COUNT(t_purchase) AS n_view_click_purchase
    FROM per_user
"""


@query(
    "q_funnel",
    oracle=_FUNNEL_SQL,
    covers="events analytics: ordered conversion funnel (view→click→purchase)",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel (view → later click → later purchase).

    Scale (r12): the oracle's staged-CTE spelling made Spark inline
    stage1/stage2 per consumer — SIX events scans, three aggregation
    exchanges, two joins. The executed form computes the same per-user
    milestones in ONE scan with one user_id shuffle: two stacked
    partition-MIN windows (second gated on the first; ts > NULL is
    NULL so the ordering constraint carries) and a grouped MIN for the
    purchase milestone reusing the window partitioning. Counts of
    non-null milestones equal the stage COUNT(*)s exactly (proof in
    the _FUNNEL_SPARK_SQL comment); no per-user collect.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_FUNNEL_SPARK_SQL)


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

# r12 single-scan form of the executed query (oracle unchanged): the
# firsts⋈events inner join attaches each user's MIN activity date —
# every event's user is in firsts by construction, so a partition-MIN
# window over one scan yields the identical row set with no second
# scan and no join.
_RETENTION_SPARK_SQL = """
    WITH w AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
               AS cohort_day
      FROM events
    ),
    activity AS (
      SELECT DISTINCT user_id, cohort_day,
             datediff(d, cohort_day) AS day_offset
      FROM w
    )
    SELECT cohort_day, day_offset, COUNT(*) AS active_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
"""


@query(
    "q_cohort_retention",
    oracle=_RETENTION_ORACLE,
    covers="events analytics: cohort retention matrix (first-day cohorts × day offsets)",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: cohort assignment, a distinct-reduce for
    activity, one final rollup.

    Scale (r12): the oracle's firsts⋈events join re-scanned events;
    the executed form computes cohort_day as a partition-MIN window
    over ONE scan (identical row set — every event's user is in
    firsts), then the same DISTINCT and rollup. Shuffles stay on
    user_id / (cohort, offset), both uniform keys."""
    register_tables(spark, sf_dir)
    return spark.sql(_RETENTION_SPARK_SQL)
