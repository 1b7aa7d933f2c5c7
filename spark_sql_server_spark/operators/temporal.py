"""Temporal join operators Spark has no native form for: as-of
(point-in-time) join and interval range join.

Both are expressed as compositions of shuffle-friendly primitives — the
prescription for custom operators at 100 TB:

* **As-of join** — NOT a per-row subquery and NOT a fan-out join:
  union the probe and reference streams tagged, one window pass per
  key carries the latest reference id forward (``last(..., ignorenulls)``
  over rows-unbounded-preceding). One shuffle on the join key, zero
  joins, state O(1) per row — the feature-store point-in-time join.
* **Range join** — the naive form is a nested-loop (quadratic) join;
  binning rewrites it as an equi-join: explode each interval into the
  fixed-width time bins it covers, bin each event once, hash-join on
  the bin, re-check the exact bounds. Join work becomes
  O(events + interval-bins) instead of O(events × intervals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table

_ASOF_ORACLE = """
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT c.event_id, c.user_id, c.ts, p.event_id AS p_id,
             ROW_NUMBER() OVER (PARTITION BY c.event_id
                                ORDER BY p.ts DESC, p.event_id DESC) AS rn
      FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts <= c.ts
    )
    SELECT event_id, user_id, ts, p_id AS asof_purchase_id
    FROM j WHERE rn = 1
    ORDER BY event_id
"""


@query(
    "q_asof_join",
    oracle=_ASOF_ORACLE,
    covers="beyond-ref temporal: as-of (point-in-time) join — for each "
    "click, the user's most recent purchase at or before it",
    bench=True,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union+window formulation.

    For every click event, attach the same user's latest purchase with
    ``purchase.ts <= click.ts`` (NULL when none). The oracle states the
    semantics as a fan-out join + per-probe argmax; the Spark plan is
    the scalable twin: tag both streams, union, and let ONE window pass
    per user carry the last purchase id forward — the plan contains no
    join node at all, so there is no per-probe fan-out to blow up on a
    high-frequency reference stream. Ties (same user, same timestamp)
    break on (purchase-before-probe, then max event_id) in both
    engines.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.col("event_id").alias("probe_id"),
        F.lit(None).cast("long").alias("ref_id"),
        F.lit(1).alias("rank_in_tie"),  # probe sorts after same-ts refs: <= semantics
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("long").alias("probe_id"),
        F.col("event_id").alias("ref_id"),
        F.lit(0).alias("rank_in_tie"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "rank_in_tie", "ref_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("asof_purchase_id", F.last("ref_id", ignorenulls=True).over(w))
        .filter(F.col("probe_id").isNotNull())
        .select(
            F.col("probe_id").alias("event_id"),
            "user_id",
            F.col("t").alias("ts"),
            "asof_purchase_id",
        )
        .orderBy("event_id")
    )


#: Range-join window table: 100 unaligned maintenance windows over the
#: events month — start every 7 h, length 3..7 h varying by index — so
#: windows overlap, straddle bin boundaries, and leave gaps.
_N_WINDOWS = 100

_RANGE_ORACLE = f"""
    WITH w AS (
      SELECT CAST(g.w AS BIGINT) AS window_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + (g.w * 7) * INTERVAL 1 HOUR AS w_start,
             TIMESTAMP '2024-01-01 00:00:00'
               + (g.w * 7 + 3 + g.w % 5) * INTERVAL 1 HOUR AS w_end
      FROM (SELECT unnest(range(0, {_N_WINDOWS})) AS w) g
    )
    SELECT w.window_id, COUNT(e.event_id) AS n_events
    FROM w LEFT JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.window_id
    ORDER BY w.window_id
"""


@query(
    "q_range_join",
    oracle=_RANGE_ORACLE,
    covers="beyond-ref temporal: interval range join via time-bin "
    "equi-join rewrite (no nested-loop join in the plan)",
    bench=True,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events counted into overlapping, unaligned time windows.

    A pure range predicate has no equi-key, so Spark's planner can only
    nested-loop it (quadratic — the oracle spells exactly that join).
    The operator instead *bins* time at 1 h: each interval explodes
    into the hour bins it covers, each event hashes to its one bin,
    and the join becomes a hash equi-join on the bin plus an exact
    bounds re-check. An event matches a window through exactly one bin
    (its own), so no dedup is needed; work is O(events +
    interval-bins) and shuffles hash-partition on uniformly
    distributed bin keys.
    """
    windows = spark.range(_N_WINDOWS).select(
        F.col("id").alias("window_id"),
        F.expr(
            "timestampadd(HOUR, CAST(id * 7 AS INT), "
            "TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("w_start"),
        F.expr(
            "timestampadd(HOUR, CAST(id * 7 + 3 + id % 5 AS INT), "
            "TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("w_end"),
    )
    # windows start/end on exact hours, so the covered bins run
    # [w_start, w_end - 1h]; a non-aligned generalization would floor
    # both ends before the sequence
    window_bins = windows.select(
        "window_id",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                F.col("w_start"),
                F.col("w_end") - F.expr("INTERVAL 1 HOUR"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bin"),
    )
    event_bins = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", F.date_trunc("hour", F.col("ts")).alias("bin")
    )
    return (
        window_bins.join(
            event_bins,
            (window_bins.bin == event_bins.bin)
            & (F.col("ts") >= F.col("w_start"))
            & (F.col("ts") < F.col("w_end")),
            "left",
        )
        .groupBy("window_id")
        .agg(F.count("event_id").alias("n_events"))
        .orderBy("window_id")
    )
