"""Sketch-family operators — the 100 TB answers to distinct-count,
heavy-hitters, quantiles, and join pre-filtering.

At cluster scale the exact forms of these queries are shuffle-bound
(a global COUNT(DISTINCT) shuffles every key; a global sort for an
exact percentile is a cluster-wide exchange). The sketch forms are
map-side-combinable, mergeable, and tiny on the wire:

* HLL sketches (Apache DataSketches, built into Spark 3.5+ SQL) give
  per-shard distinct counts that union in O(2^lgk) per group.
* CountMinSketch (``org.apache.spark.util.sketch``) gives additive
  heavy-hitter frequencies with a one-sided error guarantee.
* ``approx_percentile`` (Greenwald–Khanna style) gives rank-bounded
  quantiles whose guarantee holds under ANY partial-merge order.
* A Bloom-filter bitmap built from a small join side prunes the fact
  scan before the shuffle — the classic runtime-filter pattern, spelt
  explicitly so its plan can be asserted.

Certification strategy (cross-engine determinism, see CLAUDE.md):
sketch *estimates* are deterministic in Spark (fixed seeds, order-
independent merges) but not expressible in DuckDB — so the certified
columns are always (a) exact quantities both engines can compute and
(b) guarantee booleans (``est >= exact``, ``est within bound``) that
the sketch's math makes invariably true; the oracle emits ``true``.
The estimates themselves are pytest-checked (tests/test_sketches.py).

Reference parity note: the reference server delegates these to Spark's
own approx functions (e.g. ``approx_count_distinct`` appears in its
delegated-SQL surface, sql-server golden corpus); the sharded-sketch
union and bloom-prefilter shapes are beyond-reference scale patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.operators.relational import DSUM, dsum
from spark_sql_server_spark.session import register_tables

# ---------------------------------------------------------------------------
# sk_hll_distinct — per-day HLL sketches unioned per event_type
# ---------------------------------------------------------------------------

_HLL_SPARK_SQL = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             hll_sketch_agg(user_id, 14) AS s
      FROM events
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    merged AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             hll_sketch_estimate(hll_union_agg(s, false)) AS est
      FROM daily
      GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
      FROM events
      GROUP BY event_type
    )
    SELECT m.event_type, m.n_days, e.exact_users,
           (abs(CAST(m.est AS DOUBLE) - e.exact_users)
              <= 0.03 * e.exact_users + 1.0) AS within_3pct
    FROM merged m JOIN exact e ON m.event_type = e.event_type
    ORDER BY event_type
"""

_HLL_ORACLE = """
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           COUNT(DISTINCT user_id) AS exact_users,
           true AS within_3pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""


@query(
    "sk_hll_distinct",
    oracle=_HLL_ORACLE,
    covers="sketches: sharded HyperLogLog distinct counts merged with "
    "hll_union_agg (DataSketches HLL, Spark 3.5+ SQL surface)",
)
def sk_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type, computed the 100 TB way: one HLL
    sketch per (event_type, day) shard, then a register-max union per
    type. Each shard sketch is ≤ 2^14 registers regardless of row
    count, so the second aggregation moves KBs where COUNT(DISTINCT)
    would shuffle every user_id. lgConfigK=14 → ~0.8% stderr; the
    certified ``within_3pct`` bound is deterministic because the HLL
    merge (per-register max) is order-independent and Spark's item
    hashing is seed-fixed. Exact counts certify against DuckDB; the
    estimate itself is pytest-checked."""
    register_tables(spark, sf_dir)
    return spark.sql(_HLL_SPARK_SQL)


# ---------------------------------------------------------------------------
# sk_quantile_bands — approx_percentile vs exact rank selection
# ---------------------------------------------------------------------------

# Shared exact-rank scaffold (identical text in both engines except the
# default window frame, written out explicitly for Spark):
#  * prices → integer cents via FLOOR(x*100 + 0.5): a bare double→BIGINT
#    cast is NOT cross-engine safe (Spark truncates toward zero, DuckDB
#    rounds to nearest — ~5% of cents differ), so round in micro-space
#    with identical IEEE multiply+add+floor in both engines
#  * per-value counts, then cumulative ranks over DISTINCT values only —
#    the window input is the aggregated (cents, cnt) table, bounded by
#    the number of distinct prices, not the row count
#  * value at global rank r = the row whose [lo_rank, hi_rank] spans r
_QB_SCAFFOLD = """
    WITH t AS (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders
    ),
    agg AS (SELECT cents, COUNT(*) AS cnt FROM t GROUP BY cents),
    ranked AS (
      SELECT cents,
             SUM(cnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS lo_rank,
             SUM(cnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
               AS hi_rank
      FROM agg
    ),
    nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows FROM agg),
    params AS (
      SELECT * FROM (VALUES ('p25', CAST(0.25 AS DOUBLE)),
                            ('p50', CAST(0.50 AS DOUBLE)),
                            ('p75', CAST(0.75 AS DOUBLE))) AS v(tag, p)
    ),
    targets AS (
      SELECT tag, p,
             CAST(FLOOR(p * CAST(n_rows - 1 AS DOUBLE)) AS BIGINT) AS r,
             GREATEST(CAST(FLOOR((p - 0.005) * CAST(n_rows - 1 AS DOUBLE))
                           AS BIGINT), 0) AS r_lo,
             LEAST(CAST(CEIL((p + 0.005) * CAST(n_rows - 1 AS DOUBLE))
                        AS BIGINT), n_rows - 1) AS r_hi
      FROM params CROSS JOIN nn
    ),
    bands AS (
      SELECT tg.tag,
             MIN(CASE WHEN tg.r    BETWEEN rk.lo_rank AND rk.hi_rank
                      THEN rk.cents END) AS exact_cents,
             MIN(CASE WHEN tg.r_lo BETWEEN rk.lo_rank AND rk.hi_rank
                      THEN rk.cents END) AS lo_cents,
             MIN(CASE WHEN tg.r_hi BETWEEN rk.lo_rank AND rk.hi_rank
                      THEN rk.cents END) AS hi_cents
      FROM targets tg JOIN ranked rk
        ON tg.r    BETWEEN rk.lo_rank AND rk.hi_rank
        OR tg.r_lo BETWEEN rk.lo_rank AND rk.hi_rank
        OR tg.r_hi BETWEEN rk.lo_rank AND rk.hi_rank
      GROUP BY tg.tag
    )
"""

_QB_SPARK_SQL = (
    _QB_SCAFFOLD
    + """
    , approx AS (
      SELECT approx_percentile(cents,
               array(CAST(0.25 AS DOUBLE), CAST(0.50 AS DOUBLE),
                     CAST(0.75 AS DOUBLE)), 1000) AS ap
      FROM t
    )
    SELECT b.tag, b.exact_cents,
           (CASE b.tag WHEN 'p25' THEN a.ap[0]
                       WHEN 'p50' THEN a.ap[1]
                       ELSE a.ap[2] END
             BETWEEN b.lo_cents AND b.hi_cents) AS approx_in_band
    FROM bands b CROSS JOIN approx a
    ORDER BY tag
"""
)

_QB_ORACLE = (
    _QB_SCAFFOLD
    + """
    SELECT tag, exact_cents, true AS approx_in_band
    FROM bands
    ORDER BY tag
"""
)


@query(
    "sk_quantile_bands",
    oracle=_QB_ORACLE,
    covers="sketches: approx_percentile (GK summaries) certified against "
    "exact rank selection with the sketch's own rank-error band",
)
def sk_quantile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price quartiles via ``approx_percentile`` with a certified
    rank-error guarantee. The exact side never globally sorts the raw
    rows: it aggregates to (value, count) first — shuffle on the value
    key — and runs the cumulative window over *distinct* values only
    (the certification scaffold; at 100 TB the sketch alone is the
    answer). accuracy=1000 guarantees rank error ≤ 1/1000 under any
    merge order of the partial summaries (the GK merge preserves the
    bound, so shuffle nondeterminism cannot flip the boolean); the
    certified band uses 5× that slack. Integer cents keep every
    certified value exact in both engines."""
    register_tables(spark, sf_dir)
    return spark.sql(_QB_SPARK_SQL)


# ---------------------------------------------------------------------------
# sk_cms_topk — CountMinSketch heavy hitters with guarantee booleans
# ---------------------------------------------------------------------------

_CMS_EPS = 1e-4  # width = ceil(2/eps) = 20000 counters per row
_CMS_CONF = 0.99  # depth = ceil(ln(1/0.01)/ln 2) = 7 rows
_CMS_SEED = 42

_CMS_ORACLE = """
    SELECT l_partkey, COUNT(*) AS exact_cnt,
           true AS est_ge_exact, true AS est_within_bound
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY exact_cnt DESC, l_partkey
    LIMIT 10
"""


@query(
    "sk_cms_topk",
    oracle=_CMS_ORACLE,
    covers="sketches: CountMinSketch heavy-hitter frequencies "
    "(org.apache.spark.util.sketch, distributed count_min_sketch agg + "
    "driver-side probe of the merged sketch)",
)
def sk_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter part frequencies through a CountMinSketch.

    The sketch is built distributed (``count_min_sketch`` SQL
    aggregate: map-side partial sketches, additive merge — order-
    independent, seed-fixed, so the merged sketch is deterministic),
    then the one ~1 MB binary is probed on the driver via the JVM
    ``CountMinSketch.readFrom`` — probing k candidates is O(k·depth),
    no row data ever reaches the driver. Candidates are the exact
    top-10 (TakeOrderedAndProject). Certified columns are the exact
    counts plus CMS's two guarantees: estimates never undercount, and
    overcount ≤ 10·eps·N (eps=1e-4; the 10× slack makes the bound hold
    with probability 1-1e-70, and the fixed seed makes it a constant of
    the data)."""
    register_tables(spark, sf_dir)
    sk_row = spark.sql(
        f"SELECT count_min_sketch(l_partkey, {_CMS_EPS}d, {_CMS_CONF}d, "
        f"{_CMS_SEED}) AS s, COUNT(*) AS total FROM lineitem"
    ).collect()[0]
    top = spark.sql(
        """
        SELECT l_partkey, COUNT(*) AS exact_cnt FROM lineitem
        GROUP BY l_partkey ORDER BY exact_cnt DESC, l_partkey LIMIT 10
        """
    ).collect()

    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk_row["s"]))
    )
    bound = int(10 * _CMS_EPS * sk_row["total"]) + 1
    rows = []
    for r in top:
        est = int(cms.estimateCount(int(r["l_partkey"])))
        rows.append(
            (
                int(r["l_partkey"]),
                int(r["exact_cnt"]),
                est >= int(r["exact_cnt"]),
                est <= int(r["exact_cnt"]) + bound,
            )
        )
    return spark.createDataFrame(
        rows,
        "l_partkey BIGINT, exact_cnt BIGINT, "
        "est_ge_exact BOOLEAN, est_within_bound BOOLEAN",
    ).orderBy(F.desc("exact_cnt"), "l_partkey")


# ---------------------------------------------------------------------------
# sk_bloom_prefilter — explicit Bloom runtime filter ahead of a fact join
# ---------------------------------------------------------------------------

_BLOOM_M_BITS = 1 << 14  # 16384 bits = 256 words; ~10+ bits/key here
_BLOOM_K = 5

_BLOOM_ORACLE = f"""
    SELECT n_name, COUNT(*) AS n_lines,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY n_name
"""


def _bloom_positions(key_sql: str, m_bits: int, k: int) -> list[str]:
    """k bit positions for a key: xxhash64(key, i) mod m — seed-fixed,
    engine-deterministic, no Python in the hot path."""
    return [f"pmod(xxhash64({key_sql}, {i}), {m_bits})" for i in range(k)]


@query(
    "sk_bloom_prefilter",
    oracle=_BLOOM_ORACLE,
    covers="sketches: Bloom-filter bitmap built from the small join side, "
    "applied map-side to the fact scan before the join (explicit "
    "runtime-filter pattern)",
)
def sk_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional supplier revenue with an explicit Bloom pre-filter.

    The small side (suppliers of one region) is hashed into a 16 Kbit
    bitmap with k=5 xxhash64 probes — built *distributed* (explode →
    ``bit_or`` per 64-bit word) and only the 256-word bitmap reaches
    the driver, then rides into the fact predicate as an array literal.
    The fact scan drops non-member rows map-side, before any join or
    exchange: on a cluster this is what cuts the shuffled volume when
    the join is too big to broadcast (Spark's own runtime row-group
    filters do the same invisibly; this spells it out so the plan can
    be asserted). Bloom filters have no false negatives, so the
    certified output — the exact join result on the survivors — is
    independent of the bitmap; false positives only cost bytes and are
    removed by the exact join. Pytest checks the fp rate and plan
    placement."""
    register_tables(spark, sf_dir)
    dim = spark.sql(
        """
        SELECT s_suppkey, n_name FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        """
    ).localCheckpoint()  # consumed twice: bitmap build + exact join

    pos_exprs = ", ".join(_bloom_positions("s_suppkey", _BLOOM_M_BITS, _BLOOM_K))
    words = (
        dim.select(F.explode(F.expr(f"array({pos_exprs})")).alias("pos"))
        .select(
            F.expr("CAST(pos DIV 64 AS INT)").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * (_BLOOM_M_BITS // 64)
    for r in words:
        bitmap[int(r["w"])] = int(r["bits"])
    bitmap_lit = F.array(*[F.lit(v).cast("long") for v in bitmap])

    # the 256-word bitmap rides in as ONE named column so the 5 probe
    # expressions reference it instead of inlining 5 copies of the array
    lineitem = spark.table("lineitem").withColumn("__bloom", bitmap_lit)
    tests = []
    for pos in _bloom_positions("l_suppkey", _BLOOM_M_BITS, _BLOOM_K):
        tests.append(
            f"(element_at(__bloom, CAST({pos} DIV 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))) != 0"
        )
    survivors = lineitem.where(" AND ".join(tests)).drop("__bloom")

    return (
        survivors.join(F.broadcast(dim), survivors.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# sk_hll_intersect — sketch set algebra via inclusion–exclusion
# ---------------------------------------------------------------------------

_HLL_IX_SPARK_SQL = """
    WITH per_type AS (
      SELECT event_type, hll_sketch_agg(user_id, 14) AS s,
             COUNT(DISTINCT user_id) AS exact_n
      FROM events WHERE event_type IN ('view', 'purchase')
      GROUP BY event_type
    ),
    singles AS (
      SELECT
        MAX(CASE WHEN event_type = 'view'
                 THEN hll_sketch_estimate(s) END) AS est_a,
        MAX(CASE WHEN event_type = 'purchase'
                 THEN hll_sketch_estimate(s) END) AS est_b
      FROM per_type
    ),
    unioned AS (
      SELECT hll_sketch_estimate(hll_union_agg(s, false)) AS est_union
      FROM per_type
    ),
    exact AS (
      -- r12: the INTERSECT of two slices of the same table folded to
      -- per-user membership flags (qds38 discipline): one scan + one
      -- aggregation instead of two scans + two DISTINCTs + a join;
      -- identical distinct-user count. The sketch legs above are
      -- untouched so every estimate stays bit-identical.
      SELECT COUNT(*) AS exact_both FROM (
        SELECT user_id
        FROM events WHERE event_type IN ('view', 'purchase')
        GROUP BY user_id
        HAVING MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1
           AND MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
      )
    )
    SELECT e.exact_both,
           (abs(CAST(s.est_a + s.est_b - u.est_union AS DOUBLE)
                 - e.exact_both)
              <= 0.1 * e.exact_both + 5.0) AS within_bound
    FROM exact e CROSS JOIN singles s CROSS JOIN unioned u
"""

_HLL_IX_ORACLE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS exact_both, true AS within_bound
    FROM (
      SELECT user_id FROM events WHERE event_type = 'view'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
"""


@query(
    "sk_hll_intersect",
    oracle=_HLL_IX_ORACLE,
    covers="sketches: HLL set algebra — intersection cardinality via "
    "inclusion-exclusion over mergeable sketches (|A|+|B|-|A∪B|)",
)
def sk_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many users both viewed AND purchased, the sketch way: HLL
    supports union natively (register max), so the intersection comes
    from inclusion–exclusion — the pattern that answers overlap
    questions across 100 TB shards whose sketches are already on disk,
    with zero re-scan of raw data. Inclusion–exclusion compounds the
    error of three estimates, so the certified bound is wider (10% + 5)
    than the single-sketch 3%; it is still deterministic — all three
    estimates are order-independent functions of the data. The exact
    intersection certifies against DuckDB; pytest checks the estimate
    itself."""
    register_tables(spark, sf_dir)
    return spark.sql(_HLL_IX_SPARK_SQL)
