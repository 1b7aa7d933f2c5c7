"""TPC-DS b-variant promotions (r10): q14b, q23b, q24b, q39b.

The reference validates 103 TPC-DS query *files* — 99 numbers plus
distinct a/b variants for 14/23/24/39
(``examples/tpcds/src/main/scala/.../TPCDSQueryBenchmark.scala:215-227``).
The a-variants (and the shared topology) are covered by
``qds14_cross_channel`` / ``qds23_cte_reuse`` /
``qds24_netpaid_threshold`` / ``qds39_volatile_supply``; this wave
promotes each b-variant's *structural delta* to its own plan-gated
operator, closing the 103/103 file-level bar:

* q14b (``queries/q14b.sql``) — drops q14a's three-channel UNION ALL
  result and instead aggregates the SAME channel over two adjacent
  periods (``this_year`` / ``last_year``, each HAVING-gated by the
  shared ``avg_sales`` scalar) and equi-joins the two gated aggregates
  on the item attributes — a period-over-period self-join of a
  threshold-filtered aggregate, a topology q14a never builds.
* q23b (``queries/q23b.sql``) — q23a returns ONE scalar
  ``sum(sales)``; q23b joins each channel branch to ``customer``,
  groups per (customer) inside each branch, UNION ALLs the per-customer
  rows and emits an ordered LIMIT head — the "best customer grouping"
  delta the r9 verdict names.
* q24b (``queries/q24b.sql``) — identical topology to q24a with the
  attribute literal swapped (``i_color`` 'pale' → 'chiffon',
  ``q24b.sql:31``); shares the checkpointed-ssales builder with
  ``qds24_netpaid_threshold`` so the CTE-referenced-twice plan
  discipline is identical, and certifies the other attribute slice.
* q39b (``queries/q39b.sql``) — q39a plus one predicate:
  ``AND inv1.cov > 1.5`` (the only diff line) — the first period's
  coefficient of variation must clear a TIGHTER bar than the standing
  screen. Algebraized exactly like the a-variant: with the test
  schema's CoV bar at 1/2 (``relational5._QDS39_SQL``), the tightened
  first-month bar is 3/4, i.e.
  ``16·n·(n·Σq² − S²) > 9·(n−1)·S²`` in int64 (all terms ≪ 2^63 at
  any tested SF; quantities ≤ 50).

Adaptation notes (same test-schema conventions as the anchor files):
order priorities stand in for sales channels, ``p_brand`` for the item
attributes, and the two q14b periods are the 1996/1997 order years
(the reference selects its two weeks via scalar subqueries over
``date_dim``; this schema has no date dimension, so the period screens
are pushed-down year literals — the structural delta under test is the
self-join of two gated aggregates, which survives the substitution).

Determinism: exact DECIMAL(38,6) sums cast to DOUBLE once; HAVING
thresholds are single IEEE multiplies of exact-derived doubles; every
LIMIT head orders by a unique tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.operators.relational import DSUM
from spark_sql_server_spark.operators.relational7 import (
    _netpaid_threshold_build,
    _netpaid_threshold_sql,
)
from spark_sql_server_spark.session import load_table, register_tables

# --------------------------------------------------------------------------
# q14b — two period-gated aggregates of one channel, self-joined on the
# item attribute.
# --------------------------------------------------------------------------

_QDS14B_CHANNELS = ("1-URGENT", "2-HIGH", "3-MEDIUM")
_QDS14B_YEAR_TY = 1997
_QDS14B_YEAR_LY = 1996


def _qds14b_leg_sql(year: int, suffix: str) -> str:
    return f"""
      SELECT p_brand AS brand_{suffix}, COUNT(*) AS n_{suffix},
             {DSUM('l_extendedprice')} AS sales_{suffix}
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE l_partkey IN (SELECT l_partkey FROM cross_parts)
        AND EXTRACT(YEAR FROM o_orderdate) = {year}
      GROUP BY p_brand
      HAVING {DSUM('l_extendedprice')}
             > (SELECT average_sales FROM avg_sales) * COUNT(*)
    """


_QDS14B_SQL = f"""
    WITH cross_parts AS (
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '{_QDS14B_CHANNELS[0]}'
      INTERSECT
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '{_QDS14B_CHANNELS[1]}'
      INTERSECT
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '{_QDS14B_CHANNELS[2]}'
    ),
    avg_sales AS (
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) AS average_sales
      FROM lineitem
    ),
    this_year AS ({_qds14b_leg_sql(_QDS14B_YEAR_TY, 'ty')}),
    last_year AS ({_qds14b_leg_sql(_QDS14B_YEAR_LY, 'ly')})
    SELECT brand_ty AS p_brand, n_ty, sales_ty, n_ly, sales_ly
    FROM this_year JOIN last_year ON brand_ty = brand_ly
    ORDER BY p_brand
    LIMIT 100
"""


@query(
    "qds14b_period_self_join",
    bench=True,  # r10 VERDICT #3: TPC-DS heavies tracked round-over-round
    oracle=_QDS14B_SQL,
    covers="§2.B TPC-DS q14b: two period-gated aggregates of the same "
    "channel (each HAVING-gated by a shared global-average scalar over "
    "an INTERSECT item set) equi-joined on the item attribute",
)
def qds14b_period_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14b's topology: the cross-channel item set and global-average
    scalar are shared with q14a, but the result is a self-join of two
    period slices of ONE channel — brands that beat the corpus-average
    line price in BOTH 1996 and 1997 (reference ``queries/q14b.sql``:
    ``this_year``/``last_year`` on adjacent ``d_week_seq``).

    r12 (optimization guide §2.4): the previous spelling ran the
    lineitem⋈orders fact join SIX times — three INTERSECT channels and
    the per-leg re-derivations (``cross_parts`` and ``avg_sales`` were
    un-materialized, so each period leg recomputed both). The fact join
    now runs ONCE (projected to four columns, ``localCheckpoint``-ed);
    the INTERSECT collapses to one aggregation with three channel
    membership flags (the qds38/qds87 MAX(CASE) discipline — set
    intersection of distinct partkey streams ⇔ partkey seen under all
    three priorities); the two HAVING-gated period legs collapse to one
    (p_brand, year)-conditional aggregation over a single year-screened
    pass, gated per side against the shared 1-row broadcast average —
    a pivot is exactly the equi-join of the two ≤25-row gated legs
    (both-sides-exist ⇔ both conditional counts > 0).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")

    joined = (
        li.select("l_orderkey", "l_partkey", "l_extendedprice")
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_partkey",
            "l_extendedprice",
            F.year("o_orderdate").alias("o_year"),
            "o_orderpriority",
        )
        .localCheckpoint()
    )
    cross_parts = (
        joined.filter(F.col("o_orderpriority").isin(*_QDS14B_CHANNELS))
        .groupBy("l_partkey")
        .agg(
            *[
                F.max(F.col("o_orderpriority") == ch).alias(f"in_{i}")
                for i, ch in enumerate(_QDS14B_CHANNELS)
            ]
        )
        .filter(F.col("in_0") & F.col("in_1") & F.col("in_2"))
        .select("l_partkey")
    )
    avg_sales = li.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("average_sales")
    )

    dec = F.col("l_extendedprice").cast("decimal(38,6)")
    legs = (
        joined.filter(
            F.col("o_year").isin(_QDS14B_YEAR_TY, _QDS14B_YEAR_LY)
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(cross_parts, "l_partkey", "left_semi")
        .groupBy("p_brand")
        .agg(
            F.count(F.when(F.col("o_year") == _QDS14B_YEAR_TY, 1)).alias("n_ty"),
            F.sum(F.when(F.col("o_year") == _QDS14B_YEAR_TY, dec))
            .cast("double")
            .alias("sales_ty"),
            F.count(F.when(F.col("o_year") == _QDS14B_YEAR_LY, 1)).alias("n_ly"),
            F.sum(F.when(F.col("o_year") == _QDS14B_YEAR_LY, dec))
            .cast("double")
            .alias("sales_ly"),
        )
    )
    return (
        legs.crossJoin(F.broadcast(avg_sales))
        .filter(
            (F.col("sales_ty") > F.col("average_sales") * F.col("n_ty"))
            & (F.col("sales_ly") > F.col("average_sales") * F.col("n_ly"))
        )
        .select(F.col("p_brand"), "n_ty", "sales_ty", "n_ly", "sales_ly")
        .orderBy("p_brand")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q23b — per-customer grouping of the doubly-gated channel branches.
# --------------------------------------------------------------------------

_QDS23B_SQL = f"""
    WITH frequent_parts AS (
      SELECT l_partkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l_partkey
      HAVING COUNT(*) > 8
    ),
    customer_totals AS (
      SELECT o_custkey,
             {DSUM('l_extendedprice * (1 - l_discount)')} AS total
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    ),
    best_customers AS (
      SELECT o_custkey FROM customer_totals
      WHERE total > (SELECT 0.5 * MAX(total) FROM customer_totals)
    )
    SELECT c_custkey, c_name, sales
    FROM (
      SELECT c_custkey, c_name,
             {DSUM('l_extendedprice * (1 - l_discount)')} AS sales
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority = '1-URGENT'
        AND l_partkey IN (SELECT l_partkey FROM frequent_parts)
        AND o_custkey IN (SELECT o_custkey FROM best_customers)
      GROUP BY c_custkey, c_name
      UNION ALL
      SELECT c_custkey, c_name,
             {DSUM('l_extendedprice * (1 - l_discount)')} AS sales
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority = '2-HIGH'
        AND l_partkey IN (SELECT l_partkey FROM frequent_parts)
        AND o_custkey IN (SELECT o_custkey FROM best_customers)
      GROUP BY c_custkey, c_name
    ) y
    ORDER BY c_name, c_custkey, sales
    LIMIT 100
"""


@query(
    "qds23b_best_customer_names",
    oracle=_QDS23B_SQL,
    covers="§2.B TPC-DS q23b: the q23a CTE stack (frequent items, "
    "best customers via a whole-CTE scalar threshold) with per-customer "
    "grouping inside each UNION ALL channel branch and an ordered head",
)
def qds23b_best_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q23b's delta over q23a: instead of one scalar ``sum(sales)``,
    each channel branch joins ``customer`` and groups per customer,
    the branches UNION ALL, and the head is ordered per customer
    (reference ``queries/q23b.sql:34-67`` — the "best customer
    grouping" variant).

    Scale: r12 (optimization guide §2.4) — the shared-SQL spelling ran
    the lineitem⋈orders fact join once per CTE consumer (frequent_parts,
    customer_totals, and per UNION ALL branch). Same treatment as the
    wave-1 qds23: ONE projected fact join, localCheckpoint-ed, read by
    every consumer; the 0.5*MAX threshold is a 1-row driver collect off
    the per-customer aggregate (qds24 pattern); and the two UNION ALL
    branches — disjoint priority slices grouped per customer — become
    one (o_custkey, o_orderpriority) grouping of a single `isin` pass
    (identical groups: priority takes exactly the two branch values and
    c_name is functional in c_custkey). The customer name attaches
    broadcast AFTER the aggregation, which shrinks the join input to
    ≤2 rows per best customer; inner-join semantics are unchanged
    because dropping a keyless row before or after grouping on that
    key removes the same output rows. LIMIT rides
    TakeOrderedAndProject; (c_name, c_custkey, sales) stays a total
    order — custkey is unique per priority slice and the two slices'
    rows for one customer differ only in sales, which the third key
    orders.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    sales_dec = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(38,6)")
    joined = (
        li.select("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
        .join(
            orders.select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_partkey",
            "o_custkey",
            "o_orderdate",
            "o_orderpriority",
            sales_dec.alias("sales_dec"),
        )
        .localCheckpoint()
    )
    frequent_parts = (
        joined.filter(
            F.col("o_orderdate")
            >= F.lit("1996-01-01 00:00:00").cast("timestamp")
        )
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 8)
        .select("l_partkey")
    )
    customer_totals = (
        joined.groupBy("o_custkey")
        .agg(F.sum("sales_dec").cast("double").alias("total"))
        .localCheckpoint()
    )
    max_total = customer_totals.agg(F.max("total").alias("m")).collect()[0][
        "m"
    ]
    threshold = 0.5 * max_total if max_total is not None else None
    best_customers = customer_totals.filter(
        F.col("total") > F.lit(threshold)
    ).select("o_custkey")
    per_customer = (
        joined.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .join(frequent_parts, "l_partkey", "left_semi")
        .join(best_customers, "o_custkey", "left_semi")
        .groupBy("o_custkey", "o_orderpriority")
        .agg(F.sum("sales_dec").cast("double").alias("sales"))
    )
    return (
        per_customer.join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "sales")
        .orderBy("c_name", "c_custkey", "sales")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q24b — the q24a topology over the swapped attribute literal.
# --------------------------------------------------------------------------

_QDS24B_PTYPE = "STANDARD"


@query(
    "qds24b_netpaid_alt_slice",
    oracle=_netpaid_threshold_sql(_QDS24B_PTYPE),
    covers="§2.B TPC-DS q24b: the q24a checkpointed-ssales topology "
    "with the attribute literal swapped (i_color 'pale' → 'chiffon')",
)
def qds24b_netpaid_alt_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q24b — identical join/threshold topology to q24a with only the
    attribute literal swapped (``q24b.sql:31``; here p_type 'PROMO' →
    'STANDARD'). Shares ``_netpaid_threshold_build`` with
    ``qds24_netpaid_threshold``: the five-relation star aggregates
    ONCE into a localCheckpoint (plan gate: ExistingRDD, zero parquet
    scans downstream), the 5%-of-average threshold is a bounded 1-row
    collect, and this operator certifies the OTHER attribute slice of
    the shared aggregate — the b-file's entire point.
    """
    return _netpaid_threshold_build(spark, sf_dir, _QDS24B_PTYPE)


# --------------------------------------------------------------------------
# q39b — the q39a volatility screen with a tightened first-period bar.
# --------------------------------------------------------------------------

_QDS39B_SQL = """
    WITH inv AS (
      SELECT l_suppkey AS supp,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
    ),
    stats AS (
      SELECT supp, mon, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS s,
             CAST(SUM(q * q) AS BIGINT) AS s2
      FROM inv GROUP BY supp, mon HAVING COUNT(*) > 1
    ),
    volatile AS (
      SELECT supp, mon, n, s, s2 FROM stats
      WHERE 4 * n * (n * s2 - s * s) > (n - 1) * s * s
    )
    SELECT a.supp, a.mon AS mon1, b.mon AS mon2,
           a.n AS n1, a.s AS sum1, a.s2 AS sumsq1,
           b.n AS n2, b.s AS sum2, b.s2 AS sumsq2
    FROM volatile a JOIN volatile b
      ON a.supp = b.supp AND b.mon = a.mon + 1
    WHERE 16 * a.n * (a.n * a.s2 - a.s * a.s) > 9 * (a.n - 1) * a.s * a.s
    ORDER BY a.supp, a.mon
"""


@query(
    "qds39b_sustained_volatility",
    oracle=_QDS39B_SQL,
    covers="§2.B TPC-DS q39b: the q39a consecutive-period volatility "
    "self-join with a tightened exact-integer CoV bar on the first "
    "period (the b-file's single added predicate)",
)
def qds39b_sustained_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q39b — q39a plus exactly one predicate: the FIRST month's
    coefficient of variation must clear a tighter bar (reference diff:
    ``AND inv1.cov > 1.5`` is the only added line in ``q39b.sql``).

    With the standing screen algebraized at CoV > 1/2
    (``4·n·(n·Σq² − S²) > (n−1)·S²``), the tightened first-month bar
    is CoV > 3/4: sample-variance > (9/16)·mean² ⇔
    ``16·n·(n·Σq² − S²) > 9·(n−1)·S²`` — pure int64 (q ≤ 50, so every
    term ≪ 2^63 at any tested SF). STDDEV of doubles is
    partial-agg-order dependent; the cross-multiplied integer form is
    bit-identical under any partition/merge order in both engines.
    The predicate applies AFTER the self-join in both spellings (it
    references only the a-side, so Catalyst pushes it below the join —
    same rows either way, smaller build side at scale).

    r12 (optimization guide §2.4): same single-pass treatment as qds39
    — the ``volatile`` stats are computed once and checkpointed
    (shared `_qds39_volatile_stats`), instead of the shared SQL
    inlining the fact aggregation once per self-join side.
    """
    from spark_sql_server_spark.operators.relational5 import (
        _qds39_pair_join,
        _qds39_volatile_stats,
    )

    vol = _qds39_volatile_stats(spark, sf_dir)
    tight = (
        16 * F.col("n") * (F.col("n") * F.col("s2") - F.col("s") * F.col("s"))
        > 9 * (F.col("n") - 1) * F.col("s") * F.col("s")
    )
    return _qds39_pair_join(vol, a_filter=tight)
