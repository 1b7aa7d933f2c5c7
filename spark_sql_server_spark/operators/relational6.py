"""TPC-DS-shaped plan families, fourth wave (r7): q47/q57, q64, q78.

The reference validates 103 TPC-DS queries
(``examples/tpcds/src/main/scala/.../TPCDSQueryBenchmark.scala:215-227``);
these three close the families promised in r6:

* q47/q57 shape (``examples/tpcds/src/main/resources/tpcds/queries/q47.sql``,
  ``q57.sql``) — monthly series per (brand, dimension) with a
  same-partition mean AND the previous/next month's sales on each row.
  The reference SQL self-joins the aggregated CTE **three times** on
  ``rn = rn±1``; the Spark-first re-expression is LAG/LEAD over one
  window — identical semantics, one exchange instead of three joins.
* q64 shape (``q64.sql``) — the largest multi-join in the suite: a
  returns-vs-sales HAVING CTE gates a ~9-relation star (two aliases of
  the same dimension with an inequality, like q64's cd1 <> cd2), whose
  grouped result is self-joined across two consecutive years
  ("two-cycle" sales). The grouped base is ``localCheckpoint``-ed so
  the 9-relation join runs ONCE, not once per self-join side.
* q78 shape (``q78.sql``) — per-channel sales with returned lines
  removed by a LEFT JOIN ... IS NULL anti pattern, three channels
  LEFT-JOINed back on (year, item, ...) and null-filtered. The Spark
  impl removes returns with a genuine left-anti join and folds the
  three-channel LEFT JOIN into ONE CASE-split aggregation over the
  channel column (single fact scan + single shuffle — the qds49
  pattern); the oracle keeps the faithful three-CTE LEFT JOIN spelling.

Wave 2 (same round): q75 (per-channel net sales with returns netted,
UNION-deduped, year-over-year declining groups — ``q75.sql``), q97
(distinct customer-item pairs per channel, FULL OUTER overlap census —
``q97.sql``), q21 (before/after quantity balance around a pivot date,
ratio-banded via pure-integer cross-multiplication — ``q21.sql``), q16
(COUNT DISTINCT + sums under EXISTS different-supplier AND NOT EXISTS
returns, re-expressed as semi/anti joins — ``q16.sql``).

Adapted to the test schema: order priorities stand in for TPC-DS
channels, supplier nation for the store dimension, ``l_returnflag='R'``
rows for the returns tables.

Determinism: money sums stay DECIMAL(38,6) until a final DOUBLE cast;
every mean is window-SUM(decimal)/COUNT (a single IEEE division of
exact values); ratio predicates compare engine-identical doubles, so no
rounding is needed anywhere; every LIMIT has a unique ORDER BY
tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table, register_tables

# --------------------------------------------------------------------------
# q47/q57 shape: rank + lag/lead moving frame over partitioned monthly
# series (reference examples/tpcds/queries/q47.sql, q57.sql).
# --------------------------------------------------------------------------

_QDS47_SQL = """
    WITH v1 AS (
      SELECT p_brand, n_name,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS d_moy,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
               AS sales_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1995-12-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-02-01 00:00:00'
      GROUP BY 1, 2, 3, 4
    ),
    v2 AS (
      SELECT p_brand, n_name, d_year, d_moy,
             CAST(sales_dec AS DOUBLE) AS sum_sales,
             CAST(SUM(sales_dec) OVER (PARTITION BY p_brand, n_name, d_year)
                  AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_brand, n_name, d_year)
               AS avg_monthly_sales,
             CAST(LAG(sales_dec) OVER (PARTITION BY p_brand, n_name
                                       ORDER BY d_year, d_moy) AS DOUBLE)
               AS psum,
             CAST(LEAD(sales_dec) OVER (PARTITION BY p_brand, n_name
                                        ORDER BY d_year, d_moy) AS DOUBLE)
               AS nsum,
             CAST(RANK() OVER (PARTITION BY p_brand, n_name
                               ORDER BY d_year, d_moy) AS BIGINT) AS rn
      FROM v1
    )
    SELECT p_brand, n_name, d_year, d_moy, sum_sales, avg_monthly_sales,
           psum, nsum, rn
    FROM v2
    WHERE d_year = 1996
      AND avg_monthly_sales > 0
      AND ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
      AND psum IS NOT NULL AND nsum IS NOT NULL
    ORDER BY sum_sales - avg_monthly_sales, p_brand, n_name, d_moy
    LIMIT 100
"""


@query(
    "qds47_moving_avg_rank",
    oracle=_QDS47_SQL,
    covers="§2.B TPC-DS q47/q57 shape: rank + lag/lead moving average "
    "over partitioned monthly series (brand × supplier nation)",
)
def qds47_moving_avg_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly (brand, supplier-nation) revenue rows of 1996 deviating
    >10% from their year mean, each carrying the adjacent months' sales.

    Scale: one hash aggregation on (brand, nation, year, month) —
    bounded by 25 brands × 25 nations × 14 months — then ONE window
    exchange serves rank, lag, lead, and the year mean (the reference
    SQL self-joins the aggregated CTE three times on rn=rn±1; lag/lead
    over the same sort order is the one-shuffle Spark plan). The date
    fringe (Dec-1995 / Jan-1997) is pushed to the scan; nation (25
    rows) broadcasts. The mean is window-SUM(DECIMAL)/COUNT — one IEEE
    division of exact values, engine-identical, so the >0.1 deviation
    predicate and the ORDER BY difference key need no rounding.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-12-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    v1 = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "p_brand",
            "n_name",
            F.year("o_orderdate").cast("long").alias("d_year"),
            F.month("o_orderdate").cast("long").alias("d_moy"),
        )
        .agg(F.sum(rev).alias("sales_dec"))
    )
    wy = W.partitionBy("p_brand", "n_name", "d_year")
    ws = W.partitionBy("p_brand", "n_name").orderBy("d_year", "d_moy")
    v2 = v1.select(
        "p_brand",
        "n_name",
        "d_year",
        "d_moy",
        F.col("sales_dec").cast("double").alias("sum_sales"),
        (
            F.sum("sales_dec").over(wy).cast("double")
            / F.count(F.lit(1)).over(wy)
        ).alias("avg_monthly_sales"),
        F.lag("sales_dec").over(ws).cast("double").alias("psum"),
        F.lead("sales_dec").over(ws).cast("double").alias("nsum"),
        F.rank().over(ws).cast("long").alias("rn"),
    )
    return (
        v2.filter(
            (F.col("d_year") == 1996)
            & (F.col("avg_monthly_sales") > 0)
            & (
                F.abs(F.col("sum_sales") - F.col("avg_monthly_sales"))
                / F.col("avg_monthly_sales")
                > 0.1
            )
            & F.col("psum").isNotNull()
            & F.col("nsum").isNotNull()
        )
        .orderBy(
            F.col("sum_sales") - F.col("avg_monthly_sales"),
            "p_brand",
            "n_name",
            "d_moy",
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# q64 shape: two-cycle sales — a HAVING-gated returns CTE feeding a
# 9-relation star whose grouped result self-joins across years
# (reference examples/tpcds/queries/q64.sql).
# --------------------------------------------------------------------------

_QDS64_SQL = """
    WITH cs_ui AS (
      SELECT l_partkey AS pk
      FROM lineitem
      GROUP BY l_partkey
      HAVING SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
             > 2 * SUM(CAST(CASE WHEN l_returnflag = 'R'
                                 THEN l_extendedprice ELSE 0 END
                            AS DECIMAL(38,6)))
    ),
    cross_sales AS (
      SELECT p_name AS product_name,
             p_partkey AS item_sk,
             s_name AS store_name,
             cn.n_name AS cust_nation,
             sn.n_name AS supp_nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS syear,
             COUNT(*) AS cnt,
             SUM(CAST(l_quantity AS DECIMAL(38,6))) AS s1_dec,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS s2_dec,
             SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
               AS s3_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN region ON sn.n_regionkey = r_regionkey
      JOIN part ON l_partkey = p_partkey
      JOIN cs_ui ON l_partkey = cs_ui.pk
      WHERE cn.n_name <> sn.n_name
      GROUP BY 1, 2, 3, 4, 5, 6
    )
    SELECT cs1.product_name, cs1.store_name, cs1.cust_nation,
           cs1.supp_nation, cs1.item_sk,
           cs1.cnt AS cnt1,
           CAST(cs1.s1_dec AS DOUBLE) AS qty1,
           CAST(cs1.s2_dec AS DOUBLE) AS price1,
           CAST(cs1.s3_dec AS DOUBLE) AS disc1,
           cs2.cnt AS cnt2,
           CAST(cs2.s1_dec AS DOUBLE) AS qty2,
           CAST(cs2.s2_dec AS DOUBLE) AS price2,
           CAST(cs2.s3_dec AS DOUBLE) AS disc2
    FROM cross_sales cs1
    JOIN cross_sales cs2
      ON cs1.item_sk = cs2.item_sk
     AND cs1.store_name = cs2.store_name
     AND cs1.cust_nation = cs2.cust_nation
     AND cs1.supp_nation = cs2.supp_nation
    WHERE cs1.syear = 1996 AND cs2.syear = 1997 AND cs2.cnt <= cs1.cnt
    ORDER BY cs1.product_name, cs1.store_name, cs2.cnt,
             cs1.item_sk, cs1.cust_nation, cs1.supp_nation
    LIMIT 100
"""


@query(
    "qds64_two_cycle_sales",
    bench=True,  # r10 VERDICT #3: TPC-DS heavies tracked round-over-round
    oracle=_QDS64_SQL,
    covers="§2.B TPC-DS q64 shape: HAVING-gated returns CTE + 9-relation "
    "star (same-dim alias inequality) self-joined across two years",
)
def qds64_two_cycle_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-border part sales grouped per (part, supplier, customer
    nation, supplier nation, year), paired 1996→1997 where the second
    cycle sold no more than the first (reference q64's two-cycle join).

    Scale: cs_ui is one map-side-combinable aggregation over the fact
    (HAVING compares two exact decimal sums — no ratio, no rounding)
    and enters the star as a left-semi join; nation/region broadcast;
    the same nation table is joined twice under different aliases with
    an inequality between them (q64's cd1 <> cd2 shape).

    r12 (optimization guide §2.4): the two-cycle self-join's keys are
    the full group key minus year, so the 1996→1997 pairing collapses
    into ONE conditional aggregation — per-year CASE sums in a single
    groupBy (inner-join-both-years-exist ⇔ both conditional counts
    > 0; the qds4/qds38 membership discipline). That removes the
    eager ``localCheckpoint`` materialization, both post-checkpoint
    exchanges, the sorts, and the SortMergeJoin, and lets the
    1996/1997 year screen push all the way into the orders scan
    (the old plan aggregated every year, then filtered).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    cs_ui = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(dec(F.col("l_extendedprice"))).alias("sale_dec"),
            F.sum(
                dec(
                    F.when(
                        F.col("l_returnflag") == "R", F.col("l_extendedprice")
                    ).otherwise(F.lit(0))
                )
            ).alias("refund_dec"),
        )
        .filter(F.col("sale_dec") > 2 * F.col("refund_dec"))
        .select(F.col("l_partkey").alias("pk"))
    )
    cn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
            "n_regionkey",
        )
    )
    syear = F.year("o_orderdate").cast("long")

    def per_year(year, col, alias):
        return F.sum(F.when(F.col("syear") == year, col)).alias(alias)

    cross_sales = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.year("o_orderdate").isin(1996, 1997))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(cs_ui, F.col("l_partkey") == F.col("pk"), "left_semi")
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .select(
            F.col("p_name").alias("product_name"),
            F.col("p_partkey").alias("item_sk"),
            F.col("s_name").alias("store_name"),
            "cust_nation",
            "supp_nation",
            syear.alias("syear"),
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        )
        .groupBy(
            "product_name", "item_sk", "store_name", "cust_nation", "supp_nation"
        )
        .agg(
            F.count(F.when(F.col("syear") == 1996, 1)).alias("cnt1"),
            per_year(1996, dec(F.col("l_quantity")), "s1_dec"),
            per_year(1996, dec(F.col("l_extendedprice")), "s2_dec"),
            per_year(
                1996, dec(F.col("l_extendedprice") * F.col("l_discount")), "s3_dec"
            ),
            F.count(F.when(F.col("syear") == 1997, 1)).alias("cnt2"),
            per_year(1997, dec(F.col("l_quantity")), "s1_dec2"),
            per_year(1997, dec(F.col("l_extendedprice")), "s2_dec2"),
            per_year(
                1997, dec(F.col("l_extendedprice") * F.col("l_discount")), "s3_dec2"
            ),
        )
    )
    return (
        cross_sales.filter(
            (F.col("cnt1") > 0) & (F.col("cnt2") > 0) & (F.col("cnt2") <= F.col("cnt1"))
        )
        .select(
            "product_name",
            "store_name",
            "cust_nation",
            "supp_nation",
            "item_sk",
            "cnt1",
            F.col("s1_dec").cast("double").alias("qty1"),
            F.col("s2_dec").cast("double").alias("price1"),
            F.col("s3_dec").cast("double").alias("disc1"),
            "cnt2",
            F.col("s1_dec2").cast("double").alias("qty2"),
            F.col("s2_dec2").cast("double").alias("price2"),
            F.col("s3_dec2").cast("double").alias("disc2"),
        )
        .orderBy(
            "product_name",
            "store_name",
            "cnt2",
            "item_sk",
            "cust_nation",
            "supp_nation",
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# q78 shape: three-channel rollup with returns removed by an anti
# pattern (reference examples/tpcds/queries/q78.sql).
# --------------------------------------------------------------------------

_QDS78_CHANNELS = ("3-MEDIUM", "1-URGENT", "2-HIGH")  # ss, ws, cs

_QDS78_SQL = f"""
    WITH ret AS (
      SELECT l_orderkey AS r_orderkey, l_linenumber AS r_linenumber
      FROM lineitem WHERE l_returnflag = 'R'
    ),
    chan AS (
      SELECT o_orderpriority,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS sold_year,
             l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(38,6))) AS qty_dec,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS wc_dec,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
               AS sp_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN ret ON l_orderkey = r_orderkey
                   AND l_linenumber = r_linenumber
      WHERE r_orderkey IS NULL
      GROUP BY 1, 2, 3
    )
    SELECT ss.l_partkey AS partkey,
           CAST(ss.qty_dec AS DOUBLE)
             / CAST(ws.qty_dec + cs.qty_dec AS DOUBLE) AS ratio,
           CAST(ss.qty_dec AS DOUBLE) AS store_qty,
           CAST(ss.wc_dec AS DOUBLE) AS store_wholesale_cost,
           CAST(ss.sp_dec AS DOUBLE) AS store_sales_price,
           CAST(ws.qty_dec + cs.qty_dec AS DOUBLE) AS other_chan_qty,
           CAST(ws.wc_dec + cs.wc_dec AS DOUBLE)
             AS other_chan_wholesale_cost,
           CAST(ws.sp_dec + cs.sp_dec AS DOUBLE) AS other_chan_sales_price
    FROM (SELECT * FROM chan
          WHERE o_orderpriority = '{_QDS78_CHANNELS[0]}') ss
    LEFT JOIN (SELECT * FROM chan
               WHERE o_orderpriority = '{_QDS78_CHANNELS[1]}') ws
      ON ss.sold_year = ws.sold_year AND ss.l_partkey = ws.l_partkey
    LEFT JOIN (SELECT * FROM chan
               WHERE o_orderpriority = '{_QDS78_CHANNELS[2]}') cs
      ON ss.sold_year = cs.sold_year AND ss.l_partkey = cs.l_partkey
    WHERE COALESCE(CAST(ws.qty_dec AS DOUBLE), 0) > 0
      AND COALESCE(CAST(cs.qty_dec AS DOUBLE), 0) > 0
      AND ss.sold_year = 1996
    ORDER BY ratio, store_qty DESC, store_wholesale_cost DESC,
             store_sales_price DESC, other_chan_qty,
             other_chan_wholesale_cost, other_chan_sales_price, partkey
    LIMIT 100
"""


@query(
    "qds78_channel_rollup",
    oracle=_QDS78_SQL,
    covers="§2.B TPC-DS q78 shape: returns removed by LEFT-JOIN-IS-NULL "
    "anti pattern, three channels LEFT-JOINed and null-filtered",
)
def qds78_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part 1996 quantity ratio of the MEDIUM channel vs the URGENT
    + HIGH channels, counting only never-returned lines (q78's
    cross-channel customer loyalty shape).

    Scale: returned lines are removed with a genuine ``left_anti`` join
    against the derived returns relation (the reference spells it LEFT
    JOIN ... IS NULL; Spark's anti join is the same plan without the
    null-scan). The three-channel LEFT JOIN re-reads the fact once per
    channel in the reference; here the channel column is CASE-split
    inside ONE aggregation over (year, partkey) — single fact scan,
    single shuffle (the qds49 pattern; the oracle keeps the faithful
    three-CTE LEFT JOIN spelling, proving equivalence). The null
    filters on ws/cs quantities reproduce the LEFT-JOIN null-filter
    semantics exactly: a conditional sum is NULL precisely when the
    channel had no rows. The ratio is one IEEE division of exact
    decimal sums — no rounding (the reference's round(...,2) of a
    quotient is the exact cross-engine trap CLAUDE.md documents).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ret = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_linenumber").alias("r_linenumber"),
    )
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    kept = li.join(
        ret,
        (F.col("l_orderkey") == F.col("r_orderkey"))
        & (F.col("l_linenumber") == F.col("r_linenumber")),
        "left_anti",
    )
    ss_ch, ws_ch, cs_ch = _QDS78_CHANNELS

    def chan_sum(ch: str, col, alias: str):
        return F.sum(
            F.when(F.col("o_orderpriority") == ch, dec(col))
        ).alias(alias)

    agg = (
        kept.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.year("o_orderdate").cast("long").alias("sold_year"),
            "l_partkey",
        )
        .agg(
            chan_sum(ss_ch, F.col("l_quantity"), "ss_qty"),
            chan_sum(ss_ch, F.col("l_extendedprice"), "ss_wc"),
            chan_sum(
                ss_ch,
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "ss_sp",
            ),
            chan_sum(ws_ch, F.col("l_quantity"), "ws_qty"),
            chan_sum(ws_ch, F.col("l_extendedprice"), "ws_wc"),
            chan_sum(
                ws_ch,
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "ws_sp",
            ),
            chan_sum(cs_ch, F.col("l_quantity"), "cs_qty"),
            chan_sum(cs_ch, F.col("l_extendedprice"), "cs_wc"),
            chan_sum(
                cs_ch,
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "cs_sp",
            ),
        )
    )
    return (
        agg.filter(
            (F.col("sold_year") == 1996)
            & F.col("ss_qty").isNotNull()
            & (F.coalesce(F.col("ws_qty").cast("double"), F.lit(0.0)) > 0)
            & (F.coalesce(F.col("cs_qty").cast("double"), F.lit(0.0)) > 0)
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            (
                F.col("ss_qty").cast("double")
                / (F.col("ws_qty") + F.col("cs_qty")).cast("double")
            ).alias("ratio"),
            F.col("ss_qty").cast("double").alias("store_qty"),
            F.col("ss_wc").cast("double").alias("store_wholesale_cost"),
            F.col("ss_sp").cast("double").alias("store_sales_price"),
            (F.col("ws_qty") + F.col("cs_qty"))
            .cast("double")
            .alias("other_chan_qty"),
            (F.col("ws_wc") + F.col("cs_wc"))
            .cast("double")
            .alias("other_chan_wholesale_cost"),
            (F.col("ws_sp") + F.col("cs_sp"))
            .cast("double")
            .alias("other_chan_sales_price"),
        )
        .orderBy(
            "ratio",
            F.col("store_qty").desc(),
            F.col("store_wholesale_cost").desc(),
            F.col("store_sales_price").desc(),
            "other_chan_qty",
            "other_chan_wholesale_cost",
            "other_chan_sales_price",
            "partkey",
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# q75 shape: per-channel net sales (returns netted via LEFT JOIN +
# COALESCE), UNION-deduped across channels, year-over-year self-join on
# declining groups (reference examples/tpcds/queries/q75.sql).
# --------------------------------------------------------------------------

_QDS75_SQL = """
    WITH ret AS (
      SELECT l_orderkey AS r_ok, l_partkey AS r_pk,
             SUM(CAST(l_quantity AS BIGINT)) AS r_qty
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2
    ),
    leg_expedite AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year,
             p_brand, p_type,
             CAST(l_quantity AS BIGINT) - COALESCE(r_qty, 0) AS net_qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      LEFT JOIN ret ON l_orderkey = r_ok AND l_partkey = r_pk
      WHERE l_returnflag <> 'R'
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    ),
    leg_standard AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year,
             p_brand, p_type,
             CAST(l_quantity AS BIGINT) - COALESCE(r_qty, 0) AS net_qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      LEFT JOIN ret ON l_orderkey = r_ok AND l_partkey = r_pk
      WHERE l_returnflag <> 'R'
        AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    ),
    all_sales AS (
      SELECT d_year, p_brand, p_type, CAST(SUM(net_qty) AS BIGINT) AS cnt
      FROM (SELECT * FROM leg_expedite UNION SELECT * FROM leg_standard) u
      GROUP BY 1, 2, 3
    )
    SELECT prev.p_brand AS p_brand, prev.p_type AS p_type,
           prev.cnt AS prev_cnt, curr.cnt AS curr_cnt,
           curr.cnt - prev.cnt AS cnt_diff
    FROM all_sales curr
    JOIN all_sales prev
      ON curr.p_brand = prev.p_brand AND curr.p_type = prev.p_type
     AND curr.d_year = 1997 AND prev.d_year = 1996
    WHERE curr.cnt < prev.cnt
    ORDER BY cnt_diff, p_brand, p_type
    LIMIT 100
"""


@query(
    "qds75_yoy_channel_decline",
    oracle=_QDS75_SQL,
    covers="§2.B TPC-DS q75 shape: per-channel net sales (returns "
    "netted via LEFT JOIN + COALESCE), UNION-deduped, year-over-year "
    "declining groups",
)
def qds75_yoy_channel_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(brand, type) groups whose 1997 net sold quantity fell below
    1996, with returns netted out per order+part before aggregation.

    Scale: the reference UNION-dedups two channel legs that differ only
    in a disjoint priority predicate; since every line belongs to
    exactly one leg and the channel column is dropped before the UNION,
    the two-leg UNION is exactly DISTINCT over ONE combined scan — so
    the Spark plan reads the fact once, not once per channel (the
    oracle keeps the faithful two-leg spelling, proving equivalence).
    Returns pre-aggregate per (orderkey, partkey) before the LEFT JOIN
    — line-grain equi join, no fan-out blowup. r12 (optimization guide
    §2.4): the year self-join over the (year, brand, type) aggregate
    (and its localCheckpoint) is gone — prev/curr are conditional year
    cells of ONE per-(brand, type) aggregation (the qds4 pivot
    discipline: inner join of two ≤1-row arms ⇔ both conditional sums
    non-NULL — net_qty is never NULL, so a non-NULL cell ⇔ the year
    group existed), and the 1996/1997 screen now pushes into the
    orders scan (other years never survived the self-join's year
    pins). Net quantities are exact BIGINTs end-to-end (l_quantity is
    integral in this corpus), so the decline predicate and ORDER BY
    need no rounding; (brand, type) is the join key, making the LIMIT
    tiebreak unique.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    part = load_table(spark, sf_dir, "part")
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(
            F.col("l_orderkey").alias("r_ok"),
            F.col("l_partkey").alias("r_pk"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("r_qty"))
    )
    base = (
        li.filter(F.col("l_returnflag") != "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ret,
            (F.col("l_orderkey") == F.col("r_ok"))
            & (F.col("l_partkey") == F.col("r_pk")),
            "left",
        )
        .select(
            F.year("o_orderdate").cast("bigint").alias("d_year"),
            "p_brand",
            "p_type",
            (
                F.col("l_quantity").cast("bigint")
                - F.coalesce(F.col("r_qty"), F.lit(0))
            ).alias("net_qty"),
        )
        .distinct()  # == the reference's two-leg UNION (legs disjoint)
    )
    # r12: prev/curr year cells of one per-(brand, type) aggregation —
    # no checkpoint, no self-join of the aggregate
    all_sales = base.groupBy("p_brand", "p_type").agg(
        F.sum(F.when(F.col("d_year") == 1996, F.col("net_qty"))).alias(
            "prev_cnt"
        ),
        F.sum(F.when(F.col("d_year") == 1997, F.col("net_qty"))).alias(
            "curr_cnt"
        ),
    )
    return (
        all_sales.filter(
            F.col("prev_cnt").isNotNull() & F.col("curr_cnt").isNotNull()
        )
        .filter(F.col("curr_cnt") < F.col("prev_cnt"))
        .select(
            "p_brand",
            "p_type",
            "prev_cnt",
            "curr_cnt",
            (F.col("curr_cnt") - F.col("prev_cnt")).alias("cnt_diff"),
        )
        .orderBy("cnt_diff", "p_brand", "p_type")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q97 shape: distinct (customer, item) pairs per channel, FULL OUTER
# JOIN overlap counts (reference examples/tpcds/queries/q97.sql).
# --------------------------------------------------------------------------

_QDS97_SQL = """
    WITH expedite AS (
      SELECT o_custkey AS ck, l_partkey AS pk
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_custkey, l_partkey
    ),
    standard AS (
      SELECT o_custkey AS ck, l_partkey AS pk
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      GROUP BY o_custkey, l_partkey
    )
    SELECT
      CAST(SUM(CASE WHEN expedite.ck IS NOT NULL AND standard.ck IS NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS expedite_only,
      CAST(SUM(CASE WHEN expedite.ck IS NULL AND standard.ck IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS standard_only,
      CAST(SUM(CASE WHEN expedite.ck IS NOT NULL AND standard.ck IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS both_channels
    FROM expedite
    FULL OUTER JOIN standard
      ON expedite.ck = standard.ck AND expedite.pk = standard.pk
"""


@query(
    "qds97_channel_overlap",
    oracle=_QDS97_SQL,
    covers="§2.B TPC-DS q97 shape: distinct (customer, item) pairs per "
    "channel, FULL OUTER JOIN three-way overlap counts",
)
def qds97_channel_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many (customer, part) pairs bought only expedited, only
    standard, or through both priority channels (q97's store/catalog
    overlap census).

    Scale (r12): the oracle keeps the two-leg FULL OUTER spelling;
    Spark ran the lineitem⋈orders join once PER LEG (the legs are
    complementary priority slices of the SAME join). The executed form
    is the qds38 membership-flag discipline: ONE fact join, one
    (ck, pk) aggregation carrying a MAX(CASE) flag per channel, and a
    scalar count of each flag combination — identical pair presence
    (a pair is in a leg iff its flag is 1; FULL OUTER null patterns ⇔
    flag patterns). 4 scans + 2 aggs + FOJ → 2 scans + 1 agg. Three
    exact BIGINTs, trivially deterministic; no driver-side state.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    pairs = joined.groupBy(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk")
    ).agg(
        F.max(F.when(hi, 1).otherwise(0)).alias("has_e"),
        F.max(F.when(~hi, 1).otherwise(0)).alias("has_s"),
    )
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return pairs.agg(
        flag((F.col("has_e") == 1) & (F.col("has_s") == 0)).alias(
            "expedite_only"
        ),
        flag((F.col("has_e") == 0) & (F.col("has_s") == 1)).alias(
            "standard_only"
        ),
        flag((F.col("has_e") == 1) & (F.col("has_s") == 1)).alias(
            "both_channels"
        ),
    )


# --------------------------------------------------------------------------
# q21 shape: before/after quantity balance around a pivot date per
# (warehouse, item), ratio-banded (reference examples/tpcds/queries/q21.sql).
# --------------------------------------------------------------------------

_QDS21_SQL = """
    SELECT n_name, p_brand, inv_before, inv_after
    FROM (
      SELECT n_name, p_brand,
             CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
                 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
               AS inv_before,
             CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
                 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
               AS inv_after
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_retailprice BETWEEN 905 AND 915
        AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
      GROUP BY n_name, p_brand
    ) x
    WHERE inv_before > 0
      AND 3 * inv_after >= 2 * inv_before
      AND 2 * inv_after <= 3 * inv_before
    ORDER BY n_name, p_brand
    LIMIT 100
"""


@query(
    "qds21_shipflow_balance",
    oracle=_QDS21_SQL,
    covers="§2.B TPC-DS q21 shape: before/after quantity balance around "
    "a pivot date per (warehouse, item), ratio-banded in [2/3, 3/2]",
)
def qds21_shipflow_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(supplier nation, brand) groups whose shipped quantity stayed
    within [2/3, 3/2] across the 1997-07-01 pivot (q21's warehouse
    inventory-balance screen; supplier nation stands in for the
    warehouse, brand for the item).

    Scale: date fringe and price band reach the parquet scan as pushed
    filters; the conditional split is map-side (one CASE per row, no
    second scan); one hash aggregation on a bounded (25 nations × 25
    brands) key; nation and the price-banded part dimension broadcast.
    The reference's ``inv_after / inv_before BETWEEN 2.0/3.0 AND
    3.0/2.0`` divides doubles — here the band is the pure-integer
    cross-multiplication ``3·after ≥ 2·before AND 2·after ≤ 3·before``
    (quantities are integral, sums ≪ 2^53), so both engines evaluate
    identical integer arithmetic and the screen is exact.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_retailprice").between(905, 915)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pivot = F.lit("1997-07-01 00:00:00").cast("timestamp")
    qty = F.col("l_quantity").cast("bigint")
    agg = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "p_brand")
        .agg(
            F.sum(F.when(F.col("l_shipdate") < pivot, qty).otherwise(0)).alias(
                "inv_before"
            ),
            F.sum(F.when(F.col("l_shipdate") >= pivot, qty).otherwise(0)).alias(
                "inv_after"
            ),
        )
    )
    return (
        agg.filter(
            (F.col("inv_before") > 0)
            & (3 * F.col("inv_after") >= 2 * F.col("inv_before"))
            & (2 * F.col("inv_after") <= 3 * F.col("inv_before"))
        )
        .orderBy("n_name", "p_brand")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q16 shape: COUNT(DISTINCT) + sums under EXISTS (same order, different
# supplier) AND NOT EXISTS (order has returns)
# (reference examples/tpcds/queries/q16.sql).
# --------------------------------------------------------------------------

_QDS16_SQL = """
    SELECT CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS order_count,
           CAST(SUM(CAST(l1.l_extendedprice * (1 + l1.l_tax)
                    AS DECIMAL(38,6))) AS DOUBLE) AS total_charge
    FROM lineitem l1
    JOIN orders ON l1.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                          AND TIMESTAMP '1996-12-31 00:00:00'
      AND n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7',
                     'NATION_9', 'NATION_11', 'NATION_13', 'NATION_15')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l1.l_orderkey = l2.l_orderkey
                    AND l1.l_suppkey <> l2.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l1.l_orderkey = l3.l_orderkey
                        AND l3.l_returnflag = 'R')
"""


@query(
    "qds16_multi_supplier_clean",
    oracle=_QDS16_SQL,
    covers="§2.B TPC-DS q16 shape: COUNT(DISTINCT) + sums under "
    "correlated EXISTS (different supplier, same order) and NOT EXISTS "
    "(order has returns)",
)
def qds16_multi_supplier_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 1996 orders (and their total charge) from selected
    customer nations that were supplied by MORE than one supplier and
    had NO returned line (q16's multi-warehouse no-returns ship
    screen).

    Scale: the correlated ``EXISTS l2 (same order, different
    supplier)`` holds for a line iff its order has ≥2 distinct
    suppliers, so the Spark plan replaces the correlated probe with a
    pre-aggregated multi-supplier orderkey set and a ``left_semi``
    join; ``NOT EXISTS returns`` becomes a ``left_anti`` join against
    the R-flagged orderkeys — every probe is an equi join on the
    natural shuffle key, never a per-row subquery (the oracle keeps the
    faithful EXISTS/NOT EXISTS spelling, proving equivalence). Customer
    and nation broadcast. COUNT(DISTINCT orderkey) is exact; the charge
    sums through DECIMAL(38,6) to one final DOUBLE cast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31 00:00:00").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_1", "NATION_3", "NATION_5", "NATION_7",
            "NATION_9", "NATION_11", "NATION_13", "NATION_15",
        )
    )
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select(F.col("l_orderkey").alias("m_orderkey"))
    )
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("x_orderkey"))
        .distinct()
    )
    base = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            multi_supp, F.col("l_orderkey") == F.col("m_orderkey"), "left_semi"
        )
        .join(
            returned, F.col("l_orderkey") == F.col("x_orderkey"), "left_anti"
        )
    )
    charge = (F.col("l_extendedprice") * (1 + F.col("l_tax"))).cast(
        "decimal(38,6)"
    )
    return base.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("order_count"),
        F.sum(charge).cast("double").alias("total_charge"),
    )


# --------------------------------------------------------------------------
# q66 shape: 12-month CASE pivot into wide columns per (warehouse,
# year), carriers UNION ALL then re-summed
# (reference examples/tpcds/queries/q66.sql).
# --------------------------------------------------------------------------

_MONTHS = (
    "jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec",
)

_QDS66_MONTH_COLS = ",\n             ".join(
    f"CAST(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = {i + 1} "
    f"THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) "
    f"ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS {m}_sales,\n             "
    f"CAST(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = {i + 1} "
    f"THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS {m}_qty"
    for i, m in enumerate(_MONTHS)
)

_QDS66_OUTER_COLS = ",\n           ".join(
    f"CAST(SUM(CAST({m}_sales AS DECIMAL(38,6))) AS DOUBLE) AS {m}_sales,\n           "
    f"CAST(SUM({m}_qty) AS BIGINT) AS {m}_qty"
    for m in _MONTHS
)

_QDS66_SQL = f"""
    WITH leg AS (
      SELECT n_name, carrier, {_QDS66_MONTH_COLS}
      FROM (
        SELECT n_name,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'EXPEDITE' ELSE 'STANDARD' END AS carrier,
               l_shipdate, l_extendedprice, l_discount, l_quantity
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
      ) src
      GROUP BY n_name, carrier
    )
    SELECT n_name, {_QDS66_OUTER_COLS}
    FROM leg
    GROUP BY n_name
    ORDER BY n_name
    LIMIT 100
"""


@query(
    "qds66_monthly_pivot",
    oracle=_QDS66_SQL,
    covers="§2.B TPC-DS q66 shape: 12-month CASE pivot into 24 wide "
    "columns per warehouse, carrier legs re-summed",
)
def qds66_monthly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1997 monthly sales and quantity, pivoted into 24 wide columns
    per supplier nation (q66's warehouse × carrier monthly report; the
    carrier legs come from order-priority groups).

    Scale: the whole pivot is map-side CASE arithmetic — 24 conditional
    aggregates computed in ONE pass over the date-pruned fact, one hash
    aggregation keyed by (nation, carrier), then a second tiny
    aggregation folds the carrier legs (the reference spells the legs
    as a UNION ALL of two channel scans; priorities are disjoint so one
    CASE-tagged scan is the same relation). No per-month re-scan, no
    join wider than the broadcast dims. Sales columns are exact decimal
    sums cast to DOUBLE once; quantity columns are exact BIGINTs —
    every one of the 24 value columns is deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    src = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
                F.lit("EXPEDITE"),
            )
            .otherwise(F.lit("STANDARD"))
            .alias("carrier"),
            F.month("l_shipdate").alias("moy"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(38,6)")
            .alias("rev"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
    )
    month_aggs = []
    for i, m in enumerate(_MONTHS):
        hit = F.col("moy") == i + 1
        month_aggs.append(
            F.sum(
                F.when(hit, F.col("rev")).otherwise(
                    F.lit(0).cast("decimal(38,6)")
                )
            ).alias(f"{m}_sales_dec")
        )
        month_aggs.append(
            F.sum(F.when(hit, F.col("qty")).otherwise(0)).alias(f"{m}_qty")
        )
    leg = src.groupBy("n_name", "carrier").agg(*month_aggs)
    outer_aggs = []
    for m in _MONTHS:
        outer_aggs.append(
            F.sum(F.col(f"{m}_sales_dec"))
            .cast("double")
            .alias(f"{m}_sales")
        )
        outer_aggs.append(
            F.sum(F.col(f"{m}_qty")).cast("bigint").alias(f"{m}_qty")
        )
    cols = ["n_name"]
    for m in _MONTHS:
        cols += [f"{m}_sales", f"{m}_qty"]
    return (
        leg.groupBy("n_name")
        .agg(*outer_aggs)
        .select(*cols)
        .orderBy("n_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q98 shape: revenue ratio-to-report within class via window SUM over
# the aggregate (reference examples/tpcds/queries/q98.sql).
# --------------------------------------------------------------------------

_QDS98_SQL = """
    WITH agg AS (
      SELECT p_type, p_brand,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
               AS rev_dec
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_type IN ('ECONOMY', 'STANDARD', 'PROMO')
        AND l_shipdate BETWEEN TIMESTAMP '1997-03-01 00:00:00'
                           AND TIMESTAMP '1997-03-31 00:00:00'
      GROUP BY p_type, p_brand
    )
    SELECT p_type, p_brand,
           CAST(rev_dec AS DOUBLE) AS itemrevenue,
           CAST(rev_dec AS DOUBLE) * 100
             / CAST(SUM(rev_dec) OVER (PARTITION BY p_type) AS DOUBLE)
             AS revenueratio
    FROM agg
    ORDER BY p_type, p_brand
    LIMIT 100
"""


@query(
    "qds98_class_revenue_ratio",
    oracle=_QDS98_SQL,
    covers="§2.B TPC-DS q98 shape: per-item revenue with its "
    "ratio-to-report share of the class total via window SUM over the "
    "aggregate",
)
def qds98_class_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """March-1997 revenue per (type, brand) with each brand's percent
    share of its type's total (q98's ratio-to-report within class).

    Scale: one date+type-pruned fact pass into a hash aggregation on
    (type, brand); the class total is a window SUM over the aggregated
    rows — a second pass over ~150 rows, not the fact (the naive
    spelling joins the aggregate back to a per-class total; the window
    is the one-exchange plan). Determinism: revenues are exact decimal
    sums; the ratio is ``CAST(rev AS DOUBLE) * 100 / CAST(total AS
    DOUBLE)`` — a multiply and one IEEE division of engine-identical
    doubles, so no rounding is needed; ORDER BY (type, brand) is the
    group key, a unique tiebreak.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-03-31 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").isin("ECONOMY", "STANDARD", "PROMO")
    )
    agg = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("rev_dec")
        )
    )
    w = W.partitionBy("p_type")
    return (
        agg.select(
            "p_type",
            "p_brand",
            F.col("rev_dec").cast("double").alias("itemrevenue"),
            (
                F.col("rev_dec").cast("double")
                * 100
                / F.sum("rev_dec").over(w).cast("double")
            ).alias("revenueratio"),
        )
        .orderBy("p_type", "p_brand")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q9 shape: scalar-subquery CASE buckets — five quantity bands, each
# picking between two global aggregates by a count threshold
# (reference examples/tpcds/queries/q9.sql).
# --------------------------------------------------------------------------

_QDS9_BANDS = ((1, 10), (11, 20), (21, 30), (31, 40), (41, 50))
#: alternating thresholds keep BOTH branches exercised at every SF
#: (a single literal would flip branches as counts scale with SF)
_QDS9_THRESHOLDS = (0, 10**15, 0, 10**15, 0)

_QDS9_SQL = "SELECT " + ",\n       ".join(
    f"CASE WHEN (SELECT COUNT(*) FROM lineitem "
    f"WHERE l_quantity BETWEEN {lo} AND {hi}) > {thr} "
    f"THEN (SELECT CAST(SUM(CAST(l_extendedprice * l_discount "
    f"AS DECIMAL(38,6))) AS DOUBLE) FROM lineitem "
    f"WHERE l_quantity BETWEEN {lo} AND {hi}) "
    f"ELSE (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) "
    f"AS DOUBLE) FROM lineitem "
    f"WHERE l_quantity BETWEEN {lo} AND {hi}) END AS bucket{i + 1}"
    for i, ((lo, hi), thr) in enumerate(zip(_QDS9_BANDS, _QDS9_THRESHOLDS))
)

# r12 single-pass form: the oracle's fifteen scalar subqueries are
# fifteen global aggregates over disjoint-band slices of ONE table —
# one conditional aggregation computes every (count, discount-sum,
# gross-sum) triple in a single lineitem pass. A scalar-subquery SUM
# over an empty slice is NULL exactly like a conditional SUM with no
# matching rows, and COUNT(*)-with-WHERE equals the conditional COUNT,
# so every CASE input is identical; exact DECIMAL(38,6) sums make the
# fold order-insensitive.
_QDS9_SPARK_SQL = (
    "SELECT "
    + ",\n       ".join(
        f"CASE WHEN cnt{i + 1} > {thr} THEN disc{i + 1} "
        f"ELSE gross{i + 1} END AS bucket{i + 1}"
        for i, (_, thr) in enumerate(zip(_QDS9_BANDS, _QDS9_THRESHOLDS))
    )
    + "\nFROM (SELECT "
    + ",\n             ".join(
        f"COUNT(CASE WHEN l_quantity BETWEEN {lo} AND {hi} THEN 1 END)"
        f" AS cnt{i + 1},\n             "
        f"CAST(SUM(CASE WHEN l_quantity BETWEEN {lo} AND {hi} "
        f"THEN CAST(l_extendedprice * l_discount AS DECIMAL(38,6)) END) "
        f"AS DOUBLE) AS disc{i + 1},\n             "
        f"CAST(SUM(CASE WHEN l_quantity BETWEEN {lo} AND {hi} "
        f"THEN CAST(l_extendedprice AS DECIMAL(38,6)) END) "
        f"AS DOUBLE) AS gross{i + 1}"
        for i, (lo, hi) in enumerate(_QDS9_BANDS)
    )
    + "\n      FROM lineitem) agg"
)


@query(
    "qds9_quantity_buckets",
    oracle=_QDS9_SQL,
    covers="§2.B TPC-DS q9 shape: CASE over scalar subqueries — five "
    "quantity bands each choosing between two global aggregates by a "
    "count threshold",
)
def qds9_quantity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row of five bucket values, each a CASE over three scalar
    subqueries (count threshold picks discount volume vs gross price)
    — q9's scalar-subquery stress shape: fifteen independent global
    aggregates in a single projection.

    Scale (r12): the oracle spells fifteen scalar subqueries; Spark
    planned each as its own full lineitem pass (15 scans). The Spark
    side now computes all fifteen values in ONE conditional
    aggregation over a single scan (disjoint quantity bands → CASE-
    tagged COUNT/SUM columns), then assembles the same CASE choices in
    a projection over the 1-row aggregate. Empty-band NULL semantics
    and the exact DECIMAL(38,6)→DOUBLE casts are identical to the
    scalar-subquery spelling, so the fold is bit-exact. Determinism:
    the chosen branch per bucket is fixed by alternating literal
    thresholds (0 vs 10^15) so both branches run at every SF.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS9_SPARK_SQL)


# --------------------------------------------------------------------------
# q33 shape: three channel legs aggregated by manufacturer over an
# IN-subquery item filter, UNION ALL, re-aggregated
# (reference examples/tpcds/queries/q33.sql).
# --------------------------------------------------------------------------

_QDS33_LEG = """
      SELECT p_brand,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
               AS sales_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_type IN (SELECT p_type FROM part WHERE p_size < 25)
        AND EXTRACT(YEAR FROM o_orderdate) = 1997
        AND EXTRACT(MONTH FROM o_orderdate) = 5
        AND {pred}
      GROUP BY p_brand
"""

_QDS33_SQL = f"""
    WITH leg1 AS ({_QDS33_LEG.format(pred="o_orderpriority = '1-URGENT'")}),
    leg2 AS ({_QDS33_LEG.format(
        pred="o_orderpriority IN ('2-HIGH', '3-MEDIUM')")}),
    leg3 AS ({_QDS33_LEG.format(
        pred="o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')")})
    SELECT p_brand,
           CAST(SUM(CAST(sales_dec AS DECIMAL(38,6))) AS DOUBLE)
             AS total_sales
    FROM (SELECT * FROM leg1 UNION ALL SELECT * FROM leg2
          UNION ALL SELECT * FROM leg3) u
    GROUP BY p_brand
    ORDER BY p_brand
    LIMIT 100
"""


# r12 single-pass form: the three legs differ ONLY in disjoint
# o_orderpriority predicates whose union is the full priority domain,
# and the outer re-aggregation SUMs the per-leg exact decimal sums per
# brand — additive over a disjoint row partition, so one pass with the
# combined IN filter computes the identical value (the IN list keeps
# the row set equal to the legs' union even if the data ever carried
# another priority value).
_QDS33_SPARK_SQL = """
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS total_sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_type IN (SELECT p_type FROM part WHERE p_size < 25)
      AND EXTRACT(YEAR FROM o_orderdate) = 1997
      AND EXTRACT(MONTH FROM o_orderdate) = 5
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
                              '4-NOT SPECIFIED', '5-LOW')
    GROUP BY p_brand
    ORDER BY p_brand
    LIMIT 100
"""


@query(
    "qds33_union_leg_reagg",
    oracle=_QDS33_SQL,
    covers="§2.B TPC-DS q33 shape: three channel legs aggregated by "
    "manufacturer over an IN-subquery item filter, UNION ALL, "
    "re-aggregated",
)
def qds33_union_leg_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """May-1997 brand sales summed across three priority channels, each
    leg restricted to item types picked by an IN subquery (q33's
    three-channel manufacturer census).

    Scale (r12): the oracle keeps the faithful three-leg UNION ALL
    spelling; Spark ran the lineitem⋈orders⋈part star once PER LEG
    (three fact passes). The legs differ only in disjoint priority
    predicates and the re-aggregation sums exact decimals per brand,
    so the Spark side now runs ONE star pass with the combined
    priority IN filter — bit-identical totals (additive exact sums
    over a disjoint partition). The IN subquery over the part
    dimension stays a broadcast semi join; one (brand) hash
    aggregation; ORDER BY brand is unique.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS33_SPARK_SQL)


# --------------------------------------------------------------------------
# wave 4 (late r7, below the frozen driver-sample cut — r8 rotation
# priority): q1, q59, q65, q99 shapes.
# --------------------------------------------------------------------------

# q1 shape: per-customer return totals screened against 1.2× the
# per-store average via a correlated scalar subquery
# (reference examples/tpcds/queries/q1.sql).

_QDS1_SQL = """
    WITH ctr AS (
      SELECT o_custkey AS ctr_customer, n_name AS ctr_store,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS ret_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    )
    SELECT c_name, ctr_store AS store,
           CAST(ret_dec AS DOUBLE) AS total_return
    FROM ctr ctr1
    JOIN customer ON ctr_customer = c_custkey
    WHERE CAST(ret_dec AS DOUBLE) >
      (SELECT 1.2 * (CAST(SUM(ctr2.ret_dec) AS DOUBLE) / COUNT(*))
       FROM ctr ctr2 WHERE ctr2.ctr_store = ctr1.ctr_store)
    ORDER BY c_name, store
    LIMIT 100
"""


@query(
    "qds1_returns_above_avg",
    oracle=_QDS1_SQL,
    covers="§2.B TPC-DS q1 shape: correlated scalar AVG subquery over a "
    "grouped CTE (customers returning >1.2x their store's average)",
)
def qds1_returns_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose 1996 returned value exceeds 1.2× the average
    return total of their supplier nation (q1's store-average screen;
    supplier nation stands in for the store).

    Scale: the oracle's correlated scalar subquery re-aggregates the
    CTE per outer row; the Spark plan computes the same per-store mean
    as ONE window over the already-aggregated (customer, store) rows —
    a single extra exchange on a ~25-key partition column instead of a
    correlated re-scan. The returns filter and 1996 date fringe reach
    the fact scan pushed; nation broadcasts. Determinism: the mean is
    window-SUM(DECIMAL)/COUNT (one IEEE division of exact values), the
    1.2× screen is one multiply of engine-identical doubles, and
    (c_name, store) is a unique ORDER BY for the LIMIT.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    ctr = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("o_custkey").alias("ctr_customer"),
            F.col("n_name").alias("store"),
        )
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("ret_dec"))
    )
    ws = W.partitionBy("store")
    screened = ctr.withColumn(
        "store_avg",
        F.lit(1.2)
        * (
            F.sum("ret_dec").over(ws).cast("double")
            / F.count(F.lit(1)).over(ws)
        ),
    ).filter(F.col("ret_dec").cast("double") > F.col("store_avg"))
    return (
        screened.join(customer, F.col("ctr_customer") == F.col("c_custkey"))
        .select(
            "c_name",
            "store",
            F.col("ret_dec").cast("double").alias("total_return"),
        )
        .orderBy("c_name", "store")
        .limit(100)
    )


# q59 shape: weekly per-store sales split by day-of-week, self-joined
# 52 weeks apart, per-weekday ratios
# (reference examples/tpcds/queries/q59.sql).

#: Monday anchor strictly before the data's first order date, so the
#: day index dd = datediff(anchor, o_orderdate) is always >= 0 and
#: dd % 7 == 0 means Monday in both engines (no negative-modulo split)
_QDS59_ANCHOR = "1994-12-26 00:00:00"

_QDS59_DAYS = ("mon", "tue", "wed", "thu", "fri", "sat", "sun")

_QDS59_SQL = (
    """
    WITH wss AS (
      SELECT CAST(FLOOR(DATEDIFF('day', TIMESTAMP '"""
    + _QDS59_ANCHOR
    + """',
                                 o_orderdate) / 7.0) AS BIGINT) AS wk,
             n_name AS store,
"""
    + ",\n".join(
        f"             SUM(CASE WHEN DATEDIFF('day', TIMESTAMP "
        f"'{_QDS59_ANCHOR}', o_orderdate) % 7 = {i} THEN "
        f"CAST(l_extendedprice AS DECIMAL(38,6)) ELSE NULL END) "
        f"AS {d}_dec"
        for i, d in enumerate(_QDS59_DAYS)
    )
    + """
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT y1.store, y1.wk AS wk1,
"""
    + ",\n".join(
        f"           CAST(y1.{d}_dec AS DOUBLE) / CAST(y2.{d}_dec AS DOUBLE)"
        f" AS {d}_ratio"
        for d in _QDS59_DAYS
    )
    + """
    FROM wss y1
    JOIN wss y2 ON y1.store = y2.store AND y2.wk = y1.wk + 52
    ORDER BY y1.store, y1.wk
    LIMIT 100
"""
)


@query(
    "qds59_weekday_ratio",
    oracle=_QDS59_SQL,
    covers="§2.B TPC-DS q59 shape: weekly sales pivoted by day-of-week, "
    "self-joined 52 weeks apart, per-weekday year-over-year ratios",
)
def qds59_weekday_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (supplier nation, week) revenue split across the seven
    weekdays, each week ratioed against the week 52 weeks later (q59's
    week-over-week store census; supplier nation stands in for the
    store).

    Scale: ONE fact pass builds the weekly CASE-split aggregate (the
    weekday pivot is map-side CASE arms, not seven scans), then the
    52-week offset is an equi self-join on (store, wk) — with ~25
    stores × ~350 weeks the aggregate is tiny and AQE broadcasts it.
    The week index is pure integer arithmetic off a Monday anchor
    (portable across engines — no ISO-week or day-name locale
    semantics), weekday sums stay DECIMAL(38,6) until a final DOUBLE
    cast, and each ratio is one IEEE division of engine-identical
    doubles (NULL when either week lacks that weekday). (store, wk) is
    a unique ORDER BY for the LIMIT.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    dd = F.datediff(
        F.col("o_orderdate"), F.lit(_QDS59_ANCHOR).cast("timestamp")
    )
    price_dec = F.col("l_extendedprice").cast("decimal(38,6)")
    wss = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.floor(dd / F.lit(7.0)).cast("long").alias("wk"),
            F.col("n_name").alias("store"),
        )
        .agg(
            *[
                F.sum(F.when(dd % 7 == i, price_dec)).alias(f"{d}_dec")
                for i, d in enumerate(_QDS59_DAYS)
            ]
        )
    )
    # r12: the self-join consumed the SAME wss subtree twice — Spark
    # re-ran the whole 4-relation star per side (8 scans). wss is
    # O(stores × weeks) rows at any scale; materialize it once and let
    # both sides read the checkpointed rows (the qds39 discipline).
    wss = wss.localCheckpoint()
    y1, y2 = wss.alias("y1"), wss.alias("y2")
    return (
        y1.join(
            y2,
            (F.col("y1.store") == F.col("y2.store"))
            & (F.col("y2.wk") == F.col("y1.wk") + 52),
        )
        .select(
            F.col("y1.store").alias("store"),
            F.col("y1.wk").alias("wk1"),
            *[
                (
                    F.col(f"y1.{d}_dec").cast("double")
                    / F.col(f"y2.{d}_dec").cast("double")
                ).alias(f"{d}_ratio")
                for d in _QDS59_DAYS
            ],
        )
        .orderBy("store", "wk1")
        .limit(100)
    )


# q65 shape: stores' lowest-revenue items — per-(store, item) revenue
# joined against the store's average item revenue, kept when <= 10%
# of it (reference examples/tpcds/queries/q65.sql).

_QDS65_SQL = """
    WITH sa AS (
      SELECT n_name AS store, l_partkey AS pk,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) * 1000
                  AS BIGINT) AS rev_millis
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1, 2
    ),
    sb AS (
      SELECT store, SUM(rev_millis) AS tot_millis, COUNT(*) AS n_items
      FROM sa GROUP BY 1
    )
    SELECT sa.store, p_name, sa.pk AS item_sk,
           CAST(sa.rev_millis AS DOUBLE) / 1000.0 AS revenue,
           p_retailprice, p_brand
    FROM sa
    JOIN sb ON sa.store = sb.store
    JOIN part ON sa.pk = p_partkey
    WHERE 10 * sa.rev_millis * sb.n_items <= sb.tot_millis
    ORDER BY sa.store, p_name, sa.pk
    LIMIT 100
"""


@query(
    "qds65_store_min_avg",
    oracle=_QDS65_SQL,
    covers="§2.B TPC-DS q65 shape: aggregate-of-aggregate join-back — "
    "per-(store, item) revenue <= 10% of the store's average item "
    "revenue",
)
def qds65_store_min_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each supplier nation's weakest parts: (store, part) revenue at
    or below 10% of that store's mean per-part revenue (q65's
    low-revenue item scan; supplier nation stands in for the store).

    Scale: the reference runs the inner (store, item) aggregation
    TWICE (once raw, once under the avg subquery); here the aggregate
    is built once and the per-store totals fold over it as a WINDOW on
    the ~25-key store column — one extra exchange over already-reduced
    rows, and the fact table is scanned exactly once (a join-back
    against a re-grouped copy would re-run the whole fact join tree on
    both sides). Determinism: revenue is held as exact
    integer millis (prices have 2 decimals, so the ×1000 decimal is
    integral and the BIGINT cast is truncation-safe in both engines),
    and the 10%-of-average screen is the pure-integer
    cross-multiplication ``10·rev·n <= tot`` — no division anywhere
    (bounded: rev_millis ≤ ~1e10 at sf0.1 × 10 × ~32k items ≪ 2^63).
    The displayed revenue divides the exact millis by 1000.0 once.
    p_name is NOT unique in this data (64 distinct names over 20k
    parts), so the part key itself rides along as item_sk to uniquify
    the ORDER BY.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    sa = (
        li.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("store"), F.col("l_partkey").alias("pk"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(38,6)")) * 1000)
            .cast("bigint")
            .alias("rev_millis")
        )
    )
    ws = W.partitionBy("store")
    screened = (
        sa.withColumn("tot_millis", F.sum("rev_millis").over(ws))
        .withColumn("n_items", F.count(F.lit(1)).over(ws))
        .filter(
            10 * F.col("rev_millis") * F.col("n_items") <= F.col("tot_millis")
        )
    )
    return (
        screened
        .join(part, F.col("pk") == F.col("p_partkey"))
        .select(
            "store",
            "p_name",
            F.col("pk").alias("item_sk"),
            (F.col("rev_millis").cast("double") / 1000.0).alias("revenue"),
            "p_retailprice",
            "p_brand",
        )
        .orderBy("store", "p_name", "pk")
        .limit(100)
    )


# q99 shape: ship-lag bucket matrix — exact counts of order→ship day
# lags per (warehouse, ship mode, call center)
# (reference examples/tpcds/queries/q99.sql).

_QDS99_BUCKETS = (
    ("lag_le_neg365", "lag <= -365"),
    ("lag_neg365_0", "lag > -365 AND lag <= 0"),
    ("lag_0_365", "lag > 0 AND lag <= 365"),
    ("lag_365_730", "lag > 365 AND lag <= 730"),
    ("lag_gt_730", "lag > 730"),
)

_QDS99_SQL = (
    """
    SELECT n_name AS warehouse, o_orderpriority AS ship_mode,
           c_mktsegment AS call_center,
"""
    + ",\n".join(
        f"           CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS {name}"
        for name, cond in _QDS99_BUCKETS
    )
    + """
    FROM (
      SELECT n_name, o_orderpriority, c_mktsegment,
             DATEDIFF('day', o_orderdate, l_shipdate) AS lag
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    ) x
    GROUP BY 1, 2, 3
    ORDER BY warehouse, ship_mode, call_center
    LIMIT 100
"""
)


@query(
    "qds99_ship_lag_buckets",
    oracle=_QDS99_SQL,
    covers="§2.B TPC-DS q99 shape: day-lag bucket matrix — exact "
    "counts per (warehouse, ship mode, call center) across five "
    "order-to-ship lag bands",
)
def qds99_ship_lag_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts of lineitems per (supplier nation, order priority,
    market segment) across five order→ship day-lag bands (q99's
    days-to-ship census; nation/priority/segment stand in for
    warehouse/ship-mode/call-center; this data's synthetic lags span
    negative to multi-year, so the bands are ±365/730 rather than the
    reference's 30-day steps — every band is populated at every SF).

    Scale: the lag is computed map-side and the five bands are CASE
    arms inside ONE hash aggregation on a bounded 25×5×5 key — one
    fact pass, no per-band re-scan; nation broadcasts and the
    customer/supplier joins ride the natural fact shuffle.
    Determinism: every output is an exact BIGINT count and the day
    difference is pure date arithmetic, identical in both engines;
    the 3-part group key is a unique ORDER BY.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    conds = (
        lag <= -365,
        (lag > -365) & (lag <= 0),
        (lag > 0) & (lag <= 365),
        (lag > 365) & (lag <= 730),
        lag > 730,
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("warehouse"),
            F.col("o_orderpriority").alias("ship_mode"),
            F.col("c_mktsegment").alias("call_center"),
        )
        .agg(
            *[
                F.sum(F.when(cond, 1).otherwise(0)).alias(name)
                for (name, _), cond in zip(_QDS99_BUCKETS, conds)
            ]
        )
        .orderBy("warehouse", "ship_mode", "call_center")
        .limit(100)
    )


# --------------------------------------------------------------------------
# wave 5 (late r7, below the frozen driver-sample cut — r8 rotation
# priority): q38/q87, q13, q90, q32 shapes.
# --------------------------------------------------------------------------

# q38 shape: customers active in ALL THREE channels the same year —
# three DISTINCT channel sets INTERSECTed, counted
# (reference examples/tpcds/queries/q38.sql; q87 is the EXCEPT dual).

_QDS38_CHANNELS = ("1-URGENT", "2-HIGH", "3-MEDIUM")

_QDS38_SQL = (
    """
    SELECT COUNT(*) AS hot_custs FROM (
"""
    + "\n      INTERSECT\n".join(
        f"""      SELECT DISTINCT c_name,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority = '{p}'"""
        for p in _QDS38_CHANNELS
    )
    + """
    ) hot_cust
"""
)


@query(
    "qds38_channel_intersect",
    oracle=_QDS38_SQL,
    covers="§2.B TPC-DS q38/q87 shape: three DISTINCT channel sets "
    "INTERSECTed and counted (customers active in all three channels "
    "the same year)",
)
def qds38_channel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many (customer, year) pairs ordered through all three of the
    URGENT/HIGH/MEDIUM priority channels that year (q38's hot-customer
    census; order priorities stand in for the store/catalog/web
    channels).

    Scale: the oracle INTERSECTs three DISTINCT subqueries — three fact
    scans and two intersect shuffles. The Spark plan folds the channel
    membership into ONE aggregation: group (customer, year) once and
    keep rows where a MAX(CASE) flag fired for every channel — a single
    fact scan and a single shuffle, identical semantics because
    INTERSECT-of-DISTINCT is exactly "present in all three sets".
    Determinism: the only output is an exact BIGINT count.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(*_QDS38_CHANNELS)
    )
    customer = load_table(spark, sf_dir, "customer")
    flags = [
        F.max(
            F.when(F.col("o_orderpriority") == p, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"ch{i}")
        for i, p in enumerate(_QDS38_CHANNELS)
    ]
    hot = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", F.year("o_orderdate").cast("long").alias("yr"))
        .agg(*flags)
        .filter(
            (F.col("ch0") == 1) & (F.col("ch1") == 1) & (F.col("ch2") == 1)
        )
    )
    return hot.agg(F.count(F.lit(1)).alias("hot_custs"))


# q13 shape: OR-of-AND disjunct bands across two dimension groups,
# single-pass averages (reference examples/tpcds/queries/q13.sql).

#: (segment, total-price band, quantity band) — the marital/education/
#: sales-price disjuncts of q13
_QDS13_BAND_A = (
    "((c_mktsegment = 'BUILDING' AND o_totalprice BETWEEN 1000 AND 150000"
    " AND l_quantity BETWEEN 1 AND 15) OR "
    "(c_mktsegment = 'AUTOMOBILE' AND o_totalprice BETWEEN 50000 AND 300000"
    " AND l_quantity BETWEEN 16 AND 35) OR "
    "(c_mktsegment = 'MACHINERY' AND o_totalprice BETWEEN 100000 AND 450000"
    " AND l_quantity BETWEEN 36 AND 50))"
)
#: (nation set, discount band) — the state/net-profit disjuncts of q13
#: (this testdata's nations are the synthetic NATION_0..NATION_24)
_QDS13_BAND_B = (
    "((n_name IN ('NATION_0', 'NATION_3', 'NATION_7', 'NATION_11')"
    " AND l_discount BETWEEN 0.00 AND 0.04) OR "
    "(n_name IN ('NATION_1', 'NATION_8', 'NATION_14', 'NATION_20')"
    " AND l_discount BETWEEN 0.03 AND 0.07) OR "
    "(n_name IN ('NATION_2', 'NATION_5', 'NATION_17', 'NATION_23')"
    " AND l_discount BETWEEN 0.05 AND 0.10))"
)

_QDS13_SQL = f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(FLOOR(CAST(SUM(CAST(l_quantity AS BIGINT)) * 1000000
                           AS DOUBLE) / COUNT(*) + 0.5) AS DOUBLE)
             / 1000000.0 AS avg_qty,
           CAST(FLOOR(CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                                    AS BIGINT)) * 10000
                           AS DOUBLE) / COUNT(*) + 0.5) AS DOUBLE)
             / 1000000.0 AS avg_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE {_QDS13_BAND_A}
      AND {_QDS13_BAND_B}
    GROUP BY 1
    ORDER BY 1
"""


@query(
    "qds13_disjunct_bands",
    oracle=_QDS13_SQL,
    covers="§2.B TPC-DS q13 shape: OR-of-AND disjunct bands across two "
    "dimension groups, averaged in a single fact pass",
)
def qds13_disjunct_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag line counts, average quantity/price and revenue
    over lines matching BOTH of two OR-of-AND disjunct groups — one on
    (market segment, order value, quantity), one on (supplier nation,
    discount band) — q13's demographic disjunct screen.

    Scale: the disjuncts are one residual predicate evaluated on the
    joined row — ONE fact pass, no per-branch union; the 25-row nation
    dim broadcasts. Catalyst cannot push the OR bands below the joins
    (they straddle tables) but the per-table conjunct fringe it CAN
    derive (quantity/discount/segment hulls) still prunes. Determinism:
    quantity is integral (BIGINT sum exact), price has 2 decimals
    (cents-space BIGINT sum exact), and each mean is the CLAUDE-rule
    micro-space FLOOR(sum_micros / count + 0.5) / 1e6 — identical IEEE
    ops in both engines; revenue sums DECIMAL(38,6) then casts DOUBLE
    once.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS13_SQL)


# q90 shape: am/pm activity ratio — two disjoint time-window counts
# from ONE pass, ratioed (reference examples/tpcds/queries/q90.sql).

_QDS90_SQL = """
    SELECT event_type,
           amc, pmc,
           CASE WHEN pmc > 0
                THEN CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE)
           END AS am_pm_ratio
    FROM (
      SELECT event_type,
             CAST(SUM(CASE WHEN EXTRACT(HOUR FROM ts) BETWEEN 8 AND 9
                           THEN 1 ELSE 0 END) AS BIGINT) AS amc,
             CAST(SUM(CASE WHEN EXTRACT(HOUR FROM ts) BETWEEN 19 AND 20
                           THEN 1 ELSE 0 END) AS BIGINT) AS pmc
      FROM events
      WHERE value BETWEEN 10 AND 400
      GROUP BY 1
    ) x
    ORDER BY event_type
"""


@query(
    "qds90_ampm_ratio",
    oracle=_QDS90_SQL,
    covers="§2.B TPC-DS q90 shape: ratio of two disjoint time-window "
    "counts (am vs pm activity) computed in one fact pass",
)
def qds90_ampm_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ratio of morning (08-09h) to evening (19-20h)
    event counts among mid-value events (q90's am/pm web census over
    the events stream table).

    Scale: the reference runs TWO whole-fact subqueries and cross-joins
    their single-row results; here both window counts are CASE arms in
    ONE hash aggregation — a single fact pass and a 5-key shuffle. The
    events table is loaded through the nanos-safe session path.
    Determinism: both counts are exact BIGINTs and the ratio is one
    IEEE division (NULL when the pm window is empty); event_type is a
    unique ORDER BY.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS90_SQL)


# q32 shape: excess-discount screen — lines whose discount amount
# exceeds 1.3x their part's 90-day average
# (reference examples/tpcds/queries/q32.sql; q92 is the web dual).

_QDS32_FILTER = """
      p_brand = 'Brand#13'
      AND l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-08-30 00:00:00'
"""

_QDS32_SQL = f"""
    SELECT CAST(SUM(amt) AS DOUBLE) AS excess_discount,
           CAST(COUNT(*) AS BIGINT) AS n_excess
    FROM (
      SELECT CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(4,2)) AS amt,
             l_partkey AS pk
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE {_QDS32_FILTER}
    ) x
    WHERE CAST(amt AS DOUBLE) > (
      SELECT 1.3 * (CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(l_discount AS DECIMAL(4,2)))
                         AS DOUBLE) / COUNT(*))
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE {_QDS32_FILTER} AND l_partkey = x.pk
    )
"""


@query(
    "qds32_excess_discount",
    oracle=_QDS32_SQL,
    covers="§2.B TPC-DS q32/q92 shape: correlated 1.3x-average scalar "
    "subquery per item over a bounded date window (excess discount "
    "amount)",
)
def qds32_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total discount amount on Brand#13 lines shipped in a 90-day
    window whose discount exceeds 1.3x the same part's window average
    (q32's excess-discount audit).

    Scale: the oracle's correlated scalar subquery re-scans the window
    per outer row; the Spark plan computes each part's mean ONCE as a
    window aggregate over the already-filtered rows — the brand/date
    fringe reaches the parquet scan pushed and the fact is read once.
    Determinism: the discount amount is an exact DECIMAL product of
    2-decimal quantities (identical in both engines), the mean is
    CAST(SUM(decimal) AS DOUBLE)/COUNT (one IEEE division), the 1.3x
    screen multiplies engine-identical doubles, and the final total
    sums the exact DECIMAL amounts (order-free) before ONE cast to
    DOUBLE; the companion count is an exact BIGINT.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-08-30 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    )
    amt = F.col("l_extendedprice").cast("decimal(12,2)") * F.col(
        "l_discount"
    ).cast("decimal(4,2)")
    rows = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).select(
        amt.alias("amt"), F.col("l_partkey").alias("pk")
    )
    wp = W.partitionBy("pk")
    screened = (
        rows.withColumn("sum_amt", F.sum("amt").over(wp))
        .withColumn("n_amt", F.count(F.lit(1)).over(wp))
        .filter(
            F.col("amt").cast("double")
            > F.lit(1.3)
            * (F.col("sum_amt").cast("double") / F.col("n_amt"))
        )
    )
    return screened.agg(
        F.sum("amt").cast("double").alias("excess_discount"),
        F.count(F.lit(1)).alias("n_excess"),
    )


# --------------------------------------------------------------------------
# wave 6 (late r7, below the frozen driver-sample cut — r8 rotation
# priority): q28, q44, q58, q61 shapes.
# --------------------------------------------------------------------------

# q28 shape: six disjoint quantity-band censuses, each with its own OR
# residual — the reference cross-joins six whole-fact subqueries
# (reference examples/tpcds/queries/q28.sql).

#: (band id, quantity lo, quantity hi, OR-residual) — q28's six bands
_QDS28_BANDS = (
    (1, 1, 8, "(l_extendedprice BETWEEN 1000 AND 40000"
     " OR l_discount BETWEEN 0.00 AND 0.02 OR l_tax BETWEEN 0.00 AND 0.02)"),
    (2, 9, 16, "(l_extendedprice BETWEEN 20000 AND 60000"
     " OR l_discount BETWEEN 0.02 AND 0.04 OR l_tax BETWEEN 0.01 AND 0.03)"),
    (3, 17, 24, "(l_extendedprice BETWEEN 30000 AND 70000"
     " OR l_discount BETWEEN 0.04 AND 0.06 OR l_tax BETWEEN 0.02 AND 0.04)"),
    (4, 25, 32, "(l_extendedprice BETWEEN 40000 AND 80000"
     " OR l_discount BETWEEN 0.05 AND 0.07 OR l_tax BETWEEN 0.03 AND 0.05)"),
    (5, 33, 40, "(l_extendedprice BETWEEN 50000 AND 90000"
     " OR l_discount BETWEEN 0.06 AND 0.08 OR l_tax BETWEEN 0.04 AND 0.06)"),
    (6, 41, 50, "(l_extendedprice BETWEEN 60000 AND 100000"
     " OR l_discount BETWEEN 0.08 AND 0.10 OR l_tax BETWEEN 0.05 AND 0.08)"),
)

#: shared per-band aggregate list (cents micro-mean + exact counts)
_QDS28_AGGS = """
           CAST(FLOOR(CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                                    AS BIGINT)) * 10000
                           AS DOUBLE) / COUNT(*) + 0.5) AS DOUBLE)
             / 1000000.0 AS avg_lp,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS cntd
"""

_QDS28_SQL = (
    "\n    UNION ALL\n".join(
        f"""    SELECT {b} AS band, {_QDS28_AGGS}
    FROM lineitem
    WHERE l_quantity BETWEEN {lo} AND {hi} AND {resid}"""
        for b, lo, hi, resid in _QDS28_BANDS
    )
    + "\n    ORDER BY band\n"
)


@query(
    "qds28_quantity_band_census",
    oracle=_QDS28_SQL,
    covers="§2.B TPC-DS q28 shape: six disjoint quantity-band censuses "
    "(avg / count / count-distinct price per band), folded into one "
    "fact pass",
)
def qds28_quantity_band_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average price, line count and distinct-price count for six
    disjoint quantity bands, each with its own price/discount/tax OR
    residual (q28's list-price band census).

    Scale: the reference runs SIX whole-fact subqueries and cross-joins
    their single-row results — six scans; here the disjoint quantity
    bands become ONE derived band key (a CASE whose arms carry each
    band's residual), so one fact pass and one 6-key aggregation
    produce all six rows. COUNT(DISTINCT) per band rides the same
    shuffle. Determinism: prices have 2 decimals so the cents-space sum
    is an exact BIGINT, the mean is the micro-space FLOOR rule, and
    both counts are exact BIGINTs.
    """
    register_tables(spark, sf_dir)
    case_arms = " ".join(
        f"WHEN l_quantity BETWEEN {lo} AND {hi} AND {resid} THEN {b}"
        for b, lo, hi, resid in _QDS28_BANDS
    )
    return spark.sql(
        f"""
        SELECT band, {_QDS28_AGGS}
        FROM (SELECT CASE {case_arms} END AS band, l_extendedprice
              FROM lineitem) x
        WHERE band IS NOT NULL
        GROUP BY band
        ORDER BY band
        """
    )


# q44 shape: best/worst performing items — two opposite rankings of
# the same per-item aggregate joined on rank position
# (reference examples/tpcds/queries/q44.sql).

_QDS44_STORE = "NATION_12"  # present at every SF (sf0.001 has 10 suppliers)

_QDS44_SQL = f"""
    WITH sa AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) AS rank_col
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = '{_QDS44_STORE}'
      GROUP BY 1
    ),
    base AS (
      SELECT CAST(SUM(rank_col) AS DOUBLE) / COUNT(*) AS store_avg
      FROM sa
    ),
    ranked AS (
      SELECT pk, rank_col,
             ROW_NUMBER() OVER (ORDER BY rank_col ASC, pk ASC) AS rnk_asc,
             ROW_NUMBER() OVER (ORDER BY rank_col DESC, pk DESC) AS rnk_desc
      FROM sa, base
      WHERE rank_col > 0.9 * store_avg
    )
    SELECT a.rnk_asc AS rnk,
           a.pk AS best_pk, p1.p_name AS best_performing,
           d.pk AS worst_pk, p2.p_name AS worst_performing
    FROM (SELECT * FROM ranked WHERE rnk_asc < 11) a
    JOIN (SELECT * FROM ranked WHERE rnk_desc < 11) d
      ON a.rnk_asc = d.rnk_desc
    JOIN part p1 ON a.pk = p1.p_partkey
    JOIN part p2 ON d.pk = p2.p_partkey
    ORDER BY rnk
"""


@query(
    "qds44_best_worst_rank_join",
    oracle=_QDS44_SQL,
    covers="§2.B TPC-DS q44 shape: opposite ASC/DESC rankings of one "
    "per-item aggregate joined on rank position (best vs worst "
    "performers)",
)
def qds44_best_worst_rank_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 best and worst performing parts at one store paired by
    rank position — rank 1 pairs the best with the worst, rank 2 the
    runner-ups (q44's best/worst product board; supplier nation stands
    in for the store).

    Scale: the reference aggregates the fact TWICE (once per ranking
    direction) plus twice more for the 0.9x baseline subqueries; here
    the per-part aggregate is computed ONCE (localCheckpoint-ed so the
    three consumers don't re-run the fact join), the store baseline is
    a single-row broadcast, and each top-10 head is a DISTRIBUTED
    top-K (orderBy + limit → TakeOrderedAndProject, per-partition
    heaps + one 10-row merge — never a global single-partition sort of
    all parts, which an unpartitioned ROW_NUMBER window would force).
    The 10-row heads then take their rank by a trivial window and the
    pairing join and part-name lookups all broadcast. Determinism: the
    rank column is an exact-decimal sum divided once (engine-identical
    doubles) and every ordering carries a pk tiebreak, so both
    orderings are total; rnk is a unique ORDER BY.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == _QDS44_STORE
    )
    part = load_table(spark, sf_dir, "part")
    sa = (
        li.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            (
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("rank_col")
        )
    )
    sa = sa.localCheckpoint(eager=True)  # 3 consumers; don't re-run the fact join
    base = sa.agg(
        (F.sum("rank_col").cast("double") / F.count(F.lit(1))).alias(
            "store_avg"
        )
    )
    screened = sa.join(F.broadcast(base)).filter(
        F.col("rank_col") > 0.9 * F.col("store_avg")
    )
    best10 = screened.orderBy(F.col("rank_col").asc(), F.col("pk").asc()).limit(10)
    worst10 = screened.orderBy(F.col("rank_col").desc(), F.col("pk").desc()).limit(10)
    best = best10.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.col("rank_col").asc(), F.col("pk").asc())),
    ).select("rnk", F.col("pk").alias("best_pk"))
    worst = worst10.withColumn(
        "rnk",
        F.row_number().over(
            W.orderBy(F.col("rank_col").desc(), F.col("pk").desc())
        ),
    ).select("rnk", F.col("pk").alias("worst_pk"))
    p1 = part.select(
        F.col("p_partkey").alias("bp"), F.col("p_name").alias("best_performing")
    )
    p2 = part.select(
        F.col("p_partkey").alias("wp"), F.col("p_name").alias("worst_performing")
    )
    return (
        best.join(worst, "rnk")
        .join(F.broadcast(p1), F.col("best_pk") == F.col("bp"))
        .join(F.broadcast(p2), F.col("worst_pk") == F.col("wp"))
        .select("rnk", "best_pk", "best_performing", "worst_pk",
                "worst_performing")
        .orderBy("rnk")
    )


# q58 shape: items selling in equal shares across all three channels —
# three per-channel revenue CTEs joined with ±30% balance bands
# (reference examples/tpcds/queries/q58.sql).

_QDS58_SQL = """
    WITH c1 AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS r1_dec
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    ),
    c2 AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS r2_dec
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '2-HIGH' GROUP BY 1
    ),
    c3 AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS r3_dec
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '3-MEDIUM' GROUP BY 1
    )
    SELECT c1.pk AS item_sk,
           CAST(r1_dec AS DOUBLE) AS urgent_rev,
           CAST(r2_dec AS DOUBLE) AS high_rev,
           CAST(r3_dec AS DOUBLE) AS medium_rev
    FROM c1 JOIN c2 ON c1.pk = c2.pk JOIN c3 ON c1.pk = c3.pk
    WHERE CAST(r1_dec AS DOUBLE) >= 0.7 * ((CAST(r1_dec AS DOUBLE)
            + CAST(r2_dec AS DOUBLE) + CAST(r3_dec AS DOUBLE)) / 3)
      AND CAST(r1_dec AS DOUBLE) <= 1.3 * ((CAST(r1_dec AS DOUBLE)
            + CAST(r2_dec AS DOUBLE) + CAST(r3_dec AS DOUBLE)) / 3)
      AND CAST(r2_dec AS DOUBLE) >= 0.7 * ((CAST(r1_dec AS DOUBLE)
            + CAST(r2_dec AS DOUBLE) + CAST(r3_dec AS DOUBLE)) / 3)
      AND CAST(r2_dec AS DOUBLE) <= 1.3 * ((CAST(r1_dec AS DOUBLE)
            + CAST(r2_dec AS DOUBLE) + CAST(r3_dec AS DOUBLE)) / 3)
      AND CAST(r3_dec AS DOUBLE) >= 0.7 * ((CAST(r1_dec AS DOUBLE)
            + CAST(r2_dec AS DOUBLE) + CAST(r3_dec AS DOUBLE)) / 3)
      AND CAST(r3_dec AS DOUBLE) <= 1.3 * ((CAST(r1_dec AS DOUBLE)
            + CAST(r2_dec AS DOUBLE) + CAST(r3_dec AS DOUBLE)) / 3)
    ORDER BY item_sk
"""


@query(
    "qds58_channel_balance",
    oracle=_QDS58_SQL,
    covers="§2.B TPC-DS q58 shape: per-item revenue across three "
    "channels kept when every channel is within ±30% of the "
    "three-channel average",
)
def qds58_channel_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue splits near-evenly across the URGENT / HIGH
    / MEDIUM channels — every channel within ±30% of the three-channel
    mean (q58's equal-share item screen; order priorities stand in for
    the store/catalog/web channels).

    Scale: the oracle joins three per-channel CTEs — three fact scans
    and two joins; the Spark plan CASE-splits the channel inside ONE
    per-part aggregation (single fact pass, single shuffle). A part
    absent from a channel sums to 0 there, fails the >=0.7x-mean band
    exactly like the oracle's inner join drops it (prices are strictly
    positive, so the mean is positive whenever any channel sold), and
    parts with no rows in ANY of the three channels are filtered out
    before aggregation. Determinism: per-channel sums stay
    DECIMAL(38,6) until one DOUBLE cast and the band screen is
    engine-identical IEEE arithmetic; item_sk is a unique ORDER BY.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
    )
    price_dec = F.col("l_extendedprice").cast("decimal(38,6)")
    chans = (("urgent_rev", "1-URGENT"), ("high_rev", "2-HIGH"),
             ("medium_rev", "3-MEDIUM"))
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_partkey").alias("item_sk"))
        .agg(
            *[
                F.sum(
                    F.when(F.col("o_orderpriority") == p, price_dec).otherwise(
                        F.lit(0).cast("decimal(38,6)")
                    )
                )
                .cast("double")
                .alias(name)
                for name, p in chans
            ]
        )
    )
    mean = (
        F.col("urgent_rev") + F.col("high_rev") + F.col("medium_rev")
    ) / 3
    cond = None
    for name, _ in chans:
        c = (F.col(name) >= 0.7 * mean) & (F.col(name) <= 1.3 * mean)
        cond = c if cond is None else (cond & c)
    return agg.filter(cond).orderBy("item_sk")


# q61 shape: promotional-channel share of total revenue — two
# differently-filtered whole-fact sums ratioed
# (reference examples/tpcds/queries/q61.sql).

_QDS61_SQL = """
    SELECT CAST(promo_dec AS DOUBLE) AS promotions,
           CAST(total_dec AS DOUBLE) AS total,
           CAST(promo_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) * 100
             AS promo_pct
    FROM (
      SELECT SUM(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN CAST(l_extendedprice AS DECIMAL(38,6)) END)
               AS promo_dec,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS total_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND EXTRACT(YEAR FROM o_orderdate) = 1997
    ) x
"""


@query(
    "qds61_promo_share",
    oracle=_QDS61_SQL,
    covers="§2.B TPC-DS q61 shape: promotional-channel revenue as a "
    "percentage of total revenue over the same dimension screen, "
    "computed in one fact pass",
)
def qds61_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URGENT-channel share of 1997 BUILDING-segment revenue (q61's
    promotional-sales percentage; the URGENT priority stands in for
    the promotion-flagged channel).

    Scale: the reference computes the promotional and total sums as
    TWO whole-fact subqueries cross-joined; here the promotional sum
    is a CASE arm inside the same single aggregation — one fact pass,
    and the shared segment/year screen is pushed to both scans.
    Determinism: both sums are exact DECIMAL(38,6) until one DOUBLE
    cast each; the percentage is one IEEE division and one multiply of
    engine-identical doubles.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS61_SQL)


# --------------------------------------------------------------------------
# wave 7 (late r7, below the frozen driver-sample cut — r8 rotation
# priority): q70, q77, q7, q87 shapes.
# --------------------------------------------------------------------------

# q70 shape: revenue ROLLUP over a geography hierarchy, restricted to
# the top-ranked upper level, with RANK within each grouping level
# (reference examples/tpcds/queries/q70.sql).

_QDS70_SQL = """
    WITH rn AS (
      SELECT r_name AS region, n_name AS nation,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(38,6))) AS rev_dec
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    )
    SELECT CAST(SUM(rev_dec) AS DOUBLE) AS total_rev,
           region, nation,
           CAST(GROUPING(region) + GROUPING(nation) AS BIGINT)
             AS lochierarchy,
           RANK() OVER (
             PARTITION BY GROUPING(region) + GROUPING(nation),
                          CASE WHEN GROUPING(nation) = 0
                               THEN region END
             ORDER BY SUM(rev_dec) DESC, nation ASC NULLS FIRST,
                      region ASC NULLS FIRST
           ) AS rank_within_parent
    FROM rn
    WHERE region IN (
      SELECT region FROM (
        SELECT region,
               RANK() OVER (ORDER BY SUM(rev_dec) DESC, region ASC)
                 AS rr
        FROM rn GROUP BY region
      ) t WHERE rr <= 3
    )
    GROUP BY ROLLUP(region, nation)
    ORDER BY lochierarchy DESC, region ASC NULLS FIRST,
             rank_within_parent ASC, nation ASC NULLS FIRST
"""


@query(
    "qds70_hierarchy_rank_rollup",
    oracle=_QDS70_SQL,
    covers="§2.B TPC-DS q70 shape: ROLLUP over a geography hierarchy "
    "restricted to top-ranked regions (window-in-filter subquery), "
    "RANK within each grouping level",
)
def qds70_hierarchy_rank_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rolled up over (region, nation) for the top-3 regions by
    total revenue, each row ranked within its grouping level (q70's
    state/county profit hierarchy; supplier geography stands in for
    the store's).

    Scale: both the top-3 screen and the ROLLUP are computed from ONE
    (region, nation) fact aggregation, localCheckpoint-ed because it
    has two consumers — inlining the CTE as shared SQL re-ran the
    whole fact join per reference (16 parquet scans); now the region
    ranking is a window over the ~125 already-reduced rows, the top-3
    set broadcasts into a semi join, and the ROLLUP re-aggregates the
    same tiny frame (sums are additive). Determinism: revenue stays
    DECIMAL(38,6) until one final DOUBLE cast, both RANKs order by the
    exact decimal with name tiebreaks, and the grouping-level sort
    pins NULLS FIRST explicitly (Spark and DuckDB default opposite
    null orders).
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rn = (
        li.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("rev_dec")
        )
        .localCheckpoint(eager=True)  # 2 consumers; don't re-run the fact join
    )
    top_regions = (
        rn.groupBy("region")
        .agg(F.sum("rev_dec").alias("region_rev"))
        .withColumn(
            "rr",
            F.rank().over(
                W.orderBy(F.col("region_rev").desc(), F.col("region").asc())
            ),
        )
        .filter(F.col("rr") <= 3)
        .select("region")
    )
    filtered = rn.join(F.broadcast(top_regions), "region", "left_semi")
    rolled = filtered.rollup("region", "nation").agg(
        F.sum("rev_dec").alias("rev_sum"),
        (F.grouping("region") + F.grouping("nation"))
        .cast("long")
        .alias("lochierarchy"),
        F.when(F.grouping("nation") == 0, F.col("region")).alias("parent_key"),
    )
    wr = W.partitionBy("lochierarchy", "parent_key").orderBy(
        F.col("rev_sum").desc(),
        F.col("nation").asc_nulls_first(),
        F.col("region").asc_nulls_first(),
    )
    return (
        rolled.withColumn("rank_within_parent", F.rank().over(wr))
        .select(
            F.col("rev_sum").cast("double").alias("total_rev"),
            "region",
            "nation",
            "lochierarchy",
            "rank_within_parent",
        )
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("region").asc_nulls_first(),
            F.col("rank_within_parent").asc(),
            F.col("nation").asc_nulls_first(),
        )
    )


# q77 shape: per-channel sales/returns/profit report with a ROLLUP
# grand total over UNION ALL channel legs
# (reference examples/tpcds/queries/q77.sql; q5/q80 are variants).

_QDS77_CHANNELS = ("1-URGENT", "2-HIGH", "3-MEDIUM")

_QDS77_SQL = (
    """
    SELECT channel,
           CAST(SUM(sales_dec) AS DOUBLE) AS sales,
           CAST(SUM(returns_dec) AS DOUBLE) AS returns_amt,
           CAST(SUM(sales_dec - returns_dec) AS DOUBLE) AS profit
    FROM (
"""
    + "\n      UNION ALL\n".join(
        f"""      SELECT '{p}' AS channel,
             SUM(CASE WHEN l_returnflag <> 'R'
                      THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(38,6))
                      ELSE CAST(0 AS DECIMAL(38,6)) END) AS sales_dec,
             SUM(CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(38,6))
                      ELSE CAST(0 AS DECIMAL(38,6)) END) AS returns_dec
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '{p}'"""
        for p in _QDS77_CHANNELS
    )
    + """
    ) legs
    GROUP BY ROLLUP(channel)
    ORDER BY channel ASC NULLS LAST
"""
)


@query(
    "qds77_channel_profit_rollup",
    oracle=_QDS77_SQL,
    covers="§2.B TPC-DS q77/q5/q80 shape: per-channel sales vs returns "
    "profit report, ROLLUP grand total over UNION ALL channel legs",
)
def qds77_channel_profit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sales, returned value and net profit per priority channel with a
    ROLLUP grand-total row (q77's channel P&L; order priorities stand
    in for the store/catalog/web channels, returned lines for the
    returns tables).

    Scale: the oracle UNION-ALLs three whole-fact channel legs — three
    scans; the Spark plan CASE-splits both the channel and the
    sales-vs-returns arm inside ONE aggregation (single fact pass,
    3-key shuffle) and ROLLUPs the three pre-aggregated rows (sums are
    additive, so re-aggregating the tiny frame is exact and free).
    Determinism: every money sum stays DECIMAL(38,6) until one final
    DOUBLE cast; profit subtracts exact decimals before the cast;
    channel ORDER BY pins NULLS LAST for the total row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(*_QDS77_CHANNELS)
    )
    rev_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    zero = F.lit(0).cast("decimal(38,6)")
    legs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderpriority").alias("channel"))
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") != "R", rev_dec).otherwise(zero)
            ).alias("sales_dec"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", rev_dec).otherwise(zero)
            ).alias("returns_dec"),
        )
    )
    return (
        legs.rollup("channel")
        .agg(
            F.sum("sales_dec").cast("double").alias("sales"),
            F.sum("returns_dec").cast("double").alias("returns_amt"),
            F.sum(F.col("sales_dec") - F.col("returns_dec"))
            .cast("double")
            .alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_last())
    )


# q7 shape: multi-dimension average report — four averages per item
# class under a stacked dimension screen
# (reference examples/tpcds/queries/q7.sql; q26/q27 are variants).

_QDS7_SQL = """
    SELECT p_type,
           CAST(FLOOR(CAST(SUM(CAST(l_quantity AS BIGINT)) * 1000000
                           AS DOUBLE) / COUNT(*) + 0.5) AS DOUBLE)
             / 1000000.0 AS avg_qty,
           CAST(FLOOR(CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                                    AS BIGINT)) * 10000
                           AS DOUBLE) / COUNT(*) + 0.5) AS DOUBLE)
             / 1000000.0 AS avg_price,
           CAST(FLOOR(CAST(SUM(CAST(FLOOR(l_discount * 100 + 0.5)
                                    AS BIGINT)) * 10000
                           AS DOUBLE) / COUNT(*) + 0.5) AS DOUBLE)
             / 1000000.0 AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      AND EXTRACT(YEAR FROM o_orderdate) = 1996
    GROUP BY 1
    ORDER BY 1
"""


@query(
    "qds7_dimension_avg_report",
    oracle=_QDS7_SQL,
    covers="§2.B TPC-DS q7/q26/q27 shape: multi-dimension average "
    "report (four averages per item class under a stacked dimension "
    "screen)",
)
def qds7_dimension_avg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average quantity, price and discount per part type for 1996
    low-priority BUILDING-segment lines (q7's demographic average
    report; segment/priority/year stand in for the demographic and
    promo screens).

    Scale: one fact pass through three dimension joins with every
    screen pushed to its dimension scan; the 6-key aggregation is
    map-side partial. Determinism: quantity is integral, price and
    discount have 2 decimals (cents-space BIGINT sums are exact), and
    every mean is the micro-space FLOOR rule — identical IEEE ops in
    both engines; p_type is a unique ORDER BY.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS7_SQL)


# q87 shape: customers in the first channel but NOT the other two —
# the EXCEPT dual of q38 (reference examples/tpcds/queries/q87.sql).

_QDS87_SQL = (
    """
    SELECT COUNT(*) AS urgent_only FROM (
"""
    + "\n      EXCEPT\n".join(
        f"""      SELECT DISTINCT c_name,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority = '{p}'"""
        for p in _QDS38_CHANNELS
    )
    + """
    ) cool_cust
"""
)


@query(
    "qds87_channel_except",
    oracle=_QDS87_SQL,
    covers="§2.B TPC-DS q87 shape: chained EXCEPT of three DISTINCT "
    "channel sets (customers exclusive to the first channel that year)",
)
def qds87_channel_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many (customer, year) pairs ordered through the URGENT
    channel but NEITHER of the HIGH/MEDIUM channels that year (q87's
    store-only customer census — the EXCEPT dual of qds38).

    Scale: the oracle chains two EXCEPTs over three DISTINCT fact
    subqueries; the Spark plan is the same ONE MAX(CASE)-flag
    aggregation as qds38 with the membership test flipped (in channel
    0, absent from 1 and 2) — a single fact scan and shuffle instead
    of three scans and two except shuffles. Determinism: the only
    output is an exact BIGINT count.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(*_QDS38_CHANNELS)
    )
    customer = load_table(spark, sf_dir, "customer")
    flags = [
        F.max(
            F.when(F.col("o_orderpriority") == p, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"ch{i}")
        for i, p in enumerate(_QDS38_CHANNELS)
    ]
    only = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", F.year("o_orderdate").cast("long").alias("yr"))
        .agg(*flags)
        .filter(
            (F.col("ch0") == 1) & (F.col("ch1") == 0) & (F.col("ch2") == 0)
        )
    )
    return only.agg(F.count(F.lit(1)).alias("urgent_only"))


# --------------------------------------------------------------------------
# wave 8 (late r7, below the frozen driver-sample cut — r8 rotation
# priority): q89, q18, q46, q6 shapes.
# --------------------------------------------------------------------------

# q89 shape: monthly sales vs the partition's monthly average — keep
# rows deviating more than 10% (reference examples/tpcds/queries/
# q89.sql).

_QDS89_SQL = """
    SELECT p_type, store, moy,
           CAST(sum_dec AS DOUBLE) AS sum_sales,
           CAST(tot_dec AS DOUBLE) / n_months AS avg_monthly_sales
    FROM (
      SELECT p_type, store, moy, sum_dec,
             SUM(sum_dec) OVER (PARTITION BY p_type, store) AS tot_dec,
             COUNT(*) OVER (PARTITION BY p_type, store) AS n_months
      FROM (
        SELECT p_type, n_name AS store,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS moy,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(38,6))) AS sum_dec
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
        GROUP BY 1, 2, 3
      ) m
    ) w
    WHERE ABS(CAST(sum_dec AS DOUBLE) - CAST(tot_dec AS DOUBLE) / n_months)
          > 0.1 * (CAST(tot_dec AS DOUBLE) / n_months)
    ORDER BY p_type, store, moy
    LIMIT 100
"""


@query(
    "qds89_monthly_deviation",
    oracle=_QDS89_SQL,
    covers="§2.B TPC-DS q89 shape: monthly sales screened against the "
    "partition's monthly average (>10% deviation) via a window over "
    "the grouped rows",
)
def qds89_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1997 months where a (part type, supplier nation) pair's revenue
    deviates more than 10% from that pair's monthly average (q89's
    off-trend month screen; part type and supplier nation stand in for
    the item/store dimensions).

    Scale: one fact pass builds the (type, store, month) aggregate and
    the partition average is a window over those ~25x6x12 reduced rows
    — no re-scan, no self-join. Determinism: monthly sums stay
    DECIMAL(38,6); the average is one IEEE division of exact values;
    the 10% screen compares engine-identical doubles (ABS of their
    difference is also engine-identical); (p_type, store, moy) is a
    unique ORDER BY, deliberately replacing the reference's
    float-keyed ORDER BY deviation.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS89_SQL)


# q18 shape: demographic averages at every ROLLUP level
# (reference examples/tpcds/queries/q18.sql).

#: the inner select renames n_name up front — GROUPING(store) cannot
#: reference a select-list alias of the same query in Spark
#: (GROUPING_COLUMN_MISMATCH)
_QDS18_SQL = """
    SELECT c_mktsegment, store,
           CAST(GROUPING(c_mktsegment) + GROUPING(store) AS BIGINT)
             AS lochierarchy,
           CAST(FLOOR(CAST(SUM(qty) * 1000000 AS DOUBLE) / COUNT(*)
                      + 0.5) AS DOUBLE) / 1000000.0 AS avg_qty,
           CAST(FLOOR(CAST(SUM(price_cents) * 10000 AS DOUBLE)
                      / COUNT(*) + 0.5) AS DOUBLE)
             / 1000000.0 AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM (
      SELECT c_mktsegment, n_name AS store,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               AS price_cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
    ) x
    GROUP BY ROLLUP(c_mktsegment, store)
    ORDER BY lochierarchy DESC, c_mktsegment ASC NULLS FIRST,
             store ASC NULLS FIRST
    LIMIT 100
"""


@query(
    "qds18_rollup_avg_report",
    oracle=_QDS18_SQL,
    covers="§2.B TPC-DS q18 shape: averages computed at every ROLLUP "
    "level of a demographic hierarchy (micro-space means stay exact "
    "because sums and counts are additive across grouping levels)",
)
def qds18_rollup_avg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average quantity and price at every (market segment, supplier
    nation) ROLLUP level for 1996 (q18's demographic average pyramid).

    Scale: ONE fact pass; the ROLLUP's Expand doubles rows only after
    aggregation keys are attached, and the 25-row nation dim
    broadcasts. Determinism: the micro-space FLOOR means stay exact at
    EVERY grouping level because the cents/quantity sums and counts
    are additive; grouping-level sort pins NULLS FIRST explicitly.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS18_SQL)


# q46 shape: order-grain aggregate joined back to the customer with a
# home-vs-supplier geography mismatch residual
# (reference examples/tpcds/queries/q46.sql; q68/q79 are variants).

_QDS46_SQL = """
    SELECT c_name, o_orderkey,
           CAST(foreign_dec AS DOUBLE) AS foreign_rev,
           CAST(total_dec AS DOUBLE) AS total_rev,
           n_foreign
    FROM (
      SELECT o_orderkey, o_custkey,
             SUM(CASE WHEN s_nationkey <> c_nationkey
                      THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(38,6))
                      ELSE CAST(0 AS DECIMAL(38,6)) END) AS foreign_dec,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(38,6))) AS total_dec,
             CAST(SUM(CASE WHEN s_nationkey <> c_nationkey THEN 1
                           ELSE 0 END) AS BIGINT) AS n_foreign
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      GROUP BY 1, 2
    ) per_order
    JOIN customer ON o_custkey = c_custkey
    WHERE n_foreign > 0 AND foreign_dec * 2 > total_dec
    ORDER BY c_name, o_orderkey
    LIMIT 100
"""


@query(
    "qds46_order_geo_mismatch",
    oracle=_QDS46_SQL,
    covers="§2.B TPC-DS q46/q68/q79 shape: order-grain aggregate "
    "joined back to the customer dimension with a geography-mismatch "
    "residual (foreign-supplied revenue dominating the order)",
)
def qds46_order_geo_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders from BUILDING/AUTOMOBILE customers where lines supplied
    from OUTSIDE the customer's nation carry more than half the order
    value (q46's bought-city <> home-city screen; supplier-vs-customer
    nation keys stand in for the address city pair).

    Scale: the mismatch flag is evaluated on the joined row (map-side
    CASE), the order-grain aggregation rides the natural l_orderkey
    shuffle, and the customer name join-back hits a dimension —
    exactly q46's shape. Determinism: both money sums stay
    DECIMAL(38,6); the dominance screen doubles one side in integer
    decimal space (foreign*2 > total is exact decimal arithmetic —
    no division); (c_name, o_orderkey) is a unique ORDER BY.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS46_SQL)


# q6 shape: count customers per geography buying items priced over
# 1.2x their category average, one anchored month
# (reference examples/tpcds/queries/q6.sql).

_QDS6_SQL = """
    SELECT n_name AS state, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN (
      SELECT p_partkey
      FROM (
        SELECT p_partkey, p_retailprice,
               SUM(CAST(p_retailprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY p_type) AS type_tot,
               COUNT(*) OVER (PARTITION BY p_type) AS type_n
        FROM part
      ) p
      WHERE CAST(p_retailprice AS DOUBLE) >
            1.01 * (CAST(type_tot AS DOUBLE) / type_n)
    ) pricey ON l_partkey = p_partkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    HAVING COUNT(*) >= 5
    ORDER BY cnt, state
"""


@query(
    "qds6_pricey_item_states",
    oracle=_QDS6_SQL,
    covers="§2.B TPC-DS q6 shape: customer-geography census of "
    "purchases of items priced over their category average "
    "(dimension-side window screen), anchored date window, HAVING "
    "floor",
)
def qds6_pricey_item_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer nations with at least 5 purchases (1995-1997) of parts
    priced over 1.01x their type's average retail price (q6's
    high-price shopper census; customer nation stands in for the
    address state — retail prices here sit in a narrow 900-1000 band,
    so the reference's 1.2x multiplier selects nothing at any SF and
    1.01x keeps the same correlated-average shape with real rows).

    Scale: the reference's correlated per-category AVG subquery is a
    window over the PART DIMENSION only (never the fact), the pricey
    part list joins the fact as a broadcast, and the date fringe
    is pushed to the orders scan. Determinism: retail prices have 2
    decimals so the per-type DECIMAL window sum is exact, the 1.2x
    screen is one IEEE multiply/divide of engine-identical doubles,
    and the output is an exact BIGINT count with a (cnt, state)
    unique ORDER BY.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS6_SQL)


# --------------------------------------------------------------------------
# wave 9 (late r7, below the frozen driver-sample cut — r8 rotation
# priority): q41, q15 shapes.
# --------------------------------------------------------------------------

# q41 shape: dimension-only correlated EXISTS — product names having a
# qualifying sibling in the same dimension table
# (reference examples/tpcds/queries/q41.sql).

_QDS41_SQL = """
    SELECT DISTINCT p_name
    FROM part p1
    WHERE p_retailprice BETWEEN 900 AND 1000
      AND EXISTS (
        SELECT 1 FROM part p2
        WHERE p2.p_brand = p1.p_brand
          AND p2.p_partkey <> p1.p_partkey
          AND p2.p_retailprice BETWEEN p1.p_retailprice - 5
                                   AND p1.p_retailprice + 5
      )
    ORDER BY p_name
    LIMIT 100
"""


@query(
    "qds41_sibling_exists",
    oracle=_QDS41_SQL,
    covers="§2.B TPC-DS q41 shape: dimension-only correlated EXISTS "
    "(product names with a same-brand sibling in a price band) — the "
    "fact table is never touched",
)
def qds41_sibling_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part names having at least one same-brand sibling
    priced within ±5 (q41's manufacturer-variant screen — a query that
    runs entirely on the dimension table).

    Scale: a dimension-only self semi-join on p_brand with the price
    band as residual — Spark plans the correlated EXISTS as a LeftSemi
    hash join on the ~25-value brand key; the fact table is never
    scanned, which is the point of the q41 family. Determinism: the
    band compare is exact-decimal-class arithmetic on 2-decimal prices
    rendered as engine-identical doubles, and the DISTINCT name set
    has a unique ORDER BY.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS41_SQL)


# q15 shape: census with an OR spanning dimension AND fact columns —
# the disjunct defeats single-table pushdown by construction
# (reference examples/tpcds/queries/q15.sql).

_QDS15_SQL = """
    SELECT n_name AS state,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE (c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
           OR c_acctbal > 9000
           OR l_quantity > 45)
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY 1
    ORDER BY 1
"""


@query(
    "qds15_cross_table_disjunct",
    oracle=_QDS15_SQL,
    covers="§2.B TPC-DS q15 shape: census whose OR-disjunct spans "
    "dimension and fact columns (zip-prefix OR state OR sale-floor), "
    "evaluated as a post-join residual",
)
def qds15_cross_table_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation line counts and revenue for 1996-H1 where the
    customer segment, the customer balance, OR the line quantity
    qualifies (q15's zip/state/sale-floor disjunct; the OR spans the
    customer dimension and the fact, so no single scan can absorb it).

    Scale: the cross-table OR is one residual on the joined row — the
    date fringe still pushes to the orders scan and the conjunct-free
    dimensions stream through the natural fact shuffle; nation
    broadcasts. Determinism: the count is exact, revenue sums
    DECIMAL(38,6) before one DOUBLE cast, and state is a unique
    ORDER BY.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS15_SQL)
