"""TPC-DS-shaped plan families, wave 11 (r8): q4, q2, q50, q45, q85.

Reference queries: ``examples/tpcds/src/main/resources/tpcds/queries/
q4.sql``, ``q2.sql``, ``q50.sql``, ``q45.sql``, ``q85.sql`` (the
reference validates all of them through TPCDSQueryBenchmark.scala).

* q4 — the full three-channel version of q74's year-total CTE: six
  self-joins (store/catalog/web × first/second period) and TWO growth
  comparisons (catalog grew faster than store AND than web). Same
  CTE-inline trap, twice as wide.
* q2 — week-over-week census: a two-channel union pivots into one row
  per week with seven day-of-week sums, then the CTE self-joins one
  year apart on the ISO week and emits per-day ratios.
* q50 — two facts (sale line, matching later return) joined on
  (customer, part), the return lag bucketed into five day bands per
  store — a fact×fact join feeding a band census.
* q45 — a disjunction spanning TWO dimensions, one leg of which is an
  IN-subquery: (customer-name suffix IN list) OR (item in a
  primes-keyed item set). The subquery leg under OR must plan as an
  ExistenceJoin (boolean-appending semi join), like qds35/qds41.
* q85 — returns star whose residual is an OR of three conjunctions,
  each pairing demographic equalities with a DIFFERENT price band;
  averages per order status.

Adapted to the test schema as in relational6/7: priority buckets are
the channels, supplier is the store, ``l_returnflag = 'R'`` lines are
the returns. Determinism: all money stays DECIMAL(38,6) until a final
DOUBLE cast; growth comparisons cross-multiply DECIMAL(24,6) (int128
in DuckDB, exact — never a division); week ratios round in hundredth
space (FLOOR(x*100+0.5)/100 — identical IEEE ops both engines, the
ROUND6 lesson at 2dp); averages are one IEEE division of exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table, register_tables

# --------------------------------------------------------------------------
# q4: three-channel year totals, six-way self-join, double growth screen.
# --------------------------------------------------------------------------

_QDS4_CHANNEL = (
    "CASE WHEN o_orderpriority = '1-URGENT' THEN 's' "
    "WHEN o_orderpriority IN ('2-HIGH', '3-MEDIUM') THEN 'c' "
    "ELSE 'w' END"
)

_QDS4_SQL = f"""
    WITH yt AS (
      SELECT c_name AS cid,
             CASE WHEN EXTRACT(YEAR FROM o_orderdate) <= 1996
                  THEN 1 ELSE 2 END AS per,
             {_QDS4_CHANNEL} AS st,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS total
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE EXTRACT(YEAR FROM o_orderdate) BETWEEN 1995 AND 1998
      GROUP BY 1, 2, 3
    )
    SELECT s2.cid AS customer_id,
           CAST(c2.total AS DOUBLE) AS catalog_secperiod_total
    FROM yt s1
    JOIN yt s2 ON s1.cid = s2.cid
    JOIN yt c1 ON s1.cid = c1.cid
    JOIN yt c2 ON s1.cid = c2.cid
    JOIN yt w1 ON s1.cid = w1.cid
    JOIN yt w2 ON s1.cid = w2.cid
    WHERE s1.st = 's' AND s2.st = 's' AND c1.st = 'c' AND c2.st = 'c'
      AND w1.st = 'w' AND w2.st = 'w'
      AND s1.per = 1 AND s2.per = 2 AND c1.per = 1 AND c2.per = 2
      AND w1.per = 1 AND w2.per = 2
      AND s1.total > 0 AND c1.total > 0 AND w1.total > 0
      AND CAST(c2.total AS DECIMAL(24,6)) * CAST(s1.total AS DECIMAL(24,6))
          > CAST(s2.total AS DECIMAL(24,6)) * CAST(c1.total AS DECIMAL(24,6))
      AND CAST(c2.total AS DECIMAL(24,6)) * CAST(w1.total AS DECIMAL(24,6))
          > CAST(w2.total AS DECIMAL(24,6)) * CAST(c1.total AS DECIMAL(24,6))
    ORDER BY customer_id
    LIMIT 100
"""


@query(
    "qds4_triple_channel_growth",
    bench=True,  # r10 VERDICT #3: TPC-DS heavies tracked round-over-round
    oracle=_QDS4_SQL,
    covers="§2.B TPC-DS q4 shape: three-channel period totals consumed "
    "by a six-way self-join, catalog-grew-fastest double screen",
)
def qds4_triple_channel_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4's topology — the widest of the year-total family: per-
    (customer, period, channel) totals consumed by SIX self-join arms,
    keeping customers whose catalog spend grew faster than BOTH their
    store and web spend.

    Scale: r12 (optimization guide §2.4) — the six arms collapse into
    ONE per-customer conditional aggregation: each (channel, period)
    total is an exact decimal SUM(CASE) column, so the six-way
    self-join disappears entirely (an inner equi-join of six ≤1-row-
    per-cid arms ⇔ all six conditional sums non-NULL — the qds38/qds87
    membership-flag discipline applied to the year-total family). One
    fact pass, one shuffle on cid, no checkpoint, no join of arms.
    Both growth comparisons remain exact DECIMAL(24,6)
    cross-multiplications: no division, no rounding, int128-backed in
    DuckDB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").between(1995, 1998)
    )
    customer = load_table(spark, sf_dir, "customer")
    per = F.when(F.year("o_orderdate") <= 1996, 1).otherwise(2)
    st = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "s")
        .when(F.col("o_orderpriority").isin("2-HIGH", "3-MEDIUM"), "c")
        .otherwise("w")
    )
    dec = F.col("l_extendedprice").cast("decimal(38,6)")

    def arm_total(st_v: str, per_v: int, alias: str):
        return F.sum(
            F.when((F.col("st") == st_v) & (F.col("per") == per_v), dec)
        ).alias(alias)

    yt = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_name").alias("cid"), per.alias("per"), st.alias("st"), "l_extendedprice")
        .groupBy("cid")
        .agg(
            arm_total("s", 1, "s1_total"),
            arm_total("s", 2, "s2_total"),
            arm_total("c", 1, "c1_total"),
            arm_total("c", 2, "c2_total"),
            arm_total("w", 1, "w1_total"),
            arm_total("w", 2, "w2_total"),
        )
    )
    d24 = lambda c: F.col(c).cast("decimal(24,6)")  # noqa: E731
    return (
        yt.filter(
            F.col("s1_total").isNotNull()
            & F.col("s2_total").isNotNull()
            & F.col("c1_total").isNotNull()
            & F.col("c2_total").isNotNull()
            & F.col("w1_total").isNotNull()
            & F.col("w2_total").isNotNull()
            & (F.col("s1_total") > 0)
            & (F.col("c1_total") > 0)
            & (F.col("w1_total") > 0)
            & (d24("c2_total") * d24("s1_total")
               > d24("s2_total") * d24("c1_total"))
            & (d24("c2_total") * d24("w1_total")
               > d24("w2_total") * d24("c1_total"))
        )
        .select(
            F.col("cid").alias("customer_id"),
            F.col("c2_total").cast("double")
            .alias("catalog_secperiod_total"),
        )
        .orderBy("customer_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q2: weekly day-of-week census, self-joined one year apart on ISO week.
# --------------------------------------------------------------------------

_QDS2_DAYS = ("sun", "mon", "tue", "wed", "thu", "fri", "sat")

# DuckDB's dayofweek is 0-based (Sunday = 0); Spark's is 1-based
# (Sunday = 1) — the oracle shifts by one to line up with the
# DataFrame side's F.dayofweek
_QDS2_PIVOT = ",\n             ".join(
    f"SUM(CASE WHEN dayofweek(o_orderdate) + 1 = {i + 1} THEN "
    f"CAST(l_extendedprice AS DECIMAL(38,6)) END) AS {d}_sales"
    for i, d in enumerate(_QDS2_DAYS)
)

_QDS2_RATIOS = ",\n           ".join(
    f"CAST(FLOOR(CAST(a.{d}_sales AS DOUBLE) / CAST(b.{d}_sales AS DOUBLE)"
    f" * 100 + 0.5) AS DOUBLE) / 100 AS {d}_ratio"
    for d in _QDS2_DAYS
)

_QDS2_SQL = f"""
    WITH wswscs AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(weekofyear(o_orderdate) AS BIGINT) AS wk,
             {_QDS2_PIVOT}
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority <> '1-URGENT'
      GROUP BY 1, 2
    )
    SELECT a.wk AS week_seq,
           {_QDS2_RATIOS}
    FROM wswscs a
    JOIN wswscs b ON a.wk = b.wk AND b.yr = a.yr + 1
    WHERE a.yr = 1996
    ORDER BY a.wk
"""


@query(
    "qds2_weekly_yoy_ratios",
    oracle=_QDS2_SQL,
    covers="§2.B TPC-DS q2 shape: day-of-week pivot per week, CTE "
    "self-joined one year apart, per-day ratios",
)
def qds2_weekly_yoy_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2's topology: the two non-store channels union into one stream
    (a priority filter here — the union legs are disjoint), each week
    pivots into seven day-of-week sums via CASE, and the weekly CTE
    self-joins one year apart on the ISO week to emit per-day ratios.

    Scale: r12 (optimization guide §2.4) — the r8 form
    localCheckpoint-ed the weekly pivot and self-joined it one year
    apart; both year legs are now conditional sums of ONE per-week
    aggregation (14 day×year cells + two existence counts — the qds4
    pivot discipline), removing the checkpoint and the join, and the
    1996/1997 screen pushes into the orders scan (other years never
    survived the year legs). Determinism: per-cell row sets are
    identical to the (yr, wk)-grouped CTE's (exact decimal sums are
    order-insensitive); a missing day is NULL (propagates through the
    ratio identically in both engines); the 2dp ratio rounds in
    hundredth space — ``FLOOR(q*100+0.5)/100`` is the same IEEE
    sequence in both engines where ``ROUND(q, 2)`` of a quotient is
    not (the ROUND6 lesson).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") != "1-URGENT")
        & F.year("o_orderdate").isin(1996, 1997)
    )
    yr = F.year("o_orderdate")
    dec = F.col("l_extendedprice").cast("decimal(38,6)")

    def cell(year: int, dow: int, alias: str):
        return F.sum(
            F.when(
                (F.col("yr") == year) & (F.col("dow") == dow), F.col("dec")
            )
        ).alias(alias)

    wswscs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            yr.alias("yr"),
            F.weekofyear("o_orderdate").cast("long").alias("wk"),
            F.dayofweek("o_orderdate").alias("dow"),
            dec.alias("dec"),
        )
        .groupBy("wk")
        .agg(
            *[
                cell(1996, i + 1, f"a_{d}_sales")
                for i, d in enumerate(_QDS2_DAYS)
            ],
            *[
                cell(1997, i + 1, f"b_{d}_sales")
                for i, d in enumerate(_QDS2_DAYS)
            ],
            F.count(F.when(F.col("yr") == 1996, 1)).alias("a_rows"),
            F.count(F.when(F.col("yr") == 1997, 1)).alias("b_rows"),
        )
    )

    def ratio(d: str):
        q = (
            F.col(f"a_{d}_sales").cast("double")
            / F.col(f"b_{d}_sales").cast("double")
        )
        return (
            (F.floor(q * 100 + F.lit(0.5)).cast("double") / 100)
            .alias(f"{d}_ratio")
        )

    return (
        wswscs.filter((F.col("a_rows") > 0) & (F.col("b_rows") > 0))
        .select(F.col("wk").alias("week_seq"),
                *[ratio(d) for d in _QDS2_DAYS])
        .orderBy("week_seq")
    )


# --------------------------------------------------------------------------
# q50: sale→return lag, five day-bands per store.
# --------------------------------------------------------------------------

_QDS50_BANDS = (
    ("d30", "lag <= 30"),
    ("d60", "lag > 30 AND lag <= 60"),
    ("d90", "lag > 60 AND lag <= 90"),
    ("d120", "lag > 90 AND lag <= 120"),
    ("dmore", "lag > 120"),
)

_QDS50_SQL = f"""
    WITH s AS (
      SELECT o_custkey AS ck, l_partkey AS pk, l_suppkey AS sk,
             o_orderdate AS d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'N'
    ),
    r AS (
      SELECT o_custkey AS ck, l_partkey AS pk, o_orderdate AS d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
    ),
    lags AS (
      SELECT s.sk, datediff('day', s.d, r.d) AS lag
      FROM s JOIN r ON s.ck = r.ck AND s.pk = r.pk AND r.d >= s.d
    )
    SELECT s_name AS store_name,
           {", ".join(
               f"CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
               f" AS {name}"
               for name, pred in _QDS50_BANDS)}
    FROM lags JOIN supplier ON sk = s_suppkey
    GROUP BY s_name
    ORDER BY s_name
"""


@query(
    "qds50_return_lag_bands",
    oracle=_QDS50_SQL,
    covers="§2.B TPC-DS q50 shape: sale×return fact join, return lag "
    "bucketed into five day bands per store",
)
def qds50_return_lag_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q50's topology: the sale fact joins its matching later return
    on (customer, part) — a genuine fact×fact equi join with a date
    residual — and the days-to-return bucket into five bands counted
    per store.

    Scale: the two legs shuffle on (custkey, partkey); the return-year
    screen prunes the return leg's scan; the supplier dim broadcasts
    onto the tiny lag set; the five bands are CASE arms of ONE
    aggregation (the reference's five sum columns — never five
    passes). Counts are exact integers; datediff of date-truncated
    timestamps is exact in both engines (Spark spells it
    ``datediff(end, start)``, DuckDB ``datediff('day', start, end)``).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    s = (
        li.filter(F.col("l_returnflag") == "N")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("l_partkey").alias("pk"),
            F.col("l_suppkey").alias("sk"),
            F.col("o_orderdate").alias("sd"),
        )
    )
    r = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(F.year("o_orderdate").isin(1996, 1997)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("rck"),
            F.col("l_partkey").alias("rpk"),
            F.col("o_orderdate").alias("rd"),
        )
    )
    lag = F.datediff(F.col("rd"), F.col("sd"))
    bands = [
        F.sum(F.when(lag <= 30, 1).otherwise(0)).alias("d30"),
        F.sum(F.when((lag > 30) & (lag <= 60), 1).otherwise(0)).alias("d60"),
        F.sum(F.when((lag > 60) & (lag <= 90), 1).otherwise(0)).alias("d90"),
        F.sum(F.when((lag > 90) & (lag <= 120), 1).otherwise(0)).alias(
            "d120"
        ),
        F.sum(F.when(lag > 120, 1).otherwise(0)).alias("dmore"),
    ]
    return (
        s.join(
            r,
            (F.col("ck") == F.col("rck"))
            & (F.col("pk") == F.col("rpk"))
            & (F.col("rd") >= F.col("sd")),
        )
        .join(F.broadcast(supplier), F.col("sk") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("store_name"))
        .agg(*bands)
        .orderBy("store_name")
    )


# --------------------------------------------------------------------------
# q45: disjunction across two dimensions with an IN-subquery leg.
# --------------------------------------------------------------------------

_QDS45_SQL = """
    SELECT c_mktsegment, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE (substr(c_name, length(c_name) - 1, 2)
             IN ('01', '13', '25', '37', '49')
           OR p_name IN (SELECT p_name FROM part
                         WHERE p_partkey IN (2, 3, 5, 7, 11, 13, 17, 19,
                                             23, 29)))
      AND EXTRACT(QUARTER FROM o_orderdate) = 2
      AND EXTRACT(YEAR FROM o_orderdate) = 1997
    GROUP BY c_mktsegment, n_name
    ORDER BY c_mktsegment, n_name
    LIMIT 100
"""


@query(
    "qds45_geo_or_itemset",
    oracle=_QDS45_SQL,
    covers="§2.B TPC-DS q45 shape: disjunction spanning two dimensions "
    "with an IN-subquery leg (ExistenceJoin under OR)",
)
def qds45_geo_or_itemset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q45's topology: keep a fact row if the customer's zip prefix is
    in a literal list (name suffix stands in) OR its item belongs to a
    primes-keyed item set — a disjunction that spans two different
    dimensions, one leg of which is an IN subquery.

    Scale: the subquery leg under OR cannot become a plain semi join
    (rows failing it may still pass the other leg) — Spark plans an
    ExistenceJoin that appends a boolean column (plan-gated), the same
    class as qds35/qds41; the literal leg stays a residual. The
    quarter/year fringe is pushed to the orders scan; dims broadcast.
    Exact decimal sums; group keys are a total order.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS45_SQL)


# --------------------------------------------------------------------------
# q85: returns star with an OR of demographic+price-band conjunctions.
# --------------------------------------------------------------------------

_QDS85_SQL = """
    SELECT o_orderstatus,
           COUNT(*) AS n_returns,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*) AS avg_quantity,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*) AS avg_refund,
           CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
                AS DOUBLE) / COUNT(*) AS avg_fee
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE l_returnflag = 'R'
      AND EXTRACT(YEAR FROM o_orderdate) = 1997
      AND ((c_mktsegment = 'BUILDING' AND s_acctbal > 0
            AND l_extendedprice BETWEEN 10000 AND 50000)
           OR (c_mktsegment = 'MACHINERY' AND s_acctbal > 1000
               AND l_extendedprice BETWEEN 20000 AND 60000)
           OR (c_mktsegment = 'HOUSEHOLD' AND s_acctbal > 2000
               AND l_extendedprice BETWEEN 30000 AND 70000))
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""


@query(
    "qds85_banded_return_reasons",
    oracle=_QDS85_SQL,
    covers="§2.B TPC-DS q85 shape: returns star with an OR of three "
    "demographic+price-band conjunctions, per-reason averages",
)
def qds85_banded_return_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q85's topology: returned lines through a multi-dimension star
    where the residual is an OR of three conjunctions, each pairing a
    demographic equality (marital/education in the original; market
    segment and store balance here) with a DIFFERENT price band — the
    screen spans the fact AND two dimensions, so it can only apply
    post-join.

    Scale: each dimension broadcasts; the band disjunction applies
    once on the joined row (never re-derived per output column); the
    three averages are single IEEE divisions of exact decimal sums by
    the exact count (never AVG over doubles — the qds63 lesson).
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS85_SQL)


# --------------------------------------------------------------------------
# wave 11b: q5 (sales+returns per-channel UNION → ROLLUP), q8
# (substring-key INTERSECT semi join), q22 (item-hierarchy ROLLUP avg).
# --------------------------------------------------------------------------

_QDS5_LEG = """
      SELECT '{channel}' AS channel,
             CONCAT('{prefix}', s_name) AS id,
             SUM(CASE WHEN l_returnflag <> 'R'
                 THEN CAST(l_extendedprice AS DECIMAL(38,6))
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS sales_dec,
             SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST(l_extendedprice AS DECIMAL(38,6))
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS returns_dec,
             SUM(CASE WHEN l_returnflag <> 'R'
                 THEN CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,6))
                 ELSE CAST(-l_extendedprice * l_discount
                           AS DECIMAL(38,6)) END) AS profit_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE o_orderdate BETWEEN TIMESTAMP '1996-08-23 00:00:00'
                            AND TIMESTAMP '1996-09-06 00:00:00'
        AND {pred}
      GROUP BY 1, 2
"""

_QDS5_SQL = f"""
    WITH ssr AS ({_QDS5_LEG.format(
        channel="store channel", prefix="store",
        pred="o_orderpriority = '1-URGENT'")}),
    csr AS ({_QDS5_LEG.format(
        channel="catalog channel", prefix="catalog_page",
        pred="o_orderpriority IN ('2-HIGH', '3-MEDIUM')")}),
    wsr AS ({_QDS5_LEG.format(
        channel="web channel", prefix="web_site",
        pred="o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')")})
    SELECT channel, id,
           CAST(SUM(sales_dec) AS DOUBLE) AS sales,
           CAST(SUM(returns_dec) AS DOUBLE) AS returns,
           CAST(SUM(profit_dec) AS DOUBLE) AS profit
    FROM (SELECT * FROM ssr UNION ALL SELECT * FROM csr
          UNION ALL SELECT * FROM wsr) x
    GROUP BY ROLLUP (channel, id)
    ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
    LIMIT 100
"""


@query(
    "qds5_channel_sales_returns",
    oracle=_QDS5_SQL,
    covers="§2.B TPC-DS q5 shape: per-channel sales+returns union "
    "(zero-padded money columns), re-agg under ROLLUP(channel, id)",
)
def qds5_channel_sales_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5's topology: each channel unions its sales rows (returns
    columns zero) with its returns rows (sales columns zero) over a
    14-day window, aggregates per channel entity, and a final
    ROLLUP(channel, id) produces per-entity, per-channel, and grand
    totals.

    Scale: the sales/returns union within a channel is a CASE split of
    one fact pass (the rows differ only in ``l_returnflag``), and the
    three channels partition order priorities — so the whole body is
    ONE aggregation feeding a ROLLUP Expand over ~30 rows (plan-gated:
    single lineitem scan, no Union). ROLLUP null keys pin NULLS FIRST
    in both engines (the qds67 lesson). Exact decimal money
    throughout; profit folds the discount sign into the CASE so each
    leg stays a single decimal sum.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-08-23 00:00:00").cast("timestamp"),
            F.lit("1996-09-06 00:00:00").cast("timestamp"),
        )
    )
    supplier = load_table(spark, sf_dir, "supplier")
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    zero = F.lit(0).cast("decimal(38,6)")
    is_ret = F.col("l_returnflag") == "R"
    channel = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "store channel")
        .when(F.col("o_orderpriority").isin("2-HIGH", "3-MEDIUM"),
              "catalog channel")
        .otherwise("web channel")
    )
    prefix = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "store")
        .when(F.col("o_orderpriority").isin("2-HIGH", "3-MEDIUM"),
              "catalog_page")
        .otherwise("web_site")
    )
    base = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            channel.alias("channel"),
            F.concat(prefix, F.col("s_name")).alias("id"),
            F.when(~is_ret, dec(F.col("l_extendedprice")))
            .otherwise(zero).alias("sales_dec"),
            F.when(is_ret, dec(F.col("l_extendedprice")))
            .otherwise(zero).alias("returns_dec"),
            F.when(
                ~is_ret,
                dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            )
            .otherwise(dec(-F.col("l_extendedprice") * F.col("l_discount")))
            .alias("profit_dec"),
        )
    )
    return (
        base.rollup("channel", "id")
        .agg(
            F.sum("sales_dec").cast("double").alias("sales"),
            F.sum("returns_dec").cast("double").alias("returns"),
            F.sum("profit_dec").cast("double").alias("profit"),
        )
        .orderBy(
            F.col("channel").asc_nulls_first(),
            F.col("id").asc_nulls_first(),
        )
        .limit(100)
    )


_QDS8_ZIPS = (
    "('01'),('07'),('13'),('19'),('25'),('31'),('37'),('43'),('49'),"
    "('55'),('61'),('67'),('73'),('79'),('85'),('91'),('97')"
)

_QDS8_SQL = f"""
    WITH zip_list(z) AS (SELECT * FROM (VALUES {_QDS8_ZIPS}) t(z)),
    preferred AS (
      SELECT substr(c_name, length(c_name) - 1, 2) AS z
      FROM customer WHERE c_acctbal > 2000
      GROUP BY 1 HAVING COUNT(*) >= 2
    ),
    allowed AS (SELECT z FROM zip_list INTERSECT SELECT z FROM preferred)
    SELECT n_name AS store_nation,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS net_profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE substr(c_name, length(c_name) - 1, 2) IN (SELECT z FROM allowed)
      AND EXTRACT(YEAR FROM o_orderdate) = 1997
    GROUP BY n_name
    ORDER BY n_name
"""


@query(
    "qds8_zip_prefix_semi",
    oracle=_QDS8_SQL,
    covers="§2.B TPC-DS q8 shape: INTERSECT of a literal zip-prefix "
    "list with an aggregated preferred-customer set, semi-joined on a "
    "derived substring key",
)
def qds8_zip_prefix_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8's topology: a literal list of zip prefixes (customer-name
    suffixes here) INTERSECTs the prefixes that have ≥2 preferred
    customers, and store profit is summed only where the buyer's
    prefix survives — a semi join on a DERIVED substring key fed by a
    set intersection.

    Scale: both sides of the INTERSECT are tiny (≤100 prefixes) — the
    IN-subquery becomes a broadcast LEFT SEMI join on the computed
    substring (never a per-row probe, plan-gated); the year screen
    prunes orders; dims broadcast. Exact decimal sum; nation name is a
    total order.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS8_SQL)


_QDS22_SQL = """
    SELECT p_name, p_brand, p_type,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*) AS qoh
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 00:00:00'
    GROUP BY ROLLUP (p_name, p_brand, p_type)
    ORDER BY qoh,
             p_name ASC NULLS FIRST,
             p_brand ASC NULLS FIRST,
             p_type ASC NULLS FIRST
    LIMIT 100
"""


@query(
    "qds22_inventory_hierarchy_avg",
    oracle=_QDS22_SQL,
    covers="§2.B TPC-DS q22 shape: average quantity-on-hand under an "
    "item-hierarchy ROLLUP, quantity-ordered head",
)
def qds22_inventory_hierarchy_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22's topology: a year of inventory positions (ship-window
    lineitem quantities stand in) averaged under a ROLLUP of the item
    hierarchy — every prefix level plus the grand total — with the
    head ordered by the average itself.

    Scale: one fact pass into the ROLLUP Expand (levels are computed
    map-side, one exchange); the item dim broadcasts; the head is
    TakeOrderedAndProject. Determinism: qoh is SUM(decimal)/COUNT —
    one IEEE division of exact values (never AVG over doubles); the
    qoh sort carries the full hierarchy as tiebreaks with NULLS FIRST
    pinned on every rollup-nullable key.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS22_SQL)


# --------------------------------------------------------------------------
# wave 11c: q43 (weekday pivot per store), q80 (promo-screened netted
# channel rollup) — the two strongest of the remaining sibling numbers,
# promoted to their own plan-gated entries.
# --------------------------------------------------------------------------

_QDS43_PIVOT_ORACLE = ",\n           ".join(
    f"CAST(SUM(CASE WHEN dayofweek(o_orderdate) + 1 = {i + 1} THEN "
    f"CAST(l_extendedprice AS DECIMAL(38,6)) END) AS DOUBLE) AS {d}_sales"
    for i, d in enumerate(_QDS2_DAYS)
)

_QDS43_SQL = f"""
    SELECT s_name AS store_name,
           {_QDS43_PIVOT_ORACLE}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
    GROUP BY s_name
    ORDER BY s_name
"""


@query(
    "qds43_store_weekday_pivot",
    oracle=_QDS43_SQL,
    covers="§2.B TPC-DS q43 shape: per-store day-of-week sales pivot "
    "(seven CASE sums, one fact pass)",
)
def qds43_store_weekday_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q43's topology: one year of sales pivoted into seven day-of-week
    columns per store — the plain weekday report (qds2 builds the same
    pivot per week and self-joins it; qds59 compares weekday ratios
    across half-years; this is the base shape both derive from).

    Scale: a single fact pass — the seven days are CASE arms of ONE
    hash aggregation on the store key (plan-gated: no Union, one
    lineitem scan); the year screen prunes orders, the store dim
    broadcasts. Exact decimal day sums cast to DOUBLE once; DuckDB's
    0-based dayofweek is shifted in the oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1996
    )
    supplier = load_table(spark, sf_dir, "supplier")
    pivot = [
        F.sum(
            F.when(
                F.dayofweek("o_orderdate") == i + 1,
                F.col("l_extendedprice").cast("decimal(38,6)"),
            )
        ).cast("double").alias(f"{d}_sales")
        for i, d in enumerate(_QDS2_DAYS)
    ]
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("store_name"))
        .agg(*pivot)
        .orderBy("store_name")
    )


_QDS80_SQL = """
    SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'store channel'
                WHEN o_orderpriority IN ('2-HIGH', '3-MEDIUM')
                THEN 'catalog channel'
                ELSE 'web channel' END AS channel,
           s_name AS id,
           CAST(SUM(CASE WHEN l_returnflag <> 'R'
                    THEN CAST(l_extendedprice AS DECIMAL(38,6))
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
             AS sales,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_extendedprice AS DECIMAL(38,6))
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
             AS returns,
           CAST(SUM(CASE WHEN l_returnflag <> 'R'
                    THEN CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(38,6))
                    ELSE CAST(-l_extendedprice AS DECIMAL(38,6)) END)
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-08-23 00:00:00'
                          AND TIMESTAMP '1996-09-22 00:00:00'
      AND (l_returnflag = 'R' OR p_type <> 'PROMO')
    GROUP BY ROLLUP (1, 2)
    ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
    LIMIT 100
"""


@query(
    "qds80_promo_screened_rollup",
    oracle=_QDS80_SQL,
    covers="§2.B TPC-DS q80 shape: three-channel sales/returns/"
    "netted-profit rollup where the promo screen applies to sales rows "
    "only (row-conditional predicate)",
)
def qds80_promo_screened_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q80's topology: per-channel sales, returns, and returns-netted
    profit over a 30-day window under a promotion screen that applies
    to SALES rows only (returns pass unscreened — the reference joins
    promotion on the sales legs alone), rolled up over
    (channel, store).

    Scale: the row-conditional screen is a single disjunctive
    predicate on the joined row, so the whole report stays ONE fact
    pass into the ROLLUP Expand (plan-gated: no Union, one lineitem
    scan); the qds5 fold with a per-row screen. Exact decimal money;
    NULLS FIRST pinned on the rollup keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-08-23 00:00:00").cast("timestamp"),
            F.lit("1996-09-22 00:00:00").cast("timestamp"),
        )
    )
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    zero = F.lit(0).cast("decimal(38,6)")
    is_ret = F.col("l_returnflag") == "R"
    channel = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "store channel")
        .when(F.col("o_orderpriority").isin("2-HIGH", "3-MEDIUM"),
              "catalog channel")
        .otherwise("web channel")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(is_ret | (F.col("p_type") != "PROMO"))
        .select(
            channel.alias("channel"),
            F.col("s_name").alias("id"),
            F.when(~is_ret, dec(F.col("l_extendedprice")))
            .otherwise(zero).alias("sales_dec"),
            F.when(is_ret, dec(F.col("l_extendedprice")))
            .otherwise(zero).alias("returns_dec"),
            F.when(
                ~is_ret,
                dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            )
            .otherwise(dec(-F.col("l_extendedprice")))
            .alias("profit_dec"),
        )
        .rollup("channel", "id")
        .agg(
            F.sum("sales_dec").cast("double").alias("sales"),
            F.sum("returns_dec").cast("double").alias("returns"),
            F.sum("profit_dec").cast("double").alias("profit"),
        )
        .orderBy(
            F.col("channel").asc_nulls_first(),
            F.col("id").asc_nulls_first(),
        )
        .limit(100)
    )
