"""TPC-DS-shaped plan families (bench-corpus breadth, third wave).

The reference benches 103 TPC-DS queries with golden results
(``examples/tpcds/src/main/scala/.../TPCDSQueryBenchmark.scala:120-166``);
the TPC-H families are covered in relational/relational3, but four plan
shapes are TPC-DS-specific and had no analogue here:

* window function over an aggregate (q63 shape) — monthly sales vs the
  per-group mean of the aggregated rows themselves;
* multi-channel INTERSECT (q14 shape) — items present in every channel,
  then an aggregate filtered by a global-average scalar subquery;
* top-k over ROLLUP (q67 shape) — rank() partitioned by the coarse
  dimension over a hierarchy of subtotal rows;
* returns "anti-pattern" (q81 shape) — a returns CTE consumed twice,
  once rowwise and once as a correlated per-group average threshold.

Adapted to the test schema (no date_dim/store/item: order priorities
stand in for channels, p_type/p_brand for the item hierarchy,
l_returnflag = 'R' for returns), plan-gated in tests/test_plans.py.

Determinism: aggregates stay DECIMAL(38,6) until the last step; every
derived mean is CAST(SUM AS DOUBLE)/COUNT — a single IEEE division of
exact values, identical in Spark and DuckDB, so comparisons against it
never need rounding. Window ORDER BY pins NULLS FIRST wherever a ROLLUP
null can appear (Spark and DuckDB default opposite null orders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.operators.relational import DSUM, dsum
from spark_sql_server_spark.session import load_table, register_tables

# --------------------------------------------------------------------------
# q63 shape: window function over aggregate — monthly brand sales that
# deviate >10% from the brand's mean monthly sales.
# --------------------------------------------------------------------------

_QDS63_SQL = """
    WITH m AS (
      SELECT p_brand,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
               AS sales_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    w AS (
      SELECT p_brand, o_month,
             CAST(sales_dec AS DOUBLE) AS sum_sales,
             CAST(SUM(sales_dec) OVER (PARTITION BY p_brand) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_brand) AS avg_monthly_sales
      FROM m
    )
    SELECT p_brand, o_month, sum_sales, avg_monthly_sales
    FROM w
    WHERE avg_monthly_sales > 0
      AND ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
    ORDER BY p_brand, o_month
    LIMIT 100
"""


@query(
    "qds63_monthly_deviation",
    oracle=_QDS63_SQL,
    covers="§2.B TPC-DS q63 shape: window function over an aggregate "
    "(per-brand monthly sales vs their own mean)",
)
def qds63_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly brand revenue rows deviating >10% from the brand mean.

    Scale: one hash aggregation on (brand, month) — 25×12 rows — then a
    window over those aggregated rows (partition = brand, at most 12
    rows each); the fact table is touched once, date filter pushed to
    the scan, part broadcast. The mean is computed as window-SUM of the
    DECIMAL partials divided by window-COUNT (one IEEE division of
    exact values — deterministic, unlike AVG over doubles whose
    accumulation order is engine-specific); the deviation predicate
    then compares engine-identical doubles, so no rounding is needed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    m = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand",
            F.month("o_orderdate").cast("long").alias("o_month"),
        )
        .agg(F.sum(rev).alias("sales_dec"))
    )
    w = W.partitionBy("p_brand")
    sum_sales = F.col("sales_dec").cast("double")
    avg_monthly = F.sum("sales_dec").over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w)
    scored = m.select(
        "p_brand",
        "o_month",
        sum_sales.alias("sum_sales"),
        avg_monthly.alias("avg_monthly_sales"),
    )
    return (
        scored.filter(
            (F.col("avg_monthly_sales") > 0)
            & (
                F.abs(F.col("sum_sales") - F.col("avg_monthly_sales"))
                / F.col("avg_monthly_sales")
                > 0.1
            )
        )
        .orderBy("p_brand", "o_month")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q14 shape: multi-channel INTERSECT — parts sold under every order
# priority "channel", aggregated and filtered by a global-average
# scalar.
# --------------------------------------------------------------------------

_QDS14_CHANNELS = ("1-URGENT", "2-HIGH", "3-MEDIUM")

_QDS14_SQL = f"""
    WITH cross_parts AS (
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '{_QDS14_CHANNELS[0]}'
      INTERSECT
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '{_QDS14_CHANNELS[1]}'
      INTERSECT
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '{_QDS14_CHANNELS[2]}'
    ),
    avg_sales AS (
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) AS average_sales
      FROM lineitem
    )
    SELECT p_brand, COUNT(*) AS n_lines,
           {DSUM("l_extendedprice")} AS sales
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_partkey IN (SELECT l_partkey FROM cross_parts)
    GROUP BY p_brand
    HAVING {DSUM("l_extendedprice")}
           > (SELECT average_sales FROM avg_sales) * COUNT(*)
    ORDER BY p_brand
"""


@query(
    "qds14_cross_channel",
    oracle=_QDS14_SQL,
    covers="§2.B TPC-DS q14 shape: multi-channel INTERSECT feeding an "
    "aggregate gated by a global-average scalar subquery",
)
def qds14_cross_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brands of parts sold under ALL THREE priority channels, keeping
    brands whose average line price beats the corpus average.

    Scale: r12 (optimization guide §2.4) — the three INTERSECT branches
    are one lineitem⋈orders pass with per-channel membership flags
    (qds38/qds87 MAX(CASE) discipline: set intersection of distinct
    partkey streams ⇔ partkey seen under all three priorities), cutting
    three fact joins + two intersect shuffles to one join + one
    aggregation. The final membership check is a semi join on the
    already-small intersection, and the 1-row global average broadcasts
    into HAVING. The threshold is average_sales × COUNT(*) — comparing
    a decimal-exact group sum against a deterministic IEEE product, no
    rounding needed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")

    cross_parts = (
        li.select("l_orderkey", "l_partkey")
        .join(
            orders.select("o_orderkey", "o_orderpriority").filter(
                F.col("o_orderpriority").isin(*_QDS14_CHANNELS)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_partkey")
        .agg(
            *[
                F.max(F.col("o_orderpriority") == ch).alias(f"in_{i}")
                for i, ch in enumerate(_QDS14_CHANNELS)
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
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(cross_parts, "l_partkey", "left_semi")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice")).alias("sales"),
        )
        .crossJoin(F.broadcast(avg_sales))
        .filter(F.col("sales") > F.col("average_sales") * F.col("n_lines"))
        .select("p_brand", "n_lines", "sales")
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# q67 shape: top-k over ROLLUP — rank within each p_type over the
# (p_type, p_brand) subtotal hierarchy.
# --------------------------------------------------------------------------

_QDS67_TOPK = 5

_QDS67_SQL = f"""
    WITH agg AS (
      SELECT p_type, p_brand,
             SUM(CAST(l_quantity AS DECIMAL(38,6))) AS qty_dec
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY ROLLUP(p_type, p_brand)
    )
    SELECT p_type, p_brand, CAST(qty_dec AS DOUBLE) AS total_qty,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT p_type, p_brand, qty_dec,
             RANK() OVER (PARTITION BY p_type
                          ORDER BY qty_dec DESC,
                                   p_brand ASC NULLS FIRST) AS rk
      FROM agg
    ) ranked
    WHERE rk <= {_QDS67_TOPK}
    ORDER BY p_type NULLS FIRST, rk, p_brand NULLS FIRST
"""


@query(
    "qds67_topk_rollup",
    oracle=_QDS67_SQL,
    covers="§2.B TPC-DS q67 shape: rank() top-k over a ROLLUP subtotal "
    "hierarchy",
)
def qds67_topk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 quantity rows per p_type across the ROLLUP hierarchy
    (subtotal rows compete with leaf rows, exactly the q67 trap).

    Scale: ROLLUP expands each aggregate row over the grouping sets
    map-side (Expand operator) before one hash aggregation; the window
    then runs over the tiny subtotal table partitioned by the coarse
    dimension. Ranks order by the exact DECIMAL total (engine-identical
    comparisons) with NULLS FIRST pinned on the brand tiebreak — Spark
    and DuckDB default to opposite null orders, the classic silent
    divergence of rollup+window queries.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    agg = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .rollup("p_type", "p_brand")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("qty_dec"))
    )
    w = W.partitionBy("p_type").orderBy(
        F.col("qty_dec").desc(), F.col("p_brand").asc_nulls_first()
    )
    return (
        agg.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= _QDS67_TOPK)
        .select(
            "p_type",
            "p_brand",
            F.col("qty_dec").cast("double").alias("total_qty"),
            F.col("rk").cast("long").alias("rk"),
        )
        .orderBy(
            F.col("p_type").asc_nulls_first(),
            "rk",
            F.col("p_brand").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# q81 shape: returns CTE consumed twice — rowwise plus a correlated
# per-nation average threshold.
# --------------------------------------------------------------------------

_QDS81_MULT = 1.2

_QDS81_SQL = f"""
    WITH ctr AS (
      SELECT o_custkey AS ctr_custkey, c_nationkey AS ctr_nation,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS tr_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY o_custkey, c_nationkey
    )
    SELECT c_custkey, c_name, n_name,
           CAST(ctr1.tr_dec AS DOUBLE) AS total_return
    FROM ctr ctr1
    JOIN customer ON ctr1.ctr_custkey = c_custkey
    JOIN nation ON ctr1.ctr_nation = n_nationkey
    WHERE CAST(ctr1.tr_dec AS DOUBLE)
          > (SELECT CAST(SUM(ctr2.tr_dec) AS DOUBLE) * {_QDS81_MULT}
                    / COUNT(*)
             FROM ctr ctr2
             WHERE ctr2.ctr_nation = ctr1.ctr_nation)
    ORDER BY c_name, c_custkey
"""


@query(
    "qds81_returns_above_avg",
    oracle=_QDS81_SQL,
    covers="§2.B TPC-DS q81 shape: returns CTE read twice — rowwise and "
    "as a correlated per-group average threshold",
)
def qds81_returns_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose returned-revenue total exceeds 1.2× their
    nation's average returned-revenue.

    Scale: the returns aggregate is computed ONCE; the per-nation
    threshold is its |nations|-row re-aggregation, broadcast back — the
    decorrelated plan Catalyst produces for the correlated-subquery
    oracle spelling. Threshold = CAST(SUM AS DOUBLE)·1.2/COUNT is a
    deterministic IEEE expression over exact decimal sums, compared
    against an equally exact per-customer double, so the cut is
    engine-stable without rounding. The filter runs before the
    customer/nation detail joins — only qualifying customers join.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ctr = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("ctr_custkey"),
            F.col("c_nationkey").alias("ctr_nation"),
        )
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("tr_dec"))
        # read twice below (rowwise + per-nation threshold): materialize
        # once; localCheckpoint, never persist (no caller can unpersist)
        .localCheckpoint()
    )
    thresholds = ctr.groupBy("ctr_nation").agg(
        (
            F.sum("tr_dec").cast("double") * F.lit(_QDS81_MULT) / F.count(F.lit(1))
        ).alias("nation_threshold")
    )
    return (
        ctr.join(F.broadcast(thresholds), "ctr_nation")
        .filter(F.col("tr_dec").cast("double") > F.col("nation_threshold"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("ctr_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation),
            F.col("ctr_nation") == F.col("n_nationkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("tr_dec").cast("double").alias("total_return"),
        )
        .orderBy("c_name", "c_custkey")
    )


# --------------------------------------------------------------------------
# q4/q11 shape: year-over-year growth — one UNION ALL CTE self-joined
# four ways, growth ratios compared across channels.
# --------------------------------------------------------------------------

_QDS11_SQL = f"""
    WITH year_total AS (
      SELECT o_custkey AS customer_id,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS dyear,
             {DSUM('l_extendedprice * (1 - l_discount)')} AS year_total,
             's' AS sale_type
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag <> 'R'
      GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
      UNION ALL
      SELECT o_custkey AS customer_id,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS dyear,
             {DSUM('l_extendedprice * (1 - l_discount)')} AS year_total,
             'r' AS sale_type
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
      GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
    )
    SELECT t_s_secyear.customer_id,
           t_s_firstyear.year_total AS s_first,
           t_s_secyear.year_total AS s_sec,
           t_r_firstyear.year_total AS r_first,
           t_r_secyear.year_total AS r_sec
    FROM year_total t_s_firstyear, year_total t_s_secyear,
         year_total t_r_firstyear, year_total t_r_secyear
    WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_r_secyear.customer_id
      AND t_s_firstyear.customer_id = t_r_firstyear.customer_id
      AND t_s_firstyear.sale_type = 's' AND t_s_secyear.sale_type = 's'
      AND t_r_firstyear.sale_type = 'r' AND t_r_secyear.sale_type = 'r'
      AND t_s_firstyear.dyear = 1996 AND t_s_secyear.dyear = 1997
      AND t_r_firstyear.dyear = 1996 AND t_r_secyear.dyear = 1997
      AND t_s_firstyear.year_total > 0 AND t_r_firstyear.year_total > 0
      AND t_r_secyear.year_total / t_r_firstyear.year_total
          > t_s_secyear.year_total / t_s_firstyear.year_total
    ORDER BY t_s_secyear.customer_id
    LIMIT 100
"""


@query(
    "qds11_yoy_growth",
    oracle=_QDS11_SQL,
    covers="§2.B TPC-DS q4/q11 shape: UNION ALL CTE self-joined four "
    "ways, year-over-year growth-ratio comparison across channels",
)
def qds11_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose 'returns channel' revenue grew faster from 1996
    to 1997 than their regular-sales revenue (q11's exact join/predicate
    topology; returnflag stands in for the store/web channel split).

    Scale: r12 (optimization guide §2.4) — the shared SQL inlined the
    year_total CTE once per self-join arm (FOUR lineitem⋈orders fact
    joins); the four arms are now conditional DSUM columns of ONE
    per-customer aggregation over one fact join (the qds4 pivot
    discipline: inner-join of ≤1-row-per-customer arms ⇔ all four
    conditional sums non-NULL), and the 1996/1997 screen pushes into
    the orders scan. Determinism: each year_total is an exact
    DECIMAL(38,6) sum rendered to DOUBLE — same per-cell row sets as
    the grouped CTE, so the one-IEEE-division growth comparison is
    bit-identical to the four-way join's.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    yr = F.year("o_orderdate")
    is_r = F.col("l_returnflag") == "R"

    def arm(returns: bool, year: int, alias: str):
        cond = (is_r if returns else ~is_r) & (yr == year)
        return F.sum(F.when(cond, rev)).cast("double").alias(alias)

    yt = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(
            arm(False, 1996, "s_first"),
            arm(False, 1997, "s_sec"),
            arm(True, 1996, "r_first"),
            arm(True, 1997, "r_sec"),
        )
    )
    return (
        yt.filter(
            F.col("s_sec").isNotNull()
            & F.col("r_sec").isNotNull()
            & (F.col("s_first") > 0)
            & (F.col("r_first") > 0)
            & (
                F.col("r_sec") / F.col("r_first")
                > F.col("s_sec") / F.col("s_first")
            )
        )
        .select("customer_id", "s_first", "s_sec", "r_first", "r_sec")
        .orderBy("customer_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q23 shape: multi-level CTE reuse — two expensive CTEs (frequent items,
# best customers vs a global scalar threshold) each consumed by both
# branches of a UNION ALL.
# --------------------------------------------------------------------------

_QDS23_SQL = f"""
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
    SELECT {DSUM('sales')} AS total_sales
    FROM (
      SELECT l_extendedprice * (1 - l_discount) AS sales
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
        AND l_partkey IN (SELECT l_partkey FROM frequent_parts)
        AND o_custkey IN (SELECT o_custkey FROM best_customers)
      UNION ALL
      SELECT l_extendedprice * (1 - l_discount) AS sales
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '2-HIGH'
        AND l_partkey IN (SELECT l_partkey FROM frequent_parts)
        AND o_custkey IN (SELECT o_custkey FROM best_customers)
    ) u
"""


@query(
    "qds23_cte_reuse",
    bench=True,  # r10 VERDICT #3: TPC-DS heavies tracked round-over-round
    oracle=_QDS23_SQL,
    covers="§2.B TPC-DS q23 shape: multi-level CTE reuse (two expensive "
    "CTEs, one a scalar-threshold filter of the other, each consumed by "
    "both UNION ALL branches)",
)
def qds23_cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q23's topology: `frequent_parts` and `best_customers` (itself
    built on `customer_totals` and a scalar subquery over the SAME CTE)
    gate both branches of a UNION ALL.

    r12 (optimization guide §2.4/§3.3): the shared-SQL spelling ran the
    lineitem⋈orders fact join FOUR times (frequent_parts,
    customer_totals, and once per UNION ALL branch — Catalyst inlines
    CTEs per reference and the branch filters differ, so no exchange
    reuse fires). The fact join now runs ONCE, projected to the five
    columns every consumer needs, and is ``localCheckpoint``-ed; the
    three aggregations read the materialized RDD. The UNION ALL
    branches are disjoint priority slices summed by one exact decimal
    SUM, so a single `isin` pass computes the identical total (qds49
    CASE-split discipline). The 0.5*MAX threshold is a 1-row driver
    collect off the tiny per-customer aggregate (qds24 pattern) —
    the identical IEEE multiply both engines evaluate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
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
            F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
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
    max_total = customer_totals.agg(F.max("total").alias("m")).collect()[0]["m"]
    threshold = 0.5 * max_total if max_total is not None else None
    best_customers = customer_totals.filter(
        F.col("total") > F.lit(threshold)
    ).select("o_custkey")
    return (
        joined.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .join(frequent_parts, "l_partkey", "left_semi")
        .join(best_customers, "o_custkey", "left_semi")
        .agg(F.sum("sales_dec").cast("double").alias("total_sales"))
    )


# --------------------------------------------------------------------------
# q95 shape: a CTE referenced by two IN-subqueries (orders shipped by
# more than one supplier, and among those, ones with returns).
# --------------------------------------------------------------------------

_QDS95_SQL = f"""
    WITH multi_supp AS (
      SELECT DISTINCT l1.l_orderkey
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
    )
    SELECT COUNT(DISTINCT o_orderkey) AS order_count,
           {DSUM('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderkey IN (SELECT l_orderkey FROM multi_supp)
      AND o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        WHERE l_returnflag = 'R'
          AND l_orderkey IN (SELECT l_orderkey FROM multi_supp)
      )
"""


# r12 single-derivation form of the executed query. Two exact
# simplifications, oracle unchanged:
# - `DISTINCT l1.l_orderkey` over the self-join "∃ another line with a
#   different supplier" ⇔ the order has ≥2 distinct (non-null)
#   suppkeys ⇔ MIN(l_suppkey) <> MAX(l_suppkey) per order — a grouped
#   screen with NO pair expansion.
# - the nested `l_orderkey IN (multi_supp)` inside the returns
#   subquery is redundant under the outer `o_orderkey IN multi_supp`
#   (k ∈ ms ∧ k ∈ {R-orders ∩ ms} ⇔ k ∈ ms ∧ k ∈ R-orders), so
#   multi_supp is consumed ONCE and Catalyst's per-consumer CTE
#   inlining cannot re-run it.
_QDS95_SPARK_SQL = f"""
    WITH multi_supp AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING MIN(l_suppkey) <> MAX(l_suppkey)
    )
    SELECT COUNT(DISTINCT o_orderkey) AS order_count,
           {DSUM('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderkey IN (SELECT l_orderkey FROM multi_supp)
      AND o_orderkey IN (
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
"""


@query(
    "qds95_reused_subquery",
    oracle=_QDS95_SQL,
    covers="§2.B TPC-DS q95 shape: one CTE consumed by two nested "
    "IN-subqueries (semi-join stacking)",
)
def qds95_reused_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q95's topology: the `multi_supp` CTE feeds two IN-subqueries
    (one nested inside the other's filter in the oracle spelling),
    both planned as left-semi joins.

    Scale (r12): the oracle's `multi_supp` self-join ran TWICE under
    Catalyst's per-consumer CTE inlining (4 lineitem scans + two
    O(lines²-per-order) pair expansions). The Spark side now derives
    multi_supp as a grouped MIN≠MAX suppkey screen (exactly the
    "two lines with different suppliers" set, no pair expansion) and
    consumes it once — the nested membership filter is redundant under
    the outer one (set algebra, data-independent). 5 lineitem scans →
    2; both semi joins remain, no cartesian (plan-gated).
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS95_SPARK_SQL)


# --------------------------------------------------------------------------
# q72 shape: wide dimension join — fact joined to five dimensions plus
# a non-equi date residual; every dim must broadcast, no nested loop.
# --------------------------------------------------------------------------

_QDS72_SQL = """
    SELECT n_name, o_orderpriority, COUNT(*) AS n_late
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
                 AND l_shipdate > o_orderdate + INTERVAL '60' DAY
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_retailprice > 950 AND r_name <> 'ASIA'
    GROUP BY n_name, o_orderpriority
    ORDER BY n_name, o_orderpriority
"""


@query(
    "qds72_wide_dim_join",
    oracle=_QDS72_SQL,
    covers="§2.B TPC-DS q72 shape: fact-to-five-dimension join with a "
    "non-equi date residual on the fact-fact edge",
)
def qds72_wide_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q72's topology: the widest join fan in the DS suite — a fact
    table joined through five dimensions with an inequality residual
    (late shipments) riding the orders equi-join. The date inequality
    stays a residual on the equi anchor, so no BroadcastNestedLoop or
    cartesian appears anywhere (plan-gated); part/supplier/nation/
    region broadcast. Output is pure counts — exact.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS72_SQL)


# --------------------------------------------------------------------------
# q88 shape: one result row assembled from many independent scalar
# count subqueries (the "dashboard row" plan family).
# --------------------------------------------------------------------------

_QDS88_BANDS = [
    (1, 10, "1-URGENT"), (11, 20, "1-URGENT"),
    (1, 10, "2-HIGH"), (11, 20, "2-HIGH"),
    (21, 35, "3-MEDIUM"), (36, 50, "3-MEDIUM"),
]

_QDS88_SQL = "SELECT " + ", ".join(
    "(SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    f"WHERE l_quantity BETWEEN {lo} AND {hi} "
    f"AND o_orderpriority = '{pri}') AS h{i + 1}"
    for i, (lo, hi, pri) in enumerate(_QDS88_BANDS)
)


# r12 single-pass form: the six scalar COUNT subqueries are disjoint
# (quantity band × priority) slices of the SAME lineitem⋈orders join —
# one conditional aggregation computes all six counts in one fact
# pass. COUNT of an empty slice is 0 in both spellings; the combined
# OR-of-bands predicate keeps a pushable coarse screen on the scan.
_QDS88_SPARK_SQL = (
    "SELECT "
    + ", ".join(
        f"COUNT(CASE WHEN l_quantity BETWEEN {lo} AND {hi} "
        f"AND o_orderpriority = '{pri}' THEN 1 END) AS h{i + 1}"
        for i, (lo, hi, pri) in enumerate(_QDS88_BANDS)
    )
    + " FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE "
    + " OR ".join(
        f"(l_quantity BETWEEN {lo} AND {hi} AND o_orderpriority = '{pri}')"
        for lo, hi, pri in _QDS88_BANDS
    )
)


@query(
    "qds88_multi_scalar",
    oracle=_QDS88_SQL,
    covers="§2.B TPC-DS q88 shape: one row assembled from N independent "
    "scalar count subqueries (each with its own pushed-down band filter)",
)
def qds88_multi_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q88's topology: six uncorrelated scalar COUNT subqueries over
    disjoint (quantity band × priority) slices, concatenated into one
    row — the oracle keeps that faithful multi-scalar spelling (the
    planner path itself stays covered by the golden corpus's scalar
    subquery batteries and the oracle).

    Scale (r12): Spark ran the lineitem⋈orders join once PER SCALAR
    (six fact joins, 12 scans). The r4 docstring already noted the
    100 TB form is ONE conditional aggregation — that is now what the
    Spark side executes: one fact pass, six COUNT(CASE) columns
    (empty slice ⇒ 0 in both spellings), the OR-of-slices predicate
    still pushed to the scan. 12 scans → 2, no subqueries.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS88_SPARK_SQL)


# --------------------------------------------------------------------------
# q51 shape: two cumulative-window series FULL OUTER JOINed on their
# (key, period) grain — the web-vs-store running-total comparison.
# --------------------------------------------------------------------------

_QDS51_SQL = """
    WITH web AS (
      SELECT o_custkey AS k,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS period,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS amt
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND EXTRACT(YEAR FROM o_orderdate) = 1996
      GROUP BY o_custkey, EXTRACT(MONTH FROM o_orderdate)
    ),
    store AS (
      SELECT o_custkey AS k,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS period,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS amt
      FROM orders
      WHERE o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
        AND EXTRACT(YEAR FROM o_orderdate) = 1996
      GROUP BY o_custkey, EXTRACT(MONTH FROM o_orderdate)
    ),
    web_c AS (
      SELECT k, period,
             SUM(amt) OVER (PARTITION BY k ORDER BY period
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
      FROM web
    ),
    store_c AS (
      SELECT k, period,
             SUM(amt) OVER (PARTITION BY k ORDER BY period
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
      FROM store
    )
    SELECT COALESCE(w.k, s.k) AS custkey,
           COALESCE(w.period, s.period) AS period,
           CAST(w.cume AS DOUBLE) AS web_cume,
           CAST(s.cume AS DOUBLE) AS store_cume
    FROM web_c w FULL OUTER JOIN store_c s
      ON w.k = s.k AND w.period = s.period
    WHERE COALESCE(w.cume, 0) > COALESCE(s.cume, 0)
    ORDER BY custkey, period
"""

# r12 single-pass form: both channels are disjoint priority slices of
# orders at the same (k, period) grain — one conditional aggregation
# builds both cell columns, one window pass computes both running
# sums (SUM ignores NULL cells, so each running sum equals that
# side's cumulative at exactly the periods where the side exists),
# and `amt IS NOT NULL` reconstructs FULL OUTER presence.
_QDS51_SPARK_SQL = """
    WITH cells AS (
      SELECT o_custkey AS k,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS period,
             SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN CAST(o_totalprice AS DECIMAL(38,6)) END)
               AS web_amt,
             SUM(CASE WHEN o_orderpriority IN ('3-MEDIUM',
                          '4-NOT SPECIFIED', '5-LOW')
                      THEN CAST(o_totalprice AS DECIMAL(38,6)) END)
               AS store_amt
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
                                '4-NOT SPECIFIED', '5-LOW')
        AND EXTRACT(YEAR FROM o_orderdate) = 1996
      GROUP BY o_custkey, EXTRACT(MONTH FROM o_orderdate)
    ),
    cum AS (
      SELECT k, period, web_amt, store_amt,
             SUM(web_amt) OVER (PARTITION BY k ORDER BY period
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS web_run,
             SUM(store_amt) OVER (PARTITION BY k ORDER BY period
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS store_run
      FROM cells
    )
    SELECT k AS custkey, period,
           CAST(CASE WHEN web_amt IS NOT NULL THEN web_run END
                AS DOUBLE) AS web_cume,
           CAST(CASE WHEN store_amt IS NOT NULL THEN store_run END
                AS DOUBLE) AS store_cume
    FROM cum
    WHERE COALESCE(CASE WHEN web_amt IS NOT NULL THEN web_run END, 0)
        > COALESCE(CASE WHEN store_amt IS NOT NULL THEN store_run END, 0)
    ORDER BY custkey, period
"""


@query(
    "qds51_cumulative_windows",
    oracle=_QDS51_SQL,
    covers="§2.B TPC-DS q51 shape: two per-key cumulative window series "
    "FULL OUTER JOINed on their (key, period) grain",
)
def qds51_cumulative_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q51's topology: disjoint channel slices each aggregated to
    (key, period) grain, a running-total window on each side, then a
    FULL OUTER JOIN of the two series with COALESCEd keys — the only
    DS family where a window output feeds both sides of an outer join.
    Both window partitionings and the join share the (k, period) keys,
    so AQE can reuse one exchange; no cartesian (plan-gated).

    Determinism: cumulative sums stay exact DECIMAL(38,6) through the
    window; the > comparison runs on the exact decimals (COALESCE 0)
    and only the output casts to DOUBLE. (custkey, period) is unique
    per side, so the final ORDER BY is a total order.

    Scale (r12): the oracle keeps the two-CTE FULL OUTER spelling;
    Spark ran two orders scans, two aggregations, two window sorts and
    a SortMergeJoin. The channels are disjoint priority slices of ONE
    table at the same (k, period) grain, so the Spark side now pivots
    them into one conditional aggregation (web_amt/store_amt cells),
    runs BOTH running sums in one window pass, and reconstructs each
    side's presence with `amt IS NOT NULL` (a SUM window ignores NULL
    cells, so each running sum equals its side's cumulative exactly at
    the periods where that side exists — the FULL OUTER row set is the
    cells row set). 2 scans + 2 aggs + 2 windows + SMJ → 1 scan +
    1 agg + 1 window.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS51_SPARK_SQL)


# --------------------------------------------------------------------------
# q34/q73 shape: per-(customer, year) order counts banded by HAVING,
# then joined back to the customer dimension for display columns.
# --------------------------------------------------------------------------

_QDS34_SQL = """
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             COUNT(*) AS cnt
      FROM orders
      WHERE o_orderpriority <> '5-LOW'
      GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
      HAVING COUNT(*) BETWEEN 3 AND 5
    )
    SELECT c_name, o_custkey AS custkey, yr, cnt
    FROM per_cust JOIN customer ON o_custkey = c_custkey
    ORDER BY c_name, custkey, yr
"""


@query(
    "qds34_frequent_buyers",
    oracle=_QDS34_SQL,
    covers="§2.B TPC-DS q34/q73 shape: banded HAVING on a per-group "
    "count, joined back to the dimension for display columns",
)
def qds34_frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q34's topology: aggregate the fact to (customer, period) grain,
    keep only groups whose count lands in a band (the 'party size'
    HAVING), then join the surviving small set back to the customer
    dimension. The band filter runs on the aggregate BEFORE the
    dimension join, so the join input is tiny and the dimension
    broadcasts (plan-gated — aggregating after the join would shuffle
    the full fact against customer for nothing). Counts are exact;
    (c_name, custkey, yr) is a total order.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS34_SQL)


# --------------------------------------------------------------------------
# q93 shape: fact LEFT JOINed to its returns subset on the line grain,
# per-line CASE adjustment, then re-aggregated per customer.
# --------------------------------------------------------------------------

_QDS93_SQL = f"""
    WITH ret AS (
      SELECT l_orderkey AS r_orderkey, l_partkey AS r_partkey,
             l_suppkey AS r_suppkey
      FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT o_custkey AS custkey,
           {DSUM("CASE WHEN r_orderkey IS NOT NULL "
                 "THEN l_extendedprice * (1 - l_discount) * 0.5 "
                 "ELSE l_extendedprice * (1 - l_discount) END")} AS act_sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    LEFT JOIN ret ON l_orderkey = r_orderkey
                 AND l_partkey = r_partkey
                 AND l_suppkey = r_suppkey
    GROUP BY o_custkey
    ORDER BY act_sales, custkey
    LIMIT 100
"""

# r12 single-pass form, exact for ANY data: a lineitem row with k > 0
# return rows on its (orderkey, partkey, suppkey) grain fans out to k
# copies of the 0.5-branch under the oracle's LEFT JOIN (k = 0 keeps
# the full-price branch), so its total contribution is
# k·(rev·0.5) — computable from a per-grain R-count window with no
# self-join. All arithmetic stays exact decimal at scale ≤ 6, so
# k·CAST(v) == CAST(k·v) and the custkey sums are bit-identical.
# (sf0.001 has 8 duplicate grains — a flag-only fold is WRONG there;
# the window form reproduces the fan-out exactly.)
_QDS93_SPARK_SQL = f"""
    WITH flagged AS (
      SELECT l_orderkey, l_extendedprice, l_discount,
             COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END)
               OVER (PARTITION BY l_orderkey, l_partkey, l_suppkey)
               AS n_ret
      FROM lineitem
    )
    SELECT o_custkey AS custkey,
           {DSUM("CASE WHEN n_ret > 0 "
                 "THEN n_ret * (l_extendedprice * (1 - l_discount) * 0.5) "
                 "ELSE l_extendedprice * (1 - l_discount) END")} AS act_sales
    FROM flagged
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey
    ORDER BY act_sales, custkey
    LIMIT 100
"""


@query(
    "qds93_returns_adjustment",
    oracle=_QDS93_SQL,
    covers="§2.B TPC-DS q93 shape: fact LEFT JOIN its returns subset on "
    "the line grain, CASE-adjusted revenue re-aggregated per customer",
)
def qds93_returns_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q93's topology: every sale line LEFT JOINs its (possibly absent)
    return line on the full line grain and the revenue expression
    CASE-branches on match presence — the "adjust, don't filter"
    returns pattern (q93 subtracts refunded quantity; halved revenue
    stands in).

    Scale (r12): the oracle keeps the LEFT self-join spelling; the
    Spark side replaces it with a per-grain R-count window — a row
    with k matching return rows fans out to k copies of the halved
    branch under the join, i.e. contributes exactly k·(rev·0.5), which
    the window form computes without a second lineitem scan or a
    self-join shuffle (3 scans → 2; exact for any data including the
    8 duplicate grains at sf0.001). Sums are exact decimals; ORDER BY
    (act_sales, custkey) + LIMIT is a bounded heap with a unique
    tiebreak.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS93_SPARK_SQL)


# --------------------------------------------------------------------------
# q36 shape: rank within ROLLUP hierarchy level — the window PARTITION BY
# is built from GROUPING() outputs of the rollup itself.
# --------------------------------------------------------------------------

_QDS36_SQL = f"""
    WITH agg AS (
      SELECT n_name, o_orderpriority AS pri,
             CAST(GROUPING(n_name) + GROUPING(o_orderpriority) AS BIGINT)
               AS lochierarchy,
             CAST(GROUPING(o_orderpriority) AS BIGINT) AS gp,
             {DSUM('l_extendedprice * (1 - l_discount)')} AS rev
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY ROLLUP(n_name, o_orderpriority)
    )
    SELECT lochierarchy, n_name, pri, rev,
           CAST(RANK() OVER (
             PARTITION BY lochierarchy,
                          CASE WHEN gp = 0 THEN n_name END
             ORDER BY rev DESC, pri ASC NULLS FIRST, n_name ASC NULLS FIRST
           ) AS BIGINT) AS rank_within_parent
    FROM agg
    ORDER BY lochierarchy DESC,
             n_name ASC NULLS FIRST,
             pri ASC NULLS FIRST
"""


@query(
    "qds36_hierarchy_rank",
    oracle=_QDS36_SQL,
    covers="§2.B TPC-DS q36 shape: RANK within ROLLUP hierarchy level — "
    "window PARTITION BY built from GROUPING() of the rollup itself",
)
def qds36_hierarchy_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q36's topology: a two-level ROLLUP whose GROUPING() flags become
    both the hierarchy-level column and the window's PARTITION BY (rank
    of each priority within its nation, of each nation among nations,
    one grand-total row) — the only family where grouping metadata
    feeds a window key. Plan: map-side Expand into one hash aggregate,
    rank window over the ~150 subtotal rows only (plan-gated).

    Determinism: revenues are exact decimal sums rendered to DOUBLE, so
    RANK ties happen only on true equality and the window ORDER BY adds
    unique tiebreaks; every null-producing ROLLUP column pins NULLS
    FIRST in both window and final sort (Spark and DuckDB default
    opposite null orders — the qds67 lesson).
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS36_SQL)


# --------------------------------------------------------------------------
# q17 shape: three instances of the same fact joined in sequence
# (sale → later return → later re-purchase), then aggregated per brand.
# --------------------------------------------------------------------------

_QDS17_SQL = f"""
    WITH s AS (
      SELECT o_custkey AS ck, l_partkey AS pk, o_orderdate AS d,
             l_quantity AS q
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'N'
    ),
    r AS (
      SELECT o_custkey AS ck, l_partkey AS pk, o_orderdate AS d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
    ),
    trips AS (
      SELECT s.pk, s.q AS s_qty, c.q AS c_qty
      FROM s
      JOIN r ON s.ck = r.ck AND s.pk = r.pk AND r.d > s.d
      JOIN s c ON c.ck = r.ck AND c.d > r.d
    )
    SELECT p_brand, COUNT(*) AS n_trips,
           {DSUM('s_qty')} AS sale_qty,
           {DSUM('c_qty')} AS repurchase_qty
    FROM trips JOIN part ON pk = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
"""


@query(
    "qds17_sale_return_repurchase",
    oracle=_QDS17_SQL,
    covers="§2.B TPC-DS q17 shape: three instances of one fact joined in "
    "sequence (sale, later return, later re-purchase), brand aggregate",
)
def qds17_sale_return_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17's topology: the same fact participates three times — a sale
    line, a matching later return by the same (customer, part), and any
    later re-purchase by that customer — chained through two equi joins
    whose date predicates ride as residuals (store_sales →
    store_returns → catalog_sales in the original). The three legs
    shuffle on their natural keys ((ck, pk) then ck); no cartesian or
    nested loop anywhere (plan-gated), and the part dimension broadcasts
    onto the tiny trips set. Quantities aggregate as exact decimals;
    COUNT is exact; p_brand is a total order.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS17_SQL)


# --------------------------------------------------------------------------
# q49 shape: per-channel "worst return ratios" — a window ranking inside
# each channel slice of one fact pass, band-filtered on two ranks.
# --------------------------------------------------------------------------

_QDS49_SQL = """
    WITH flags AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'web'
                  WHEN o_orderpriority = '2-HIGH' THEN 'catalog'
                  ELSE 'store' END AS channel,
             l_partkey AS item,
             l_quantity AS qty,
             CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END AS ret_qty,
             l_extendedprice AS amt,
             CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END AS ret_amt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    per AS (
      SELECT channel, item,
             CAST(SUM(CAST(ret_qty AS DECIMAL(38,6))) AS DOUBLE) AS rq,
             CAST(SUM(CAST(qty AS DECIMAL(38,6))) AS DOUBLE) AS tq,
             CAST(SUM(CAST(ret_amt AS DECIMAL(38,6))) AS DOUBLE) AS ra,
             CAST(SUM(CAST(amt AS DECIMAL(38,6))) AS DOUBLE) AS ta
      FROM flags GROUP BY channel, item
    ),
    ranked AS (
      SELECT channel, item,
             (CAST(FLOOR((rq / tq) * 1000000 + 0.5) AS DOUBLE) / 1000000.0)
               AS return_ratio,
             RANK() OVER (PARTITION BY channel
                          ORDER BY rq / tq DESC, item) AS qty_rank,
             RANK() OVER (PARTITION BY channel
                          ORDER BY ra / ta DESC, item) AS amt_rank
      FROM per
    )
    SELECT channel, item, return_ratio,
           CAST(qty_rank AS BIGINT) AS qty_rank,
           CAST(amt_rank AS BIGINT) AS amt_rank
    FROM ranked WHERE qty_rank <= 10 OR amt_rank <= 10
    ORDER BY channel, item
"""


@query(
    "qds49_channel_return_ranks",
    oracle=_QDS49_SQL,
    covers="§2.B TPC-DS q49 shape: per-channel return-ratio double "
    "ranking, band-filtered on both ranks",
)
def qds49_channel_return_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q49's topology: one fact pass splits into channels via CASE (no
    three scans), per-(channel, item) return ratios aggregate as exact
    decimals, and TWO rank windows over the same partitioning grade
    each item by quantity- and amount-return ratio — the union-of-
    channel-rankings family (the CASE split plans one Expand-free
    aggregation; both windows share one sort).

    Determinism: ratio ranking keys are single IEEE divisions of
    exact-decimal-derived doubles (identical in both engines; item
    tiebreak), and the output ratio uses the ROUND6 micro-space form
    (FLOOR(x*1e6+0.5)/1e6 — bit-identical cross-engine regardless of
    boundary proximity, unlike ROUND of a quotient). qty can't be zero
    (l_quantity >= 1), so no division guard is needed.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS49_SQL)


# --------------------------------------------------------------------------
# q39 shape: volatility screen — per-(supplier, month) quantity stats,
# a coefficient-of-variation filter, self-joined on consecutive months.
# --------------------------------------------------------------------------

_QDS39_SQL = """
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
    ORDER BY a.supp, a.mon
"""


@query(
    "qds39_volatile_supply",
    oracle=_QDS39_SQL,
    covers="§2.B TPC-DS q39 shape: per-period stddev/mean volatility "
    "screen self-joined on consecutive periods, exact-integer CoV test",
)
def qds39_volatile_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q39's topology (inventory volatility): per-(supplier, month)
    quantity statistics, keep periods whose coefficient of variation
    exceeds a threshold, then self-join consecutive months to find
    sustained volatility — the aggregate → filter → offset-self-join
    family.

    Determinism: STDDEV of doubles is partial-agg-order dependent, so
    the CoV test is algebraized to exact int64 — sample stdev/mean >
    1/2 ⇔ 4·n·(n·Σq² − (Σq)²) > (n−1)·(Σq)² (quantities ≤ 50, n ≤ ~60
    per group → every term ≪ 2^63). The certified columns are the raw
    exact quantities (n, Σq, Σq²) per matched month pair; the self-join
    is equi on (supp, mon+1) — one shuffle, no window needed. At scale
    the month offset join beats LAG-over-window when the period key is
    sparse per group (no sort of the whole stats table).

    r12 (optimization guide §2.4): the shared SQL referenced
    ``volatile`` twice, so the lineitem⋈orders fact aggregation was
    inlined once per self-join side; the stats aggregate (one row per
    (supplier, month) — O(suppliers·12), tiny at any scale) is now
    computed ONCE and ``localCheckpoint``-ed, and both join sides read
    the materialized rows.
    """
    return _qds39_pair_join(_qds39_volatile_stats(spark, sf_dir))


def _qds39_volatile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkpointed ``volatile`` stats of the q39 family: one row
    per (supplier, month) passing the exact-integer CoV > 1/2 screen —
    shared by qds39 and qds39b (relational11), each of which self-joins
    it on consecutive months."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1996
    )
    q = F.col("l_quantity").cast("bigint")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("l_suppkey").alias("supp"),
            F.month("o_orderdate").cast("bigint").alias("mon"),
            q.alias("q"),
        )
        .groupBy("supp", "mon")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").cast("bigint").alias("s"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias("s2"),
        )
        .filter(F.col("n") > 1)
        .filter(
            4 * F.col("n") * (F.col("n") * F.col("s2") - F.col("s") * F.col("s"))
            > (F.col("n") - 1) * F.col("s") * F.col("s")
        )
        .localCheckpoint()
    )


def _qds39_pair_join(vol: DataFrame, a_filter=None) -> DataFrame:
    """Consecutive-month self-join of the volatile stats — the q39
    output shape. ``a_filter`` optionally tightens the first-month side
    (qds39b's single added predicate; it references only a-side
    columns, so filtering before the join keeps the identical rows)."""
    a = (vol.filter(a_filter) if a_filter is not None else vol).alias("a")
    b = vol.alias("b")
    return (
        a.join(
            b,
            (F.col("a.supp") == F.col("b.supp"))
            & (F.col("b.mon") == F.col("a.mon") + 1),
        )
        .select(
            F.col("a.supp").alias("supp"),
            F.col("a.mon").alias("mon1"),
            F.col("b.mon").alias("mon2"),
            F.col("a.n").alias("n1"),
            F.col("a.s").alias("sum1"),
            F.col("a.s2").alias("sumsq1"),
            F.col("b.n").alias("n2"),
            F.col("b.s").alias("sum2"),
            F.col("b.s2").alias("sumsq2"),
        )
        .orderBy("supp", "mon1")
    )


# --------------------------------------------------------------------------
# q35/q10 shape: EXISTS under OR — Catalyst plans the disjunctive
# branches as ExistenceJoin (boolean-column semi-join), a planner path
# nothing else in the registry exercises.
# --------------------------------------------------------------------------

_QDS35_SQL = """
    SELECT c_mktsegment, COUNT(*) AS cnt
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
      AND (EXISTS (SELECT 1 FROM orders
                   WHERE o_custkey = c_custkey
                     AND o_orderpriority = '2-HIGH')
           OR EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '5-LOW'))
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@query(
    "qds35_multi_channel_exists",
    oracle=_QDS35_SQL,
    covers="§2.B TPC-DS q35/q10 shape: conjunctive EXISTS plus a "
    "disjunction of EXISTS — planned as ExistenceJoin",
)
def qds35_multi_channel_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q35's topology: customers active in one channel AND in at least
    one of two others. The AND-side EXISTS plans as a plain LeftSemi,
    but EXISTS under OR cannot (a row must survive even when one branch
    fails), so Catalyst emits ExistenceJoin — a semi-join variant that
    APPENDS a boolean 'exists' column instead of filtering, evaluated
    later in the disjunction. Plan-gated: both join flavors present,
    no cartesian. Counts are exact; segment is a total order.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS35_SQL)


# --------------------------------------------------------------------------
# q54 shape: build a customer cohort, total their spend, histogram the
# cohort by spend band — the "count of customers per revenue bucket"
# family (aggregate of an aggregate).
# --------------------------------------------------------------------------

_QDS54_SQL = """
    WITH cohort AS (
      SELECT DISTINCT o_custkey AS ck
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING' AND o_orderpriority = '1-URGENT'
    ),
    spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders JOIN cohort ON o_custkey = ck
      GROUP BY o_custkey
    )
    SELECT CAST(FLOOR(CAST(CAST(FLOOR(rev * 100) AS BIGINT) AS DOUBLE)
                      / 5000000.0) AS BIGINT) AS band,
           COUNT(*) AS cnt
    FROM spend GROUP BY 1 ORDER BY band
"""

# r12 single-pass form: cohort membership ("has a 1-URGENT order" ×
# "segment BUILDING") and total spend both key on o_custkey — one
# orders aggregation computes rev + the urgent flag per customer, and
# the BUILDING screen joins the ≤|customers| aggregate to the customer
# dim AFTER aggregation (broadcastable dim) instead of scanning orders
# twice. Row set and the exact decimal rev are identical.
_QDS54_SPARK_SQL = """
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev,
             MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS has_urgent
      FROM orders
      GROUP BY o_custkey
    )
    SELECT CAST(FLOOR(CAST(CAST(FLOOR(rev * 100) AS BIGINT) AS DOUBLE)
                      / 5000000.0) AS BIGINT) AS band,
           COUNT(*) AS cnt
    FROM spend
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING' AND has_urgent = 1
    GROUP BY 1 ORDER BY band
"""


@query(
    "qds54_cohort_spend_bands",
    oracle=_QDS54_SQL,
    covers="§2.B TPC-DS q54 shape: cohort semi-join, per-customer spend, "
    "histogram of the aggregate by band",
)
def qds54_cohort_spend_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q54's topology: a DISTINCT cohort (customers who bought the
    target segment/priority combination), their TOTAL spend across all
    orders, then a second aggregation histogramming customers into
    $50k revenue bands — the aggregate-of-an-aggregate family where
    the first groupBy's output is the second's input.

    Determinism: rev is an exact decimal sum of 2dp prices, so rev*100
    is integral and FLOOR+BIGINT cast is exact in both engines (a bare
    DECIMAL→BIGINT cast truncates in Spark but rounds in DuckDB — only
    safe here because the value is integral; FLOOR makes it explicit).
    The band division runs in doubles on integers ≪ 2^53 — identical
    IEEE ops.

    Scale (r12): the oracle's cohort CTE made Spark scan orders twice
    (cohort screen, then total spend). Both facts key on o_custkey, so
    the Spark side computes rev + an urgent-order flag in ONE orders
    aggregation and applies the BUILDING screen via a post-aggregation
    customer join (≤|customers| rows against a broadcastable dim).
    2 orders scans + 2 joins → 1 scan + 1 join; identical row set and
    exact decimal rev (plan-gated no cartesian).
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS54_SPARK_SQL)


# --------------------------------------------------------------------------
# q31 shape: quarter-over-quarter acceleration — one quarterly CTE
# self-joined SIX ways (two channels × three quarters per nation) with
# ratio-of-ratio comparison predicates.
# --------------------------------------------------------------------------

_QDS31_SQL = """
    WITH qs AS (
      SELECT n_name,
             CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'web' ELSE 'store' END AS chan,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      GROUP BY n_name, EXTRACT(QUARTER FROM o_orderdate),
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'web' ELSE 'store' END
    )
    SELECT ws1.n_name,
           ws2.rev / ws1.rev AS web_q1_q2_increase,
           ss2.rev / ss1.rev AS store_q1_q2_increase,
           ws3.rev / ws2.rev AS web_q2_q3_increase,
           ss3.rev / ss2.rev AS store_q2_q3_increase
    FROM qs ws1
    JOIN qs ws2 ON ws1.n_name = ws2.n_name AND ws2.chan = 'web' AND ws2.q = 2
    JOIN qs ws3 ON ws1.n_name = ws3.n_name AND ws3.chan = 'web' AND ws3.q = 3
    JOIN qs ss1 ON ws1.n_name = ss1.n_name AND ss1.chan = 'store' AND ss1.q = 1
    JOIN qs ss2 ON ws1.n_name = ss2.n_name AND ss2.chan = 'store' AND ss2.q = 2
    JOIN qs ss3 ON ws1.n_name = ss3.n_name AND ss3.chan = 'store' AND ss3.q = 3
    WHERE ws1.chan = 'web' AND ws1.q = 1
      AND ws2.rev / ws1.rev > ss2.rev / ss1.rev
    ORDER BY ws1.n_name
"""


@query(
    "qds31_quarterly_acceleration",
    oracle=_QDS31_SQL,
    covers="§2.B TPC-DS q31 shape: one quarterly CTE self-joined six "
    "ways, ratio-of-ratio growth comparison across channels",
)
def qds31_quarterly_acceleration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q31's topology: nations whose web revenue grew faster than their
    store revenue from Q1 to Q2 of the same year — the same quarterly
    aggregate referenced SIX times (two channels × three quarters),
    all equi-joined on the nation key with constant channel/quarter
    residuals. The widest CTE self-join fan in the suite (qds11 is
    four-way).

    Scale: r12 (optimization guide §2.4) — the shared SQL inlined the
    quarterly CTE once per reference (SIX orders⋈customer⋈nation
    aggregation passes); the six cells are now conditional sums of ONE
    per-nation aggregation over one star pass (the qds4 pivot
    discipline: the all-inner six-way join ⇔ all six conditional sums
    non-NULL). The chan CASE keeps its ELSE semantics verbatim.
    Determinism: each growth ratio is ONE IEEE division of
    exact-decimal-derived doubles — per-cell row sets identical to the
    grouped CTE's, so predicate and output columns are bit-identical to
    the six-way join's; n_name is unique per row, so the ORDER BY is
    total.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1996
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    chan = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "web"
    ).otherwise("store")
    qtr = F.quarter("o_orderdate")
    tp = F.col("o_totalprice").cast("decimal(38,6)")

    def cell(ch: str, qv: int, alias: str):
        return (
            F.sum(F.when((F.col("chan") == ch) & (F.col("q") == qv), tp))
            .cast("double")
            .alias(alias)
        )

    qs = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", chan.alias("chan"), qtr.alias("q"), "o_totalprice")
        .groupBy("n_name")
        .agg(
            cell("web", 1, "ws1"),
            cell("web", 2, "ws2"),
            cell("web", 3, "ws3"),
            cell("store", 1, "ss1"),
            cell("store", 2, "ss2"),
            cell("store", 3, "ss3"),
        )
    )
    return (
        qs.filter(
            F.col("ws1").isNotNull()
            & F.col("ws2").isNotNull()
            & F.col("ws3").isNotNull()
            & F.col("ss1").isNotNull()
            & F.col("ss2").isNotNull()
            & F.col("ss3").isNotNull()
            & (F.col("ws2") / F.col("ws1") > F.col("ss2") / F.col("ss1"))
        )
        .select(
            "n_name",
            (F.col("ws2") / F.col("ws1")).alias("web_q1_q2_increase"),
            (F.col("ss2") / F.col("ss1")).alias("store_q1_q2_increase"),
            (F.col("ws3") / F.col("ws2")).alias("web_q2_q3_increase"),
            (F.col("ss3") / F.col("ss2")).alias("store_q2_q3_increase"),
        )
        .orderBy("n_name")
    )
