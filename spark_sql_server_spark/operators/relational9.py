"""TPC-DS-shaped plan families, wave 12 (r9): q10, q40, q84.

Reference queries: ``examples/tpcds/src/main/resources/tpcds/queries/
q10.sql``, ``q40.sql``, ``q84.sql`` (the reference validates all of
them through TPCDSQueryBenchmark.scala:215-227). The r8 judge singled
these three out as the parameter-siblings with genuine structural
wrinkles worth their own plan-gated families:

* q10 — demographic census behind an EXISTS screen: customers joined
  to TWO dimensions up front (address/demographics), then kept only
  when active in a base channel AND in at least one of two more
  (EXISTS-under-OR → ExistenceJoin), then a census GROUP BY over
  several demographic columns with repeated ``count(*)`` outputs.
  Unlike qds35 (the q35 twin), the base-channel EXISTS contains its
  OWN join (store_sales ⋈ date_dim) — a correlated subquery over a
  join, and the census groups by five derived columns.
* q40 — before/after price-change netting: the sales fact LEFT OUTER
  JOINs its returns fact on (order, item), nets the refund off each
  sale, and a CASE on the sale date splits the netted money into
  ``sales_before`` / ``sales_after`` a pivot date, per (state, item).
* q84 — chained-dimension customer lookup: five dimensions chained
  key-to-key (customer → address, → cdemo → hdemo → income_band) with
  a range screen on the FAR end of the chain, inner-joined to the
  returns fact (duplicates preserved — q84 has no DISTINCT), emitting
  a concatenated display name. A pure lookup query: no aggregation.

Adapted to the test schema as in relational6/7/8: order priorities are
the channels, ``l_returnflag = 'R'`` lines are the returns fact,
nation/region is the dimension chain, and the account-balance band
stands in for the income band. Determinism: counts are exact; money
stays DECIMAL(38,6) until a final DOUBLE cast; the q10 balance band is
FLOOR of an integral-decimal→BIGINT→DOUBLE division (identical IEEE
ops in both engines — the qds54 lesson); every LIMIT rides a total
order (group keys / unique-per-duplicate-set sort key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table, register_tables

# --------------------------------------------------------------------------
# q10: EXISTS-screened demographic census.
# --------------------------------------------------------------------------

_QDS10_NATIONS = "'NATION_3','NATION_7','NATION_12','NATION_18','NATION_21'"

_QDS10_SQL = f"""
    SELECT c_mktsegment,
           n_name,
           CAST(FLOOR(CAST(CAST(FLOOR(c_acctbal * 100) AS BIGINT)
                           AS DOUBLE) / 100000.0) AS BIGINT) AS bal_band,
           COUNT(*) AS cnt1,
           COUNT(*) AS cnt2,
           COUNT(*) AS cnt3
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ({_QDS10_NATIONS})
      AND EXISTS (SELECT 1 FROM orders JOIN lineitem
                    ON l_orderkey = o_orderkey
                  WHERE o_custkey = c_custkey
                    AND l_returnflag = 'R'
                    AND EXTRACT(MONTH FROM o_orderdate) BETWEEN 1 AND 4)
      AND (EXISTS (SELECT 1 FROM orders
                   WHERE o_custkey = c_custkey
                     AND o_orderpriority = '2-HIGH'
                     AND EXTRACT(MONTH FROM o_orderdate) BETWEEN 1 AND 4)
           OR EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '5-LOW'
                        AND EXTRACT(MONTH FROM o_orderdate)
                            BETWEEN 1 AND 4))
    GROUP BY 1, 2, 3
    ORDER BY c_mktsegment, n_name, bal_band
    LIMIT 100
"""


@query(
    "qds10_demographic_census",
    oracle=_QDS10_SQL,
    covers="§2.B TPC-DS q10 shape: dimension-screened customers kept by "
    "a joined EXISTS AND an EXISTS-under-OR disjunction, census GROUP "
    "BY over derived demographic columns with repeated count(*)",
)
def qds10_demographic_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10's topology: customers pre-joined to their dimensions (here
    nation, screened to an IN-list of five — q10's county list), kept
    only when they transacted in the base channel (an EXISTS whose
    subquery is itself a JOIN of the sales fact to the date dimension
    — here orders ⋈ lineitem on the returned-line leg) AND in at least
    one of two more channels; the survivors feed a census GROUP BY
    over demographic columns (segment, nation, a $1000 balance band)
    with q10's signature repeated ``count(*)`` outputs.

    Planner path: the AND-side EXISTS (containing its own join) plans
    as a LeftSemi whose build side is the pre-joined subquery; the two
    EXISTS under OR become ExistenceJoins (boolean-appending semi
    joins) evaluated in the disjunction — both flavors plan-gated, no
    cartesian. At scale every semi build side aggregates to DISTINCT
    custkeys before the join, the nation dim broadcasts, and the
    census is one hash aggregate.

    Determinism: counts are exact; the balance band is FLOOR of an
    integral DECIMAL (c_acctbal*100) cast BIGINT→DOUBLE then one IEEE
    division — identical in both engines (qds54 lesson); the ORDER BY
    covers every group key, so LIMIT 100 is a total order.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS10_SQL)


# --------------------------------------------------------------------------
# q40: before/after price-change netting over a sales⟕returns join.
# --------------------------------------------------------------------------

_QDS40_SQL = """
    WITH ret AS (
      SELECT l_orderkey AS r_okey, l_partkey AS r_pkey,
             SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
               AS refund
      FROM lineitem
      WHERE l_returnflag = 'R'
      GROUP BY 1, 2
    )
    SELECT n_name AS w_state,
           p_brand AS item_id,
           CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
                THEN CAST(l_extendedprice AS DECIMAL(38,6))
                     - COALESCE(refund, CAST(0 AS DECIMAL(38,6)))
                ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
             AS sales_before,
           CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-06-01 00:00:00'
                THEN CAST(l_extendedprice AS DECIMAL(38,6))
                     - COALESCE(refund, CAST(0 AS DECIMAL(38,6)))
                ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
             AS sales_after
    FROM lineitem
    LEFT JOIN ret ON l_orderkey = r_okey AND l_partkey = r_pkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE l_returnflag <> 'R'
      AND p_retailprice BETWEEN 902 AND 948
      AND o_orderdate BETWEEN TIMESTAMP '1996-05-02 00:00:00'
                          AND TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY n_name, p_brand
    ORDER BY w_state, item_id
    LIMIT 100
"""


@query(
    "qds40_price_change_netting",
    oracle=_QDS40_SQL,
    covers="§2.B TPC-DS q40 shape: sales fact LEFT OUTER JOIN returns "
    "fact on (order, item), refund netted per sale, CASE on the sale "
    "date splits netted money before/after a pivot date",
)
def qds40_price_change_netting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q40's topology (price-change impact): every sale line in a ±30
    day window around a price-change date, LEFT OUTER JOINed to the
    returns fact on (order, item) so returned sales net their refund
    (``coalesce(refund, 0)``), the netted amount split by a CASE on
    the sale date into before/after columns per (warehouse state,
    item) — here (supplier nation, part brand).

    Scale: returns pre-aggregate per (order, item) BEFORE the join —
    the outer join is fact×(shrunk fact) on fixed-width int keys, and
    the date screen reaches the sales scan (pushed filter) so only the
    60-day slice shuffles. part/supplier/nation broadcast. Plan-gated:
    no cartesian, broadcasts on all three dims.

    Determinism: money is exact DECIMAL(38,6) end-to-end (refund =
    price × discount is exact at 6dp), one DOUBLE cast at the very
    end; group keys form the ORDER BY so LIMIT 100 is total.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    zero = F.lit(0).cast("decimal(38,6)")
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(
            F.col("l_orderkey").alias("r_okey"),
            F.col("l_partkey").alias("r_pkey"),
        )
        .agg(
            F.sum(dec(F.col("l_extendedprice") * F.col("l_discount")))
            .alias("refund")
        )
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-05-02 00:00:00").cast("timestamp"),
            F.lit("1996-07-01 00:00:00").cast("timestamp"),
        )
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_retailprice").between(902, 948)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pivot = F.lit("1996-06-01 00:00:00").cast("timestamp")
    netted = dec(F.col("l_extendedprice")) - F.coalesce(
        F.col("refund"), zero
    )
    return (
        li.filter(F.col("l_returnflag") != "R")
        .join(
            ret,
            (F.col("l_orderkey") == F.col("r_okey"))
            & (F.col("l_partkey") == F.col("r_pkey")),
            "left",
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("w_state"),
            F.col("p_brand").alias("item_id"),
        )
        .agg(
            F.sum(F.when(F.col("o_orderdate") < pivot, netted)
                  .otherwise(zero)).cast("double").alias("sales_before"),
            F.sum(F.when(F.col("o_orderdate") >= pivot, netted)
                  .otherwise(zero)).cast("double").alias("sales_after"),
        )
        .orderBy("w_state", "item_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q84: chained-dimension customer lookup joined to the returns fact.
# --------------------------------------------------------------------------

_QDS84_SQL = """
    SELECT c_name AS customer_id,
           CONCAT(c_mktsegment, ', ', c_name) AS customername
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND c_acctbal BETWEEN 1000 AND 6000
      AND l_returnflag = 'R'
    ORDER BY customer_id
    LIMIT 100
"""


@query(
    "qds84_chained_dim_lookup",
    oracle=_QDS84_SQL,
    covers="§2.B TPC-DS q84 shape: customer looked up through a chained "
    "dimension path with a range screen at the far end, inner-joined to "
    "the returns fact (duplicates preserved), concatenated display name",
)
def qds84_chained_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q84's topology: a pure lookup (no aggregation) of customers
    reached through a chain of dimensions joined key-to-key (customer
    → nation → region, standing in for address → cdemo → hdemo →
    income_band), with the selective range screen sitting at the FAR
    end of the chain (q84's income-band bounds; here the balance band
    plus the region equality), inner-joined to the returns fact so a
    customer appears once PER returned line (q84 keeps duplicates —
    no DISTINCT), emitting q84's concatenated display name.

    Determinism: the sort key (customer_id) is unique per customer and
    every duplicate row of a customer is byte-identical, so the LIMIT
    100 multiset is engine-independent even when the cut lands inside
    a duplicate run.

    Scale: the dimension chain broadcasts end-to-end (region → nation
    → the customer screen), the fact joins are equi on int keys
    (orders on custkey, lineitem on orderkey), and the head is a
    TakeOrderedAndProject — no global sort materializes.
    """
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").between(1000, 6000)
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("c_name").alias("customer_id"),
            F.concat(
                F.col("c_mktsegment"), F.lit(", "), F.col("c_name")
            ).alias("customername"),
        )
        .orderBy("customer_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Wave 13 (r9, second batch): q30, q69.
# Reference: examples/tpcds/src/main/resources/tpcds/queries/q30.sql,
# q69.sql — the two remaining parameter-siblings with structural
# wrinkles of their own (COVERAGE.md r8 map marked them *sib*).
# --------------------------------------------------------------------------

_QDS30_NATIONS = "'NATION_12','NATION_7'"

_QDS30_SQL = f"""
    WITH ctr AS (
      SELECT o_custkey AS ctr_custkey,
             c_nationkey AS ctr_nation,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(24,6))) AS ctr_total
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
        AND EXTRACT(YEAR FROM l_shipdate) = 1996
      GROUP BY 1, 2
    )
    SELECT c_custkey AS customer_id,
           c_name AS customer_name,
           c_mktsegment AS customer_segment,
           CAST(ctr_total AS DOUBLE) AS total_return
    FROM (SELECT ctr_custkey, ctr_nation, ctr_total,
                 SUM(ctr_total) OVER (PARTITION BY ctr_nation)
                   AS nation_sum,
                 COUNT(*) OVER (PARTITION BY ctr_nation) AS nation_cnt
          FROM ctr) x
    JOIN customer ON ctr_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ({_QDS30_NATIONS})
      AND ctr_total * 5 * nation_cnt > nation_sum * 6
    ORDER BY customer_id
    LIMIT 100
"""


@query(
    "qds30_state_excess_returners",
    oracle=_QDS30_SQL,
    covers="§2.B TPC-DS q30 shape: per-customer return totals vs "
    "1.2x the state average (correlated scalar AVG over a CTE "
    "referenced twice), customer-DETAIL output projection",
)
def qds30_state_excess_returners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q30's topology: a customer_total_return CTE (returns fact ⋈
    date dim ⋈ address, grouped per customer × state), consumed twice
    — once as the row source, once inside a correlated scalar
    ``avg(ctr_total) * 1.2`` per state — with the survivors joined
    back to the customer dimension for a DETAIL projection (q30 emits
    twelve customer columns, no outer aggregate; here key, name,
    segment + the return total).

    Spark-first re-expression: instead of re-scanning the CTE for the
    correlated scalar (Spark inlines shared SQL CTEs per reference —
    the qds70/qds44/qds64 trap), the per-state average rides a window
    over the grouped rows: ``SUM(ctr_total) OVER (PARTITION BY
    state)`` / ``COUNT(*) OVER (...)`` — one pass, one exchange on
    the state key, and the threshold compares exactly by
    cross-multiplying integers-in-decimal (``total*5*cnt > sum*6`` ≡
    ``total > 1.2*avg``) so no division ever happens. The money total
    is DECIMAL(24,6) — int128-safe in DuckDB's decimal multiply (the
    qds74/qds4 lesson), one DOUBLE cast at output.

    Scale: the CTE groups (custkey, nation) after an equi fact join;
    the window shuffles once on the ~25-key nation column (bounded
    fan-in, no skew at 25 partitionsworth — AQE coalesces); customer
    joins back on custkey; nation broadcasts. ORDER BY the unique
    custkey rides TakeOrderedAndProject.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS30_SQL)


_QDS69_NATIONS = "'NATION_3','NATION_12','NATION_21'"

_QDS69_SQL = f"""
    SELECT c_mktsegment,
           n_name,
           COUNT(*) AS cnt1,
           COUNT(*) AS cnt2
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ({_QDS69_NATIONS})
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                        AND TIMESTAMP '1996-06-30 00:00:00')
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT'
                        AND o_orderdate
                            BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                AND TIMESTAMP '1996-06-30 00:00:00')
      AND NOT EXISTS (SELECT 1 FROM orders JOIN lineitem
                        ON l_orderkey = o_orderkey
                      WHERE o_custkey = c_custkey
                        AND l_returnflag = 'R'
                        AND o_orderdate
                            BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                AND TIMESTAMP '1996-06-30 00:00:00')
    GROUP BY 1, 2
    ORDER BY c_mktsegment, n_name
    LIMIT 100
"""


@query(
    "qds69_semi_anti_census",
    oracle=_QDS69_SQL,
    covers="§2.B TPC-DS q69 shape: one EXISTS AND two NOT EXISTS "
    "channel screens in a single plan (LeftSemi + two LeftAnti), "
    "demographic census with repeated count(*)",
)
def qds69_semi_anti_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q69's topology: the demographic census of customers who are
    active in the base channel (EXISTS over store_sales ⋈ date_dim)
    but inactive in BOTH other channels (NOT EXISTS over web_sales
    and catalog_sales) — one LeftSemi and two LeftAnti joins stacked
    against the same customer spine in a single plan, then a census
    GROUP BY with q69's repeated ``count(*)`` outputs. Here: orders
    in a half-year window is the base channel, urgent orders and
    returned lines (the NOT EXISTS leg containing its own fact⋈fact
    join, like q69's date-dim joins) are the two absent channels.

    Planner path: all three subqueries correlate on the same custkey,
    so Spark stacks LeftSemi → LeftAnti → LeftAnti before the census
    aggregate — both join flavors plan-gated. At scale each build
    side reduces to DISTINCT custkeys under the date screen before
    joining, the nation dim broadcasts, and the census is one hash
    aggregate over two low-cardinality keys.

    Determinism: pure counts over exact screens; the full group key
    is the ORDER BY so LIMIT 100 is a total order.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS69_SQL)
