"""Relational operator coverage (SURVEY.md §2.B).

The reference implements no relational operators of its own — it
delegates the whole SQL surface to Spark (SURVEY.md §2, reference
``service/ExecutorImpl.scala:135``). Parity therefore means *test
coverage* of that delegated surface: joins (all types), aggregation
(incl. GROUPING SETS / ROLLUP / CUBE / PIVOT), window functions, set
operations, subqueries (EXISTS / IN / scalar, correlated), sort/limit,
CTEs, lateral views, higher-order functions, inline tables and TVFs.

Each query here is written Spark-first: DataFrame API or ``spark.sql``
(identical Catalyst plans), broadcast hints on dimension tables, and
filters expressed so they push down to the parquet scan. Scale notes on
each query explain why the plan survives 100×.

Determinism vs the DuckDB oracle: see registry.py (decimal-sum rule,
unique tiebreaks on LIMIT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table, register_tables


def dsum(c: Column) -> Column:
    """Order-insensitive (exact decimal) sum, returned as DOUBLE."""
    return F.sum(c.cast("decimal(38,6)")).cast("double")


def DSUM(expr: str) -> str:
    """SQL spelling of :func:`dsum` — valid in both Spark SQL and DuckDB."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def round6(c: Column) -> Column:
    """Cross-engine-safe 6dp rounding of a non-negative double:
    ``FLOOR(x*1e6 + 0.5) / 1e6`` is the identical IEEE op sequence in
    Spark and DuckDB, whereas ``ROUND(double, 6)`` of a quotient is NOT
    cross-engine safe (Spark rounds the shortest decimal repr via
    BigDecimal HALF_UP, DuckDB rounds a scaled multiply — a value
    within an ulp of a 0.5e-6 boundary splits them; see CLAUDE.md and
    the r3 ``t_ngram_lm_score`` driver failure)."""
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000.0


def ROUND6(expr: str) -> str:
    """SQL spelling of :func:`round6` — valid in both Spark SQL and
    DuckDB. The CAST TO DOUBLE before the division is load-bearing: in
    Spark SQL ``FLOOR(double)`` is BIGINT and the literal ``1000000.0``
    parses as DECIMAL(8,1), so without the cast the quotient silently
    becomes DECIMAL — a different wire/pandas type than DuckDB's DOUBLE
    and a driver hash mismatch (caught by
    tests/test_boundary_audit.py::test_round6_cross_engine_identity).
    With it, both engines perform the same exact int→double conversion
    (|value| ≪ 2^53) and one IEEE division."""
    return f"(CAST(FLOOR(({expr}) * 1000000 + 0.5) AS DOUBLE) / 1000000.0)"


def davg(c: Column) -> Column:
    """Deterministic average: exact decimal sum / count, in DOUBLE."""
    return (dsum(c) / F.count(c).cast("double")).cast("double")


def DAVG(expr: str) -> str:
    return f"CAST({DSUM(expr)} / CAST(COUNT({expr}) AS DOUBLE) AS DOUBLE)"


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity')} AS sum_qty,
           {DSUM('l_extendedprice')} AS sum_base_price,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {DAVG('l_quantity')} AS avg_qty,
           {DAVG('l_extendedprice')} AS avg_price,
           {DAVG('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    covers="§2.B GROUP BY + aggregate functions (TPC-H Q1 shape)",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy single-pass aggregation.

    Scale: the shipdate filter and 7-column projection push down to the
    parquet scan; aggregation is partial (map-side) then final over only
    6 groups — shuffle volume is O(groups × partitions), independent of
    row count, so this is embarrassingly scalable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_agg_distinct",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_distinct_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    covers="§2.B DISTINCT aggregates",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates → Spark plans expand + two-phase agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.sum_distinct(F.col("l_quantity").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_distinct_qty"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS g
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST, g
    """,
    covers="§2.B ROLLUP + grouping()",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), g.cast("long").alias("g"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_last(),
            F.col("l_linestatus").asc_nulls_last(),
            "g",
        )
    )


@query(
    "q_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity')} AS sum_qty,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS g
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST, g
    """,
    covers="§2.B CUBE",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"), g.cast("long").alias("g"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_last(),
            F.col("l_linestatus").asc_nulls_last(),
            "g",
        )
    )


_GROUPING_SETS_SQL = f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {DSUM('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
"""


@query("q_grouping_sets", oracle=_GROUPING_SETS_SQL, covers="§2.B GROUPING SETS")
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@query(
    "q_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {DSUM("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS o_qty,
           {DSUM("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS f_qty,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS o_cnt,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS f_cnt
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    covers="§2.B PIVOT",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list — the list keeps the plan a
    single pass (no extra distinct-values job) at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum(F.col("l_quantity")).alias("qty"), F.count(F.lit(1)).alias("cnt"))
    )
    return pv.select(
        "l_returnflag",
        F.col("O_qty").alias("o_qty"),
        F.col("F_qty").alias("f_qty"),
        F.col("O_cnt").alias("o_cnt"),
        F.col("F_cnt").alias("f_cnt"),
    ).orderBy("l_returnflag")


_HAVING_SQL = f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {DSUM('o_totalprice')} AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3 AND {DSUM('o_totalprice')} > 100000
    ORDER BY o_custkey
"""


@query("q_having", oracle=_HAVING_SQL, covers="§2.B HAVING")
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_HAVING_SQL)


@query(
    "q_stats_agg",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           {DSUM('l_quantity')} AS s1,
           {DSUM('l_quantity * l_quantity')} AS s2,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           quantile_cont(l_quantity, 0.5) AS median_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    covers="§2.B statistical aggregates (moments via exact sums), percentile",
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment sums are decimal-exact so variance/stddev derived from
    (n, s1, s2) is reproducible on any engine; median is exact
    interpolated percentile (Spark `percentile` ≡ DuckDB quantile_cont)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            dsum(q).alias("s1"),
            dsum(q * q).alias("s2"),
            F.min(q).cast("double").alias("min_qty"),
            F.max(q).cast("double").alias("max_qty"),
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@query(
    "q2_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    covers="§2.B correlated EXISTS → left-semi join (TPC-H Q4 shape)",
    bench=True,
)
def q2_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join on the shuffle key.

    Scale: semi join shuffles both sides once on l_orderkey/o_orderkey;
    no row multiplication, and AQE can pick shuffle-hash when one side
    is small after filtering.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    covers="§2.B multi-way inner join + agg + top-k (TPC-H Q3 shape)",
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join with the selective dimension broadcast.

    Scale: customer (filtered to one segment) is the small side →
    broadcast hash join avoids shuffling orders; orders⋈lineitem
    shuffles on the order key. Top-k is sort+limit which Spark plans as
    TakeOrderedAndProject (per-partition heap, no global sort).
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name, {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    covers="§2.B 6-way join, broadcast dims (TPC-H Q5 shape)",
    bench=True,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: every dimension (region, nation, supplier, customer)
    is broadcast so the only shuffle is orders⋈lineitem on orderkey.
    At 100 TB the fact-fact shuffle is unavoidable; the dims never are.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_outer_joins",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus = 'F'
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
    covers="§2.B LEFT OUTER join with join-side predicate",
)
def q_outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_orderstatus == "F")
    return (
        cust.join(orders, cond, "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@query(
    "q_full_outer",
    oracle="""
    WITH a AS (SELECT o_custkey AS k, COUNT(*) AS n_open
               FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey),
         b AS (SELECT o_custkey AS k, COUNT(*) AS n_done
               FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
    SELECT COALESCE(a.k, b.k) AS custkey,
           COALESCE(n_open, 0) AS n_open, COALESCE(n_done, 0) AS n_done
    FROM a FULL OUTER JOIN b ON a.k = b.k
    ORDER BY custkey
    """,
    covers="§2.B FULL OUTER join + CTE",
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_open"))
    )
    b = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_done"))
    )
    return (
        a.join(b, "k", "full_outer")
        .select(
            F.col("k").alias("custkey"),
            F.coalesce("n_open", F.lit(0)).alias("n_open"),
            F.coalesce("n_done", F.lit(0)).alias("n_done"),
        )
        .orderBy("custkey")
    )


@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    covers="§2.B NOT EXISTS → left-anti join",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q_theta_join",
    oracle="""
    SELECT c1.c_nationkey AS nationkey, COUNT(*) AS n_pairs
    FROM customer c1 JOIN customer c2
      ON c1.c_nationkey = c2.c_nationkey AND c1.c_acctbal < c2.c_acctbal
    GROUP BY c1.c_nationkey
    ORDER BY c1.c_nationkey
    """,
    covers="§2.B theta / non-equi join",
)
def q_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi pair join *with an equi anchor*: Spark extracts the
    c_nationkey equality as the hash key, so this stays a hash join with
    a residual filter — not a nested-loop cross product — at any scale."""
    c1 = load_table(spark, sf_dir, "customer").alias("c1")
    c2 = load_table(spark, sf_dir, "customer").alias("c2")
    cond = (F.col("c1.c_nationkey") == F.col("c2.c_nationkey")) & (
        F.col("c1.c_acctbal") < F.col("c2.c_acctbal")
    )
    return (
        c1.join(c2, cond)
        .groupBy(F.col("c1.c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("nationkey")
    )


_USING_JOIN_SQL = """
    SELECT n_name, r_name
    FROM (SELECT n_regionkey AS rk, n_name FROM nation)
    JOIN (SELECT r_regionkey AS rk, r_name FROM region) USING (rk)
    ORDER BY n_name
"""


@query("q_using_join", oracle=_USING_JOIN_SQL, covers="§2.B USING join")
def q_using_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_USING_JOIN_SQL)


_NATURAL_JOIN_SQL = """
    SELECT rk, COUNT(*) AS n_nations
    FROM (SELECT n_regionkey AS rk, n_name FROM nation)
    NATURAL JOIN (SELECT r_regionkey AS rk, r_name FROM region)
    GROUP BY rk
    ORDER BY rk
"""


@query("q_natural_join", oracle=_NATURAL_JOIN_SQL, covers="§2.B NATURAL join")
def q_natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_NATURAL_JOIN_SQL)


_CROSS_JOIN_SQL = """
    SELECT r_name, o_orderstatus, COUNT(*) AS n
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    GROUP BY r_name, o_orderstatus
    ORDER BY r_name, o_orderstatus
"""


@query("q_cross_join", oracle=_CROSS_JOIN_SQL, covers="§2.B CROSS join")
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_CROSS_JOIN_SQL)


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@query(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER w AS rn,
             RANK()       OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) t WHERE rn <= 2
    ORDER BY o_custkey, rn
    """,
    covers="§2.B window ranking functions + named WINDOW clause",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via row_number — the scalable idiom (single
    shuffle on the partition key; no self-join)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 2)
        .orderBy("o_custkey", "rn")
    )


@query(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           LAG(o_orderkey, 1)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS prev_order,
           LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS next_order,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS first_order
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    covers="§2.B running aggregates, lag/lead/first_value, ROWS frames",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(running)
        .cast("double")
        .alias("running_spend"),
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "q_window_range",
    oracle="""
    SELECT p_size, p_partkey,
           COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
             AS n_similar_size,
           NTILE(4)      OVER (ORDER BY p_retailprice, p_partkey) AS price_quartile,
           CAST(PERCENT_RANK() OVER (ORDER BY p_retailprice, p_partkey) AS DOUBLE) AS pr,
           CAST(CUME_DIST()    OVER (ORDER BY p_retailprice, p_partkey) AS DOUBLE) AS cd
    FROM part
    ORDER BY p_partkey
    """,
    covers="§2.B RANGE frames, ntile, percent_rank, cume_dist",
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    wsize = W.orderBy("p_size").rangeBetween(-1, 1)
    wprice = W.orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_size",
        "p_partkey",
        F.count("*").over(wsize).alias("n_similar_size"),
        F.ntile(4).over(wprice).alias("price_quartile"),
        F.percent_rank().over(wprice).cast("double").alias("pr"),
        F.cume_dist().over(wprice).cast("double").alias("cd"),
    ).orderBy("p_partkey")


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

_SET_OPS_SQL = """
    SELECT k FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    ) t
    ORDER BY k
"""


@query("q_intersect", oracle=_SET_OPS_SQL, covers="§2.B INTERSECT")
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_SET_OPS_SQL)


_EXCEPT_SQL = """
    SELECT k FROM (
      SELECT c_custkey AS k FROM customer
      EXCEPT
      SELECT o_custkey AS k FROM orders
    ) t
    ORDER BY k
"""


@query("q_except", oracle=_EXCEPT_SQL, covers="§2.B EXCEPT")
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_EXCEPT_SQL)


_UNION_SQL = """
    SELECT k, src, COUNT(*) AS n FROM (
      SELECT o_custkey AS k, 'open' AS src FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT o_custkey AS k, 'done' AS src FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT c_custkey AS k, 'cust' AS src FROM customer
    ) t
    GROUP BY k, src
    ORDER BY k, src
"""


@query("q_union", oracle=_UNION_SQL, covers="§2.B UNION / UNION ALL")
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_UNION_SQL)


@query(
    "q_intersect_all",
    oracle="""
    SELECT q FROM (
      SELECT l_quantity AS q FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT ALL
      SELECT l_quantity AS q FROM lineitem WHERE l_returnflag = 'R'
    ) t ORDER BY q
    """,
    covers="§2.B INTERSECT ALL / EXCEPT ALL",
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_quantity").alias("q"))
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_quantity").alias("q"))
    return a.intersectAll(r).orderBy("q")


# --------------------------------------------------------------------------
# Subqueries, CTEs
# --------------------------------------------------------------------------

_SCALAR_SUBQ_SQL = """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part) * 1.5
    ORDER BY p_partkey
"""


@query("q_scalar_subquery", oracle=_SCALAR_SUBQ_SQL, covers="§2.B scalar subquery")
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQ_SQL)


_CORR_SCALAR_SQL = f"""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (
      SELECT {DSUM('l_extendedprice')} FROM lineitem WHERE l_orderkey = o.o_orderkey
    )
    ORDER BY o_orderkey
"""


@query(
    "q_correlated_scalar",
    oracle=_CORR_SCALAR_SQL,
    covers="§2.B correlated scalar subquery (decorrelated by Catalyst)",
)
def q_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_CORR_SCALAR_SQL)


_IN_SUBQ_SQL = """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem WHERE l_quantity > 45
    ) AND s_nationkey NOT IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
    ORDER BY s_suppkey
"""


@query("q_in_subquery", oracle=_IN_SUBQ_SQL, covers="§2.B IN / NOT IN subqueries")
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_IN_SUBQ_SQL)


_CTE_SQL = f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {DSUM('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      GROUP BY l_suppkey
    ),
    top AS (SELECT MAX(total_revenue) AS max_rev FROM revenue)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no, top
    WHERE total_revenue = top.max_rev
    ORDER BY s_suppkey
"""


@query("q_cte", oracle=_CTE_SQL, covers="§2.B WITH / CTE (TPC-H Q15 shape)")
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_CTE_SQL)


# --------------------------------------------------------------------------
# Expressions: CASE, strings, dates, JSON, sort/limit semantics
# --------------------------------------------------------------------------

_CASE_SQL = """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS bucket,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'done'
                ELSE 'other' END AS status_word,
           IF(o_orderpriority LIKE '1%', 1, 0) AS urgent
    FROM orders
    ORDER BY o_orderkey
"""

_CASE_ORACLE = """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS bucket,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'done'
                ELSE 'other' END AS status_word,
           CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS urgent
    FROM orders
    ORDER BY o_orderkey
"""


@query("q_case_expr", oracle=_CASE_ORACLE, covers="§2.B CASE (searched + simple), IF, LIKE")
def q_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_CASE_SQL)


_STRING_SQL = """
    SELECT c_custkey,
           UPPER(c_name) AS uname,
           SUBSTRING(c_name, 1, 8) AS prefix,
           LENGTH(c_name) AS name_len,
           c_name || '/' || c_mktsegment AS tagged,
           TRIM('  pad  ') AS trimmed,
           REPLACE(c_mktsegment, 'BUILD', 'BLD') AS repl,
           LPAD(CAST(c_custkey AS STRING), 8, '0') AS padded_key,
           SPLIT_PART(c_name, '#', 2) AS name_num
    FROM customer
    WHERE c_name LIKE 'Customer%'
    ORDER BY c_custkey
"""

_STRING_ORACLE = """
    SELECT c_custkey,
           UPPER(c_name) AS uname,
           SUBSTRING(c_name, 1, 8) AS prefix,
           CAST(LENGTH(c_name) AS INT) AS name_len,
           c_name || '/' || c_mktsegment AS tagged,
           TRIM('  pad  ') AS trimmed,
           REPLACE(c_mktsegment, 'BUILD', 'BLD') AS repl,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           SPLIT_PART(c_name, '#', 2) AS name_num
    FROM customer
    WHERE c_name LIKE 'Customer%'
    ORDER BY c_custkey
"""


@query("q_string_funcs", oracle=_STRING_ORACLE, covers="§2.B string function family, || concat")
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_STRING_SQL)


_REGEX_SQL = """
    SELECT p_partkey, p_type,
           p_type RLIKE '^[A-Z]+ ' AS starts_upper,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           REGEXP_REPLACE(p_name, '[aeiou]', '_') AS devoweled
    FROM part
    ORDER BY p_partkey
"""

_REGEX_ORACLE = """
    SELECT p_partkey, p_type,
           regexp_matches(p_type, '^[A-Z]+ ') AS starts_upper,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
    FROM part
    ORDER BY p_partkey
"""


@query("q_regex", oracle=_REGEX_ORACLE, covers="§2.B RLIKE / regexp functions (PG `~`)")
def q_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_REGEX_SQL)


_DATE_SQL = """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           COUNT(*) AS n,
           MIN(CAST(o_orderdate AS DATE)) AS first_day
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY yr, mo
"""


@query("q_date_funcs", oracle=_DATE_SQL, covers="§2.B date/time extract, date_trunc, GROUP BY ordinal")
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_DATE_SQL)


@query(
    "q_order_nulls",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_quantity END AS maybe_qty
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY maybe_qty ASC NULLS FIRST, l_orderkey, l_linenumber
    """,
    covers="§2.B NULLS FIRST/LAST ordering",
)
def q_order_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    maybe = F.when(F.col("l_linenumber") % 3 == 0, None).otherwise(F.col("l_quantity"))
    return li.select("l_orderkey", "l_linenumber", maybe.alias("maybe_qty")).orderBy(
        F.col("maybe_qty").asc_nulls_first(), "l_orderkey", "l_linenumber"
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 5
    """,
    covers="§2.B LIMIT / OFFSET, top-k",
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(5)
        .limit(15)
    )


_DISTRIBUTE_SQL = """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_orderkey <= 50
    DISTRIBUTE BY l_orderkey SORT BY l_orderkey, l_linenumber
"""

_DISTRIBUTE_ORACLE = """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_orderkey <= 50
"""


@query(
    "q_distribute_sort_by",
    oracle=_DISTRIBUTE_ORACLE,
    covers="§2.B DISTRIBUTE BY / SORT BY (set-equal to plain scan)",
)
def q_distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_DISTRIBUTE_SQL)


_VALUES_SQL = """
    SELECT t.k, t.v, n_name
    FROM VALUES (0, 'zero'), (1, 'one'), (2, 'two') AS t(k, v)
    LEFT JOIN nation ON n_nationkey = t.k
    ORDER BY t.k
"""

_VALUES_ORACLE = """
    SELECT t.k, t.v, n_name
    FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) t(k, v)
    LEFT JOIN nation ON n_nationkey = t.k
    ORDER BY t.k
"""


@query("q_inline_values", oracle=_VALUES_ORACLE, covers="§2.B inline table VALUES ... AS t(a,b)")
def q_inline_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_VALUES_SQL)


@query(
    "q_range_tvf",
    oracle="""
    SELECT CAST(r AS BIGINT) AS r, r * r AS r_squared
    FROM generate_series(1, 10) t(r)
    ORDER BY r
    """,
    covers="§2.A17 generate_series → range TVF; §2.B table-valued functions",
)
def q_range_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs through the PG dialect rewriter: generate_series(1,10) is
    end-inclusive, Spark's range(1,11) end-exclusive (reference
    PgParser.scala:188-238)."""
    from spark_sql_server_spark.dialect.rewriter import rewrite_sql

    sql = "SELECT r, r * r AS r_squared FROM generate_series(1, 10) AS s(r) ORDER BY r"
    return spark.sql(rewrite_sql(sql))


_LATERAL_SQL = """
    SELECT word, COUNT(*) AS cnt
    FROM documents LATERAL VIEW explode(split(text, ' ')) t AS word
    WHERE lang = 'en'
    GROUP BY word
    HAVING COUNT(*) > 5
    ORDER BY cnt DESC, word
    LIMIT 25
"""

_LATERAL_ORACLE = """
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word
          FROM documents WHERE lang = 'en') t
    GROUP BY word
    HAVING COUNT(*) > 5
    ORDER BY cnt DESC, word
    LIMIT 25
"""


@query(
    "q_lateral_explode",
    oracle=_LATERAL_ORACLE,
    covers="§2.B LATERAL VIEW explode (UDTF surface)",
)
def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_HOF_SQL = """
    SELECT l_orderkey,
           element_at(transform(qtys, x -> x * 2), 1) AS first_doubled,
           CAST(size(filter(qtys, x -> x > 25.0)) AS BIGINT) AS n_big,
           aggregate(qtys, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS fold_sum
    FROM (SELECT l_orderkey, sort_array(collect_list(l_quantity)) AS qtys
          FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey)
    ORDER BY l_orderkey
"""

_HOF_ORACLE = """
    SELECT l_orderkey,
           qtys_t[1] AS first_doubled,
           CAST(len(list_filter(qtys, x -> x > 25.0)) AS BIGINT) AS n_big,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), qtys), (acc, x) -> acc + x)
             AS fold_sum
    FROM (SELECT l_orderkey,
                 list_transform(list_sort(list(l_quantity)), x -> x * 2) AS qtys_t,
                 list_sort(list(l_quantity)) AS qtys
          FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey) t
    ORDER BY l_orderkey
"""


@query(
    "q_higher_order",
    oracle=_HOF_ORACLE,
    covers="§2.B higher-order functions (transform/filter/aggregate), arrays",
)
def q_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_HOF_SQL)


# Certified sampling summary: TABLESAMPLE's row-count contract is exact
# in both engines even though WHICH rows land is engine-specific, and
# the seeded-hash Bernoulli sample (multiplicative hash mod a prime —
# the scale-correct way to take a *reproducible* sample: pure map-side
# filter, no shuffle, stable under repartitioning) selects the IDENTICAL
# row set in both engines, certified via count + key checksum.
_SAMPLE_SPARK_SQL = """
    SELECT 'hash_mod10' AS method, COUNT(*) AS n_rows,
           CAST(SUM(l_orderkey * 8 + l_linenumber) AS BIGINT) AS key_checksum
    FROM lineitem
    WHERE (l_orderkey * 2654435761 + l_linenumber * 40503)
          % 1000000007 % 10 = 0
    UNION ALL
    SELECT 'rows_500' AS method, COUNT(*) AS n_rows,
           CAST(NULL AS BIGINT) AS key_checksum
    FROM (SELECT * FROM lineitem TABLESAMPLE (500 ROWS))
    ORDER BY method
"""

_SAMPLE_ORACLE = """
    SELECT 'hash_mod10' AS method, COUNT(*) AS n_rows,
           CAST(SUM(l_orderkey * 8 + l_linenumber) AS BIGINT) AS key_checksum
    FROM lineitem
    WHERE (l_orderkey * 2654435761 + l_linenumber * 40503)
          % 1000000007 % 10 = 0
    UNION ALL
    SELECT 'rows_500' AS method, COUNT(*) AS n_rows,
           CAST(NULL AS BIGINT) AS key_checksum
    FROM (SELECT * FROM lineitem USING SAMPLE 500 ROWS)
    ORDER BY method
"""


@query(
    "q_sample",
    oracle=_SAMPLE_ORACLE,
    covers="§2.B TABLESAMPLE (exact row-count contract) + seeded-hash "
    "reproducible Bernoulli sample (exact membership)",
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_SAMPLE_SPARK_SQL)


# --------------------------------------------------------------------------
# Events table (JSON, time-series windows)
# --------------------------------------------------------------------------

_EVENTS_HOURLY_SQL = f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {DSUM('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type
"""


@query(
    "q_events_hourly",
    oracle=_EVENTS_HOURLY_SQL,
    covers="time-series bucketing (batch equivalent of streaming tumbling window)",
    bench=True,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_EVENTS_HOURLY_SQL)


_EVENTS_JSON_SQL = """
    SELECT event_id,
           CAST(get_json_object(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY event_id
"""

_EVENTS_JSON_ORACLE = """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY event_id
"""


@query("q_events_json", oracle=_EVENTS_JSON_ORACLE, covers="§2.B JSON functions")
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_EVENTS_JSON_SQL)


@query(
    "q_events_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    covers="sessionization: lag + running sum (batch twin of streaming session windows)",
    bench=True,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization, the classic distributed formulation:
    one shuffle on user_id, then two window passes — no per-user
    collect, so it scales to any number of events per user."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ (no direct long cast) — go through TIMESTAMP;
    # load_table pins the session to UTC so the epoch view is stable
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(gap > 30 * 60, 1).otherwise(0)
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias(
            "session_id"
        ),
    )
    return (
        sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )
