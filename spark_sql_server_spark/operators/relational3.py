"""Advanced TPC-H-shaped relational queries (second wave).

Deeper plan shapes over the delegated SQL surface (SURVEY.md §2.B):
nation-pair trade with a disjunctive join filter (Q7), multi-dim profit
rollup (Q9), returned-item top-k (Q10), conditional-aggregate ratio
(Q14), distinct-count with anti-join exclusion (Q16), HAVING-driven IN
subquery on an aggregate (Q18), and dual correlated EXISTS / NOT EXISTS
on the same fact table (Q21).

The test schema has no ``partsupp`` and lineitem carries only
``l_shipdate``, so the classic shapes are adapted: supply cost derives
from ``p_retailprice``, the part-supplier bridge is the distinct
(l_partkey, l_suppkey) projection of lineitem, and "late delivery"
compares ship dates within an order. Plan shapes — the thing these
queries exercise — are unchanged.

Determinism: every money aggregate goes through ``DSUM``
(DECIMAL(38,6) → DOUBLE); ``l_quantity`` is stored as DOUBLE so even
quantity totals use the decimal path; every LIMIT carries a unique
tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.operators.relational import DSUM, ROUND6, dsum, round6
from spark_sql_server_spark.session import load_table

_Q7_SQL = f"""
    SELECT supp_nation, cust_nation, l_year, {DSUM("volume")} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@query(
    "q7_nation_trade",
    oracle=_Q7_SQL,
    covers="§2.B disjunctive cross-dimension join filter + year rollup "
    "(TPC-H Q7 shape)",
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume between two nations by ship year.

    Scale: both nation dims broadcast; the disjunctive nation-pair
    predicate evaluates after the broadcast joins, so the only
    shuffles are the two fact joins (lineitem⋈orders on orderkey,
    then ⋈customer on custkey). The final rollup has ≤ 2×years
    groups — map-side partials collapse it almost entirely.
    """
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q9_SQL = f"""
    SELECT nation, o_year, {DSUM("amount")} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""


@query(
    "q9_product_profit",
    oracle=_Q9_SQL,
    covers="§2.B multi-dim profit rollup, LIKE-filtered dim (TPC-H Q9 "
    "shape; supply cost from p_retailprice — no partsupp in schema)",
    bench=True,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation × order year for 'red' parts.

    Scale: part (LIKE-filtered before the join), supplier, and nation
    broadcast; lineitem⋈orders is the one fact shuffle. The amount
    expression is identical character-for-character in both engines —
    double multiply/subtract is IEEE-exact, so only the SUM needs the
    decimal path.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_Q10_SQL = f"""
    SELECT c_custkey, c_name,
           {DSUM("l_extendedprice * (1 - l_discount)")} AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@query(
    "q10_returned_items",
    oracle=_Q10_SQL,
    covers="§2.B selective fact filter + top-k customer rollup (TPC-H "
    "Q10 shape)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue lost to returned items in one year.

    Scale: returnflag + date filters push to the parquet scans before
    the orderkey shuffle; customer/nation broadcast; the top-k plans
    as TakeOrderedAndProject over the per-customer aggregate.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_Q14_SQL = f"""
    SELECT {ROUND6('''
             100.00 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                        THEN CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(38,6))
                        ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE)''')} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-12-01 00:00:00'
"""


@query(
    "q14_promo_revenue",
    oracle=_Q14_SQL,
    covers="§2.B conditional-aggregate ratio (TPC-H Q14 shape)",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from promotional parts in one quarter.

    Scale: the date filter pushes to the lineitem scan; part broadcasts;
    the whole query reduces map-side to two decimal partials. Both CASE
    branches are DECIMAL(38,6) so the conditional sum stays exact, and
    the final ratio is one double division, rounded at 6dp in integer
    micro-space (round6 — ROUND of a quotient is cross-engine unsafe).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-12-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    zero = F.lit(0).cast("decimal(38,6)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev.cast("decimal(38,6)")).otherwise(
        zero
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            round6(
                F.lit(100.00)
                * F.sum(promo).cast("double")
                / F.sum(rev.cast("decimal(38,6)")).cast("double")
            ).alias("promo_revenue")
        )
    )


_Q16_SQL = """
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
"""


@query(
    "q16_supplier_cnt",
    oracle=_Q16_SQL,
    covers="§2.B DISTINCT-projected bridge + NOT IN anti-join + "
    "COUNT(DISTINCT) rollup (TPC-H Q16 shape; bridge = distinct "
    "lineitem projection — no partsupp in schema)",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier variety per (brand, type, size) excluding flagged
    suppliers.

    Scale: the bridge is a two-column distinct (map-side combine on
    fixed-width keys); the exclusion list (complaint suppliers) is a
    broadcast anti-join; part is IN/LIKE-filtered before its broadcast
    join; COUNT(DISTINCT) expands to the standard two-phase plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    bridge = li.select("l_partkey", "l_suppkey").distinct()
    return (
        bridge.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(50)
    )


_Q18_QTY = 250

_Q18_SQL = f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {DSUM("l_quantity")} AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING {DSUM("l_quantity")} > {_Q18_QTY}
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
"""


@query(
    "q18_large_orders",
    oracle=_Q18_SQL,
    covers="§2.B IN subquery over a HAVING aggregate → semi join "
    "(TPC-H Q18 shape)",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with very large orders (total quantity > 250).

    Scale: the HAVING subquery aggregates lineitem on the same
    orderkey the outer join shuffles on, so the semi join reuses the
    partitioning; qualifying orders are rare → the semi-join list is
    small. l_quantity is DOUBLE in this schema, so both the HAVING
    threshold and the output total go through the decimal path to be
    partial-order-exact.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("tq"))
        .filter(F.col("tq") > _Q18_QTY)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"),
                F.col("l_orderkey") == F.col("bk"), "left_semi")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


_Q21_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""


@query(
    "q21_last_shipper",
    oracle=_Q21_SQL,
    covers="§2.B dual correlated EXISTS + NOT EXISTS on one fact "
    "(TPC-H Q21 shape; lateness = latest ship date in a "
    "multi-supplier order — no receipt/commit dates in schema)",
)
def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the last to ship in multi-supplier finished
    orders — the Q21 "kept everyone waiting" shape on this schema.

    Scale: both correlated subqueries decorrelate to joins on
    l_orderkey — the same key the outer fact join shuffles on, so one
    partitioning serves all three; the NOT EXISTS becomes a left-anti
    join, no per-row subquery execution anywhere.
    """
    from spark_sql_server_spark.session import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(_Q21_SQL)


_Q13_SQL = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@query(
    "q13_customer_distribution",
    oracle=_Q13_SQL,
    covers="§2.B outer join with join-condition filter + two-level "
    "count distribution (TPC-H Q13 shape; priority filter — no "
    "o_comment in schema)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by their count of non-urgent orders —
    including the zero-order bucket the outer join exists to preserve.

    Scale: the priority predicate filters the orders side BEFORE the
    outer join (equivalent to the ON-clause filter — never after, which
    would drop the NULL-extended rows); one shuffle on custkey, then a
    tiny count-of-counts rollup that collapses map-side.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


#: Q17's "small-quantity" cutoff: fraction of the part's mean quantity.
_Q17_FRACTION = 0.2

_Q17_SQL = f"""
    SELECT {ROUND6(DSUM("l_extendedprice") + " / 7.0")} AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_size < 15
      AND l_quantity < (
        SELECT {_Q17_FRACTION} *
               CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
"""


@query(
    "q17_small_qty_revenue",
    oracle=_Q17_SQL,
    covers="§2.B correlated per-key AVG subquery on the fact table "
    "(TPC-H Q17 shape; p_size stands in for p_container)",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from orders of a part below a fifth of that part's mean
    order quantity — the classic correlated-aggregate-on-the-fact shape.

    Scale: the correlated AVG decorrelates to one per-part aggregate of
    lineitem (same l_partkey key space as the probe side) whose result
    is part-sized — broadcast back into the fact. The brand/size filter
    broadcasts `part` and prunes the fact rows before the threshold
    join. The mean goes through the decimal path (exact sum / count)
    so the cutoff is partial-order-exact across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15)
    )
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (
            F.lit(_Q17_FRACTION)
            * F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
            / F.count("*")
        ).alias("qty_cutoff")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(per_part), F.col("ap_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(
            round6(dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly")
        )
    )


#: Q20's "dominant supplier" cutoff: fraction of the part's total
#: shipped quantity one supplier must exceed.
_Q20_FRACTION = 0.15

_Q20_SQL = f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, {DSUM("l_quantity")} AS qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    pt AS (
      SELECT l_partkey, {DSUM("l_quantity")} AS tq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT ps.l_suppkey
      FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
      WHERE ps.l_partkey IN (SELECT p_partkey FROM part
                             WHERE p_name LIKE 'small%')
        AND ps.qty > {_Q20_FRACTION} * pt.tq
    )
    ORDER BY s_name
"""


@query(
    "q20_excess_suppliers",
    oracle=_Q20_SQL,
    covers="§2.B nested IN over aggregates (TPC-H Q20 shape; dominance "
    "over the part's shipped total stands in for partsupp availqty)",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping more than 15% of some 'small' part's total
    quantity — Q20's nested-IN-over-aggregate shape without partsupp.

    Scale: both aggregates shuffle lineitem on l_partkey(+l_suppkey),
    so the qualifying join is co-partitioned; the LIKE-filtered part
    key list broadcasts as a semi join BEFORE the per-part totals join
    prunes the aggregate; the final supplier probe is a broadcast semi
    join against the (tiny) qualifying-supplier list. Quantity sums
    take the decimal path in one level on both engines — the 15%
    comparison is bit-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    small_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        dsum(F.col("l_quantity")).alias("qty")
    )
    pt = li.groupBy(F.col("l_partkey").alias("pt_key")).agg(
        dsum(F.col("l_quantity")).alias("tq")
    )
    qualifying = (
        ps.join(
            F.broadcast(small_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(F.broadcast(pt), F.col("pt_key") == F.col("l_partkey"))
        .filter(F.col("qty") > F.lit(_Q20_FRACTION) * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(qualifying),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


#: Q22's "country code" buckets — last two digits of the customer name
#: (the schema has no c_phone; right(c_name, 2) is uniform over '00'-'99').
_Q22_CODES = ("01", "12", "23", "34", "45", "56", "67")

_Q22_SQL = f"""
    WITH eligible AS (
      SELECT right(c_name, 2) AS cntrycode, c_custkey, c_acctbal
      FROM customer
      WHERE right(c_name, 2) IN {_Q22_CODES!r}
    )
    SELECT cntrycode, COUNT(*) AS numcust, {DSUM("c_acctbal")} AS totacctbal
    FROM eligible e
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
        FROM eligible WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = e.c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
"""


@query(
    "q22_global_sales_opp",
    oracle=_Q22_SQL,
    covers="§2.B anti join + substring bucketing + uncorrelated scalar "
    "AVG subquery (TPC-H Q22 shape; 'no urgent order' stands in for "
    "'never ordered' — every customer in the test data has orders)",
)
def q22_global_sales_opp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers in selected name buckets who
    never placed an urgent order, rolled up by bucket.

    Scale: the scalar mean is a one-row aggregate broadcast via cross
    join (never a driver round-trip); the urgent-order exclusion is a
    left-anti join against a priority-filtered projection of orders
    (filter pushed to the scan); the bucket rollup has ≤ |codes|
    groups. The mean takes the decimal path so the cutoff is exact.
    """
    cust = load_table(spark, sf_dir, "customer")
    eligible = cust.select(
        F.expr("right(c_name, 2)").alias("cntrycode"), "c_custkey", "c_acctbal"
    ).filter(F.col("cntrycode").isin(*_Q22_CODES))
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    urgent_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent_cust, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


_Q8_SQL = f"""
    SELECT o_year,
           {ROUND6(DSUM("CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END")
                   + " / " + DSUM("volume"))} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""


@query(
    "q8_market_share",
    oracle=_Q8_SQL,
    covers="§2.B conditional share-of-total over an 8-table snowflake "
    "(TPC-H Q8 shape)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_1's share of ECONOMY-part revenue into ASIA, by year.

    Scale: all five dims broadcast (part type-filtered before its
    join); the only shuffles are lineitem⋈orders and ⋈customer on
    their keys. Numerator and denominator both take the decimal path
    inside ONE aggregation pass — the share is a single double
    division, rounded at 6dp.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_volume = F.when(F.col("nation") == "NATION_1", volume).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            nation_volume.alias("nation_volume"),
        )
        .groupBy("o_year")
        .agg(
            round6(
                dsum(F.col("nation_volume")) / dsum(F.col("volume"))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


#: Q11's "important part" threshold: multiple of the average per-part
#: share of the nation's total shipped value (self-scaling — the classic
#: query's FRACTION is hand-scaled per SF instead).
_Q11_MULTIPLE = 3.0

_Q11_SQL = f"""
    SELECT l_partkey, {DSUM("l_extendedprice")} AS value
    FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
    GROUP BY l_partkey
    HAVING {DSUM("l_extendedprice")} > (
      SELECT ({_Q11_MULTIPLE} / (SELECT COUNT(*) FROM part))
             * {DSUM("l_extendedprice")}
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_1'
    )
    ORDER BY value DESC, l_partkey
"""


@query(
    "q11_important_parts",
    oracle=_Q11_SQL,
    covers="§2.B HAVING vs uncorrelated scalar share-of-total subquery "
    "(TPC-H Q11 shape; lineitem value stands in for partsupp stock)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value from NATION_1 suppliers exceeds 3× the
    average per-part share of that nation's total.

    Scale: supplier⋈nation broadcasts into lineitem as a semi-filter;
    the per-part aggregate is the one shuffle; the global total is a
    one-row decimal aggregate broadcast via cross join (never a driver
    round-trip); the part count comes from the part table's footer
    statistics. Both sums take the single-level decimal path, so the
    HAVING cutoff is bit-exact across engines.

    r12: the cutoff and the per-part values both consumed the
    semi-joined fact frame, re-running the pass twice; the fact now
    aggregates ONCE into a checkpointed per-part decimal frame and the
    cutoff is the (exact, associative) sum of those partials — the
    identical decimal, hence the identical double.
    """
    li = load_table(spark, sf_dir, "lineitem")
    nation_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_1"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    nat_li = li.join(
        F.broadcast(nation_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    n_parts = load_table(spark, sf_dir, "part").count()
    # r12: the global total and the per-part aggregate both consumed
    # nat_li — the semi-joined fact pass ran TWICE. Exact decimal sums
    # are associative, so the total is the sum of the per-part decimal
    # partials: aggregate once (O(|parts|) rows, checkpointed), derive
    # the cutoff from the partials, and filter the same rows.
    per_part = (
        nat_li.groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("vdec"))
        .localCheckpoint()
    )
    total = per_part.agg(
        (F.lit(_Q11_MULTIPLE / n_parts) * F.sum("vdec").cast("double")).alias(
            "cutoff"
        )
    )
    return (
        per_part.select(
            "l_partkey", F.col("vdec").cast("double").alias("value")
        )
        .crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("cutoff"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


_Q12_HIGH = ("1-URGENT", "2-HIGH")

_Q12_SQL = f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN {_Q12_HIGH!r}
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN {_Q12_HIGH!r}
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@query(
    "q12_priority_lines",
    oracle=_Q12_SQL,
    covers="§2.B conditional two-way counts per category (TPC-H Q12 "
    "shape; returnflag/orderpriority stand in for shipmode/commitdate)",
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High- vs low-priority line counts per return flag for one ship
    year — Q12's CASE-count pivot shape on this schema.

    Scale: the date filter pushes to the lineitem scan; one orderkey
    shuffle join; the conditional counts are integer sums that collapse
    map-side to ≤ |flags| rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin(*_Q12_HIGH)
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q19_SQL = f"""
    SELECT {DSUM("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
           AND l_quantity >= 5 AND l_quantity <= 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
           AND l_quantity >= 10 AND l_quantity <= 60)
"""


@query(
    "q19_bracket_revenue",
    oracle=_Q19_SQL,
    covers="§2.B disjunction of conjunctive cross-table predicate "
    "brackets (TPC-H Q19 shape; p_size stands in for container/shipmode)",
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three OR'd brand/size/quantity brackets — the
    classic disjunctive-predicate join Catalyst must NOT turn into a
    cartesian.

    Scale: the join key (p_partkey = l_partkey) stays extractable from
    the OR brackets, so part broadcasts as a hash join and the bracket
    disjunction evaluates post-join; the brand IN-superset is pushed to
    the part scan. One-row decimal aggregate output.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    q = F.col("l_quantity")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & (q >= 1) & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 20)
            & (q >= 5) & (q <= 40)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 40)
            & (q >= 10) & (q <= 60)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(bracket)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


_BUCKETED_SQL = f"""
    SELECT o_orderpriority, l_returnflag,
           COUNT(*) AS n_lines,
           {DSUM("l_extendedprice")} AS total_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority, l_returnflag
    ORDER BY o_orderpriority, l_returnflag
"""


def _bucketed_join_build(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[str], list[str]]:
    """Write both bucketed tables and return (lazy joined DF, table
    names, temp dirs). The caller owns cleanup — used directly by the
    plan-gate test, which must see the SortMergeJoin plan before the
    registered operator checkpoints it away."""
    import tempfile
    import uuid

    from spark_sql_server_spark.sources.layout import write_bucketed

    suffix = uuid.uuid4().hex[:8]
    ot, lt = f"orders_bkt_{suffix}", f"lineitem_bkt_{suffix}"
    od = tempfile.mkdtemp(prefix="bkt-orders-")
    ld = tempfile.mkdtemp(prefix="bkt-lineitem-")
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        ot,
        ["o_orderkey"],
        8,
        ["o_orderkey"],
        path=od,
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_extendedprice"
        ),
        lt,
        ["l_orderkey"],
        8,
        ["l_orderkey"],
        path=ld,
    )
    joined = (
        spark.table(ot)
        .hint("merge")  # pin SortMergeJoin so the bucket layout, not a
        # small-table broadcast, is what elides the exchanges
        .join(spark.table(lt), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice")).alias("total_price"),
        )
        .orderBy("o_orderpriority", "l_returnflag")
    )
    return joined, [ot, lt], [od, ld]


@query(
    "q_bucketed_join",
    oracle=_BUCKETED_SQL,
    covers="§2.B bucketed co-located fact-fact join: both sides written "
    "bucketBy(orderkey), SortMergeJoin with zero join-side exchanges "
    "(pay one shuffle at write time, join shuffle-free forever after)",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join over bucketed tables — the layout lever that
    removes the recurring-join shuffle at 100 TB.

    Both fact tables are written ``bucketBy(8, orderkey)`` + sorted
    (external location — the session warehouse belongs to the driver),
    then joined with a merge hint: the planner sees matching bucket
    specs and elides BOTH join-side exchanges (gated in
    tests/test_plans.py against the pre-checkpoint plan; the only
    exchange left is the final rollup's). The answer must equal the
    plain unbucketed join — layout never changes semantics.

    Resource lifecycle: the tiny grouped result is materialized eagerly
    (localCheckpoint — blocks reclaimed by the ContextCleaner), then
    the metastore tables and temp dirs are dropped in ``finally`` so a
    long-running server doesn't accrete one table pair + two projection
    dirs per invocation.
    """
    import shutil

    joined, tables, dirs = _bucketed_join_build(spark, sf_dir)
    try:
        # eager: the SortMergeJoin runs NOW, against the bucketed
        # layout; the returned DF reads the materialized blocks
        return joined.localCheckpoint()
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)


_SALTED_SQL = f"""
    SELECT p_brand,
           COUNT(*) AS n_lines,
           {DSUM("l_extendedprice")} AS total_price
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY p_brand
    ORDER BY p_brand
"""


@query(
    "q_salted_join",
    oracle=_SALTED_SQL,
    covers="§2.B skew-salted equi-join: hot keys spread over salt "
    "buckets, result provably identical to the plain join",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join executed through the salting rewrite — the skew
    lever for keys too hot even for AQE's skew splitting.

    The big side gets a uniform salt, the small side replicates once
    per salt value, and the join key becomes (key, salt) so one hot
    key's rows land on `salt_buckets` reducers instead of melting one.
    A merge hint pins the shuffle join (salting is pointless under a
    broadcast — that is already skew-immune). Salting redistributes
    rows but never changes matches: the oracle is the plain join.
    """
    from spark_sql_server_spark.sources.layout import salted_join

    big = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_extendedprice"
    )
    small = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        salted_join(big, small.hint("merge"), "p_partkey", salt_buckets=8)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice")).alias("total_price"),
        )
        .orderBy("p_brand")
    )


_Q6_SQL = f"""
    SELECT {DSUM("l_extendedprice * l_discount")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query(
    "q6_forecast_revenue",
    oracle=_Q6_SQL,
    covers="§2.B pure scan-filter-aggregate, every predicate at the scan "
    "(TPC-H Q6 shape)",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue change from hypothetically eliminating small discounts —
    the canonical scan-bound query: no join, every predicate pushable.

    Scale: all three filters reach the parquet scan (plan-gated), the
    aggregate collapses map-side to one decimal partial per partition,
    and the exchange moves |partitions| rows. The fastest thing an
    engine can do with 100 TB — the gate proves nothing blocks the
    pushdown.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
        )
    )
