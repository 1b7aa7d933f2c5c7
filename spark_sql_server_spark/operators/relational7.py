"""TPC-DS-shaped plan families, wave 10 (r8): the three-fact and
inventory families plus the star-report quick wins the r7 verdict
ordered.

The reference validates 103 TPC-DS queries
(``examples/tpcds/src/main/scala/.../TPCDSQueryBenchmark.scala:215-227``);
this wave closes eleven more q-numbers:

* q25/q29 shape (``examples/tpcds/src/main/resources/tpcds/queries/
  q25.sql``, ``q29.sql``) — the same fact participates three times
  (sale → later return → re-purchase) chained through two equi joins,
  then profits (q25) / quantities (q29) aggregate per (item, store).
  The qds17 lesson applies: the third leg's equi key anchors on the
  RETURN leg's customer key (transitively equal, but DuckDB picks a
  pathological join order when anchored on the sale leg).
* q37/q82 shape (``q37.sql``, ``q82.sql``) — an item screen (price
  band + discrete attribute set) joined to an inventory date-window /
  quantity-band scan, existence-joined against a second sales channel,
  deduped by GROUP BY. The Spark plan uses a genuine LEFT SEMI join
  for the existence leg (no row explosion); the oracle keeps the
  faithful join-then-GROUP-BY spelling.
* q24 shape (``q24.sql``) — a fine-grained "ssales" aggregate consumed
  TWICE: once re-aggregated under an attribute filter, once whole-CTE
  as the 5%-of-average HAVING threshold. This is the CTE-referenced-
  twice inline trap (qds70/qds64 class): the Spark side
  ``localCheckpoint``-s the aggregate so the 5-relation star runs
  ONCE; the scalar threshold is a bounded one-row driver collect
  mirroring the oracle's IEEE op order exactly.
* q42/q52/q55 shape (``q42.sql``, ``q52.sql``, ``q55.sql``) — the
  single-star report family: fact × date screen × item screen, one
  hash aggregate, a ranked head. All three plan as two broadcast joins
  into TakeOrderedAndProject (distributed top-K, never a global sort).
* q96 (``q96.sql``) — a pure selectivity count: fact × three broadcast
  dimension screens → one COUNT(*).
* q56/q60 shape (``q56.sql``, ``q60.sql``) — three per-channel legs
  over an IN-subquery item filter UNION ALL'd and re-aggregated. The
  channel legs partition the fact by order priority, so the Spark plan
  folds them into ONE aggregation (the qds77/qds58 one-pass pattern —
  decimal sums are associative, the re-agg of disjoint legs IS the
  single GROUP BY); the oracle keeps the faithful three-CTE spelling.

Adapted to the test schema: order priorities stand in for TPC-DS
channels, supplier for the store dimension, ``l_returnflag = 'R'``
lines for the returns tables, ``l_shipdate``/``l_quantity`` for the
inventory date/on-hand columns, ``p_retailprice`` bands inside the
data's 900–920 envelope (sf0.001 tops out at 919.9 — the qds72
lesson), and ``Brand#N`` spellings exactly as generated.

Determinism: money/quantity sums stay DECIMAL(38,6) until one final
DOUBLE cast; the q24 threshold is one IEEE division + one multiply of
exact values, mirrored operation-for-operation on the driver; every
LIMIT has a unique ORDER BY tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table, register_tables

# --------------------------------------------------------------------------
# q25/q29 shape: sale → later return → re-purchase, three instances of
# the same fact chained on (customer, part).
# --------------------------------------------------------------------------

_QDS25_SQL = """
    WITH s AS (
      SELECT o_custkey AS ck, l_partkey AS pk, l_suppkey AS sk,
             l_extendedprice * (1 - l_discount) AS profit
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'N' AND EXTRACT(YEAR FROM o_orderdate) = 1996
    ),
    r AS (
      SELECT o_custkey AS ck, l_partkey AS pk, l_extendedprice AS loss
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
    ),
    c AS (
      SELECT o_custkey AS ck, l_partkey AS pk,
             l_extendedprice * (1 - l_discount) AS profit
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'N'
        AND EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997, 1998)
    )
    SELECT p_name, p_brand, s_name AS store_name,
           COUNT(*) AS n_chains,
           CAST(SUM(CAST(s.profit AS DECIMAL(38,6))) AS DOUBLE)
             AS store_sales_profit,
           CAST(SUM(CAST(r.loss AS DECIMAL(38,6))) AS DOUBLE)
             AS store_returns_loss,
           CAST(SUM(CAST(c.profit AS DECIMAL(38,6))) AS DOUBLE)
             AS catalog_sales_profit
    FROM s
    JOIN r ON s.ck = r.ck AND s.pk = r.pk
    JOIN c ON r.ck = c.ck AND r.pk = c.pk
    JOIN part ON s.pk = p_partkey
    JOIN supplier ON s.sk = s_suppkey
    GROUP BY p_name, p_brand, s_name
    ORDER BY p_name, p_brand, s_name
    LIMIT 100
"""


@query(
    "qds25_profit_chain",
    oracle=_QDS25_SQL,
    covers="§2.B TPC-DS q25 shape: sale → later return → re-purchase "
    "three-fact chain, net-profit/loss aggregates per (item, store)",
)
def qds25_profit_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q25's topology: the fact participates three times — the 1996
    sale, a 1996–97 return by the same (customer, part), and any
    1996–98 re-purchase — and the chain's profits, return losses, and
    re-purchase profits aggregate per (item, store).

    Scale: the three legs shuffle on (custkey, partkey) — fixed-width
    integer keys; year screens prune each leg's scan; part and
    supplier broadcast onto the tiny chain set. The third leg anchors
    its equi key on the RETURN leg (r.ck = c.ck) — transitively equal
    to s.ck, but the anchor choice fixes DuckDB's join order (the
    qds17 280s→2.4s lesson). No cartesian/BNLJ anywhere (plan-gated).
    Exact decimal sums; the group keys are a total order.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS25_SQL)


_QDS29_SQL = """
    WITH s AS (
      SELECT o_custkey AS ck, l_partkey AS pk, l_suppkey AS sk,
             l_quantity AS q
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'N' AND EXTRACT(YEAR FROM o_orderdate) = 1995
    ),
    r AS (
      SELECT o_custkey AS ck, l_partkey AS pk, l_quantity AS q
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)
    ),
    c AS (
      SELECT o_custkey AS ck, l_partkey AS pk, l_quantity AS q
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'N'
        AND EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996, 1997)
    )
    SELECT p_name, p_brand, s_name AS store_name,
           CAST(SUM(CAST(s.q AS DECIMAL(38,6))) AS DOUBLE)
             AS store_sales_quantity,
           CAST(SUM(CAST(r.q AS DECIMAL(38,6))) AS DOUBLE)
             AS store_returns_quantity,
           CAST(SUM(CAST(c.q AS DECIMAL(38,6))) AS DOUBLE)
             AS catalog_sales_quantity
    FROM s
    JOIN r ON s.ck = r.ck AND s.pk = r.pk
    JOIN c ON r.ck = c.ck AND r.pk = c.pk
    JOIN part ON s.pk = p_partkey
    JOIN supplier ON s.sk = s_suppkey
    GROUP BY p_name, p_brand, s_name
    ORDER BY p_name, p_brand, s_name
    LIMIT 100
"""


@query(
    "qds29_quantity_chain",
    oracle=_QDS29_SQL,
    covers="§2.B TPC-DS q29 shape: sale → return → re-purchase chain "
    "with quantity flows and a widened re-purchase year window",
)
def qds29_quantity_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q29's variant of the three-fact chain: quantity flows instead of
    money, with the re-purchase leg's year window widened to three
    years (the original's ``d3.d_year IN (y, y+1, y+2)``).

    Scale: identical join topology to qds25 — (custkey, partkey)
    shuffles, year-pruned scans, broadcast dimensions, return-leg
    anchor for the third join. Quantities are small integers summed as
    exact decimals.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS29_SQL)


# --------------------------------------------------------------------------
# q37/q82 shape: item screen × inventory date/quantity window,
# existence-joined to a second sales channel, deduped by GROUP BY.
# --------------------------------------------------------------------------

_QDS37_ORACLE = """
    SELECT p_name, p_brand, p_retailprice
    FROM part
    JOIN lineitem inv ON inv.l_partkey = p_partkey
    JOIN (SELECT l_partkey AS sale_pk
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) sales
      ON sales.sale_pk = p_partkey
    WHERE p_retailprice BETWEEN 905 AND 915
      AND p_size IN (5, 10, 15, 20)
      AND inv.l_shipdate BETWEEN TIMESTAMP '1996-02-01 00:00:00'
                             AND TIMESTAMP '1996-04-01 00:00:00'
      AND inv.l_quantity BETWEEN 10 AND 40
    GROUP BY p_name, p_brand, p_retailprice
    ORDER BY p_name, p_brand
    LIMIT 100
"""


def _inventory_screen(
    spark: SparkSession,
    sf_dir: str,
    price_lo: float,
    price_hi: float,
    sizes: tuple[int, ...],
    ship_lo: str,
    ship_hi: str,
    qty_lo: int,
    qty_hi: int,
    sale_priorities: tuple[str, ...],
) -> DataFrame:
    """Shared q37/q82 plan: screened item dim broadcast onto the
    inventory-window fact scan, LEFT SEMI against the sales channel
    (the faithful equi join + GROUP BY dedup, without the row
    explosion), one hash aggregate for the dedup, distributed top-K."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_retailprice").between(price_lo, price_hi)
        & F.col("p_size").isin(*sizes)
    )
    inv = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit(ship_lo).cast("timestamp"), F.lit(ship_hi).cast("timestamp")
        )
        & F.col("l_quantity").between(qty_lo, qty_hi)
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(*sale_priorities)
    )
    sales = (
        load_table(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("l_partkey").alias("sale_pk"))
    )
    return (
        F.broadcast(part)
        .join(inv, F.col("l_partkey") == F.col("p_partkey"))
        .join(sales, F.col("sale_pk") == F.col("p_partkey"), "left_semi")
        .select("p_name", "p_brand", "p_retailprice")
        .distinct()
        .orderBy("p_name", "p_brand")
        .limit(100)
    )


@query(
    "qds37_inventory_window",
    oracle=_QDS37_ORACLE,
    covers="§2.B TPC-DS q37 shape: item price-band/attribute screen × "
    "inventory date+quantity window, existence join to catalog sales",
)
def qds37_inventory_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q37's topology: which screened items (price band 905–915, four
    discrete sizes) had 10–40 units moving in a 60-day ship window AND
    appear in the urgent-priority sales channel.

    Scale: the screened item dim (~2% of part) broadcasts onto the
    date-pruned inventory scan; the sales channel is a LEFT SEMI join
    (existence only — the reference's equi join + GROUP BY dedup
    without materializing the duplicate rows); the dedup aggregate
    carries three narrow columns. Filters all reach the scans
    (plan-gated). The price band sits inside the data's 900–920
    envelope so every SF selects rows (the qds72 lesson).
    """
    return _inventory_screen(
        spark, sf_dir,
        905, 915, (5, 10, 15, 20),
        "1996-02-01 00:00:00", "1996-04-01 00:00:00",
        10, 40, ("1-URGENT", "2-HIGH"),
    )


_QDS82_ORACLE = """
    SELECT p_name, p_brand, p_retailprice
    FROM part
    JOIN lineitem inv ON inv.l_partkey = p_partkey
    JOIN (SELECT l_partkey AS sale_pk
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')) sales
      ON sales.sale_pk = p_partkey
    WHERE p_retailprice BETWEEN 908 AND 918
      AND p_size IN (7, 14, 21, 28)
      AND inv.l_shipdate BETWEEN TIMESTAMP '1997-05-25 00:00:00'
                             AND TIMESTAMP '1997-07-24 00:00:00'
      AND inv.l_quantity BETWEEN 5 AND 35
    GROUP BY p_name, p_brand, p_retailprice
    ORDER BY p_name, p_brand
    LIMIT 100
"""


@query(
    "qds82_inventory_store_window",
    oracle=_QDS82_ORACLE,
    covers="§2.B TPC-DS q82 shape: the q37 inventory screen against "
    "the store channel with shifted bands and window",
)
def qds82_inventory_store_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q82 — the q37 family against the store channel: shifted price
    band (908–918), different size set, a 1997 ship window, a wider
    quantity band, and the low-priority order channel as the existence
    leg. Same broadcast-dim + semi-join + dedup-aggregate plan as
    qds37 (shared builder, plan-gated).
    """
    return _inventory_screen(
        spark, sf_dir,
        908, 918, (7, 14, 21, 28),
        "1997-05-25 00:00:00", "1997-07-24 00:00:00",
        5, 35, ("4-NOT SPECIFIED", "5-LOW"),
    )


# --------------------------------------------------------------------------
# q24 shape: fine-grained ssales aggregate consumed twice — attribute-
# filtered re-aggregation HAVING > 5% of the whole-CTE average.
# --------------------------------------------------------------------------

_QDS24_SQL = """
    WITH ssales AS (
      SELECT c_name, s_name, p_brand, p_type, p_size,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
               AS netpaid
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part ON l_partkey = p_partkey
      WHERE l_returnflag = 'R'
      GROUP BY c_name, s_name, p_brand, p_type, p_size
    )
    SELECT c_name, s_name,
           CAST(SUM(netpaid) AS DOUBLE) AS paid
    FROM ssales
    WHERE p_type = 'PROMO'
    GROUP BY c_name, s_name
    HAVING CAST(SUM(netpaid) AS DOUBLE) >
           (SELECT 0.05 * (CAST(SUM(netpaid) AS DOUBLE) / COUNT(*))
            FROM ssales)
    ORDER BY c_name, s_name
"""


@query(
    "qds24_netpaid_threshold",
    oracle=_QDS24_SQL,
    covers="§2.B TPC-DS q24 shape: fine-grained returns aggregate "
    "consumed twice — filtered re-aggregation HAVING > 5% of the "
    "whole-CTE average (CTE-reuse checkpoint)",
)
def qds24_netpaid_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q24's topology: a five-relation star aggregates returned-line
    net-paid at (customer, store, brand, type, size) grain; that CTE
    is consumed TWICE — re-aggregated per (customer, store) under the
    item-attribute filter, and whole as the 5%-of-average HAVING
    threshold.

    Scale: this is the CTE-referenced-twice inline trap (qds70/qds64
    class) — a shared-SQL spelling re-runs the whole star per
    consumer, so the Spark side ``localCheckpoint``-s the ssales
    aggregate once (plan gate: ExistingRDD, zero parquet scans). The
    threshold is a one-row driver collect off the checkpoint (bounded
    artifact), computed as ``0.05 * (sum_double / count)`` — the
    identical IEEE op sequence DuckDB evaluates, so the strict ``>``
    splits both engines the same way. The netpaid sums are exact
    decimals cast to DOUBLE once per consumer.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    net = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    ssales = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("c_name", "s_name", "p_brand", "p_type", "p_size")
        .agg(F.sum(net).alias("netpaid"))
        .localCheckpoint()
    )
    srow = ssales.agg(
        F.sum("netpaid").cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    threshold = 0.05 * (srow["s"] / srow["n"])
    return (
        ssales.filter(F.col("p_type") == "PROMO")
        .groupBy("c_name", "s_name")
        .agg(F.sum("netpaid").cast("double").alias("paid"))
        .filter(F.col("paid") > F.lit(threshold))
        .orderBy("c_name", "s_name")
    )


# --------------------------------------------------------------------------
# q42/q52/q55 shape: single-star GROUP BY reports with ranked heads.
# --------------------------------------------------------------------------

_QDS42_SQL = """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year,
           p_type,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             AS ext_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(YEAR FROM o_orderdate) = 2000
      AND EXTRACT(MONTH FROM o_orderdate) = 11
      AND p_size BETWEEN 1 AND 5
    GROUP BY 1, 2
    ORDER BY ext_price DESC, d_year, p_type
    LIMIT 100
"""


@query(
    "qds42_category_report",
    oracle=_QDS42_SQL,
    covers="§2.B TPC-DS q42 shape: single-star monthly category report "
    "ordered by revenue head",
)
def qds42_category_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q42: November-2000 revenue per item category (p_type stands in)
    under a manager screen (p_size band), revenue-descending head.

    Scale: the date screen prunes the orders scan, the item screen
    broadcasts, one hash aggregate over ≤6 categories, and the ranked
    LIMIT plans as TakeOrderedAndProject (plan-gated) — never a global
    single-partition sort. Exact decimal sum → one DOUBLE cast;
    (d_year, p_type) tiebreaks make the DESC head a total order.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS42_SQL)


_QDS52_SQL = """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year,
           p_brand,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             AS ext_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(YEAR FROM o_orderdate) = 2000
      AND EXTRACT(MONTH FROM o_orderdate) = 11
      AND p_size BETWEEN 1 AND 5
    GROUP BY 1, 2
    ORDER BY d_year, ext_price DESC, p_brand
    LIMIT 100
"""


@query(
    "qds52_brand_report",
    oracle=_QDS52_SQL,
    covers="§2.B TPC-DS q52 shape: single-star monthly brand report, "
    "year-then-revenue sort",
)
def qds52_brand_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q52 — the q42 star at brand grain with the original's different
    sort (year first, then revenue descending, brand tiebreak). Same
    broadcast-star + TakeOrderedAndProject plan.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS52_SQL)


_QDS55_SQL = """
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             AS ext_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1999
      AND EXTRACT(MONTH FROM o_orderdate) = 11
      AND p_size BETWEEN 26 AND 30
    GROUP BY 1
    ORDER BY ext_price DESC, p_brand
    LIMIT 100
"""


@query(
    "qds55_manager_brand_head",
    oracle=_QDS55_SQL,
    covers="§2.B TPC-DS q55 shape: brand-only revenue head under a "
    "different manager screen",
)
def qds55_manager_brand_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q55 — brand-only revenue head for November-1999 under a
    different manager screen (p_size 26–30), no year column in the
    output. Same single-star plan as q42/q52.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS55_SQL)


_QDS96_SQL = """
    SELECT COUNT(*) AS cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE EXTRACT(DAY FROM l_shipdate) >= 15
      AND c_mktsegment = 'BUILDING'
      AND s_nationkey <= 5
"""


@query(
    "qds96_selectivity_count",
    oracle=_QDS96_SQL,
    covers="§2.B TPC-DS q96 shape: pure selectivity COUNT(*) across "
    "three broadcast dimension screens",
)
def qds96_selectivity_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q96: how many fact lines pass a time-dimension screen (ship-day
    ≥ 15 stands in for the 8:30pm half-hour), a demographics screen
    (market segment), and a store screen (supplier nation band) — one
    COUNT(*), no grouping.

    Scale: the fact never widens — each dimension is a broadcast hash
    join feeding a single count aggregate; the plan is
    partial-count → one exchange → final count. Exact integer count.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS96_SQL)


# --------------------------------------------------------------------------
# q56/q60 shape: three channel legs over an IN-subquery item filter,
# UNION ALL, re-aggregated. The legs partition the fact by priority, so
# the one-pass CASE-split re-expression is a single GROUP BY.
# --------------------------------------------------------------------------

_CHANNEL_LEG = """
      SELECT p_name,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
               AS total_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_name IN ({item_filter})
        AND EXTRACT(YEAR FROM o_orderdate) = {year}
        AND EXTRACT(MONTH FROM o_orderdate) = {moy}
        AND c_mktsegment = '{segment}'
        AND {pred}
      GROUP BY p_name
"""

_PRIORITY_LEGS = (
    "o_orderpriority = '1-URGENT'",
    "o_orderpriority IN ('2-HIGH', '3-MEDIUM')",
    "o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')",
)


def _channel_union_sql(
    item_filter: str, year: int, moy: int, segment: str, order_by: str
) -> str:
    legs = ",\n    ".join(
        f"leg{i + 1} AS ({_CHANNEL_LEG.format(item_filter=item_filter, year=year, moy=moy, segment=segment, pred=pred)})"
        for i, pred in enumerate(_PRIORITY_LEGS)
    )
    return f"""
    WITH {legs}
    SELECT p_name,
           CAST(SUM(CAST(total_dec AS DECIMAL(38,6))) AS DOUBLE)
             AS total_sales
    FROM (SELECT * FROM leg1 UNION ALL SELECT * FROM leg2
          UNION ALL SELECT * FROM leg3) u
    GROUP BY p_name
    ORDER BY {order_by}
    LIMIT 100
"""


def _channel_union_onepass(
    spark: SparkSession,
    sf_dir: str,
    item_filter,
    year: int,
    moy: int,
    segment: str,
    order_cols,
) -> DataFrame:
    """One-pass Spark plan for the q56/q60 family: the three priority
    legs partition the fact, decimal sums are associative, so the
    UNION-ALL-then-re-agg IS a single GROUP BY over the union of the
    leg predicates (= no priority filter). The IN subquery over part
    becomes a broadcast LEFT SEMI join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == year) & (F.month("o_orderdate") == moy)
    )
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == segment
    )
    part = load_table(spark, sf_dir, "part")
    wanted = (
        part.filter(item_filter).select("p_name").distinct()
        .withColumnRenamed("p_name", "wanted_name")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(wanted),
            F.col("p_name") == F.col("wanted_name"),
            "left_semi",
        )
        .groupBy("p_name")
        .agg(F.sum(rev).cast("double").alias("total_sales"))
        .orderBy(*order_cols)
        .limit(100)
    )


_QDS56_SQL = _channel_union_sql(
    "SELECT p_name FROM part "
    "WHERE p_brand IN ('Brand#3', 'Brand#7', 'Brand#11')",
    1996, 2, "HOUSEHOLD",
    "total_sales, p_name",
)


@query(
    "qds56_brandset_union",
    oracle=_QDS56_SQL,
    covers="§2.B TPC-DS q56 shape: three channel legs over a brand-set "
    "IN-subquery item filter, UNION ALL re-agg, revenue-ascending head",
)
def qds56_brandset_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q56: February-1996 household-segment sales per item across all
    three priority channels, items restricted to a three-brand set by
    an IN subquery, smallest totals first.

    Scale: the oracle keeps the faithful three-CTE UNION ALL; the
    Spark plan folds the disjoint priority legs into ONE aggregation
    (decimal sums are associative — the re-agg of a partition-by-
    priority union IS the single GROUP BY), so the fact is scanned
    once, the customer/part dims broadcast, and the brand-set IN
    subquery is a broadcast semi join (plan-gated: no Union, ≤1
    lineitem scan). ORDER BY total_sales carries the p_name tiebreak
    (the reference's bare revenue sort is not a total order).
    """
    return _channel_union_onepass(
        spark, sf_dir,
        F.col("p_brand").isin("Brand#3", "Brand#7", "Brand#11"),
        1996, 2, "HOUSEHOLD",
        (F.col("total_sales"), F.col("p_name")),
    )


_QDS60_SQL = _channel_union_sql(
    "SELECT p_name FROM part WHERE p_type = 'STANDARD'",
    1998, 9, "MACHINERY",
    "p_name, total_sales",
)


@query(
    "qds60_category_union",
    oracle=_QDS60_SQL,
    covers="§2.B TPC-DS q60 shape: the channel-union family keyed by a "
    "category item filter, item-ordered",
)
def qds60_category_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q60 — the q56 family with a category item filter (p_type =
    'STANDARD'), a September-1998 machinery-segment window, and the
    original's item-first ordering. Same one-pass fold (plan-gated).
    """
    return _channel_union_onepass(
        spark, sf_dir,
        F.col("p_type") == "STANDARD",
        1998, 9, "MACHINERY",
        (F.col("p_name"), F.col("total_sales")),
    )
