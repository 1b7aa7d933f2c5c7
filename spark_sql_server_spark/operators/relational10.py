"""TPC-DS-shaped plan families, waves 14-15 (r9): the final 17
parameter-sibling promotions — q3, q12, q19, q20, q26, q27, q48, q53,
q57, q62, q68, q71, q73, q79, q86, q92, q94.

Reference queries: ``examples/tpcds/src/main/resources/tpcds/queries/
q{3,12,19,20,26,27,48,53,57,62,68,71,73,79,86,92,94}.sql`` (validated
upstream through ``TPCDSQueryBenchmark.scala:215-227``). COVERAGE.md
r8 mapped each of these to an implemented family as a *parameter
sibling* (same join topology, different fact slice / literals); this
wave promotes every one to its own plan-gated operator so all 99
TPC-DS numbers have a first-class registry entry, each adapted to the
test schema with the structural detail that distinguishes it from its
anchor family:

* q3  — month-screened brand star ORDERED BY the aggregate DESC
  (anchor qds42/52/55 order by dimension keys).
* q12/q20 — per-item revenue share of its class: windowed
  sum-of-sums ratio (``SUM(SUM(x)) OVER (PARTITION BY class)``).
* q19 — brand star with a CROSS-DIMENSION non-equi residual
  (customer geography <> supplier geography; anchor qds42 has none).
* q26/q27 — demographic mean report (4 single-IEEE-division means);
  q27 adds ROLLUP + GROUPING() output.
* q48 — ungrouped quantity sum under TWO stacked OR-of-(dimension
  residual AND fact band) disjunction blocks.
* q53 — quarterly CoV screen |sum-avg|/avg > 0.1, algebraized to the
  exact decimal cross-multiply 10*|sum*cnt - tot| > tot.
* q57 — entity-dim monthly series with LAG/LEAD neighbor outputs AND
  the q53 CoV screen in one window pass (anchor qds47 has no screen).
* q62 — ship-lag day buckets under a TRUNCATING group key
  (substr(s_name,1,17) merges suppliers in tens).
* q68 — per-ticket basket sums re-joined to the customer with a
  bought-geography <> current-geography residual.
* q71 — three-channel UNION ALL joined to a time-of-day dimension
  (the events table is the only source with intraday timestamps).
* q73 — count-band join-back behind a GUARDED-CASE ratio screen
  (vehicle>0 THEN dep/vehicle>1 — cross-multiplied exact).
* q79 — weekday (d_dow) per-ticket profit report (DuckDB dayofweek
  is 0-based vs Spark's 1-based — oracle shifts by one).
* q86 — ROLLUP + GROUPING() arithmetic + RANK within the rollup
  parent (lochierarchy partition keys).
* q92 — excess-discount scalar: per-item 1.3x-avg threshold as the
  exact cross-multiply 10*disc*cnt > 13*tot, single-row output.
* q94 — multi-warehouse-order EXISTS (equi + <> residual on the SAME
  fact) AND no-returns NOT EXISTS, COUNT(DISTINCT) + sums.

Determinism rules as established (registry.py): money sums through
DECIMAL(38,6) (DECIMAL(24,6) where a cross-multiply follows — int128
safe in DuckDB); means/ratios as ONE IEEE division of exact
quantities; threshold predicates never divide; every LIMIT rides a
total order (or byte-identical duplicate runs); EXTRACT projections
CAST AS BIGINT; NULLS FIRST pinned on nullable sort keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table, register_tables

_DEC = "DECIMAL(38,6)"


# --------------------------------------------------------------------------
# q3: month-screened brand star, revenue-descending report.
# --------------------------------------------------------------------------

_QDS3_SQL = """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year,
           p_brand AS brand,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_agg
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND EXTRACT(MONTH FROM o_orderdate) = 11
    GROUP BY 1, 2
    ORDER BY d_year, sum_agg DESC, brand
    LIMIT 100
"""


@query(
    "qds3_brand_month_star",
    oracle=_QDS3_SQL,
    covers="§2.B TPC-DS q3 shape: month-screened fact × item star, "
    "report ordered by year then the revenue aggregate DESCENDING "
    "with a brand tiebreak",
)
def qds3_brand_month_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3's topology (ref q3.sql): date_dim ⋈ store_sales ⋈ item with
    a manufacturer screen on the item dim and a month (d_moy = 11)
    screen on the date dim, grouped per (year, brand). What makes q3
    its own shape vs the qds42/52/55 star-report anchors: the ORDER BY
    leads with the year then the AGGREGATE DESCENDING — the top
    revenue rows per year, not a dimension-ordered report.

    Adapted: part is the item dim (p_type = 'PROMO' the manufacturer
    screen), the order date carries the month screen.

    Determinism: the sum is exact DECIMAL(38,6) → one DOUBLE cast;
    equal sums across groups fall back to the unique (d_year, brand)
    tiebreak, so LIMIT 100 is a total order.

    Scale: part broadcasts under its pushed type screen; the month
    screen reaches the orders scan; the head is TakeOrderedAndProject.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS3_SQL)


# --------------------------------------------------------------------------
# q12 / q20: per-item revenue share of its class (windowed sum-of-sums).
# --------------------------------------------------------------------------


def _class_ratio_sql(priority: str, types: str, lo: str, hi: str) -> str:
    return f"""
    SELECT p_partkey AS item_id,
           p_name AS item_desc,
           p_type AS class,
           p_retailprice AS current_price,
           CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE)
             AS itemrevenue,
           (CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) * 100)
             / CAST(SUM(SUM(CAST(l_extendedprice AS {_DEC})))
                    OVER (PARTITION BY p_type) AS DOUBLE) AS revenueratio
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE o_orderpriority = '{priority}'
      AND p_type IN ({types})
      AND o_orderdate BETWEEN TIMESTAMP '{lo}' AND TIMESTAMP '{hi}'
    GROUP BY p_partkey, p_name, p_type, p_retailprice
    ORDER BY class, item_id
    LIMIT 100
"""


_QDS12_SQL = _class_ratio_sql(
    "2-HIGH", "'PROMO','STANDARD','ECONOMY'",
    "1996-02-22 00:00:00", "1996-04-22 00:00:00",
)
_QDS20_SQL = _class_ratio_sql(
    "4-NOT SPECIFIED", "'LARGE','MEDIUM','SMALL'",
    "1997-02-22 00:00:00", "1997-04-22 00:00:00",
)


@query(
    "qds12_class_revenue_ratio",
    oracle=_QDS12_SQL,
    covers="§2.B TPC-DS q12 shape: per-item revenue and its share of "
    "the class total via SUM(SUM(x)) OVER (PARTITION BY class), "
    "30-day-window web-channel slice",
)
def qds12_class_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12's topology (ref q12.sql): web_sales ⋈ item ⋈ date_dim over
    a 30-day window and an item-category IN screen, grouped per item,
    emitting the item's revenue AND its percentage share of the class
    total — the nested-aggregate window ``sum(sum(x)) OVER (PARTITION
    BY i_class)``. Adapted: the '2-HIGH' priority slice is the web
    channel, p_type is the class, part attributes the item columns.

    Determinism: both operands of the share are exact decimal sums
    cast DOUBLE once; the ratio is (a*100)/b — two IEEE ops evaluated
    identically in both engines (never a decimal division). ORDER BY
    (class, item_id) is unique per group row.

    Scale: one hash aggregate per item then a window exchange on the
    low-cardinality class key; the date+priority screens reach the
    orders scan, the type screen the part scan.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS12_SQL)


@query(
    "qds20_catalog_class_ratio",
    oracle=_QDS20_SQL,
    covers="§2.B TPC-DS q20 shape: the q12 class-share report on the "
    "catalog channel slice (disjoint priority, window, and class set)",
)
def qds20_catalog_class_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20's topology (ref q20.sql) — identical structure to q12 on
    the catalog channel: upstream the two differ only in the fact
    table (cs_* for ws_*); here the '4-NOT SPECIFIED' slice stands in
    for catalog, with a disjoint class set and a 1997 window so the
    two operators certify disjoint data. See
    :func:`qds12_class_revenue_ratio` for the determinism and scale
    argument (shared builder).
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS20_SQL)


# --------------------------------------------------------------------------
# q19: brand star with a cross-dimension geography-mismatch residual.
# --------------------------------------------------------------------------

_QDS19_SQL = """
    SELECT p_brand AS brand,
           p_type AS manufact,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             AS ext_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_size BETWEEN 5 AND 15
      AND EXTRACT(MONTH FROM o_orderdate) = 11
      AND EXTRACT(YEAR FROM o_orderdate) = 1996
      AND c_nationkey <> s_nationkey
    GROUP BY 1, 2
    ORDER BY ext_price DESC, brand, manufact
    LIMIT 100
"""


@query(
    "qds19_brand_geo_mismatch",
    oracle=_QDS19_SQL,
    covers="§2.B TPC-DS q19 shape: brand star whose WHERE carries a "
    "cross-dimension non-equi residual (buyer geography <> seller "
    "geography), revenue-descending report",
)
def qds19_brand_geo_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19's topology (ref q19.sql): the brand star (date ⋈ fact ⋈
    item, manager + month/year screens) EXTENDED through customer →
    address and store, keeping only sales where the buyer's zip prefix
    differs from the store's — ``substr(ca_zip,1,5) <>
    substr(s_zip,1,5)``, a residual comparing columns of TWO DIFFERENT
    dimensions that no single scan can evaluate. Adapted: the customer
    nation vs the supplier nation (c_nationkey <> s_nationkey).

    Planner path: both dimension chains resolve to broadcast joins;
    the <> residual evaluates post-join (it references both sides) but
    every join stays equi-keyed — plan-gated no cartesian / no BNLJ.
    ORDER BY leads with the aggregate DESC; (brand, manufact) is the
    unique tiebreak. Money exact-decimal as usual.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS19_SQL)


# --------------------------------------------------------------------------
# q26 / q27: demographic mean reports (q27 adds ROLLUP + GROUPING()).
# --------------------------------------------------------------------------


def _four_means() -> str:
    cols = [
        ("l_quantity", "agg1"),
        ("l_extendedprice", "agg2"),
        ("l_discount", "agg3"),
        ("l_tax", "agg4"),
    ]
    return ",\n           ".join(
        f"CAST(SUM(CAST({c} AS {_DEC})) AS DOUBLE) / COUNT(*) AS {a}"
        for c, a in cols
    )


_QDS26_SQL = f"""
    SELECT p_brand AS item_id,
           {_four_means()}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_mktsegment = 'BUILDING'
      AND EXTRACT(YEAR FROM o_orderdate) = 1996
      AND (o_orderpriority = '5-LOW' OR o_orderstatus = 'F')
    GROUP BY 1
    ORDER BY 1
    LIMIT 100
"""


@query(
    "qds26_promo_demographic_means",
    oracle=_QDS26_SQL,
    covers="§2.B TPC-DS q26 shape: four AVG aggregates per item over "
    "a demographic-screened star with an OR screen on the promotion "
    "dimension",
)
def qds26_promo_demographic_means(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q26's topology (ref q26.sql): catalog_sales ⋈ cdemo ⋈ date ⋈
    item ⋈ promotion, an exact demographic screen (gender / marital /
    education), an OR screen on the promotion dim (email OR event =
    'N'), and FOUR ``avg()`` outputs per item. Adapted: c_mktsegment
    is the demographic screen; the priority-OR-status disjunction is
    the promotion screen; the means run over quantity, price,
    discount and tax.

    Determinism (the r4 lesson — never certify AVG of doubles): each
    mean is the exact DECIMAL(38,6) sum cast DOUBLE once, divided by
    the exact count — ONE IEEE division, bit-identical cross-engine.

    Scale: all dims broadcast; one hash aggregate on the 25-brand key.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS26_SQL)


_QDS27_NATIONS = "'NATION_3','NATION_7','NATION_12','NATION_18'"

_QDS27_SQL = f"""
    SELECT p_brand AS item_id,
           n_name AS state,
           CAST(GROUPING(n_name) AS INT) AS g_state,
           {_four_means()}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_mktsegment = 'MACHINERY'
      AND EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
      AND n_name IN ({_QDS27_NATIONS})
    GROUP BY ROLLUP(p_brand, n_name)
    ORDER BY item_id NULLS FIRST, state NULLS FIRST
    LIMIT 100
"""


@query(
    "qds27_rollup_demographic_means",
    oracle=_QDS27_SQL,
    covers="§2.B TPC-DS q27 shape: the q26 mean report under GROUP BY "
    "ROLLUP(item, state) with a GROUPING() output column",
)
def qds27_rollup_demographic_means(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q27's topology (ref q27.sql): q26's demographic mean report but
    grouped ``ROLLUP(i_item_id, s_state)`` with ``grouping(s_state)``
    emitted — subtotal rows per item plus the grand total, each mean
    recomputed per rollup level (NOT an average of averages: the
    Expand feeds raw rows to every level). Adapted: nation is the
    state dim, restricted to an IN-list like q27's s_state screen.

    Cross-engine pins: GROUPING() is cast to INT on both sides (Spark
    returns TINYINT, DuckDB INT64); the ORDER BY pins NULLS FIRST on
    both rollup keys (Spark ASC defaults NULLS FIRST, DuckDB NULLS
    LAST — the r5 groupingsets lesson). (item_id, state) is unique
    across rollup rows, so LIMIT 100 is total. GROUPING() targets the
    base column, never a select alias (GROUPING_COLUMN_MISMATCH trap).

    Scale: one Expand over the aggregate input — rollup levels never
    rescan the fact.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS27_SQL)


# --------------------------------------------------------------------------
# q48: ungrouped sum under two stacked OR-of-(residual AND band) blocks.
# --------------------------------------------------------------------------

_QDS48_SQL = """
    SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             AS qty_sum
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      AND ((c_mktsegment = 'BUILDING'
            AND l_extendedprice BETWEEN 1000 AND 20000)
        OR (c_mktsegment = 'MACHINERY'
            AND l_extendedprice BETWEEN 20000 AND 40000)
        OR (c_mktsegment = 'FURNITURE'
            AND l_extendedprice BETWEEN 40000 AND 60000))
      AND ((n_name IN ('NATION_1','NATION_5','NATION_9')
            AND l_discount BETWEEN 0.00 AND 0.04)
        OR (n_name IN ('NATION_12','NATION_15','NATION_18')
            AND l_discount BETWEEN 0.04 AND 0.08)
        OR (n_name IN ('NATION_20','NATION_22','NATION_24')
            AND l_discount BETWEEN 0.06 AND 0.10))
"""


@query(
    "qds48_disjunct_band_sum",
    oracle=_QDS48_SQL,
    covers="§2.B TPC-DS q48 shape: ungrouped quantity sum under two "
    "independent OR-of-(dimension residual AND fact band) disjunction "
    "blocks (demographic × geography)",
)
def qds48_disjunct_band_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q48's topology (ref q48.sql): one ungrouped ``sum(ss_quantity)``
    where the WHERE stacks TWO independent three-arm disjunctions —
    each arm pairing a dimension equality (marital/education; state
    list) with a DIFFERENT fact-column band (sales_price; net_profit).
    Neither block can be pushed to a single scan whole, but each arm's
    dimension half prunes its dim and the fact bands are scan-pushable
    as the OR-of-ranges. Adapted: mktsegment × extendedprice bands and
    nation × discount bands.

    Determinism: a single exact DECIMAL(38,6) sum cast DOUBLE — one
    output row, no ordering concerns.

    Scale: customer/nation broadcast; the disjunction evaluates on the
    joined row without expanding it (no UNION rewrite — one fact pass).
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS48_SQL)


# --------------------------------------------------------------------------
# q53: quarterly CoV screen, cross-multiplied exact.
# --------------------------------------------------------------------------

_QDS53_SQL = """
    WITH base AS (
      SELECT p_brand AS manufact,
             CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qoy,
             SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS ssum
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        AND ((p_type IN ('PROMO','STANDARD')
              AND p_size BETWEEN 1 AND 15
              AND p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4'))
          OR (p_type IN ('ECONOMY','LARGE')
              AND p_size BETWEEN 20 AND 40
              AND p_brand IN ('Brand#5','Brand#6','Brand#7','Brand#8')))
      GROUP BY 1, 2
    )
    SELECT manufact,
           CAST(ssum AS DOUBLE) AS sum_sales,
           CAST(tot AS DOUBLE) / cnt AS avg_quarterly_sales
    FROM (SELECT manufact, ssum,
                 SUM(ssum) OVER (PARTITION BY manufact) AS tot,
                 COUNT(*) OVER (PARTITION BY manufact) AS cnt
          FROM base) x
    WHERE tot > 0
      AND 10 * ABS(ssum * cnt - tot) > tot
    ORDER BY avg_quarterly_sales, sum_sales, manufact
    LIMIT 100
"""


@query(
    "qds53_quarterly_cov_screen",
    oracle=_QDS53_SQL,
    covers="§2.B TPC-DS q53 shape: per-(manufacturer, quarter) sales "
    "vs the manufacturer's quarterly average, |sum-avg|/avg > 0.1 "
    "kept exact by cross-multiplication",
)
def qds53_quarterly_cov_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q53's topology (ref q53.sql): per-(manufact, quarter) sums with
    ``avg(sum(...)) OVER (PARTITION BY i_manufact_id)`` and the screen
    ``CASE WHEN avg > 0 THEN abs(sum-avg)/avg ELSE NULL END > 0.1``,
    under q53's two-arm (category × class × brand) item disjunction.

    Cross-engine exactness: the screen never divides — with avg =
    tot/cnt, ``abs(sum-avg)/avg > 0.1 ∧ avg > 0`` is equivalent to
    ``10·|sum·cnt − tot| > tot ∧ tot > 0``, evaluated entirely in
    exact decimals (DECIMAL(24,6) keeps DuckDB's decimal multiply in
    int128 — the qds74 lesson). The DISPLAYED average is the one
    IEEE division CAST(tot AS DOUBLE)/cnt. The quarter column feeds
    the group but is not projected (as in q53); surviving duplicate
    rows of one manufacturer are byte-identical, so the ordered LIMIT
    cut is engine-independent.

    Scale: one aggregate, one window exchange on the 25-brand key.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS53_SQL)


# --------------------------------------------------------------------------
# q57: entity-dim monthly series, LAG/LEAD neighbors + CoV screen.
# --------------------------------------------------------------------------

_QDS57_SQL = """
    WITH v1 AS (
      SELECT s_name AS cc_name,
             p_brand AS brand,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS d_moy,
             SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS ssum
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_type IN ('PROMO','STANDARD')
        AND (EXTRACT(YEAR FROM o_orderdate) = 1996
             OR (EXTRACT(YEAR FROM o_orderdate) = 1995
                 AND EXTRACT(MONTH FROM o_orderdate) = 12)
             OR (EXTRACT(YEAR FROM o_orderdate) = 1997
                 AND EXTRACT(MONTH FROM o_orderdate) = 1))
      GROUP BY 1, 2, 3, 4
    ), v2 AS (
      SELECT cc_name, brand, d_year, d_moy, ssum,
             SUM(ssum) OVER (PARTITION BY cc_name, brand, d_year) AS ytot,
             COUNT(*) OVER (PARTITION BY cc_name, brand, d_year) AS ycnt,
             LAG(ssum) OVER (PARTITION BY cc_name, brand
                             ORDER BY d_year, d_moy) AS prev_sum,
             LEAD(ssum) OVER (PARTITION BY cc_name, brand
                              ORDER BY d_year, d_moy) AS next_sum
      FROM v1
    )
    SELECT cc_name, brand, d_year, d_moy,
           CAST(ssum AS DOUBLE) AS sum_sales,
           CAST(ytot AS DOUBLE) / ycnt AS avg_monthly_sales,
           CAST(prev_sum AS DOUBLE) AS psum,
           CAST(next_sum AS DOUBLE) AS nsum
    FROM v2
    WHERE d_year = 1996
      AND ytot > 0
      AND 10 * ABS(ssum * ycnt - ytot) > ytot
    ORDER BY cc_name, brand, d_moy
    LIMIT 100
"""


@query(
    "qds57_entity_monthly_neighbors",
    oracle=_QDS57_SQL,
    covers="§2.B TPC-DS q57 shape: monthly entity series over a "
    "14-month window, LAG/LEAD neighbor sums + the yearly-average CoV "
    "screen in one window pass",
)
def qds57_entity_monthly_neighbors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q57's topology (ref q57.sql): the call-center twin of q47 —
    monthly (category, brand, call_center) sums over year ±1 month,
    the per-year average window, and the previous/next month's sums
    pulled alongside. Upstream spells the neighbors as a TRIPLE
    self-join of the CTE on rn±1; re-expressed Spark-first as LAG/LEAD
    over the same window ordering — one pass, no re-scan (the qds47
    conversion), with q57's |sum−avg|/avg > 0.1 screen kept exact by
    the qds53 cross-multiply. Adapted: supplier is the entity dim
    (call center), brand the item key.

    Edge months (Dec 1995 / Jan 1997) contribute as neighbors and are
    then filtered to d_year = 1996, exactly like the reference's rn
    chain. Neighbor NULLs (a series that starts/ends mid-window)
    survive the DOUBLE cast as NULLs in both engines.

    Determinism: sums DECIMAL(24,6); the displayed average is one
    IEEE division; (cc_name, brand, d_moy) is unique at d_year fixed.

    Scale: one aggregate, ONE window exchange on (cc_name, brand) —
    the year-partition window and both neighbor functions share it.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS57_SQL)


# --------------------------------------------------------------------------
# q62: ship-lag day buckets under a truncating substr group key.
# --------------------------------------------------------------------------

_QDS62_BUCKETS = [
    ("d30", "lag_days <= 30"),
    ("d60", "lag_days > 30 AND lag_days <= 60"),
    ("d90", "lag_days > 60 AND lag_days <= 90"),
    ("d120", "lag_days > 90 AND lag_days <= 120"),
    ("dmore", "lag_days > 120"),
]

_QDS62_ORACLE = f"""
    WITH lagged AS (
      SELECT SUBSTR(s_name, 1, 17) AS warehouse,
             o_orderpriority AS sm_type,
             l_linestatus AS web_name,
             datediff('day', CAST(o_orderdate AS DATE),
                      CAST(l_shipdate AS DATE)) AS lag_days
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
    )
    SELECT warehouse, sm_type, web_name,
           {", ".join(
        f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS {name}"
        for name, cond in _QDS62_BUCKETS
    )}
    FROM lagged
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    LIMIT 100
"""


@query(
    "qds62_warehouse_ship_buckets",
    oracle=_QDS62_ORACLE,
    covers="§2.B TPC-DS q62 shape: order→ship lag bucketed into five "
    "day bands, grouped under a TRUNCATING substr(warehouse) key that "
    "merges warehouses",
)
def qds62_warehouse_ship_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q62's topology (ref q62.sql): web_sales joined to warehouse /
    ship_mode / web_site, the ship−sold day lag split into five SUM
    (CASE) bands per (substr(w_warehouse_name,1,20), sm_type,
    web_name) — the group key itself TRUNCATES the warehouse name, so
    several warehouses merge into one row (a derived group key, not a
    column). Adapted: supplier is the warehouse (substr(s_name,1,17)
    merges suppliers in tens), priority the ship mode, linestatus the
    site.

    Cross-engine pins: Spark spells the lag ``datediff(end, start)``,
    DuckDB ``datediff('day', start, end)`` (the qds50 spelling split —
    hence the DataFrame implementation with a DuckDB-dialect oracle);
    DuckDB's SUM(int) is HUGEINT → the oracle casts each band to
    BIGINT (qds50 lesson). Counts are exact; the full group key is
    the ORDER BY.

    Scale: supplier broadcasts; the lag computes scan-side before the
    single hash aggregate; the year screen reaches the orders scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    lag = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    ).alias("lag_days")
    lagged = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.substring("s_name", 1, 17).alias("warehouse"),
            F.col("o_orderpriority").alias("sm_type"),
            F.col("l_linestatus").alias("web_name"),
            lag,
        )
    )
    conds = {
        "d30": F.col("lag_days") <= 30,
        "d60": (F.col("lag_days") > 30) & (F.col("lag_days") <= 60),
        "d90": (F.col("lag_days") > 60) & (F.col("lag_days") <= 90),
        "d120": (F.col("lag_days") > 90) & (F.col("lag_days") <= 120),
        "dmore": F.col("lag_days") > 120,
    }
    return (
        lagged.groupBy("warehouse", "sm_type", "web_name")
        .agg(
            *[
                F.sum(F.when(c, 1).otherwise(0)).cast("bigint").alias(n)
                for n, c in conds.items()
            ]
        )
        .orderBy("warehouse", "sm_type", "web_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q68: per-ticket basket sums, bought-vs-current geography mismatch.
# --------------------------------------------------------------------------

_QDS68_SQL = """
    WITH dn AS (
      SELECT l_orderkey AS ticket,
             o_custkey AS cust,
             n_name AS bought_city,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS extended_price,
             SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
               AS list_price,
             SUM(CAST(l_extendedprice * l_tax AS DECIMAL(38,6)))
               AS extended_tax
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE EXTRACT(DAY FROM o_orderdate) BETWEEN 1 AND 2
        AND EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997, 1998)
        AND (o_orderpriority = '2-HIGH' OR o_orderpriority = '5-LOW')
      GROUP BY 1, 2, 3
    )
    SELECT c_name,
           c_mktsegment,
           cn.n_name AS current_city,
           bought_city,
           ticket,
           CAST(extended_price AS DOUBLE) AS extended_price,
           CAST(extended_tax AS DOUBLE) AS extended_tax,
           CAST(list_price AS DOUBLE) AS list_price
    FROM dn
    JOIN customer ON cust = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE cn.n_name <> bought_city
    ORDER BY c_name, ticket, bought_city
    LIMIT 100
"""


@query(
    "qds68_city_basket_detail",
    oracle=_QDS68_SQL,
    covers="§2.B TPC-DS q68 shape: per-ticket basket sums grouped "
    "with the bought-at geography, re-joined to the customer and kept "
    "only where the current geography differs",
)
def qds68_city_basket_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q68's topology (ref q68.sql): store_sales grouped per (ticket,
    customer, bought city) under day-of-month / demographic-OR / city
    screens, then the baskets join back to customer → current address
    keeping only tickets bought in a DIFFERENT city than the customer
    now lives in — the mismatch residual compares a GROUP KEY of the
    inner aggregate against a dimension of the outer join. Adapted:
    the order is the ticket, the supplier's nation the bought city,
    the customer's nation the current city, priority the demographic
    OR.

    An order spanning suppliers in several nations yields several
    baskets (exactly q68's (ticket, addr) grain), so the sort key adds
    bought_city to (c_name, ticket) for a total order.

    Determinism: money exact DECIMAL(38,6) (price×discount/tax
    products are 6dp-exact), DOUBLE cast at projection only.

    Scale: nation/supplier/customer broadcast; the basket aggregate
    shuffles once on the ticket grain; the join back to customer is
    equi on custkey.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS68_SQL)


# --------------------------------------------------------------------------
# q71: three-channel UNION ALL × time-of-day dimension.
# --------------------------------------------------------------------------

_QDS71_SQL = """
    WITH u AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, value FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c_mktsegment AS brand,
           CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS t_hour,
           CAST(EXTRACT(MINUTE FROM ts) AS BIGINT) AS t_minute,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS ext_price
    FROM u
    JOIN customer ON user_id = c_custkey
    WHERE c_acctbal > 0
      AND (EXTRACT(HOUR FROM ts) BETWEEN 6 AND 8
           OR EXTRACT(HOUR FROM ts) BETWEEN 18 AND 20)
    GROUP BY 1, 2, 3
    ORDER BY ext_price DESC, brand, t_hour, t_minute
    LIMIT 100
"""

# r12 single-pass form: the oracle's three UNION ALL slices are
# disjoint event_type predicates over the same table — one scan with
# the combined IN filter yields the identical row multiset.
_QDS71_SPARK_SQL = """
    SELECT c_mktsegment AS brand,
           CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS t_hour,
           CAST(EXTRACT(MINUTE FROM ts) AS BIGINT) AS t_minute,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS ext_price
    FROM events
    JOIN customer ON user_id = c_custkey
    WHERE event_type IN ('click', 'view', 'purchase')
      AND c_acctbal > 0
      AND (EXTRACT(HOUR FROM ts) BETWEEN 6 AND 8
           OR EXTRACT(HOUR FROM ts) BETWEEN 18 AND 20)
    GROUP BY 1, 2, 3
    ORDER BY ext_price DESC, brand, t_hour, t_minute
    LIMIT 100
"""


@query(
    "qds71_time_of_day_union",
    oracle=_QDS71_SQL,
    covers="§2.B TPC-DS q71 shape: three channel slices UNION ALL-ed, "
    "joined to a time-of-day dimension with a meal-time disjunction, "
    "grouped by brand × hour × minute",
)
def qds71_time_of_day_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q71's topology (ref q71.sql): web + catalog + store November
    sales UNION ALL-ed into one stream, joined to item (manager
    screen) and to time_dim keeping breakfast/dinner hours, grouped
    per (brand, hour, minute) and ordered revenue-descending. Adapted
    to the ONLY intraday-timestamp source in the test schema: three
    event_type slices of the events table are the channels, the
    customer dim (acctbal > 0 the manager screen, mktsegment the
    brand) replaces item, and the meal-time disjunction keeps hours
    6-8 and 18-20.

    events.ts is TIMESTAMP(NANOS) — readable only via
    session.load_table (nanosAsLong → micros NTZ), which
    register_tables applies; DuckDB truncates the same nanos to
    micros, so EXTRACT(HOUR/MINUTE) agree.

    Determinism: the value sum rides the certified double→DECIMAL
    (38,6) path (relational2's window family); equal sums fall to the
    unique (brand, hour, minute) tiebreak.

    Scale (r12): the three UNION ALL slices are disjoint event_type
    predicates over ONE table — Spark scanned events once per slice.
    The Spark side now runs a single scan with the combined
    `event_type IN (...)` filter (identical row multiset: each row
    matches at most one slice), keeping the pushed filter, the
    customer broadcast and the single hash aggregate. 3 event scans
    → 1; oracle keeps the faithful UNION ALL spelling.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS71_SPARK_SQL)


# --------------------------------------------------------------------------
# q73: count-band join-back behind a guarded-CASE ratio screen.
# --------------------------------------------------------------------------

_QDS73_SQL = """
    WITH dj AS (
      SELECT l_orderkey AS ticket,
             o_custkey AS cust,
             COUNT(*) AS cnt
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE EXTRACT(DAY FROM o_orderdate) BETWEEN 1 AND 2
        AND EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997, 1998)
        AND (c_mktsegment = 'BUILDING' OR c_mktsegment = 'AUTOMOBILE')
        AND c_nationkey > 0
        AND CASE WHEN c_nationkey > 0
                 THEN c_acctbal > 200 * c_nationkey END
      GROUP BY 1, 2
    )
    SELECT c_name, c_mktsegment, ticket, cnt
    FROM dj
    JOIN customer ON cust = c_custkey
    WHERE cnt BETWEEN 1 AND 5
    ORDER BY cnt DESC, c_name, ticket
    LIMIT 100
"""


@query(
    "qds73_guarded_count_band",
    oracle=_QDS73_SQL,
    covers="§2.B TPC-DS q73 shape: per-ticket line counts behind a "
    "guarded-CASE ratio screen on the demographic dim, count band "
    "kept on the join-back to customer",
)
def qds73_guarded_count_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q73's topology (ref q73.sql): tickets counted per (ticket,
    customer) under dom/demographic screens — including the GUARDED
    ratio ``CASE WHEN hd_vehicle_count > 0 THEN hd_dep_count /
    hd_vehicle_count ELSE NULL END > 1`` (a CASE yielding NULL when
    the guard fails, used directly as a predicate) — then joined back
    to customer keeping tickets with 1-5 lines, ordered count-first.
    The narrower band (1-5 vs qds34's 15-20) and the guarded-CASE
    screen distinguish it from the qds34 anchor.

    Cross-engine exactness: the ratio screen is cross-multiplied
    inside the CASE (``c_acctbal > 200 * c_nationkey`` — double vs
    int product, identical IEEE compare; never a decimal division);
    the CASE still returns NULL when the guard fails, preserving q73's
    tri-state predicate semantics.

    Determinism: counts exact; ORDER BY (cnt DESC, c_name, ticket) is
    total (ticket unique).

    Scale: customer broadcasts twice (screen + name lookup); one
    aggregate on the ticket grain; the count band applies post-agg.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS73_SQL)


# --------------------------------------------------------------------------
# q79: weekday per-ticket profit report (dayofweek cross-engine shift).
# --------------------------------------------------------------------------

_QDS79_ORACLE = """
    WITH ms AS (
      SELECT l_orderkey AS ticket,
             o_custkey AS cust,
             SUBSTR(n_name, 1, 8) AS city,
             SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
               AS amt,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
               AS profit
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE dayofweek(o_orderdate) + 1 = 2
        AND EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997, 1998)
        AND s_acctbal BETWEEN 1000 AND 8000
      GROUP BY 1, 2, 3
    )
    SELECT c_name, city, ticket,
           CAST(amt AS DOUBLE) AS amt,
           CAST(profit AS DOUBLE) AS profit
    FROM ms
    JOIN customer ON cust = c_custkey
    WHERE c_mktsegment = 'FURNITURE' OR c_acctbal > 5000
    ORDER BY c_name, city, ticket
    LIMIT 100
"""


@query(
    "qds79_weekday_ticket_profit",
    oracle=_QDS79_ORACLE,
    covers="§2.B TPC-DS q79 shape: Monday per-ticket coupon/profit "
    "sums grouped with a truncated city key, joined back to the "
    "customer under a demographic OR screen",
)
def qds79_weekday_ticket_profit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q79's topology (ref q79.sql): Monday (d_dow = 1) store sales
    grouped per (ticket, customer, store city) with coupon and profit
    sums under a demographic OR and a store-size band, then joined
    back to customer, emitting substr(s_city,1,30). Adapted: the
    supplier's nation is the store city (substr-truncated like q79's
    projection), s_acctbal the store-size band, the customer
    segment-OR-balance the demographic screen.

    Cross-engine pin: Spark's dayofweek is 1-based (Sunday=1), DuckDB
    0-based — the oracle shifts by one (the qds2 lesson). Hence the
    DataFrame implementation with a DuckDB-dialect oracle.

    Determinism: money exact DECIMAL(38,6) to DOUBLE at projection;
    (c_name, city, ticket) is a total order (ticket appears once per
    city grain).

    Scale: supplier/nation/customer broadcast; one aggregate on the
    ticket grain; the weekday screen computes scan-side on orders.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.dayofweek("o_orderdate") == 2)
        & F.year("o_orderdate").isin(1996, 1997, 1998)
    )
    supplier = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal").between(1000, 8000)
    )
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_mktsegment") == "FURNITURE") | (F.col("c_acctbal") > 5000)
    )
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    ms = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("l_orderkey").alias("ticket"),
            F.col("o_custkey").alias("cust"),
            F.substring("n_name", 1, 8).alias("city"),
        )
        .agg(
            F.sum(dec(F.col("l_extendedprice") * F.col("l_discount")))
            .alias("amt"),
            F.sum(
                dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("profit"),
        )
    )
    return (
        ms.join(F.broadcast(customer), F.col("cust") == F.col("c_custkey"))
        .select(
            "c_name",
            "city",
            "ticket",
            F.col("amt").cast("double").alias("amt"),
            F.col("profit").cast("double").alias("profit"),
        )
        .orderBy("c_name", "city", "ticket")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q86: ROLLUP + GROUPING() arithmetic + RANK within the rollup parent.
# --------------------------------------------------------------------------

_QDS86_SQL = """
    WITH g AS (
      SELECT r_name AS category,
             n_name AS class,
             CAST(GROUPING(r_name) + GROUPING(n_name) AS INT)
               AS lochierarchy,
             CAST(GROUPING(n_name) AS INT) AS g_class,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS total
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      GROUP BY ROLLUP(r_name, n_name)
    )
    SELECT CAST(total AS DOUBLE) AS total_sum,
           category,
           class,
           lochierarchy,
           RANK() OVER (PARTITION BY lochierarchy,
                          CASE WHEN g_class = 0 THEN category END
                        ORDER BY total DESC) AS rank_within_parent
    FROM g
    ORDER BY lochierarchy DESC,
             CASE WHEN lochierarchy = 0 THEN category END NULLS FIRST,
             rank_within_parent,
             category NULLS FIRST,
             class NULLS FIRST
    LIMIT 100
"""


@query(
    "qds86_rollup_rank_parent",
    oracle=_QDS86_SQL,
    covers="§2.B TPC-DS q86 shape: ROLLUP hierarchy with GROUPING() "
    "arithmetic (lochierarchy) and RANK partitioned by the rollup "
    "parent",
)
def qds86_rollup_rank_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q86's topology (ref q86.sql): a year of web revenue rolled up
    ``ROLLUP(i_category, i_class)`` with ``grouping(a)+grouping(b)``
    as the hierarchy level and ``rank() OVER (PARTITION BY <level>,
    CASE WHEN grouping(i_class)=0 THEN i_category END ORDER BY sum
    DESC)`` — each row ranked among its rollup SIBLINGS (classes
    within a category; categories within the grand total). Adapted:
    region → nation is the category → class hierarchy.

    Spark-first form: the GROUPING() arithmetic is computed in the
    aggregate subquery (Spark rejects GROUPING() outside the
    grouping query — and qds70's lesson: never reference it through a
    select alias in the same scope), the rank windows over the tiny
    rolled-up set. ORDER BY pins NULLS FIRST on every nullable key
    (Spark/DuckDB default split) and appends (category, class) so the
    cut is total.

    Determinism: ranks order by the EXACT decimal total (ties rank
    equally in both engines, and tied rows differ only in their key
    columns which are later sort keys).

    Scale: one Expand over the joined fact — 3 rollup levels of a
    5×25 hierarchy; the rank's partitions are tiny.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS86_SQL)


# --------------------------------------------------------------------------
# q92: excess-discount scalar (1.3x per-item average threshold).
# --------------------------------------------------------------------------

_QDS92_SQL = """
    WITH d AS (
      SELECT l_partkey AS pk,
             CAST(l_extendedprice * l_discount AS DECIMAL(24,6)) AS disc
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_size BETWEEN 30 AND 40
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-27 00:00:00'
                            AND TIMESTAMP '1996-04-26 00:00:00'
    ), w AS (
      SELECT disc,
             SUM(disc) OVER (PARTITION BY pk) AS tot,
             COUNT(*) OVER (PARTITION BY pk) AS cnt
      FROM d
    )
    SELECT CAST(SUM(disc) AS DOUBLE) AS excess_discount
    FROM w
    WHERE 10 * disc * cnt > 13 * tot
"""


@query(
    "qds92_excess_discount",
    oracle=_QDS92_SQL,
    covers="§2.B TPC-DS q92 shape: sum of discounts exceeding 1.3x "
    "the item's own windowed average — correlated scalar AVG as a "
    "window, threshold cross-multiplied exact, single-row output",
)
def qds92_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q92's topology (ref q92.sql): web discounts in a 90-day window
    for a manufacturer's items, keeping rows above ``1.3 *
    avg(ws_ext_discount_amt)`` of the SAME item in the SAME window (a
    correlated scalar subquery re-scanning the fact), summed to one
    scalar. Re-expressed Spark-first: the per-item average rides a
    window over the single scan (the qds32/qds30 conversion — no
    second fact scan), and the 1.3x threshold is the exact decimal
    cross-multiply ``10*disc*cnt > 13*tot`` (DECIMAL(24,6) keeps
    DuckDB's int128 multiply safe). One DOUBLE cast on the final sum.

    q92 vs the qds32 anchor: q92 aggregates to a SINGLE ungrouped
    scalar (qds32 reports per item) — the entire survivor set folds
    into one row, so the plan ends in a two-phase ungrouped agg.

    Scale: the date screen reaches the orders scan, the size screen
    the part scan; one window exchange on partkey; no self-join.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS92_SQL)


# --------------------------------------------------------------------------
# q94: multi-warehouse orders with no returns (semi + anti on one fact).
# --------------------------------------------------------------------------

_QDS94_SQL = """
    SELECT CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS order_count,
           CAST(SUM(CAST(l1.l_extendedprice * l1.l_discount
                         AS DECIMAL(38,6))) AS DOUBLE) AS total_ship_cost,
           CAST(SUM(CAST(l1.l_extendedprice * l1.l_tax
                         AS DECIMAL(38,6))) AS DOUBLE) AS total_tax
    FROM lineitem l1
    JOIN orders ON l1.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-02-01 00:00:00'
                          AND TIMESTAMP '1996-08-01 00:00:00'
      AND n_name = 'NATION_12'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_returnflag = 'R')
"""


@query(
    "qds94_multiwarehouse_no_returns",
    oracle=_QDS94_SQL,
    covers="§2.B TPC-DS q94 shape: COUNT(DISTINCT order) + sums over "
    "lines whose order ships from more than one warehouse (EXISTS "
    "with a <> residual against the SAME fact) and has no returns "
    "(NOT EXISTS)",
)
def qds94_multiwarehouse_no_returns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q94's topology (ref q94.sql): web orders shipped to one state
    in a 60-day window, kept when the order spans MORE THAN ONE
    warehouse — ``EXISTS (ws2 same order, different warehouse)``, an
    equi-correlation PLUS a non-equi residual against the SAME fact
    table — and has no returned line (``NOT EXISTS`` on web_returns),
    reduced to COUNT(DISTINCT order) + two sums. Adapted: suppliers
    are the warehouses, the 'R' returnflag leg the returns fact, the
    customer-nation screen the ship-address state.

    Planner path: the EXISTS plans as a LeftSemi on orderkey with the
    suppkey <> residual as the join condition; the NOT EXISTS as a
    LeftAnti — both against lineitem itself (self semi/anti, no
    cartesian). COUNT(DISTINCT) is exact.

    Scale: both correlated legs reduce to per-orderkey build sides;
    at 100 TB the semi side pre-aggregates DISTINCT (orderkey,
    suppkey) and the anti side DISTINCT returned orderkeys before the
    joins — Spark's planner pushes the aggregate below the shuffle.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_QDS94_SQL)
