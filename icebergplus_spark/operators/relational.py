"""Core relational operator battery: scans, filters, joins, aggregations,
set ops, subqueries (SURVEY.md §2.B).

The reference delegates ALL query processing to the engine reading its
Iceberg tables (SURVEY.md §0; its only expression object is
``Expressions.alwaysTrue()``, MicrometerMetricsReporterTest.java:33), so
these operators are required capability-parity, expressed Spark-first:
declarative DataFrame plans that Catalyst compiles to pushed-down,
whole-stage-codegen'd physical plans.

Determinism discipline for the DuckDB oracle hash:
- Order-dependent double aggregates (sum/avg over shuffled data) are
  ROUNDED (2dp money, 4-6dp ratios) in BOTH engines — distributed
  summation order differs, IEEE addition is non-associative.
- Per-row double arithmetic is left exact: identical expression trees
  evaluate bit-identically in both engines.
- Integer sums cast to BIGINT (DuckDB SUM(int) returns HUGEINT).

Scale notes (100 TB): fact-fact joins shuffle on join keys and rely on
AQE for skew; dimension joins are explicitly ``broadcast()``; all
aggregations are partial (map-side combine) automatically via
``groupBy().agg()``; filters are plain column predicates so they reach
the parquet scan as PushedFilters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.functions.exact import dsum, dsum_raw
from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q01 — pricing summary (flagship; TPC-H Q1 shape)
# Scan → pushed-down filter → hash agg (partial+final) → few-row result.
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,2))), 2) AS DOUBLE)                                  AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))), 2) AS DOUBLE)               AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
  ROUND(AVG(l_discount), 4)                                        AS avg_disc,
  COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "sum_disc_price"
            ),
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                6,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — projection + filter + per-row arithmetic (no agg: exact doubles)
# Entirely pushdown-able; WholeStageCodegen single stage, no shuffle.
# ---------------------------------------------------------------------------
@register(
    "q02_filter_project",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  l_quantity,
  l_extendedprice * (1 - l_discount) AS net_price,
  l_returnflag
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 10
""",
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 10)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        "l_returnflag",
    )


# ---------------------------------------------------------------------------
# q03 — shipping priority: 3-way join + agg + top-k (TPC-H Q3 shape)
# orders/customer scale with SF: no broadcast hints — fact joins shuffle on
# their keys and AQE upgrades to broadcast only when runtime stats allow.
# ---------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle="""
SELECT
  l_orderkey,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            # orders and customer both scale with SF: no broadcast hint. AQE
            # broadcasts at small SF and degrades to shuffle/SMJ at scale.
            orders.join(cust, F.col("c_custkey") == F.col("o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — order priority checking: EXISTS → left-semi join (TPC-H Q4 shape)
# ---------------------------------------------------------------------------
@register(
    "q04_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
""",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    # Semi join keeps orders-side columns only; correlated condition rides
    # along as a mixed join predicate.
    sem = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# q05 — local supplier volume: 6-way star join (TPC-H Q5 shape)
# region/nation/supplier broadcast (dims); orders/customer/lineitem shuffle.
# ---------------------------------------------------------------------------
@register(
    "q05_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        # orders/customer scale with SF — fact-fact joins shuffle; AQE picks
        # broadcast only when runtime stats fit under the threshold.
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q06 — forecast revenue: pure scan-side filter + single global agg
# (TPC-H Q6 shape). All predicates push to parquet row-group stats.
# ---------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — broadcast dimension join + two-key agg (brand volume)
# ---------------------------------------------------------------------------
@register(
    "q07_brand_volume",
    oracle="""
SELECT p_brand,
       CAST(SUM(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_lines,
       ROUND(AVG(l_extendedprice), 4) AS avg_price
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_size <= 20
GROUP BY p_brand
""",
)
def q07_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum("l_quantity").cast("double").alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# q08 — semi/anti joins: customer order activity
# ---------------------------------------------------------------------------
@register(
    "q08_semi_anti",
    oracle="""
WITH active AS (
  SELECT c_mktsegment, COUNT(*) AS n_customers, 'with_orders' AS cohort
  FROM customer
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_mktsegment
),
inactive AS (
  SELECT c_mktsegment, COUNT(*) AS n_customers, 'without_orders' AS cohort
  FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_mktsegment
)
SELECT * FROM active UNION ALL SELECT * FROM inactive
""",
)
def q08_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    # Only the join key is needed from orders — prune before shuffle.
    okeys = _t(spark, sf_dir, "orders").select("o_custkey")
    on = F.col("o_custkey") == F.col("c_custkey")
    active = (
        cust.join(okeys, on, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("cohort", F.lit("with_orders"))
    )
    inactive = (
        cust.join(okeys, on, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("cohort", F.lit("without_orders"))
    )
    return active.unionByName(inactive)


# ---------------------------------------------------------------------------
# q09 — outer joins: order counts per customer incl. orderless customers
# ---------------------------------------------------------------------------
@register(
    "q09_outer_join",
    oracle="""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       COALESCE(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE), 0.0) AS total_spent
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
""",
)
def q09_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice", 2), F.lit(0.0)).alias("total_spent"),
        )
    )


# ---------------------------------------------------------------------------
# q10 — distinct aggregates
# ---------------------------------------------------------------------------
@register(
    "q10_distinct_agg",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
""",
)
def q10_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q11 — ROLLUP grouping sets
# ---------------------------------------------------------------------------
@register(
    "q11_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q12 — CUBE grouping sets
# ---------------------------------------------------------------------------
@register(
    "q12_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", 2).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# q13 — sort + limit with total order (top-k)
# Spark executes as TakeOrderedAndProject: no global sort materialized.
# ---------------------------------------------------------------------------
@register(
    "q13_sort_limit",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20
""",
)
def q13_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q14 — set operations: UNION / INTERSECT / EXCEPT
# ---------------------------------------------------------------------------
@register(
    "q14_setops",
    oracle="""
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
     y97 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
SELECT 'both' AS cohort, COUNT(*) AS n FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
UNION ALL
SELECT 'only_96' AS cohort, COUNT(*) AS n FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
UNION ALL
SELECT 'either' AS cohort, COUNT(*) AS n FROM (SELECT * FROM y96 UNION SELECT * FROM y97)
""",
)
def q14_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")

    def in_year(y: int):
        return (
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
        ).cast("int")

    # Single distributed pass (no driver-side counts): per-key membership
    # flags, then one aggregation derives all three set-op cardinalities.
    flags = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(in_year(1996)).alias("in96"),
            F.max(in_year(1997)).alias("in97"),
        )
        .filter((F.col("in96") == 1) | (F.col("in97") == 1))
    )
    totals = flags.agg(
        F.sum(((F.col("in96") == 1) & (F.col("in97") == 1)).cast("long")).alias("both"),
        F.sum(((F.col("in96") == 1) & (F.col("in97") == 0)).cast("long")).alias("only_96"),
        F.count(F.lit(1)).alias("either"),
    )
    return totals.unpivot(
        ids=[], values=["both", "only_96", "either"],
        variableColumnName="cohort", valueColumnName="n",
    )


# ---------------------------------------------------------------------------
# q15 — IN-subquery + conditional aggregation (CASE WHEN)
# ---------------------------------------------------------------------------
@register(
    "q15_in_subquery_case",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big,
       CAST(ROUND(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END AS DECIMAL(38,2))), 2) AS DOUBLE) AS urgent_value
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
GROUP BY o_orderstatus
""",
)
def q15_in_subquery_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    rich = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        orders.join(rich, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("n_big"),
            dsum(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")
                ).otherwise(0.0),
                2,
            ).alias("urgent_value"),
        )
    )


# ---------------------------------------------------------------------------
# q16 — scalar (aggregate) subquery: small-quantity-order revenue
# (TPC-H Q17 shape). The per-part average is a broadcast-joined agg.
# ---------------------------------------------------------------------------
@register(
    "q16_scalar_subquery",
    oracle="""
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN (SELECT l_partkey AS a_partkey, 0.8 * AVG(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey) t
  ON l_partkey = a_partkey
WHERE l_quantity < qty_threshold
""",
)
def q16_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Per-part threshold: avg over each part's lines. avg order varies, but
    # the < comparison is robust (quantities are integral-ish, thresholds
    # fractional), so no rounding needed on the threshold itself.
    thresholds = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (0.8 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(dsum_raw("l_extendedprice", 2) / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q17 — range (theta) join: lineitems shipped within 30 days of order date
# Equi key + range predicate → hash join with residual filter (NOT BNLJ).
# ---------------------------------------------------------------------------
@register(
    "q17_range_join",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_fast_lines,
       ROUND(AVG(DATE_DIFF('second', o_orderdate, l_shipdate) / 86400.0), 4) AS avg_lag_days
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate < o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
""",
)
def q17_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    lag_days = F.expr("timestampdiff(SECOND, o_orderdate, l_shipdate)") / 86400.0
    return (
        li.join(
            # Equi key alone already avoids BNLJ — the range predicate rides
            # as a residual filter on the shuffled hash/SMJ join. orders is
            # fact-scale, so no broadcast hint; AQE decides at runtime.
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_fast_lines"),
            F.round(F.avg(lag_days), 4).alias("avg_lag_days"),
        )
    )
