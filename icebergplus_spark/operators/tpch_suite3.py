"""TPC-H Q9/Q16/Q20 shapes adapted to the testdata schema — the last
three of the 22 classic shapes (the rest live in relational*.py and
tpch_suite*.py; COVERAGE.md maps them). There is no partsupp table
(FIXTURES.md §2), so supply cost/stock are derived from part.p_retailprice
and shipped lineitem quantities.

Scale notes (100 TB): every dimension join is an explicit broadcast;
the fact table is shuffled at most once per query (Q9: once for the
final group-by; Q16: once for the distinct-count; Q20: once for the
per-part window, whose exchange is reused by the filter). Money sums go
through functions/exact.py integer units so the result is identical
across engines and partition orders.

Reference parity note: the reference implements no relational operators
(SURVEY.md §2.C) — these are capability-parity queries for the engine
that reads its tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from icebergplus_spark.functions.exact import dsum
from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q84 — product-type profit by nation and year (TPC-H Q9 shape).
# Adapted: supply cost := p_retailprice per unit (no partsupp), so
# profit = l_extendedprice*(1-l_discount) - p_retailprice*l_quantity.
# Amount is 4dp fixed-point (2dp*2dp product minus 2dp*integer), summed
# exactly in integer units. One fact shuffle (final groupBy); part,
# supplier, nation are broadcast.
# ---------------------------------------------------------------------------
@register(
    "q84_product_profit",
    oracle="""
SELECT
  n_name AS nation,
  CAST(year(l_shipdate) AS INT) AS o_year,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                      - p_retailprice * l_quantity AS DECIMAL(38, 4))), 2)
       AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%rod%'
GROUP BY 1, 2
""",
)
def q84_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%rod%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", scale_in=4, round_to=2).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q85 — supplier/part relationship counts (TPC-H Q16 shape). Distinct
# suppliers per (brand, type, size) bucket, excluding one brand, one
# type prefix, a size IN-list, and "complaint" suppliers (adapted:
# s_acctbal < 2000) via NOT IN → broadcast anti-join. The distinct
# count shuffles the (brand,type,size,suppkey) projection once;
# Catalyst expands it as a two-phase partial-distinct aggregate.
# ---------------------------------------------------------------------------
@register(
    "q85_supplier_part_relation",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'ECONOMY%'
  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
GROUP BY p_brand, p_type, p_size
""",
)
def q85_supplier_part_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").like("ECONOMY%")
        & F.col("p_size").isin([5, 10, 15, 20, 25, 30, 35, 40, 45, 50])
    )
    complain = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000)
        .select("s_suppkey")
    )
    # s_suppkey is never NULL in a key column, so NOT IN == anti-join.
    return (
        li.join(
            F.broadcast(complain),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q86 — promotion-candidate suppliers (TPC-H Q20 shape). Suppliers who
# shipped more than half of a 'widget' part's 1996 volume. The
# correlated total-per-part is a window over the per-(part,supplier)
# aggregate — the window input is already tiny (|parts|×|suppliers|
# upper bound), so the second shuffle is negligible at any scale; the
# fact table itself is shuffled exactly once.
# ---------------------------------------------------------------------------
@register(
    "q86_promotion_candidates",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%widget%' AND year(l_shipdate) = 1996
  GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey, l_suppkey, qty,
         SUM(qty) OVER (PARTITION BY l_partkey) AS part_total
  FROM shipped
)
SELECT DISTINCT s_name, n_name
FROM tot
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE qty > 0.5 * part_total
""",
)
def q86_promotion_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    # l_quantity values are whole numbers (FIXTURES.md) — a double SUM of
    # integers < 2^53 is exact and order-independent on both engines.
    shipped = (
        li.filter(F.year("l_shipdate") == 1996)
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = shipped.withColumn(
        "part_total", F.sum("qty").over(Window.partitionBy("l_partkey"))
    )
    return (
        tot.filter(F.col("qty") > 0.5 * F.col("part_total"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .distinct()
    )
