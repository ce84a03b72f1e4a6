"""TPC-H Q2/Q11/Q12/Q17 shapes adapted to the testdata schema (no
partsupp table — FIXTURES.md §2): correlated-min supplier selection,
group-vs-global-total HAVING, conditional counts after a fact join, and
a correlated-average filter. Like tpch_suite.py these exercise the
join+agg shapes that dominate 100 TB plans; each avoids a second
scan/self-join of the fact table by computing the correlated aggregate
with a window over the same shuffle partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from icebergplus_spark.functions.exact import _units, dsum
from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q73 — min-cost supplier per part (TPC-H Q2 shape, adapted: partsupp
# doesn't exist, so "supply cost" = unit price observed on lineitem).
# Correlated MIN implemented as a window over the part key: ONE shuffle
# of the fact table instead of the aggregate-then-self-join plan (which
# shuffles it twice). At 100 TB the window and the join-back plan move
# the same bytes, but the window reuses the exchange for both the MIN
# and the filter.
# ---------------------------------------------------------------------------
@register(
    "q73_min_cost_supplier",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS u FROM lineitem
),
m AS (
  SELECT l_partkey, l_suppkey, u, MIN(u) OVER (PARTITION BY l_partkey) AS mu
  FROM unit
)
SELECT DISTINCT p_partkey, p_name, s_name, mu AS min_unit
FROM m
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE u = mu
""",
)
def q73_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    unit = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("u"),
    )
    w = Window.partitionBy("l_partkey")
    # u == mu is an exact double comparison: both engines compute the
    # identical IEEE quotient from identical inputs, so the min row
    # matches itself deterministically.
    m = unit.withColumn("mu", F.min("u").over(w)).filter(F.col("u") == F.col("mu"))
    return (
        m.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_partkey", "p_name", "s_name", F.col("mu").alias("min_unit")
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# q74 — suppliers above a global revenue-share threshold (TPC-H Q11
# shape: GROUP BY ... HAVING sum > fraction * (SELECT global total)).
# The threshold compare happens in exact integer units on the Spark
# side (functions/exact.py), so the cut is deterministic across engines.
# ---------------------------------------------------------------------------
@register(
    "q74_supplier_share",
    oracle="""
WITH sv AS (
  SELECT s_suppkey, s_name,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS val
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY s_suppkey, s_name
)
SELECT s_suppkey, s_name,
       CAST(ROUND(val, 2) AS DOUBLE) AS supplier_value
FROM sv
WHERE CAST(val AS DOUBLE) >
      (SELECT CAST(SUM(val) AS DOUBLE) FROM sv) / (SELECT COUNT(*) FROM sv)
""",
)
def q74_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sv = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.sum(_units(rev, 4)).alias("u"),
            dsum(rev, 4).alias("supplier_value"),
        )
    )
    # Global total/count via an empty-frame window: sv is
    # post-aggregation (|suppliers| rows), so collapsing it to one
    # partition is free relative to the fact-table scan above. The cut
    # is "above the mean supplier value" so it selects rows at
    # every scale factor (a fixed share threshold empties out as the
    # supplier count grows).
    w = Window.partitionBy()
    return (
        sv.withColumn("tot", F.sum("u").over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(
            F.col("u").cast("double") / 1e4
            > (F.col("tot") / 1e4) / F.col("cnt")
        )
        .select("s_suppkey", "s_name", "supplier_value")
    )


# ---------------------------------------------------------------------------
# q75 — priority line counts by line status (TPC-H Q12 shape: the
# testdata has no l_shipmode, so the pivot column is l_linestatus and
# the CASE classifies order priority). Conditional counts fold into one
# pass over the join — no per-branch scans.
# ---------------------------------------------------------------------------
@register(
    "q75_priority_counts",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
""",
)
def q75_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        # orders is fact-scale — shuffle join; AQE broadcasts only if small.
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q76 — small-quantity-order revenue (TPC-H Q17 shape): lineitems below
# half the average quantity for their part. The correlated AVG is a
# window over l_partkey — the comparison is exact because quantities
# are integral doubles (sum exact in IEEE up to 2^53).
# ---------------------------------------------------------------------------
@register(
    "q76_small_qty_revenue",
    oracle="""
WITH m AS (
  SELECT l_extendedprice, l_quantity,
         0.5 * AVG(l_quantity) OVER (PARTITION BY l_partkey) AS half_avg
  FROM lineitem
)
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) / 7.0, 2) AS DOUBLE)
         AS avg_yearly
FROM m WHERE l_quantity < half_avg
""",
)
def q76_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    m = li.withColumn("half_avg", 0.5 * F.avg("l_quantity").over(w))
    return (
        m.filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.sum(_units("l_extendedprice", 2)).alias("su"))
        .select(
            (F.round(F.col("su") / F.lit(7.0), 0) / F.lit(100.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )
