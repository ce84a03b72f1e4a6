"""Window-function operator battery: ranking, analytic, frames
(SURVEY.md §2.B "Window" rows; absent in the reference — §2.C).

Determinism: every window ORDER BY ends in a unique key (orderkey /
custkey) so ranking functions are total-ordered — ties would otherwise
make row_number nondeterministic and break the oracle hash.

Scale notes: a window partitioned by a key is one shuffle on that key;
frames are computed streaming within each partition (no materialized
cross product). Skewed partition keys (one giant customer) are the
100 TB risk — AQE skew handling does not apply inside windows, so keys
here are chosen to be naturally bounded (orders per customer).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q20 — top-k per group via row_number (ranking window)
# ---------------------------------------------------------------------------
@register(
    "q20_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS INTEGER) AS rn
  FROM orders
) t
WHERE rn <= 3
""",
)
def q20_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# q21 — running total (cumulative frame) + lag
# ---------------------------------------------------------------------------
@register(
    "q21_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 2) AS running_spend,
       LAG(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS prev_price
FROM orders
""",
)
def q21_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


# ---------------------------------------------------------------------------
# q22 — lag/lead deltas over an event stream (batch analytic form)
# ---------------------------------------------------------------------------
@register(
    "q22_lag_lead_events",
    oracle="""
SELECT user_id, event_id,
       value - LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_prev,
       LEAD(event_type)    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
""",
)
def q22_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# ---------------------------------------------------------------------------
# q23 — rank / dense_rank / ntile
# ---------------------------------------------------------------------------
@register(
    "q23_rank_ntile",
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(RANK()       OVER w AS INTEGER) AS bal_rank,
       CAST(DENSE_RANK() OVER w AS INTEGER) AS bal_dense_rank,
       CAST(NTILE(4)     OVER w AS INTEGER) AS bal_quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""",
)
def q23_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


# ---------------------------------------------------------------------------
# q24 — sliding ROWS frame (centered moving average)
# ---------------------------------------------------------------------------
@register(
    "q24_moving_avg",
    oracle="""
SELECT c_nationkey, c_custkey,
       ROUND(AVG(c_acctbal) OVER (
         PARTITION BY c_nationkey
         ORDER BY c_custkey
         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
       ), 4) AS mov_avg_bal,
       CAST(COUNT(*) OVER (
         PARTITION BY c_nationkey
         ORDER BY c_custkey
         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
       ) AS BIGINT) AS frame_n
FROM customer
""",
)
def q24_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey").rowsBetween(-2, 2)
    return cust.select(
        "c_nationkey",
        "c_custkey",
        F.round(F.avg("c_acctbal").over(w), 4).alias("mov_avg_bal"),
        F.count(F.lit(1)).over(w).alias("frame_n"),
    )


# ---------------------------------------------------------------------------
# q25 — first/last value over frame (per-nation extremes carried on rows)
# ---------------------------------------------------------------------------
@register(
    "q25_first_last",
    oracle="""
SELECT c_custkey, c_nationkey,
       FIRST_VALUE(c_name) OVER w AS richest_name,
       LAST_VALUE(c_name)  OVER w AS poorest_name
FROM customer
WINDOW w AS (
  PARTITION BY c_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
""",
)
def q25_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.first("c_name").over(w).alias("richest_name"),
        F.last("c_name").over(w).alias("poorest_name"),
    )


# ---------------------------------------------------------------------------
# q28 — RANGE frame (value-based window): sum of balances within 1000
# of each customer's balance, per nation
# ---------------------------------------------------------------------------
@register(
    "q28_range_frame",
    oracle="""
SELECT c_custkey, c_nationkey,
       ROUND(SUM(c_acctbal) OVER (
         PARTITION BY c_nationkey
         ORDER BY c_acctbal
         RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
       ), 2) AS near_bal_sum,
       CAST(COUNT(*) OVER (
         PARTITION BY c_nationkey
         ORDER BY c_acctbal
         RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS near_bal_n
FROM customer
""",
)
def q28_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal")
        .rangeBetween(-1000, Window.currentRow)
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.sum("c_acctbal").over(w), 2).alias("near_bal_sum"),
        F.count(F.lit(1)).over(w).alias("near_bal_n"),
    )


# ---------------------------------------------------------------------------
# q99 — IGNORE NULLS forward fill (last observation carried forward):
# per user, every event carries the most recent purchase price. The
# canonical time-series gap-fill; one window pass, shuffle on user_id
# only. The oracle uses DuckDB's in-parens IGNORE NULLS spelling (the
# one syntax point where the engines' SQL dialects differ).
# ---------------------------------------------------------------------------
@register(
    "q99_ignore_nulls_fill",
    oracle="""
WITH f AS (
  SELECT user_id,
         last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(COUNT(filled) AS BIGINT) AS n_filled,
       CAST(COUNT(DISTINCT filled) AS BIGINT) AS n_price_levels
FROM f GROUP BY user_id
""",
)
def q99_ignore_nulls_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_price = F.when(F.col("event_type") == "purchase", F.col("value"))
    filled = F.last(purchase_price, ignorenulls=True).over(w)
    return (
        ev.select("user_id", filled.alias("filled"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("filled").alias("n_filled"),
            F.countDistinct("filled").alias("n_price_levels"),
        )
    )
