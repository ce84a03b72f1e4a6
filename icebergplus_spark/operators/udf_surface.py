"""UDF surface demonstrations (SURVEY.md §2.B "UDF surface"):
grouped-map ``applyInPandas``, Python UDTF, Arrow-optimized scalar UDF,
and approximate distinct-count. Kept OUT of hot paths elsewhere — these
queries exist to prove the full extension surface works, each with the
strictest oracle the semantics allow.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q54 — grouped-map applyInPandas: per-nation z-score normalization.
# Oracle: the same math as window functions — proves the pandas path
# computes exactly what the declarative plan would.
# ---------------------------------------------------------------------------
@register(
    "q54_grouped_pandas_zscore",
    oracle="""
SELECT c_custkey, c_nationkey,
       ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey))
             / STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_nationkey), 6) AS bal_z
FROM customer
""",
)
def q54_grouped_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        z = (bal - bal.mean()) / bal.std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "bal_z": z.round(6),
            }
        )

    return cust.groupBy("c_nationkey").applyInPandas(
        zscore, schema="c_custkey long, c_nationkey int, bal_z double"
    )


# ---------------------------------------------------------------------------
# q55 — Python UDTF: explode each order into priority-class rows
# ---------------------------------------------------------------------------
@register(
    "q55_udtf_expand",
    oracle="""
SELECT o_orderkey, 'priority' AS attr, o_orderpriority AS val FROM orders WHERE o_orderkey % 100 = 0
UNION ALL
SELECT o_orderkey, 'status' AS attr, o_orderstatus AS val FROM orders WHERE o_orderkey % 100 = 0
""",
)
def q55_udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, attr string, val string")
    class Unpivot:
        def eval(self, o_orderkey: int, o_orderpriority: str, o_orderstatus: str):
            yield o_orderkey, "priority", o_orderpriority
            yield o_orderkey, "status", o_orderstatus

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    orders.createOrReplaceTempView("_udtf_orders")
    spark.udtf.register("unpivot_orders", Unpivot)
    return spark.sql(
        """
        SELECT t.o_orderkey, t.attr, t.val
        FROM _udtf_orders o,
             LATERAL unpivot_orders(o.o_orderkey, o.o_orderpriority, o.o_orderstatus) t
        """
    )


# ---------------------------------------------------------------------------
# q56 — Arrow-optimized scalar Python UDF (useArrow): deterministic
# string normalization
# ---------------------------------------------------------------------------
@register(
    "q56_arrow_udf",
    oracle="""
SELECT p_partkey,
       CONCAT(UPPER(SUBSTRING(p_name, 1, 1)), SUBSTRING(p_name, 2)) AS name_title
FROM part
WHERE p_partkey % 3 = 0
""",
)
def q56_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(returnType="string", useArrow=True)
    def title_first(s: str) -> str:
        return s[:1].upper() + s[1:] if s else s

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 3 == 0)
    return part.select("p_partkey", title_first("p_name").alias("name_title"))


# ---------------------------------------------------------------------------
# q57 — approximate distinct count (HLL++). Approximation ≠ oracle-
# hashable → rows-only check here; tests assert ≤5% error vs exact.
# ---------------------------------------------------------------------------
@register(
    "q57_approx_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS approx_within_10pct
FROM lineitem
GROUP BY l_returnflag
""",
)
def q57_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approx distinct, made hash-checkable: the sketch value
    itself is engine-specific, so the gated columns are the exact count
    plus a boolean asserting the sketch landed within 10% relative
    error (default rsd 5%). A broken sketch flips the boolean and the
    driver hash catches it; the raw approx value stays pytest-covered."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey")
                - F.countDistinct("l_partkey")
            )
            <= 0.10 * F.countDistinct("l_partkey")
        ).alias("approx_within_10pct"),
    )


# ---------------------------------------------------------------------------
# q59 — approximate percentile sketch. The sketch value is
# engine-specific, so the gate carries the exact percentiles plus
# booleans asserting the sketch landed within 1% relative error — a
# broken sketch flips a boolean and the driver hash catches it.
# ---------------------------------------------------------------------------
@register(
    "q59_approx_percentile",
    oracle="""
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS exact_median,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 4) AS exact_p99,
       TRUE AS median_within_1pct,
       TRUE AS p99_within_1pct
FROM lineitem
GROUP BY l_returnflag
""",
)
def q59_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    exact_median = F.percentile("l_extendedprice", F.lit(0.5))
    exact_p99 = F.percentile("l_extendedprice", F.lit(0.99))
    approx_median = F.percentile_approx("l_extendedprice", 0.5, 10000)
    approx_p99 = F.percentile_approx("l_extendedprice", 0.99, 10000)
    return li.groupBy("l_returnflag").agg(
        F.round(exact_median, 4).alias("exact_median"),
        F.round(exact_p99, 4).alias("exact_p99"),
        (F.abs(approx_median - exact_median) <= 0.01 * exact_median).alias(
            "median_within_1pct"
        ),
        (F.abs(approx_p99 - exact_p99) <= 0.01 * exact_p99).alias(
            "p99_within_1pct"
        ),
    )
