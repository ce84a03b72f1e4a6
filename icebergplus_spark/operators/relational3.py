"""Third relational battery: distribution window functions, pattern
matching, unpivot, correlated scalar subqueries, keep-best dedup
(SURVEY.md §2.B breadth).
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
# q26 — distribution windows: percent_rank / cume_dist
# ---------------------------------------------------------------------------
@register(
    "q26_percent_rank",
    oracle="""
SELECT c_custkey, c_nationkey,
       ROUND(PERCENT_RANK() OVER w, 8) AS bal_pct_rank,
       ROUND(CUME_DIST()    OVER w, 8) AS bal_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""",
)
def q26_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 8).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("bal_cume_dist"),
    )


# ---------------------------------------------------------------------------
# q37 — pattern-matching battery: LIKE / NOT LIKE / ILIKE / regexp
# ---------------------------------------------------------------------------
@register(
    "q37_pattern_match",
    oracle="""
SELECT
  COUNT(CASE WHEN p_name LIKE 'small%' THEN 1 END)          AS n_small_prefix,
  COUNT(CASE WHEN p_name NOT LIKE '%o%' THEN 1 END)         AS n_no_o,
  COUNT(CASE WHEN p_name ILIKE '%GEAR%' THEN 1 END)         AS n_gear_ci,
  COUNT(CASE WHEN p_name LIKE '%\\_%' ESCAPE '\\' THEN 1 END) AS n_underscore,
  COUNT(CASE WHEN regexp_matches(p_name, '^(red|blue) ')
             THEN 1 END)                                    AS n_color_regex
FROM part
""",
)
def q37_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.agg(
        F.count(F.when(F.col("p_name").like("small%"), 1)).alias("n_small_prefix"),
        F.count(F.when(~F.col("p_name").like("%o%"), 1)).alias("n_no_o"),
        F.count(F.when(F.col("p_name").ilike("%GEAR%"), 1)).alias("n_gear_ci"),
        F.count(F.when(F.col("p_name").like(r"%\_%"), 1)).alias("n_underscore"),
        F.count(F.when(F.col("p_name").rlike("^(red|blue) "), 1)).alias("n_color_regex"),
    )


# ---------------------------------------------------------------------------
# q38 — unpivot / melt (wide → long)
# ---------------------------------------------------------------------------
@register(
    "q38_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
FROM lineitem WHERE l_orderkey % 500 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount' AS measure, l_discount AS val
FROM lineitem WHERE l_orderkey % 500 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax' AS measure, l_tax AS val
FROM lineitem WHERE l_orderkey % 500 = 0
""",
)
def q38_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    ).withColumn("measure", F.expr("substring(measure, 3)"))  # l_quantity→quantity


# ---------------------------------------------------------------------------
# q68 — correlated scalar subquery: each order vs its customer's max
# ---------------------------------------------------------------------------
@register(
    "q68_correlated_scalar",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(o_totalprice = (
         SELECT MAX(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
       ) AS BOOLEAN) AS is_biggest_order
FROM orders o
WHERE o_orderkey % 20 = 0
""",
)
def q68_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    per_cust_max = orders.groupBy(F.col("o_custkey").alias("mc_custkey")).agg(
        F.max("o_totalprice").alias("max_price")
    )
    return (
        orders.filter(F.col("o_orderkey") % 20 == 0)
        # per_cust_max is customer-scale (grows with SF) — no broadcast hint.
        .join(per_cust_max, F.col("o_custkey") == F.col("mc_custkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            (F.col("o_totalprice") == F.col("max_price")).alias("is_biggest_order"),
        )
    )


# ---------------------------------------------------------------------------
# d06 — keep-best dedup policy: one survivor per fingerprint, chosen by
# quality (longest text, doc_id tiebreak) — the policy layer over d02
# ---------------------------------------------------------------------------
@register(
    "d06_keep_best_dedup",
    oracle="""
SELECT fingerprint, doc_id AS keeper_id, n_chars AS keeper_chars
FROM (
  SELECT md5(LOWER(TRIM(text))) AS fingerprint, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY md5(LOWER(TRIM(text)))
           ORDER BY n_chars DESC, doc_id
         ) AS rn
  FROM documents
) t
WHERE rn = 1
""",
)
def d06_keep_best_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("fingerprint").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        docs.select(
            F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
            "doc_id",
            "n_chars",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "fingerprint",
            F.col("doc_id").alias("keeper_id"),
            F.col("n_chars").alias("keeper_chars"),
        )
    )


# ---------------------------------------------------------------------------
# q69 — NOT IN subquery (three-valued-logic semantics: any NULL in the
# subquery empties the result; here the key is non-null so it's the
# plain anti-join — the semantics both engines must agree on)
# ---------------------------------------------------------------------------
@register(
    "q69_not_in_subquery",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders
  WHERE o_totalprice > 150000
)
GROUP BY c_mktsegment
""",
)
def q69_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big_buyers = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select("o_custkey")
    )
    return (
        cust.join(big_buyers, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# q70 — multi-EXISTS self-join (TPC-H Q21 shape): suppliers with a
# "late" line in a multi-supplier order where NO other supplier was late
# ---------------------------------------------------------------------------
@register(
    "q70_multi_exists",
    oracle="""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN late l1 ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
""",
)
def q70_multi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    late = (
        # orders is fact-scale — shuffle join on the order key; no hint.
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.select(F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("skey"))
    # EXISTS other-supplier line in the same order
    other_line = li.select(
        F.col("l_orderkey").alias("e_okey"), F.col("l_suppkey").alias("e_skey")
    )
    has_other = l1.join(
        other_line,
        (F.col("okey") == F.col("e_okey")) & (F.col("skey") != F.col("e_skey")),
        "left_semi",
    )
    # NOT EXISTS other-supplier LATE line in the same order
    other_late = late.select(
        F.col("l_orderkey").alias("a_okey"), F.col("l_suppkey").alias("a_skey")
    )
    only_late = has_other.join(
        other_late,
        (F.col("okey") == F.col("a_okey")) & (F.col("skey") != F.col("a_skey")),
        "left_anti",
    )
    return (
        only_late.join(F.broadcast(supp), F.col("skey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q27 — explicit GROUPING SETS with grouping() disambiguation
# (rollup/cube are q11/q12; this is the general form)
# ---------------------------------------------------------------------------
@register(
    "q27_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER)  AS g_rf,
       CAST(GROUPING(l_linestatus) AS INTEGER)  AS g_ls,
       COUNT(*) AS n_lines,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def q27_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    # Spark SQL GROUPING SETS — the DataFrame API has no direct form
    return li.sparkSession.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS n_lines,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )
