"""Scalar-function battery: string / date / math / JSON / array functions
(SURVEY.md §2.B "Scalar fns" rows; absent in the reference — §2.C).

All JVM-side built-ins (``pyspark.sql.functions``) — zero Python UDFs,
so the whole projection stays inside WholeStageCodegen. Cross-engine
type alignment with the DuckDB oracle is explicit: DuckDB returns
BIGINT from length()/year()/strpos() where Spark returns INT, so one
side is cast (documented per query).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q30 — string functions
# ---------------------------------------------------------------------------
@register(
    "q30_string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_name)                                   AS name_upper,
       LOWER(p_brand)                                  AS brand_lower,
       SUBSTRING(p_name, 1, 8)                         AS name_prefix,
       CAST(LENGTH(p_name) AS INTEGER)                 AS name_len,
       CONCAT(p_brand, ':', p_type)                    AS brand_type,
       REPLACE(p_type, ' ', '_')                       AS type_snake,
       CAST(STRPOS(p_type, 'AL') AS INTEGER)           AS al_pos,
       TRIM(CONCAT('  ', p_brand, '  '))               AS brand_trim
FROM part
WHERE p_name LIKE '%g%'
""",
)
def q30_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.filter(F.col("p_name").like("%g%")).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.instr(F.col("p_type"), "AL").alias("al_pos"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
    )


# ---------------------------------------------------------------------------
# q31 — date/time functions
# ---------------------------------------------------------------------------
@register(
    "q31_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate)    AS INTEGER) AS o_year,
       CAST(MONTH(o_orderdate)   AS INTEGER) AS o_month,
       CAST(DAY(o_orderdate)     AS INTEGER) AS o_day,
       CAST(QUARTER(o_orderdate) AS INTEGER) AS o_quarter,
       DATE_TRUNC('month', o_orderdate)      AS month_start,
       o_orderdate + INTERVAL 90 DAY         AS due_date,
       CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER) AS days_to_2002
FROM orders
WHERE o_orderkey % 10 = 0
""",
)
def q31_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(
            F.lit("2002-01-01 00:00:00").cast("timestamp"), F.col("o_orderdate")
        ).alias("days_to_2002"),
    )


# ---------------------------------------------------------------------------
# q32 — math functions (per-row doubles: IEEE-deterministic, no rounding
# needed except where noted)
# ---------------------------------------------------------------------------
@register(
    "q32_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_discount - 0.05)                    AS disc_dev,
       ROUND(l_extendedprice, 1)                 AS price_r1,
       CAST(FLOOR(l_quantity) AS BIGINT)         AS qty_floor,
       CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       POW(l_discount, 2)                        AS disc_sq,
       SQRT(l_quantity)                          AS qty_sqrt,
       ROUND(LN(l_extendedprice), 8)             AS price_ln,
       ROUND(LOG10(l_extendedprice), 8)          AS price_log10,
       CAST(l_orderkey % 7 AS BIGINT)            AS key_mod7
FROM lineitem
WHERE l_linenumber = 1 AND l_orderkey % 5 = 0
""",
)
def q32_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 5 == 0)).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.pow("l_discount", 2).alias("disc_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        # libm ln/log10 differ by 1 ulp across engines — round to 8dp
        F.round(F.log(F.col("l_extendedprice")), 8).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 8).alias("price_log10"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


# ---------------------------------------------------------------------------
# q33 — JSON extraction over events.props (a JSON string column)
# ---------------------------------------------------------------------------
@register(
    "q33_json_events",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY k_val
""",
)
def q33_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("int").alias("k_val"), "value"
        )
        .groupBy("k_val")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# q34 — array functions over embeddings (array<float> column)
# ---------------------------------------------------------------------------
@register(
    "q34_array_funcs",
    oracle="""
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(MIN(len(embedding)) AS INTEGER) AS min_dim,
       CAST(MAX(len(embedding)) AS INTEGER) AS max_dim,
       ROUND(AVG(CAST(embedding[1] AS DOUBLE)), 6) AS avg_first,
       ROUND(AVG(CAST(list_aggregate(embedding, 'max') AS DOUBLE)), 6) AS avg_max_elem
FROM embeddings
GROUP BY label
""",
)
def q34_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min(F.size("embedding")).alias("min_dim"),
        F.max(F.size("embedding")).alias("max_dim"),
        F.round(F.avg(F.element_at("embedding", 1).cast("double")), 6).alias("avg_first"),
        F.round(F.avg(F.array_max("embedding").cast("double")), 6).alias("avg_max_elem"),
    )


# ---------------------------------------------------------------------------
# q35 — explode / lateral view (first 4 vector elements to rows)
# ---------------------------------------------------------------------------
@register(
    "q35_explode",
    oracle="""
SELECT vec_id, 0 AS pos, embedding[1] AS val FROM embeddings WHERE vec_id < 5
UNION ALL
SELECT vec_id, 1 AS pos, embedding[2] AS val FROM embeddings WHERE vec_id < 5
UNION ALL
SELECT vec_id, 2 AS pos, embedding[3] AS val FROM embeddings WHERE vec_id < 5
UNION ALL
SELECT vec_id, 3 AS pos, embedding[4] AS val FROM embeddings WHERE vec_id < 5
""",
)
def q35_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    return (
        emb.select("vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "val"))
        # posexplode pos is INT like the oracle's literal; keep as-is
        .select("vec_id", "pos", "val")
    )


# ---------------------------------------------------------------------------
# q36 — map + higher-order functions (transform / filter / aggregate)
# ---------------------------------------------------------------------------
@register(
    "q36_higher_order",
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
       ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 6) AS sq_norm
FROM embeddings
WHERE vec_id < 50
""",
)
def q36_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sq_norm"),
    )
