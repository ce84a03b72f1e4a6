"""Product-analytics + format coverage, round 2: retention cohorts,
fixed-width histograms, an ORC round-trip, and TF-IDF term ranking.

Retention and histogram are the two canonical "events warehouse"
aggregation shapes not yet in the battery; ORC completes the columnar
source/sink matrix next to parquet/CSV/JSON; TF-IDF is the classic
two-pass (corpus stats + per-doc weights) text-scoring plan.
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q77 — retention cohort matrix: users bucketed by first-seen week,
# counted in each subsequent active week. Two aggregations over events
# (first-seen, distinct-active) joined on user_id — both partial-agg
# before the shuffle, and the join key is the natural events partition
# key, so at 100 TB this is one co-partitioned shuffle, not a fact×fact
# re-shuffle. Week truncation is ISO-Monday in both engines.
# ---------------------------------------------------------------------------
@register(
    "q77_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(DATE_TRUNC('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS act_week FROM events
)
SELECT cohort_week,
       CAST(DATEDIFF('day', cohort_week, act_week) / 7 AS INTEGER) AS week_n,
       COUNT(*) AS active_users
FROM firsts JOIN activity USING (user_id)
GROUP BY cohort_week, week_n
""",
)
def q77_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    firsts = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = ev.distinct().withColumnRenamed("wk", "act_week")
    return (
        firsts.join(activity, "user_id")
        .select(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7).cast("int").alias("week_n"),
        )
        .groupBy("cohort_week", "week_n")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


# ---------------------------------------------------------------------------
# q78 — fixed-width histogram of order line revenue: bucket =
# floor(price / width). Pure map-side expression + one partial-agg
# shuffle — the shape stays O(buckets) however large the fact table.
# Bucket boundaries are exact: prices are 2dp fixed-point, the width
# is integral, so the quotient only lands on an integer at exact
# multiples (where the double is exact too).
# ---------------------------------------------------------------------------
@register(
    "q78_histogram",
    oracle="""
SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS INTEGER) AS bucket,
       COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,2))), 2) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY bucket
""",
)
def q78_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.functions.exact import dsum

    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice", "l_quantity")
    return (
        li.select(
            F.floor(F.col("l_extendedprice") / 5000.0).cast("int").alias("bucket"),
            "l_quantity",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_quantity", 2).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# q79 — ORC source/sink round-trip (completes the format matrix:
# parquet native, CSV q52, JSON q53). ORC keeps types exactly, so
# floats may ride through — but we stay on the int/string subset for
# symmetry with the text-format queries.
# ---------------------------------------------------------------------------
@register(
    "q79_orc_roundtrip",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM customer
GROUP BY c_mktsegment
""",
)
def q79_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    path = tempfile.mkdtemp(prefix="orc_rt_") + "/customer_orc"
    cust.write.mode("overwrite").orc(path)
    back = spark.read.schema("c_custkey long, c_mktsegment string").orc(path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c_custkey").alias("key_sum")
    )


# ---------------------------------------------------------------------------
# t14 — TF-IDF top terms per document. Corpus pass: document frequency
# per term (distinct-explode + count). Doc pass: term frequency. The
# idf join broadcasts the term dictionary (vocabulary ≪ corpus at any
# scale — it grows sublinearly). Top-3 per doc via ranking window
# partitioned by doc_id; weight rounded to 6dp AFTER the rank cut so
# the rank order itself uses full-precision doubles in both engines.
# ---------------------------------------------------------------------------
@register(
    "t14_tfidf_top_terms",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS term
  FROM documents
),
n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks),
tf AS (SELECT doc_id, term, COUNT(*) AS f FROM toks GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS d FROM toks GROUP BY term),
w AS (
  SELECT tf.doc_id, tf.term,
         tf.f * LN(CAST((SELECT n FROM n_docs) AS DOUBLE) / d) AS wt
  FROM tf JOIN df ON tf.term = df.term
),
r AS (
  SELECT doc_id, term, wt,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wt DESC, term) AS rk
  FROM w
)
SELECT doc_id, term, ROUND(wt, 6) AS tfidf, CAST(rk AS INTEGER) AS rk
FROM r WHERE rk <= 3
""",
)
def t14_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    n_docs = docs.select("doc_id").distinct().count()
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("f"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("d"))
    w = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        (F.col("f") * F.log(F.lit(float(n_docs)) / F.col("d"))).alias("wt"),
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("wt").desc(), "term")
    )
    return (
        w.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", F.round("wt", 6).alias("tfidf"), "rk")
    )
