"""Fifth analytics battery: rolling distinct-count windows, ordered
value-window functions (nth_value family), and corpus token entropy
(SURVEY.md §2.B window/extension breadth — all absent in the reference,
which delegates query processing entirely; SURVEY.md §2.C).

Scale notes (100 TB): the rolling-distinct window partitions by
event_type and orders within the partition — one shuffle, state bounded
by the 1-hour frame; the leaderboard windows partition by nation key;
entropy is two chained partial-aggregations (token counts, then a
per-source fold) with no driver collection.
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
# q96 — rolling 1-hour distinct users per event type, one row per event.
# Spark has no COUNT(DISTINCT) window aggregate, so the idiomatic form is
# size(collect_set(...)) over a value-RANGE frame on epoch-microseconds —
# identical semantics to the oracle's RANGE INTERVAL frame (inclusive
# lower bound, peers-in-frame) because events.ts is µs-precision in both
# engines. Frame state is bounded by the hour, not the partition.
# ---------------------------------------------------------------------------
@register(
    "q96_rolling_distinct",
    oracle="""
SELECT event_id, event_type, ts,
       CAST(COUNT(DISTINCT user_id) OVER (
         PARTITION BY event_type ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS INTEGER) AS rolling_users
FROM events
""",
)
def q96_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-hour_us, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        F.size(F.collect_set("user_id").over(w)).alias("rolling_users"),
    )


# ---------------------------------------------------------------------------
# q97 — per-nation customer-balance leaderboard via ordered value-window
# functions: first_value / nth_value(2,3) / last_value over the full
# partition frame, collapsed to one row per nation. Fully ordered
# (acctbal DESC, custkey) so every engine agrees on ties.
# ---------------------------------------------------------------------------
@register(
    "q97_nth_value_leaderboard",
    oracle="""
WITH ranked AS (
  SELECT c_nationkey,
         ROW_NUMBER() OVER w AS rn,
         FIRST_VALUE(c_name) OVER wf AS top_cust,
         NTH_VALUE(c_name, 2) OVER wf AS second_cust,
         NTH_VALUE(c_name, 3) OVER wf AS third_cust,
         LAST_VALUE(c_name) OVER wf AS bottom_cust,
         ROUND(FIRST_VALUE(c_acctbal) OVER wf, 2) AS top_bal,
         ROUND(LAST_VALUE(c_acctbal) OVER wf, 2) AS bottom_bal
  FROM customer
  WINDOW
    w  AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
    wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT c_nationkey, top_cust, second_cust, third_cust, bottom_cust,
       top_bal, bottom_bal
FROM ranked WHERE rn = 1
""",
)
def q97_nth_value_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    order = [F.col("c_acctbal").desc(), F.col("c_custkey")]
    w = Window.partitionBy("c_nationkey").orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        cust.select(
            "c_nationkey",
            F.row_number().over(w).alias("rn"),
            F.first("c_name").over(wf).alias("top_cust"),
            F.nth_value("c_name", 2).over(wf).alias("second_cust"),
            F.nth_value("c_name", 3).over(wf).alias("third_cust"),
            F.last("c_name").over(wf).alias("bottom_cust"),
            F.round(F.first("c_acctbal").over(wf), 2).alias("top_bal"),
            F.round(F.last("c_acctbal").over(wf), 2).alias("bottom_bal"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# t19 — unigram Shannon entropy per corpus source: token count, type
# count (vocabulary), entropy in bits, and normalized entropy
# (H / log2(types) — a diversity score in [0,1] used for corpus-mix
# monitoring in LLM data pipelines). Two partial aggregations; the
# token-count groupBy is the only wide shuffle and map-side combines.
# ---------------------------------------------------------------------------
@register(
    "t19_token_entropy",
    oracle="""
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS w
  FROM documents
),
cnt AS (
  SELECT source, w, COUNT(*) AS c
  FROM tok WHERE w <> ''
  GROUP BY source, w
),
tot AS (
  SELECT source, SUM(c) AS t, COUNT(*) AS types
  FROM cnt GROUP BY source
)
SELECT cnt.source,
       CAST(t AS BIGINT) AS n_tokens,
       CAST(types AS BIGINT) AS n_types,
       ROUND(-SUM((c * 1.0 / t) * LOG2(c * 1.0 / t)), 2) AS entropy_bits,
       ROUND(-SUM((c * 1.0 / t) * LOG2(c * 1.0 / t)) / LOG2(types), 3)
         AS norm_entropy
FROM cnt JOIN tot ON cnt.source = tot.source
GROUP BY cnt.source, t, types
""",
)
def t19_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    cnt = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = Window.partitionBy("source")
    p = F.col("c") / F.sum("c").over(tot)
    plogp = cnt.select(
        "source", "c", (p * F.log2(p)).alias("plogp")
    )
    return plogp.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(-F.sum("plogp"), 2).alias("entropy_bits"),
        F.round(-F.sum("plogp") / F.log2(F.count(F.lit(1))), 3).alias(
            "norm_entropy"
        ),
    )
