"""Dedup/text battery, round 2: CDC latest-per-key, edit-distance
near-dup scoring, and time-series gap filling over a generated spine.

``d09`` is the standard CDC compaction pattern (keep the newest row
per key); ``d10`` adds the classic edit-distance lens to the near-dup
family (token Jaccard d03, MinHash d04, SimHash d05, embedding d08);
``q83`` generates a date spine with ``sequence()`` and left-joins
actuals onto it — the canonical gap-filling shape for calendar-aligned
reporting at any scale (the spine is tiny; the join broadcasts it).
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
# d09 — latest row per key (CDC dedup): one row_number window over
# (user_id, ts desc) — the upsert-compaction read pattern. The
# tie-break chain (ts desc, event_id desc) is total, so both engines
# pick the same row.
# ---------------------------------------------------------------------------
@register(
    "d09_latest_per_key",
    oracle="""
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def d09_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# d10 — edit-distance near-dup scoring on adjacent doc pairs: the
# cheap-verify lens for candidate pairs (here the deterministic
# id-adjacent pairing the other dedup queries use). Levenshtein is
# O(len²) per pair — at 100 TB it runs ONLY on LSH candidates, never
# all pairs; truncating to a prefix bounds the per-pair cost.
# ---------------------------------------------------------------------------
@register(
    "d10_levenshtein_pairs",
    oracle="""
WITH p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         SUBSTRING(a.text, 1, 80) AS ta, SUBSTRING(b.text, 1, 80) AS tb
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
)
SELECT doc_a, doc_b,
       CAST(levenshtein(ta, tb) AS INTEGER) AS edit_dist,
       ROUND(1.0 - CAST(levenshtein(ta, tb) AS DOUBLE)
                   / GREATEST(LENGTH(ta), LENGTH(tb)), 6) AS similarity
FROM p
""",
)
def d10_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.substring("text", 1, 80).alias("ta"),
    )
    b = docs.select(
        (F.col("doc_id") - 1).alias("join_id"),
        F.col("doc_id").alias("doc_b"),
        F.substring("text", 1, 80).alias("tb"),
    )
    d = F.levenshtein("ta", "tb")
    return (
        a.join(b, F.col("join_id") == F.col("doc_a"))
        .select(
            "doc_a",
            "doc_b",
            d.alias("edit_dist"),
            F.round(
                1.0 - d.cast("double") / F.greatest(F.length("ta"), F.length("tb")),
                6,
            ).alias("similarity"),
        )
    )


# ---------------------------------------------------------------------------
# q83 — calendar gap filling: generate the full day spine with
# sequence() + explode, left-join daily revenue, zero-fill the gaps.
# The spine is O(days) rows → broadcast side; the actuals aggregate
# partial-reduces before the join, so the shape is scan + one shuffle.
# ---------------------------------------------------------------------------
@register(
    "q83_gap_fill_spine",
    oracle="""
WITH bounds AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS lo, CAST(MAX(o_orderdate) AS DATE) AS hi
  FROM orders
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS rev
  FROM orders GROUP BY day
)
SELECT CAST(spine.day AS TIMESTAMP) AS day,
       COALESCE(n_orders, 0) AS n_orders,
       CAST(ROUND(COALESCE(rev, 0), 2) AS DOUBLE) AS revenue
FROM spine LEFT JOIN daily ON spine.day = daily.day
""",
)
def q83_gap_fill_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("rev"),
        )
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("rev", F.lit(0.0)).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# d11 — time-window (debounce) dedup: drop an event arriving within 10
# minutes of the previous KEPT event of the same (user_id, event_type).
# A greedy chain-collapse would be iterative; the standard streaming-
# compatible approximation — and what production click-dedup actually
# ships — keys each event to its previous NEIGHBOR via LAG over one
# shuffle of (user, type). Deterministic, so both engines agree.
# ---------------------------------------------------------------------------
@register(
    "d11_window_dedup",
    oracle="""
WITH lagged AS (
  SELECT event_id, user_id, event_type, ts,
         LAG(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS prev_ts
  FROM events
)
SELECT event_id, user_id, event_type, ts
FROM lagged
WHERE prev_ts IS NULL OR ts >= prev_ts + INTERVAL 10 MINUTE
""",
)
def d11_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    lagged = ev.select("event_id", "user_id", "event_type", "ts").withColumn(
        "prev_ts", F.lag("ts").over(w)
    )
    return lagged.filter(
        F.col("prev_ts").isNull()
        | (F.col("ts") >= F.col("prev_ts") + F.expr("interval 10 minutes"))
    ).drop("prev_ts")
