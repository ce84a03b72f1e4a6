"""Event-stream analytics in batch form: tumbling/sliding windows,
sessionization, as-of enrichment (SURVEY.md §2.B "Streaming" rows —
batch-first; true Structured Streaming lives in
``icebergplus_spark.streaming``).

``F.window`` is the same operator Structured Streaming uses, so these
plans lift to ``readStream`` unchanged (watermark added).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from icebergplus_spark.operators.asof import asof_join
from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q40 — tumbling 1-hour window aggregation
# ---------------------------------------------------------------------------
@register(
    "q40_tumbling_window",
    oracle="""
SELECT DATE_TRUNC('hour', ts)                    AS wstart,
       DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR  AS wend,
       event_type,
       COUNT(*)                                  AS n_events,
       ROUND(SUM(value), 2)                      AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def q40_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# q41 — sliding window (1 hour long, every 30 minutes)
# Each event lands in exactly 2 windows; the oracle expands them by hand.
# ---------------------------------------------------------------------------
@register(
    "q41_sliding_window",
    oracle="""
WITH base AS (
  SELECT CASE WHEN EXTRACT(minute FROM ts) >= 30
              THEN DATE_TRUNC('hour', ts) + INTERVAL 30 MINUTE
              ELSE DATE_TRUNC('hour', ts) END AS b,
         value
  FROM events
),
expanded AS (
  SELECT b AS wstart, value FROM base
  UNION ALL
  SELECT b - INTERVAL 30 MINUTE AS wstart, value FROM base
)
SELECT wstart,
       wstart + INTERVAL 1 HOUR AS wend,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM expanded
GROUP BY wstart
""",
)
def q41_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# q42 — sessionization (gaps-and-islands, 30-minute inactivity gap)
# Batch equivalent of session_window; one shuffle on user_id.
# ---------------------------------------------------------------------------
@register(
    "q42_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS INTEGER) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       ROUND(SUM(value), 2) AS session_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def q42_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    gap_sec = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    flagged = ev.select(
        "user_id",
        "ts",
        "value",
        F.when(F.lag("ts").over(w).isNull() | (gap_sec > 1800.0), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wrun).cast("int")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


# ---------------------------------------------------------------------------
# q43 — as-of join: each event enriched with the user's latest order
# at-or-before the event time (custom operator, union-sort strategy).
# ---------------------------------------------------------------------------
@register(
    "q43_asof_join",
    oracle="""
SELECT event_id, user_id, ts, o_orderkey, o_orderdate
FROM (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) t
WHERE rn = 1
""",
)
def q43_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders")
    return asof_join(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
        how="inner",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")


# ---------------------------------------------------------------------------
# q72 — funnel analysis: users who view → click → purchase in order,
# each step within 24h of the previous (sequential pattern over streams)
# ---------------------------------------------------------------------------
@register(
    "q72_funnel",
    oracle="""
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
     funnel AS (
       SELECT DISTINCT v.user_id
       FROM v
       JOIN c ON c.user_id = v.user_id
              AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
       JOIN p ON p.user_id = v.user_id
              AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
     )
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST((SELECT COUNT(DISTINCT user_id) FROM v) AS BIGINT) AS n_viewers
FROM funnel
""",
)
def q72_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    day = F.expr("INTERVAL 24 HOURS")
    converted = (
        v.join(
            c,
            (F.col("cu") == F.col("vu"))
            & (F.col("cts") > F.col("vts"))
            & (F.col("cts") <= F.col("vts") + day),
        )
        .join(
            p,
            (F.col("pu") == F.col("vu"))
            & (F.col("pts") > F.col("cts"))
            & (F.col("pts") <= F.col("cts") + day),
        )
        .select(F.col("vu").alias("user_id"))
        .distinct()
    )
    n_viewers = v.select(F.col("vu")).distinct().count()
    return converted.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.lit(n_viewers).cast("long").alias("n_viewers"),
    )
