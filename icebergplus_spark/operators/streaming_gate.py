"""Structured Streaming under the driver's hash-check oracle gate.

Every streaming feature is pytest-verified (tests/test_streaming.py);
q116 additionally puts an actual micro-batched streaming run under the
driver gate: the events table is re-served as a 3-file stream, consumed
with maxFilesPerTrigger=1 (so the window state really is built up
across multiple triggers), aggregated with a tumbling window in
complete output mode, and the FINAL emitted table must hash-match the
batch oracle — Structured Streaming's core guarantee (a streaming query
is incrementally the same computation as the batch query) made
falsifiable by the driver.

Complete mode is what makes the gate exact: in append mode the
watermark legitimately holds back tail windows, so the emitted set is
a prefix of the batch result; complete mode emits every window after
the last trigger.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


_CHUNK_BOUNDS = [
    (None, "2024-01-11"),
    ("2024-01-11", "2024-01-21"),
    ("2024-01-21", None),
]


def _serve_as_stream(ev: DataFrame, prefix: str) -> str:
    """Re-serve a batch events frame as a directory of 3 time-ordered
    parquet files (arrival order ~ event time, like a real feed), for
    consumption with maxFilesPerTrigger=1. Returns the stream dir."""
    root = tempfile.mkdtemp(prefix=prefix)
    flat = os.path.join(root, "in")
    os.makedirs(flat)
    n = 0
    for i, (lo, hi) in enumerate(_CHUNK_BOUNDS):
        chunk = ev
        if lo:
            chunk = chunk.filter(F.col("ts") >= lo)
        if hi:
            chunk = chunk.filter(F.col("ts") < hi)
        d = os.path.join(root, f"c{i}")
        chunk.coalesce(1).write.parquet(d)
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                os.link(os.path.join(d, f), os.path.join(flat, f"{n:03d}.parquet"))
                n += 1
    return flat


@register(
    "q116_stream_tumbling_gate",
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
def q116_stream_tumbling_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.streaming.pipelines import read_events_stream

    prepare_session(spark)
    ev = load_table(spark, sf_dir, "events")

    # Re-serve the table as a stream of 3 time-ordered files so the
    # windowed state genuinely accretes across micro-batches.
    flat = _serve_as_stream(ev, "stream_gate_")
    stream = read_events_stream(spark, flat, max_files_per_trigger=1)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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
    name = f"q116_gate_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.lastProgress is None or q.lastProgress["batchId"] >= 1, (
        "stream collapsed to a single batch — the gate must exercise "
        "multi-trigger state accretion"
    )
    # Materialize off the transient memory view so the returned frame
    # outlives the sink registration.
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


@register(
    "q117_stream_lake_sink_gate",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY event_type
""",
)
def q117_stream_lake_sink_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full streaming ingestion loop under the driver gate: events
    re-served as a 3-file stream → exactly-once lake sink (one snapshot
    per micro-batch, batch-id watermark in the snapshot summary) → lake
    scan. The oracle aggregates the raw table, so a hash match proves
    the stream landed every row exactly once — no replay dupes, no
    dropped batch — through the same commit machinery a 100 TB
    streaming ingest would use (tests/test_streaming.py additionally
    wipes the checkpoint to force replays)."""
    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.streaming.pipelines import (
        read_events_stream,
        stream_to_lake,
    )

    prepare_session(spark)
    ev = load_table(spark, sf_dir, "events")

    stream_dir = _serve_as_stream(ev, "stream_lake_gate_")
    root = tempfile.mkdtemp(prefix="stream_lake_wh_")
    cat = LocalLakeCatalog(spark, os.path.join(root, "wh")).start()
    t = cat.create_table("bench.events_ingest", ev.schema)
    stream = read_events_stream(spark, stream_dir, max_files_per_trigger=1)
    q = stream_to_lake(stream, t, os.path.join(root, "ckpt"))
    q.awaitTermination(300)
    t = t.refresh()
    # one snapshot per non-empty micro-batch — the stream really was
    # micro-batched, not collapsed
    assert len(t.history()) >= 2, "expected multiple streaming commits"
    return (
        t.scan()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "q124_stream_session_gate",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         -- Strict > : verified empirically — Spark's session_window
         -- MERGES an event arriving at exactly last + gap (closed
         -- boundary), same as q42's batch convention, so the oracle
         -- starts a new session only strictly past the gap.
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         -- same (ts, event_id) total order as window w above: with a
         -- tied boundary timestamp the running sum must see the
         -- new_session flag in the order the flag was computed, else
         -- the tied twin can land in the previous session.
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS INTEGER) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS session_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def q124_stream_session_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SESSION WINDOWS under the driver gate: the events
    stream (3 files, maxFilesPerTrigger=1 — sessions must merge across
    micro-batches as late chunks arrive) aggregated with
    session_window(gap=30min) in complete mode; the final table must
    hash-match the batch sessionization oracle (q42's CTE reshaped to
    Spark's session bounds: window.end = last event + gap). Session
    state merging across triggers is exactly the stateful machinery a
    100 TB clickstream pipeline leans on."""
    from icebergplus_spark.streaming.pipelines import read_events_stream

    prepare_session(spark)
    ev = load_table(spark, sf_dir, "events")

    flat = _serve_as_stream(ev, "stream_sess_")
    stream = read_events_stream(spark, flat, max_files_per_trigger=1)
    agg = (
        stream.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
    name = f"q124_gate_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


# ---------------------------------------------------------------------------
# q150 — STREAMING continuous aggregate under the gate: events re-served
# as a 3-file stream → exactly-once lake sink WITH per-micro-batch MV
# refresh (stream_to_lake_with_mv_refresh) → the MATERIALIZED VIEW is
# the gated read. The oracle aggregates the raw events from scratch, so
# a hash match proves the incremental per-batch refreshes converged to
# the exact recompute through the streaming path — the generalized MV
# (q149) and the streaming machinery (q117) composed, driver-visibly.
# ---------------------------------------------------------------------------
@register(
    "q150_stream_mv_freshness",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS bucket,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sv
FROM events
GROUP BY 1, 2
""",
)
def q150_stream_mv_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.rollup import create_materialized_aggregate
    from icebergplus_spark.streaming.pipelines import (
        read_events_stream,
        stream_to_lake_with_mv_refresh,
    )

    prepare_session(spark)
    ev = load_table(spark, sf_dir, "events")
    stream_dir = _serve_as_stream(ev, "stream_mv_gate_")
    root = tempfile.mkdtemp(prefix="stream_mv_wh_")
    cat = LocalLakeCatalog(spark, os.path.join(root, "wh")).start()
    cat.create_table("bench.events_mv_src", ev.schema)
    create_materialized_aggregate(
        cat,
        "bench.events_hourly",
        "bench.events_mv_src",
        {
            "time_col": "ts",
            "window": "hour",
            "group_cols": ["event_type"],
            "aggs": [("n", "count(*)"), ("sv", "round(sum(value), 2)")],
        },
    )
    stream = read_events_stream(spark, stream_dir, max_files_per_trigger=1)
    q = stream_to_lake_with_mv_refresh(
        stream, cat, "bench.events_mv_src", os.path.join(root, "ckpt")
    )
    q.awaitTermination(300)
    src = cat.load_table("bench.events_mv_src")
    assert len(src.history()) >= 2, "expected multiple streaming commits"
    return (
        cat.load_table("bench.events_hourly")
        .scan()
        .select("bucket", "event_type", "n", "sv")
    )
