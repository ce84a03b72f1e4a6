"""Structured Streaming pipelines (SURVEY.md §2.B "Streaming" rows,
extension phase §7 step 6).

Each builder takes an events-shaped streaming DataFrame (event_id, ts,
user_id, event_type, value, props) and returns a transformed streaming
DataFrame — the SAME declarative ops as the batch versions in
``operators/events_ops.py`` (q40-q42), lifted to ``readStream`` with
watermarks for state cleanup.

Scale notes: watermarks bound the state store (without one, windowed
state grows forever at 100 TB/day event rates); ``stream_to_lake``
commits each micro-batch as one lake snapshot, giving exactly-once
table-level visibility via the snapshot log + Spark's checkpoint.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import StructType

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, schema: StructType | str = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of events parquet files."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums with late-data handling (streaming
    twin of q40_tumbling_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
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


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window aggregation (streaming twin of q41)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
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


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (streaming twin of q42's gaps-and-islands;
    ``session_window`` keeps per-user state until the gap closes)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
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


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming face of d01/d02 (state bounded by the watermark)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def _sink_id(checkpoint_dir: str) -> str:
    """Stable sink identity: the checkpoint location IS Spark's unit of
    replay, so it keys the batch-id watermark across restarts."""
    import os

    return os.path.realpath(checkpoint_dir)


def _last_committed_batch(table, sink_id: str) -> int:
    """Highest streaming batch id this sink has already committed,
    read from the snapshot summaries (-1 if none). foreachBatch is
    at-least-once: a crash between the lake commit and Spark's
    checkpoint write REPLAYS the batch, so sinks must skip batch ids
    at or below this watermark — the same (queryId, epochId) dedup
    Iceberg's Spark sink performs to turn at-least-once delivery into
    exactly-once table state."""
    last = -1
    for s in table._meta.get("snapshots", []):
        summ = s.get("summary") or {}
        if summ.get("streaming-sink-id") == sink_id:
            last = max(last, int(summ.get("streaming-batch-id", -1)))
    return last


def stream_to_lake(stream: DataFrame, table, checkpoint_dir: str, query_name: str = "to_lake"):
    """Sink a stream into a LakeTable: one append-commit (snapshot) per
    micro-batch via foreachBatch, idempotent under batch replay (the
    snapshot records the sink's batch id; replayed batches are skipped).
    Returns the StreamingQuery."""
    sid = _sink_id(checkpoint_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.refresh()
        if batch_id <= _last_committed_batch(table, sid):
            return  # replayed batch — already committed, exactly-once
        table.append(
            batch_df,
            extra_summary={"streaming-sink-id": sid, "streaming-batch-id": batch_id},
        )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_upsert_to_lake(
    stream: DataFrame,
    table,
    key: str,
    checkpoint_dir: str,
    query_name: str = "upsert_to_lake",
):
    """CDC-upsert sink: per micro-batch, tombstone the incoming keys with
    a merge-on-read EQUALITY delete, then append the new rows — the
    streaming upsert pattern Iceberg v2 delete files exist for. Write
    cost per batch is O(batch), never O(table) (the copy-on-write
    ``table.merge`` rewrite this replaces touches every file whose key
    range intersects the batch). Latest-row-per-key semantics inside a
    batch are resolved by max event order before the write.

    Each batch commits ONE atomic snapshot (``LakeTable.upsert``): the
    equality-delete manifest and the appended-rows manifest land in the
    same pointer swap, so readers never observe a key deleted but not
    yet re-inserted. Replayed batches (at-least-once foreachBatch) are
    skipped via the snapshot-recorded batch-id watermark. Upserts are
    value-idempotent anyway (same keys, same rows), so the skip guards
    commit-log cleanliness more than correctness here — but it keeps
    the snapshot count equal to the batch count.
    """
    from pyspark.sql import functions as _F

    sid = _sink_id(checkpoint_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.refresh()
        if batch_id <= _last_committed_batch(table, sid):
            return  # replayed batch — already committed
        # collapse to the last row per key within the batch (by ts if
        # present, else arbitrary-but-deterministic max struct order)
        order = [c for c in ("ts",) if c in batch_df.columns]
        latest = (
            batch_df.withColumn(
                "__rn",
                _F.row_number().over(
                    Window.partitionBy(key).orderBy(
                        *([_F.col(c).desc() for c in order] or [_F.lit(1)])
                    )
                ),
            )
            .filter(_F.col("__rn") == 1)
            .drop("__rn")
        )
        # single ATOMIC snapshot: equality tombstone + appended rows
        # commit together, so readers never observe the
        # deleted-but-not-reinserted window
        table.upsert(
            latest,
            key,
            extra_summary={"streaming-sink-id": sid, "streaming-batch-id": batch_id},
        )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "1 hour",
    join_window_minutes: int = 30,
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each left event with
    right events of the SAME USER within ±``join_window_minutes``.

    Both sides are watermarked and the join condition bounds event-time
    distance, so Spark can expire buffered state — the required shape
    for an unbounded stream-stream join (state is O(events within the
    window horizon), never O(stream)).
    """
    l = left.withWatermark("ts", watermark).select(
        F.col("event_id").alias("l_event_id"),
        F.col("user_id").alias("l_user_id"),
        F.col("ts").alias("l_ts"),
        F.col("event_type").alias("l_type"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("event_id").alias("r_event_id"),
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_type").alias("r_type"),
    )
    bound = F.expr(
        f"r_ts BETWEEN l_ts - INTERVAL {join_window_minutes} MINUTES "
        f"AND l_ts + INTERVAL {join_window_minutes} MINUTES"
    )
    return l.join(
        r,
        (F.col("l_user_id") == F.col("r_user_id"))
        & (F.col("l_event_id") < F.col("r_event_id"))
        & bound,
        "inner",
    )


def stream_replicate_lake(
    spark,
    source_table_dir: str,
    replica,
    checkpoint_dir: str,
    from_snapshot_id: int = 0,
    query_name: str = "replicate_lake",
):
    """Continuous lake→lake CDC replication: consume the source table's
    change stream (``read_lake_cdc_stream``) and apply it to ``replica``
    so the replica converges to the source's row state — across appends,
    merge-on-read tombstones, and copy-on-write rewrites alike.

    Per micro-batch the insert/delete rows are NETTED first (a row both
    deleted and re-inserted inside the batch window — e.g. the two
    halves of an UPDATE, or CoW rewrite noise — cancels), then net
    deletes are applied as one all-column equality tombstone and net
    inserts as one append: O(changed rows) per batch, never O(table).
    Restarts resume from the checkpointed snapshot offset, giving
    exactly-once application per commit.

    Net deletes use equality semantics over ALL columns — full-duplicate
    rows in the replica collapse when one copy is deleted (document-key
    workloads are unaffected; multiset-exact replication would thread
    the source row position through instead)."""
    from icebergplus_spark.streaming.lake_source import read_lake_cdc_stream

    changes = read_lake_cdc_stream(
        spark, source_table_dir, from_snapshot_id=from_snapshot_id
    )
    data_cols = [
        c for c in changes.columns if c not in ("_change_type", "_commit_snapshot_id")
    ]

    sid = _sink_id(checkpoint_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        replica.refresh()
        if batch_id <= _last_committed_batch(replica, sid):
            return  # replayed batch — already fully applied
        ins = batch_df.filter(F.col("_change_type") == "insert").select(*data_cols)
        dels = batch_df.filter(F.col("_change_type") == "delete").select(*data_cols)
        net_ins = ins.exceptAll(dels)
        net_dels = dels.exceptAll(ins).dropDuplicates()
        # The batch-id marker rides the LAST commit of the batch: a
        # crash between the delete and the append replays both, but
        # re-deleting the same key values is a no-op, so replay
        # converges; once the final commit lands, the whole batch is
        # skipped on replay.
        has_dels = replica.snapshot() is not None and not net_dels.isEmpty()
        has_ins = not net_ins.isEmpty()
        marker = {"streaming-sink-id": sid, "streaming-batch-id": batch_id}
        if has_dels:
            replica.delete_by_key(net_dels, extra_summary=None if has_ins else marker)
        if has_ins:
            replica.append(net_ins, extra_summary=marker)

    return (
        changes.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def _fanout_batch(catalog, routes, sid, batch_df, batch_id) -> None:
    """One fan-out micro-batch (module-level so the replay/route-change
    semantics are directly testable). Per-table replay skip, NOT a
    max() across tables: transaction atomicity means on pure
    crash-replay every participant agrees (all carry the batch id or
    none do). The watermarks diverge only when routes CHANGE on an
    existing checkpoint — a max() would let the old tables' watermark
    dominate and silently skip a replayed batch for a newly added
    table, while unconditionally re-appending to ALL tables would
    duplicate the old tables' slices. Only the genuinely-missing
    tables participate in the (still atomic) commit."""
    if batch_df.isEmpty():
        return
    tables = {i: catalog.load_table(i) for i in routes}
    pending = {
        i: t
        for i, t in tables.items()
        if batch_id > _last_committed_batch(t, sid)
    }
    if not pending:
        return  # replayed batch — already committed atomically
    txn = catalog.transaction()
    for ident in pending:
        transform = routes[ident]
        out = transform(batch_df) if transform is not None else batch_df
        txn.append(
            ident,
            out,
            extra_summary={
                "streaming-sink-id": sid,
                "streaming-batch-id": batch_id,
            },
        )
    txn.commit()


def stream_fanout_to_lake(
    stream: DataFrame,
    catalog,
    routes: dict,
    checkpoint_dir: str,
    query_name: str = "fanout_to_lake",
):
    """Micro-batch fan-out to SEVERAL lake tables with CROSS-TABLE
    atomicity: each batch's per-table slices (``routes``: identifier →
    transform, or None for pass-through) commit through ONE
    ``catalog.transaction()`` — readers see every table advanced by the
    batch or none of them. The medallion split (raw to bronze, cleaned
    to silver) where downstream joins must never observe one side ahead
    of the other.

    Exactly-once under foreachBatch's at-least-once replay: the batch-id
    watermark is recorded on every participating table inside the same
    transaction, so after a crash either ALL tables carry the batch id
    (skip the replay) or NONE do (the aborted staging is invisible —
    txn.py — and the replay commits cleanly).
    """
    sid = _sink_id(checkpoint_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _fanout_batch(catalog, routes, sid, batch_df, batch_id)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_to_lake_with_mv_refresh(
    stream: DataFrame,
    catalog,
    identifier: str,
    checkpoint_dir: str,
    query_name: str = "to_lake_mv",
):
    """``stream_to_lake`` composed with continuous-aggregate upkeep:
    after each micro-batch commit, every stale materialized view in the
    catalog is refreshed — so downstream dashboards read
    micro-batch-fresh aggregates without a separate scheduler. Both
    halves are idempotent under foreachBatch replay (the append is
    batch-id-watermarked; the refresh is source-snapshot-keyed), so a
    crash between append and refresh just refreshes on the replay."""
    from icebergplus_spark.lake.rollup import (
        refresh_stale_materialized_views,
    )

    sid = _sink_id(checkpoint_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table = catalog.load_table(identifier)
        if batch_id > _last_committed_batch(table, sid):
            table.append(
                batch_df,
                extra_summary={
                    "streaming-sink-id": sid,
                    "streaming-batch-id": batch_id,
                },
            )
        # runs on the replayed path too: a crash AFTER the append but
        # BEFORE the refresh otherwise leaves the MVs stale forever
        refresh_stale_materialized_views(catalog)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
