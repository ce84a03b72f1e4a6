from icebergplus_spark.streaming.pipelines import (
    EVENTS_SCHEMA,
    dedup_stream,
    read_events_stream,
    session_windows,
    sliding_counts,
    stream_to_lake,
    stream_upsert_to_lake,
    windowed_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "windowed_counts",
    "sliding_counts",
    "session_windows",
    "dedup_stream",
    "stream_to_lake",
    "stream_upsert_to_lake",
]
