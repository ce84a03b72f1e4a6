from icebergplus_spark.streaming.lake_source import (
    read_lake_cdc_stream,
    read_lake_stream,
)
from icebergplus_spark.streaming.pipelines import (
    EVENTS_SCHEMA,
    dedup_stream,
    read_events_stream,
    session_windows,
    sliding_counts,
    stream_fanout_to_lake,
    stream_replicate_lake,
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
    "stream_fanout_to_lake",
    "stream_upsert_to_lake",
    "stream_replicate_lake",
    "read_lake_stream",
    "read_lake_cdc_stream",
]
