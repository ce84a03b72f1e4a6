"""SparkSession construction & per-session normalization.

The reference bootstraps its environment in
``LocalIcebergCatalog.start()`` (LocalIcebergCatalog.java:99-142):
container + JDBC catalog + FileIO wiring. Our Spark-native equivalent is
one process: a SparkSession with a warehouse dir and tuned SQL confs.

Scale notes (100 TB design): every conf set here is also valid on a real
cluster; ``local[N]`` only appears when WE create the session (tests /
bench). ``prepare_session`` touches only runtime-settable confs so it is
safe to call on a driver-provided session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session (incl. driver-provided).
_RUNTIME_CONFS = {
    # Oracle parity: testdata timestamps are tz-naive; normalize to UTC so
    # Spark and DuckDB agree on timestamp values (FIXTURES.md oracle note).
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime re-planning (partition coalescing, skew-join splitting,
    # broadcast conversion). Essential at 100 TB, harmless at sf0.01.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Parquet scan efficiency: pushdown + vectorized reader.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Write timestamps as INT64 micros, not legacy INT96: INT96 is
    # deprecated AND carries no footer min/max statistics, which
    # silently disables every timestamp-range pruning tier (manifest
    # min/max, Parquet row-group skip) — the MV-refresh scan path
    # depends on both (r6).
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Arrow for pandas UDF / toPandas interchange (10-100x vs pickle).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: TPC-H-ish expressions want permissive casts like the oracle.
    "spark.sql.ansi.enabled": "false",
    # testdata events.ts is parquet TIMESTAMP(NANOS) — Spark has no nanos
    # type, so read as long and convert in sources.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Read tz-naive parquet timestamps as TIMESTAMP (UTC session) rather
    # than TIMESTAMP_NTZ: one timestamp type everywhere, cast-friendly,
    # and identical values given the UTC session timezone.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def prepare_session(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Normalize a (possibly externally created) session for our engine."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on this build — static value still fine
    if shuffle_partitions is None:
        # Local-mode default: match parallelism instead of the 200 default
        # (AQE coalesces anyway, but a right-sized starting point is cheaper).
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "icebergplus-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for tests/bench; on
    a real cluster the caller passes none and spark-submit decides.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_LOCAL"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return prepare_session(spark, shuffle_partitions)
