"""Metrics-parity tests — pytest port of the reference's
MicrometerMetricsReporterTest (scan :23-47, commit :51-97) and the
IntegrationTest commit-name assertion (:106-117). Duration fields are
TimerResult in Iceberg, and the reference bridges them to UNTAGGED
Micrometer Timers (MicrometerMetricsReporter.java:86-92) — a distinct
meter type from the tableName-tagged counters, mirrored here."""

import pytest

from icebergplus_spark.lake import (
    COMMIT_COUNTER_FIELDS,
    COMMIT_TIMER_FIELDS,
    CommitReport,
    MetricsReporter,
    MetricsSink,
    ScanReport,
)


def test_scan_report_meter_names():
    sink = MetricsSink()
    rep = MetricsReporter(sink)
    rep.report(
        ScanReport(
            "mytable", 1,
            {"resultDataFiles": 2, "resultDeleteFiles": 0, "totalFileSizeInBytes": 1024},
            timers={"totalPlanningDuration": 0.25},
        )
    )
    assert sink.meter_names == {
        "iceberg.scanReport.resultDataFiles",
        "iceberg.scanReport.resultDeleteFiles",
        "iceberg.scanReport.totalFileSizeInBytes",
        "iceberg.scanReport.totalPlanningDuration",
    }
    c = sink.get("iceberg.scanReport.resultDataFiles")
    assert c.value == 2 and c.tags == {"tableName": "mytable"}
    t = sink.get_timer("iceberg.scanReport.totalPlanningDuration")
    assert t.count == 1 and t.total_time_s == 0.25


def test_commit_report_exact_11_names():
    sink = MetricsSink()
    MetricsReporter(sink).report(
        CommitReport(
            "db.t", 1,
            {f: 1 for f in COMMIT_COUNTER_FIELDS},
            timers={f: 0.5 for f in COMMIT_TIMER_FIELDS},
        )
    )
    # IntegrationTest.java:106-117 — the exact 11 commit meter names
    # (10 tagged counters + the untagged totalDuration timer).
    assert sink.meter_names == {
        "iceberg.commitReport.attempts",
        "iceberg.commitReport.addedDataFiles",
        "iceberg.commitReport.totalPositionalDeletes",
        "iceberg.commitReport.totalDataFiles",
        "iceberg.commitReport.addedRecords",
        "iceberg.commitReport.totalDeleteFiles",
        "iceberg.commitReport.totalFilesSizeInBytes",
        "iceberg.commitReport.totalRecords",
        "iceberg.commitReport.totalEqualityDeletes",
        "iceberg.commitReport.addedFilesSizeInBytes",
        "iceberg.commitReport.totalDuration",
    }


def test_timer_semantics_untagged_and_accumulating():
    """Timer parity (MicrometerMetricsReporter.java:86-92): duration
    fields register as timers — no tableName tag, one sample recorded
    per report, durations accumulate — NOT as counters."""
    sink = MetricsSink()
    rep = MetricsReporter(sink)
    for secs in (0.5, 1.5):
        rep.report(
            CommitReport("db.t", 1, {"attempts": 1}, timers={"totalDuration": secs})
        )
    assert sink.get("iceberg.commitReport.totalDuration") is None  # not a counter
    t = sink.get_timer("iceberg.commitReport.totalDuration")
    assert t.count == 2
    assert t.total_time_s == 2.0
    assert not hasattr(t, "tags")  # untagged meter type
    # counters remain tagged and keep accumulating independently
    c = sink.get("iceberg.commitReport.attempts")
    assert c.value == 2 and c.tags == {"tableName": "db.t"}


def test_live_commit_and_scan_emit_timers(spark, tmp_path):
    """End-to-end: a real append emits commitReport.totalDuration and a
    real plan emits scanReport.totalPlanningDuration as timers."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog

    sink = MetricsSink()
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    cat.set_metrics_reporter(MetricsReporter(sink))
    t = cat.create_table(
        "db.timers", StructType([StructField("x", IntegerType(), True)])
    )
    t.append(spark.createDataFrame([(1,)], t.schema))
    t.plan_files()
    commit_t = sink.get_timer("iceberg.commitReport.totalDuration")
    scan_t = sink.get_timer("iceberg.scanReport.totalPlanningDuration")
    assert commit_t is not None and commit_t.count == 1 and commit_t.total_time_s > 0
    assert scan_t is not None and scan_t.count == 1 and scan_t.total_time_s >= 0


def test_null_safety_and_unknown_type():
    # MicrometerMetricsReporter.java:42-49 (no-ops) and :73-75 (raise)
    MetricsReporter(None).report(
        ScanReport("t", 1, {"resultDataFiles": 1})
    )  # null registry → no-op
    sink = MetricsSink()
    rep = MetricsReporter(sink)
    rep.report(None)  # null report → no-op
    assert sink.meter_names == set()
    with pytest.raises(ValueError):
        rep.report({"not": "a report"})


def test_custom_prefix():
    sink = MetricsSink()
    MetricsReporter(sink, prefix="lake.").report(
        ScanReport("t", 1, {"resultDataFiles": 1})
    )
    assert sink.meter_names == {"lake.scanReport.resultDataFiles"}
