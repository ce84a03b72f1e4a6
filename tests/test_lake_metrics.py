"""Metrics-parity tests — pytest port of the reference's
MicrometerMetricsReporterTest (scan :23-47, commit :51-97) and the
IntegrationTest commit-name assertion (:106-117)."""

import pytest

from icebergplus_spark.lake import (
    COMMIT_COUNTER_FIELDS,
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
        )
    )
    assert sink.meter_names == {
        "iceberg.scanReport.resultDataFiles",
        "iceberg.scanReport.resultDeleteFiles",
        "iceberg.scanReport.totalFileSizeInBytes",
    }
    c = sink.get("iceberg.scanReport.resultDataFiles")
    assert c.value == 2 and c.tags == {"tableName": "mytable"}


def test_commit_report_exact_11_names():
    sink = MetricsSink()
    MetricsReporter(sink).report(
        CommitReport("db.t", 1, {f: 1 for f in COMMIT_COUNTER_FIELDS})
    )
    # IntegrationTest.java:106-117 — the exact 11 commit counter names
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
