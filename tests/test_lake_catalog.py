"""Lake catalog/table tests — pytest port of the reference's test
narratives: LocalIcebergCatalogTest (round-trip :77-84, write/commit
:86-108, restart persistence :114-156) and IntegrationTest (:56-133),
using the reference's exact fixture (FIXTURES.md §1)."""

import datetime as dt

import pytest
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from icebergplus_spark.lake import LocalLakeCatalog, MetricsReporter, MetricsSink

# Reference fixture schema (LocalIcebergCatalogTest.java:62-69).
REF_SCHEMA = StructType(
    [
        StructField("text", StringType(), False),
        StructField("count", IntegerType(), False),
        StructField("amazing", BooleanType(), False),
        StructField("event_timestamp", TimestampType(), False),
    ]
)

# Canonical rows (LocalIcebergCatalogTest.java:39-42, offset +05:00 → UTC).
ROW1 = ("Hello world", 22, True, dt.datetime(2005, 11, 30, 19, 0, 0))
ROW2 = ("Hello moon", 33, False, dt.datetime(2005, 12, 23, 19, 0, 0))


@pytest.fixture
def catalog(spark, tmp_path):
    return LocalLakeCatalog(spark, str(tmp_path / "warehouse")).start()


def test_lifecycle_guards(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh"))
    assert cat.is_stopped()
    cat.start()
    assert not cat.is_stopped()
    with pytest.raises(RuntimeError):
        cat.start()  # CAS guard: double start throws (LocalIcebergCatalog.java:100-102)
    cat.stop()
    assert cat.is_stopped()


def test_create_load_roundtrip(catalog):
    t = catalog.create_table("mynamespace.mytable", REF_SCHEMA)
    loaded = catalog.load_table("mynamespace.mytable")
    # round-trip identity (LocalIcebergCatalogTest.java:77-84)
    assert loaded.location == t.location
    assert loaded.schema == t.schema == REF_SCHEMA
    assert loaded.field_ids == {"text": 1, "count": 2, "amazing": 3, "event_timestamp": 4}
    assert catalog.list_tables() == ["mynamespace.mytable"]
    with pytest.raises(ValueError):
        catalog.create_table("mynamespace.mytable", REF_SCHEMA)
    with pytest.raises(KeyError):
        catalog.load_table("mynamespace.nope")


def test_write_commit_restart_scan(spark, tmp_path):
    """The reference's full narrative: write 2 rows as 2 files/commits,
    restart the catalog twice, rebuild over the same dir, scan == 2 rows
    (LocalIcebergCatalogTest.java:86-156)."""
    root = str(tmp_path / "warehouse")
    sink = MetricsSink()
    cat = LocalLakeCatalog(spark, root, metrics_sink=sink).start()
    t = cat.create_table("mynamespace.mytable", REF_SCHEMA)
    t.append(spark.createDataFrame([ROW1], REF_SCHEMA))
    t.append(spark.createDataFrame([ROW2], REF_SCHEMA))
    assert t.current_snapshot_id == 2
    assert len(t.history()) == 2

    # commit metric names present (IntegrationTest.java:106-117)
    assert "iceberg.commitReport.addedRecords" in sink.meter_names
    # counters accumulate across commits (micrometer semantics): 1 + 1
    assert sink.get("iceberg.commitReport.addedRecords").value == 2
    assert sink.get("iceberg.commitReport.attempts").value == 2
    assert sink.get("iceberg.commitReport.totalRecords").value == 1 + 2  # 1 then 2
    assert sink.get("iceberg.commitReport.attempts").tags == {
        "tableName": "mynamespace.mytable"
    }

    # two restart cycles + a rebuilt instance over the same dir
    cat.stop()
    cat2 = LocalLakeCatalog(spark, root).start()
    t2 = cat2.load_table("mynamespace.mytable")
    assert t2.schema == REF_SCHEMA
    rows = sorted(t2.scan().collect(), key=lambda r: r["count"])
    assert [(r["text"], r["count"], r["amazing"]) for r in rows] == [
        ("Hello world", 22, True),
        ("Hello moon", 33, False),
    ]
    cat2.stop()
    cat3 = LocalLakeCatalog(spark, root).start()
    assert cat3.load_table("mynamespace.mytable").scan().count() == 2


def test_scan_planning_prunes_by_stats(spark, catalog):
    t = catalog.create_table(
        "db.pruned",
        StructType([StructField("k", IntegerType(), True), StructField("v", StringType(), True)]),
    )
    t.append(spark.createDataFrame([(i, f"a{i}") for i in range(10)], t.schema).coalesce(1))
    t.append(spark.createDataFrame([(i, f"b{i}") for i in range(100, 110)], t.schema).coalesce(1))
    all_files = t.plan_files()
    assert len(all_files) == 2
    pruned = t.plan_files({"k": (">=", 100)})
    assert len(pruned) == 1  # first file's max(k)=9 < 100 → skipped
    assert t.scan({"k": (">=", 100)}).count() == 10
    # residual filter still applies within kept files
    assert t.scan({"k": ("=", 105)}).count() == 1


def test_time_travel(spark, catalog):
    t = catalog.create_table(
        "db.tt", StructType([StructField("x", IntegerType(), True)])
    )
    t.append(spark.createDataFrame([(1,), (2,)], t.schema))
    t.append(spark.createDataFrame([(3,)], t.schema))
    assert t.scan().count() == 3
    assert t.scan(snapshot_id=1).count() == 2  # snapshot isolation / time travel
    ops = [s["operation"] for s in t.history()]
    assert ops == ["append", "append"]


def test_schema_mismatch_rejected(spark, catalog):
    t = catalog.create_table(
        "db.strict", StructType([StructField("x", IntegerType(), True)])
    )
    bad = spark.createDataFrame([(1, "y")], "x int, y string")
    with pytest.raises(ValueError):
        t.append(bad)


def test_drop_table(spark, catalog):
    t = catalog.create_table("db.gone", StructType([StructField("x", IntegerType(), True)]))
    t.append(spark.createDataFrame([(1,)], t.schema))
    catalog.drop_table("db.gone", purge=True)
    assert not catalog.table_exists("db.gone")


def test_concurrent_commit_detected(spark, catalog):
    from icebergplus_spark.lake.metrics import MetricsReporter, MetricsSink
    from icebergplus_spark.lake.table import ConcurrentCommitError

    sink = MetricsSink()
    catalog.set_metrics_reporter(MetricsReporter(sink))
    t = catalog.create_table("db.concurrent", REF_SCHEMA)
    # two handles over the same table; the second commits first
    stale = catalog.load_table("db.concurrent")
    fresh = catalog.load_table("db.concurrent")
    fresh.append(spark.createDataFrame([ROW1], REF_SCHEMA))
    # append self-heals (Iceberg newAppend retry): the conflicting
    # commit is detected, the handle refreshes, and the manifest is
    # re-anchored on the new base — attempts=2 in the commit report
    stale.append(spark.createDataFrame([ROW2], REF_SCHEMA))
    assert stale.scan().count() == 2
    assert fresh.refresh().scan().count() == 2
    attempts = sink.get("iceberg.commitReport.attempts")
    assert attempts is not None and attempts.value >= 3  # 1 + 2

    # non-append commits stay fail-fast: the caller must refresh because
    # their rewrite decisions were made against the stale base
    stale2 = catalog.load_table("db.concurrent")
    fresh.append(spark.createDataFrame([ROW1], REF_SCHEMA))
    with pytest.raises(ConcurrentCommitError):
        stale2.delete({"count": ("=", 22)})


def test_sql_over_lake_view(spark, catalog):
    t = catalog.create_table("db.sqlview", REF_SCHEMA)
    t.append(spark.createDataFrame([ROW1, ROW2], REF_SCHEMA))
    t.to_view("lake_mytable")
    got = spark.sql(
        "SELECT count FROM lake_mytable WHERE amazing ORDER BY count"
    ).collect()
    assert [r["count"] for r in got] == [22]
    # time-traveled view
    t.append(spark.createDataFrame([("Hello sun", 44, True, ROW1[3])], REF_SCHEMA))
    t.to_view("lake_v1", snapshot_id=1)
    assert spark.sql("SELECT COUNT(*) n FROM lake_v1").first()["n"] == 2


def test_parallel_appends_lose_nothing(spark, catalog):
    """Two threads appending simultaneously: the locked CAS serializes
    the commits and the retry loop re-anchors the loser — every row and
    every snapshot survives."""
    import threading

    t = catalog.create_table("db.parallel", REF_SCHEMA)
    handles = [catalog.load_table("db.parallel") for _ in range(2)]
    dfs = [
        spark.createDataFrame([ROW1], REF_SCHEMA),
        spark.createDataFrame([ROW2], REF_SCHEMA),
    ]
    errs = []

    def work(i):
        try:
            handles[i].append(dfs[i])
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    t = t.refresh()
    assert t.scan().count() == 2
    assert len(t.history()) == 2


def test_catalog_versioned_views(spark, catalog):
    """Iceberg view-spec parity: views are catalog objects with a
    version log; CREATE OR REPLACE appends a version, historical
    versions stay queryable, names share the table namespace."""
    t = catalog.create_table("db.base", REF_SCHEMA)
    t.append(spark.createDataFrame([ROW1, ROW2], REF_SCHEMA))
    t.to_view("base_v")

    catalog.create_view("db.counts", "SELECT COUNT(*) AS n FROM base_v")
    assert catalog.view_exists("db.counts")
    assert catalog.list_views() == ["db.counts"]
    assert "db.counts" not in catalog.list_tables()  # separate namespaces listing
    assert catalog.load_view("db.counts").first()["n"] == 2

    # replace appends a version; v1 remains queryable
    catalog.create_view(
        "db.counts",
        "SELECT COUNT(*) AS n FROM base_v WHERE amazing",
        replace=True,
    )
    assert catalog.load_view("db.counts").first()["n"] == 1
    assert catalog.load_view("db.counts", version=1).first()["n"] == 2
    assert [v["version"] for v in catalog.view_versions("db.counts")] == [1, 2]

    # restart: views persist like tables
    from icebergplus_spark.lake import LocalLakeCatalog

    cat2 = LocalLakeCatalog(spark, catalog.root_dir).start()
    assert cat2.load_view("db.counts").first()["n"] == 1

    # collision guards both directions
    import pytest

    with pytest.raises(ValueError, match="already exists"):
        catalog.create_table("db.counts", REF_SCHEMA)
    with pytest.raises(ValueError, match="already exists"):
        catalog.create_view("db.base", "SELECT 1")
    with pytest.raises(ValueError, match="replace"):
        catalog.create_view("db.counts", "SELECT 2")

    catalog.drop_view("db.counts")
    assert not catalog.view_exists("db.counts")
