"""Rollback + orphan-file cleanup (Iceberg `rollback_to_snapshot` /
`remove_orphan_files` parity — maintenance ops beyond the reference's
append-only surface, SURVEY.md §2.C)."""

import os

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from icebergplus_spark.lake import (
    LocalLakeCatalog,
    expire_snapshots,
    remove_orphan_files,
    rollback,
)

SCHEMA = StructType(
    [StructField("k", IntegerType(), True), StructField("v", StringType(), True)]
)


@pytest.fixture
def two_snapshot_table(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.rb", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA).coalesce(1))
    t.append(spark.createDataFrame([(3, "c")], SCHEMA).coalesce(1))
    return t


def test_rollback_restores_old_state_and_preserves_history(spark, two_snapshot_table):
    t = two_snapshot_table
    first = t.history()[0]["snapshot_id"]
    assert t.scan().count() == 3

    res = rollback(t, first)
    assert res["rolled_back"] and res["to_snapshot_id"] == first
    # current state == snapshot 1's content, via a NEW snapshot
    assert sorted(r["k"] for r in t.scan().collect()) == [1, 2]
    assert t.snapshot()["operation"] == "rollback"
    # the rolled-past snapshot remains time-travelable
    bad = res["from_snapshot_id"]
    assert t.scan(snapshot_id=bad).count() == 3
    # appends continue from the rolled-back state
    t.append(spark.createDataFrame([(9, "z")], SCHEMA).coalesce(1))
    assert sorted(r["k"] for r in t.scan().collect()) == [1, 2, 9]


def test_rollback_unknown_snapshot_raises(two_snapshot_table):
    with pytest.raises(ValueError):
        rollback(two_snapshot_table, 999)


def test_rollback_to_current_is_noop(two_snapshot_table):
    t = two_snapshot_table
    res = rollback(t, t.current_snapshot_id)
    assert res == {"rolled_back": False, "reason": "already current"}


def test_remove_orphan_files(spark, two_snapshot_table):
    t = two_snapshot_table
    # plant an orphan (aborted-write debris) next to live data files
    orphan_dir = os.path.join(t.table_dir, "data", "aborted-write")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-00000-dead.parquet")
    spark.createDataFrame([(99, "dead")], SCHEMA).toPandas().to_parquet(orphan)

    # default grace period protects fresh files (in-flight writers)
    res = remove_orphan_files(t)
    assert res["deleted"] == 0 and os.path.exists(orphan)

    res = remove_orphan_files(t, older_than_s=0)
    assert res["deleted"] == 1
    assert not os.path.exists(orphan)
    # live data untouched; table still scans identically
    assert t.scan().count() == 3
    # idempotent
    assert remove_orphan_files(t, older_than_s=0)["deleted"] == 0


def test_expire_after_rollback_drops_bad_snapshot_files(spark, two_snapshot_table):
    t = two_snapshot_table
    first = t.history()[0]["snapshot_id"]
    bad_files = {f["file_path"] for f in t.plan_files()} - {
        f["file_path"] for f in t.plan_files(snapshot_id=first)
    }
    rollback(t, first)
    expire_snapshots(t, keep_last=1)
    # snapshot-2's exclusive file is gone, current scan unaffected
    assert all(not os.path.exists(p) for p in bad_files)
    assert sorted(r["k"] for r in t.scan().collect()) == [1, 2]


def test_scan_as_of_timestamp(spark, two_snapshot_table):
    t = two_snapshot_table
    s1, s2 = t.history()[0], t.history()[1]
    # at s1's commit time → s1's content; after s2 → s2's
    assert t.scan(as_of_ms=s1["timestamp_ms"]).count() == 2
    assert t.scan(as_of_ms=s2["timestamp_ms"] + 1).count() == 3
    with pytest.raises(ValueError):
        t.scan(as_of_ms=s1["timestamp_ms"] - 1)  # before first commit
    with pytest.raises(ValueError):
        t.scan(snapshot_id=s1["snapshot_id"], as_of_ms=s2["timestamp_ms"])


def test_expire_metadata_versions(spark, two_snapshot_table):
    import os

    from icebergplus_spark.lake import expire_metadata_versions

    t = two_snapshot_table
    for i in range(4):  # churn more metadata versions
        t.append(spark.createDataFrame([(10 + i, "x")], SCHEMA).coalesce(1))
    files = [f for f in os.listdir(t._meta_dir) if f.endswith(".metadata.json")]
    assert len(files) == 7  # v1 (create) + 6 commits
    res = expire_metadata_versions(t, keep_last=2)
    assert res["removed_versions"] == 5
    left = sorted(f for f in os.listdir(t._meta_dir) if f.endswith(".metadata.json"))
    assert len(left) == 2
    # table still fully readable: current state + refresh + time travel
    t.refresh()
    assert t.scan().count() == 7
    assert t.scan(snapshot_id=t.history()[-2]["snapshot_id"]).count() == 6


def test_expire_snapshots_by_age(spark, tmp_path):
    """older_than_ms retains every snapshot newer than the cutoff even
    beyond keep_last; only stale history expires."""
    from pyspark.sql.types import LongType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.maintenance import expire_snapshots

    schema = StructType([StructField("x", LongType(), True)])
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.age", schema)
    for i in range(4):
        t.append(spark.createDataFrame([(i,)], schema).coalesce(1))
    ts = [s["timestamp_ms"] for s in t.history()]
    # cutoff between snapshot 2 and 3: snapshots 3,4 are "recent"
    cutoff = ts[2]
    res = expire_snapshots(t, keep_last=1, older_than_ms=cutoff)
    ids = [s["snapshot_id"] for s in t.refresh().history()]
    assert ids == [3, 4]  # 1,2 expired; 3,4 kept by age (4 also by tail)
    assert res["expired"] == 2
    # all rows still scannable from the retained head
    assert t.scan().count() == 4


def test_auto_maintain_triggers_and_skips(spark, tmp_path):
    """auto_maintain fires each action only when its threshold trips,
    reports skips otherwise, and dry_run touches nothing."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog, auto_maintain

    schema = StructType([StructField("x", IntegerType(), True)])
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.auto", schema)
    for i in range(10):  # 10 tiny files, 10 manifests, 10 snapshots
        t.append(spark.createDataFrame([(i,)], schema).coalesce(1))
    n_rows = t.scan().count()

    # dry run: reports intentions, mutates nothing
    before_version = t._meta["_version"]
    rep = auto_maintain(
        t, min_small_files=4, max_manifests=4, keep_snapshots=5, dry_run=True
    )
    assert "would compact" in rep["compact"]
    assert "would rewrite" in rep["rewrite_manifests"]
    assert "would expire" in rep["expire_snapshots"]
    assert t.refresh()._meta["_version"] == before_version

    # manifest rewrite fires alone when compaction's trigger is quiet
    rep = auto_maintain(
        t, min_small_files=1000, max_manifests=4, keep_snapshots=1000,
        orphan_grace_s=3600,
    )
    assert "skipped" in rep["compact"]
    assert isinstance(rep["rewrite_manifests"], dict)

    # full run: compaction (which itself consolidates manifests) + expiry
    rep = auto_maintain(
        t, min_small_files=4, max_manifests=4, keep_snapshots=5,
        orphan_grace_s=0,
    )
    assert rep["compact"]["compacted"] > 1
    assert isinstance(rep["expire_snapshots"], dict)
    assert t.scan().count() == n_rows  # content untouched

    # healthy table: every trigger reports a skip
    rep = auto_maintain(t, min_small_files=1000, max_manifests=1000,
                        keep_snapshots=1000, orphan_grace_s=3600)
    assert all(
        "skipped" in str(v) or (isinstance(v, dict) and not v.get("deleted"))
        for v in rep.values()
    ), rep


def test_auto_maintain_respects_gc_disabled(spark, tmp_path):
    """gc.enabled=false (clone-source safety) downgrades file-deleting
    steps to reported skips instead of errors."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog, auto_maintain

    schema = StructType([StructField("x", IntegerType(), True)])
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.frozen", schema)
    for i in range(6):
        t.append(spark.createDataFrame([(i,)], schema).coalesce(1))
    t.set_property("gc.enabled", "false")
    rep = auto_maintain(t, min_small_files=1000, keep_snapshots=2)
    assert rep["expire_snapshots"] == "skipped: gc.enabled=false"
    assert rep["remove_orphan_files"] == "skipped: gc.enabled=false"
    assert len(t.refresh()._meta["snapshots"]) == 6  # nothing expired


def test_retention_properties_drive_auto_maintain(spark, tmp_path):
    """Iceberg retention-property parity: the table declares its policy
    (history.expire.min-snapshots-to-keep / max-snapshot-age-ms) and
    auto_maintain honors it without arguments; VACUUM <tbl> routes the
    whole policy through the SQL frontend."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog, auto_maintain
    from icebergplus_spark.lake.sql_dml import lake_sql

    schema = StructType([StructField("x", IntegerType(), True)])
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.ret", schema)
    for i in range(8):
        t.append(spark.createDataFrame([(i,)], schema).coalesce(1))
    t.set_property("history.expire.min-snapshots-to-keep", "3")

    rep = auto_maintain(t, min_small_files=1000, orphan_grace_s=3600)
    assert isinstance(rep["expire_snapshots"], dict)
    assert len(t.refresh()._meta["snapshots"]) == 3  # property-driven
    assert t.scan().count() == 8

    # max-age retention keeps everything younger than the horizon even
    # past the count limit
    t.set_property("history.expire.max-snapshot-age-ms", str(10**12))
    t.append(spark.createDataFrame([(9,)], schema).coalesce(1))
    rep = auto_maintain(t, min_small_files=1000, keep_snapshots=1,
                        orphan_grace_s=3600)
    assert len(t.refresh()._meta["snapshots"]) == 4  # all younger than horizon

    # VACUUM statement routes the same policy
    rep = lake_sql(cat, "VACUUM db.ret")
    assert "expire_snapshots" in rep and t.scan().count() == 9
