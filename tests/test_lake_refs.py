"""Snapshot refs (tags/branches, Iceberg SnapshotRef parity) and
metadata tables (Iceberg's db.t.snapshots/files/refs/… parity).

The reference pins Iceberg 1.10 (pom.xml:53), whose table format
carries named refs and metadata tables; our lake layer re-expresses
both over the JSON metadata log."""

import pytest
from pyspark.sql import Row
from pyspark.sql.types import LongType, StringType, StructField, StructType

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.maintenance import expire_snapshots

SCHEMA = StructType(
    [
        StructField("k", LongType(), True),
        StructField("v", StringType(), True),
    ]
)


@pytest.fixture
def catalog(spark, tmp_path):
    return LocalLakeCatalog(spark, str(tmp_path / "warehouse")).start()


def _rows(spark, lo, hi):
    return spark.createDataFrame([Row(k=i, v=f"v{i}") for i in range(lo, hi)], SCHEMA)


def test_tag_time_travel_and_immutability(spark, catalog):
    t = catalog.create_table("ns.tags", SCHEMA)
    t.append(_rows(spark, 0, 10))
    t.create_tag("audit")
    t.overwrite(_rows(spark, 100, 103))

    assert t.scan().count() == 3  # main sees the overwrite
    assert t.scan(ref="audit").count() == 10  # tag pins the old snapshot
    assert sorted(r.k for r in t.scan(ref="audit").collect()) == list(range(10))

    with pytest.raises(ValueError):
        t.create_tag("audit")  # tags are immutable
    with pytest.raises(ValueError):
        t.append(_rows(spark, 0, 1), branch="audit")  # cannot write to a tag
    with pytest.raises(KeyError):
        t.scan(ref="nope")

    t.drop_ref("audit")
    with pytest.raises(KeyError):
        t.scan(ref="audit")


def test_branch_write_audit_publish(spark, catalog):
    t = catalog.create_table("ns.branches", SCHEMA)
    t.append(_rows(spark, 0, 5))
    main_before = t.current_snapshot_id

    t.create_branch("staging")
    t.append(_rows(spark, 5, 8), branch="staging")

    # audit: branch head sees old+new, main is untouched
    assert t.scan().count() == 5
    assert t.current_snapshot_id == main_before
    assert t.scan(ref="staging").count() == 8

    # a second branch commit stacks on the branch head
    t.append(_rows(spark, 8, 9), branch="staging")
    assert t.scan(ref="staging").count() == 9
    assert t.scan().count() == 5

    # publish
    t.fast_forward("staging")
    assert t.scan().count() == 9
    assert sorted(r.k for r in t.scan().collect()) == list(range(9))


def test_expire_keeps_ref_pinned_snapshots(spark, catalog):
    t = catalog.create_table("ns.pinned", SCHEMA)
    t.append(_rows(spark, 0, 4))
    t.create_tag("keepme")
    t.overwrite(_rows(spark, 10, 12))
    t.overwrite(_rows(spark, 20, 23))

    res = expire_snapshots(t, keep_last=1)
    assert res["expired"] == 1  # only the middle overwrite goes
    # the tagged snapshot survives and still reads all its rows
    assert t.scan(ref="keepme").count() == 4
    assert t.scan().count() == 3


def test_metadata_tables(spark, catalog):
    t = catalog.create_table("ns.meta", SCHEMA, partition_cols=["v"])
    t.append(_rows(spark, 0, 3))
    t.append(_rows(spark, 3, 5))
    t.create_tag("t1")

    snaps = t.metadata_df("snapshots")
    assert snaps.count() == 2
    ops = [r.operation for r in snaps.orderBy("snapshot_id").collect()]
    assert ops == ["append", "append"]
    totals = [r.total_records for r in snaps.orderBy("snapshot_id").collect()]
    assert totals == [3, 5]

    hist = t.metadata_df("history").orderBy("snapshot_id").collect()
    assert [r.is_current for r in hist] == [False, True]

    refs = {r.name: (r.type, r.snapshot_id) for r in t.metadata_df("refs").collect()}
    assert refs["main"] == ("branch", t.current_snapshot_id)
    assert refs["t1"] == ("tag", t.current_snapshot_id)

    files = t.metadata_df("files")
    assert files.count() == t.metadata_df("files").select("file_path").distinct().count()
    assert files.agg({"record_count": "sum"}).collect()[0][0] == 5

    parts = t.metadata_df("partitions").collect()
    assert sum(r.record_count for r in parts) == 5
    assert all(r.partition.startswith("v=") for r in parts)

    man = t.metadata_df("manifests")
    assert man.count() == 2  # one manifest per append

    with pytest.raises(ValueError):
        t.metadata_df("nope")
