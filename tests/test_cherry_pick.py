"""cherry_pick — Iceberg ``cherrypick_snapshot`` parity: re-anchor one
append snapshot's added files onto the current head, metadata-only.

Covers the WAP case fast_forward cannot: publishing a single audited
branch commit while the branch has moved on, and publishing onto a main
that advanced since the branch forked."""

import pytest
from pyspark.sql import Row
from pyspark.sql.types import LongType, StringType, StructField, StructType

from icebergplus_spark.lake import LocalLakeCatalog, cherry_pick

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
    return spark.createDataFrame(
        [Row(k=i, v=f"v{i}") for i in range(lo, hi)], SCHEMA
    )


def test_cherry_pick_branch_commit_onto_advanced_main(spark, catalog):
    t = catalog.create_table("ns.cp", SCHEMA)
    t.append(_rows(spark, 0, 5))

    t.create_branch("staging")
    t.append(_rows(spark, 100, 103), branch="staging")
    audited = t.refs["staging"]["snapshot_id"]
    t.append(_rows(spark, 200, 210), branch="staging")  # branch moved on

    t.append(_rows(spark, 5, 8))  # main advanced independently
    assert t.scan().count() == 8

    res = cherry_pick(t, audited)
    assert res["cherry_picked"] is True
    assert res["added_records"] == 3
    got = sorted(r.k for r in t.scan().collect())
    assert got == list(range(0, 8)) + [100, 101, 102]
    # lineage: new head's parent is the old main head, not the branch
    head = t.snapshot()
    assert head["summary"]["cherry-picked-from"] == audited
    # the un-published 200s never reached main
    assert 200 not in got


def test_cherry_pick_duplicate_and_non_append_rejected(spark, catalog):
    t = catalog.create_table("ns.cp2", SCHEMA)
    t.append(_rows(spark, 0, 3))
    t.create_branch("b")
    t.append(_rows(spark, 10, 12), branch="b")
    audited = t.refs["b"]["snapshot_id"]

    cherry_pick(t, audited)
    with pytest.raises(ValueError, match="duplicate"):
        cherry_pick(t, audited)  # double publish refused

    t.overwrite(_rows(spark, 50, 55))
    replace_snap = t.current_snapshot_id
    with pytest.raises(ValueError, match="append snapshots only"):
        cherry_pick(t, replace_snap)

    with pytest.raises(ValueError, match="no snapshot"):
        cherry_pick(t, 10_000)


def test_cherry_pick_survives_restart_and_time_travel(spark, catalog, tmp_path):
    t = catalog.create_table("ns.cp3", SCHEMA)
    t.append(_rows(spark, 0, 4))
    before = t.current_snapshot_id
    t.create_branch("wap")
    t.append(_rows(spark, 4, 6), branch="wap")
    cherry_pick(t, t.refs["wap"]["snapshot_id"])

    assert t.scan().count() == 6
    assert t.scan(snapshot_id=before).count() == 4  # history intact

    catalog.stop()
    reopened = (
        LocalLakeCatalog(spark, str(tmp_path / "warehouse"))
        .start()
        .load_table("ns.cp3")
    )
    assert reopened.scan().count() == 6
